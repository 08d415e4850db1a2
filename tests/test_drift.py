"""Snapshot-pair tests: alignment, PSI, binned-ECDF KS (SURVEY.md §5.2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from raqc_spark.checks.drift import align_snapshots, drift_ks, drift_psi
from raqc_spark.contract import Check, PartitionSpec, Threshold, default_contract
from raqc_spark.functions import partition_id_col
from raqc_spark.plan import prepare


def test_align_snapshots_statuses(spark, snapshots, code_fixture):
    fx, _ = code_fixture
    s1, s2, _ = snapshots
    c = default_contract()
    aligned = align_snapshots(prepare(s1, c), prepare(s2, c))
    counts = {r["status"]: r["cnt"] for r in
              aligned.groupBy("status").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"added", "removed", "modified", "unchanged"}
    # ~5% of s1 deleted, +15% new (plus injected dup/new rows)
    assert counts["removed"] > 0 and counts["added"] > 0
    assert counts["unchanged"] > counts["modified"]


def test_psi_self_is_zero(spark, snapshots):
    """Property: PSI(A, A) == 0 (SURVEY.md §5.2.4)."""
    s1, _, _ = snapshots
    df = prepare(s1, default_contract())
    chk = Check("psi_lang", "drift_psi", column="lang", threshold=Threshold("le", 0.2))
    verdicts, _ = drift_psi(df, df, chk)
    assert verdicts.filter(F.abs("metric_value") > 1e-9).count() == 0
    assert verdicts.filter("NOT pass").count() == 0


def test_ks_self_is_zero(spark, snapshots):
    s1, _, _ = snapshots
    df = prepare(s1, default_contract())
    chk = Check("ks_len", "drift_ks", column="content_length",
                threshold=Threshold("le", 0.15), params=(("num_bins", 64),))
    verdicts, _ = drift_ks(df, df, chk)
    assert verdicts.filter(F.abs("metric_value") > 1e-9).count() == 0


def test_drift_fails_only_injected_partitions(spark, snapshots):
    """V8 flips lang in repo_0007..0009; V9 shifts lengths in repo_0003 —
    drift must fail for (at least) those partitions and pass elsewhere."""
    s1, s2, _ = snapshots
    c = default_contract()
    d1, d2 = prepare(s1, c), prepare(s2, c)
    spec = c.partition_spec

    pids = {
        r["repo"]: r["pid"]
        for r in spark.createDataFrame(
            [(f"repo_{i:04d}",) for i in range(16)], ["repo"]
        ).select("repo", partition_id_col(spec).alias("pid")).collect()
    }

    chk = Check("psi_lang", "drift_psi", column="lang", threshold=Threshold("le", 0.1))
    verdicts, _ = drift_psi(d1, d2, chk)
    failed = {r["partition_id"] for r in verdicts.filter("NOT pass").collect()}
    drifted = {pids[f"repo_{i:04d}"] for i in (7, 8, 9)}
    assert drifted & failed, f"expected drifted partitions {drifted} to fail, got {failed}"

    chk2 = Check("ks_len", "drift_ks", column="content_length",
                 threshold=Threshold("le", 0.2), params=(("num_bins", 64),))
    v2, _ = drift_ks(d1, d2, chk2)
    failed_ks = {r["partition_id"] for r in v2.filter("NOT pass").collect()}
    assert pids["repo_0003"] in failed_ks


def _hist_check():
    return next(
        c for c in default_contract().checks if c.kind == "hist2d_outlier"
    )


def test_hist2d_outlier_golden(spark, snapshots, code_fixture):
    """north_star signature op: every injected length outlier (V7 huge rows,
    V4 empty strings — the fixture's 'length_outlier' golden keys) must land
    in a rare histogram cell; total flagging stays below the 5% threshold."""
    from raqc_spark.checks.drift import hist2d_outlier_check

    fx, _ = code_fixture
    _, s2, _ = snapshots
    df = prepare(s2, default_contract())
    verdicts, violations = hist2d_outlier_check(df, _hist_check())
    flagged = {
        (r["repo"], r["path"], r["commit"], r["content_sha"])
        for r in violations.collect()
    }
    missing = fx.golden["length_outlier"] - flagged
    assert not missing, f"{len(missing)} injected outliers not flagged"
    n_rows = df.count()
    assert len(flagged) / n_rows < 0.05
    # verdict bookkeeping: per-partition n_violations sums to flagged rows
    total_viol = verdicts.agg(F.sum("n_violations")).collect()[0][0]
    assert total_viol == violations.count()


def test_hist2d_outlier_in_default_contract():
    """Regression (VERDICT r1): the flagship contract must carry RAQC's
    signature 2D-histogram outlier check."""
    kinds = {c.kind for c in default_contract().checks}
    assert "hist2d_outlier" in kinds


def test_hist2d_outlier_compiles_lazily(spark, snapshots):
    """Regression (VERDICT r1): compiling the hist check must trigger NO
    Spark job (the round-1 version ran df.count() eagerly)."""
    from raqc_spark.checks.drift import hist2d_outlier_check

    _, s2, _ = snapshots
    df = prepare(s2, default_contract())
    sc = spark.sparkContext
    group = "hist-lazy-probe"
    sc.setJobGroup(group, "laziness probe")
    try:
        hist2d_outlier_check(df, _hist_check())
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup(None, None)
    assert list(jobs) == []


def test_drift_ks_inplan_edges_match_pinned(spark, snapshots, contract_df=None):
    """Un-pinned drift_ks derives (lo, hi) in-plan (broadcast 1-row min/max
    cross-join, no driver collect) and must equal the same check with those
    edges pinned as floats."""
    from pyspark.sql import functions as F

    s1, s2, _ = snapshots
    d1 = prepare(s1, default_contract())
    d2 = prepare(s2, default_contract())
    chk_dyn = Check("ks_len", "drift_ks", column="content_length",
                    threshold=Threshold("le", 0.15),
                    params=(("num_bins", 32), ("log_scale", True)))
    v_dyn = drift_ks(d1, d2, chk_dyn)[0].collect()
    row = d1.agg(
        F.min(F.log1p(F.col("content_length").cast("double"))).alias("lo"),
        F.max(F.log1p(F.col("content_length").cast("double"))).alias("hi"),
    ).collect()[0]
    v_pin = drift_ks(d1, d2, chk_dyn, lo=float(row["lo"]),
                     hi=float(row["hi"]))[0].collect()
    assert sorted(map(tuple, v_dyn)) == sorted(map(tuple, v_pin))


def test_no_driver_collect_in_checks_package():
    """VERDICT r2 task 6 'Done' criterion: no .collect() anywhere under
    raqc_spark/checks/ — every check compiles to one lazy DAG."""
    import pathlib

    pkg = pathlib.Path(__file__).parent.parent / "raqc_spark" / "checks"
    for f in pkg.glob("*.py"):
        assert ".collect(" not in f.read_text(), f"driver collect in {f}"


def test_compile_drift_pass_matches_standalone_checks(spark, snapshots):
    """The merged one-cube drift family (VERDICT r2 task 1) must produce
    bit-identical verdicts to the standalone drift_psi/drift_ks checks —
    same integer marginals through the same float tails."""
    from raqc_spark.checks.drift import compile_drift_pass

    s1, s2, _ = snapshots
    d1 = prepare(s1, default_contract())
    d2 = prepare(s2, default_contract())
    psi_chk = Check("psi_lang", "drift_psi", column="lang",
                    threshold=Threshold("le", 0.2))
    ks_chk = Check("ks_len", "drift_ks", column="content_length",
                   threshold=Threshold("le", 0.15),
                   params=(("num_bins", 64), ("lo", 0.0), ("hi", 14.0),
                           ("log_scale", True)))
    ks_dyn = Check("ks_len_dyn", "drift_ks", column="content_length",
                   threshold=Threshold("le", 0.15),
                   params=(("num_bins", 32), ("log_scale", True)))
    merged = compile_drift_pass(d1, d2, [psi_chk, ks_chk, ks_dyn]).collect()
    standalone = (
        drift_psi(d1, d2, psi_chk)[0].collect()
        + drift_ks(d1, d2, ks_chk)[0].collect()
        + drift_ks(d1, d2, ks_dyn)[0].collect()
    )
    assert sorted(map(tuple, merged)) == sorted(map(tuple, standalone))
