"""Lifecycle tests: run_contract end-to-end, checkpoint/resume (§5.2.6),
and the driver entry smoke."""

from __future__ import annotations

import json
import os

from raqc_spark.contract import default_contract
from raqc_spark.runner import run_contract


def _run(spark, snapshots, run_dir, resume=True):
    s1, s2, commits = snapshots
    return run_contract(
        spark,
        default_contract(),
        s2,
        s1=s1,
        commits_dim=commits,
        run_dir=str(run_dir),
        resume=resume,
    )


def test_run_contract_end_to_end(spark, snapshots, tmp_path):
    res = _run(spark, snapshots, tmp_path / "run1")
    v = res.verdicts
    names = {r["check_name"] for r in v.select("check_name").distinct().collect()}
    c = default_contract()
    assert names == {chk.name for chk in c.checks}
    assert not res.passed  # injected violations must fail some partition
    # violations materialized on disk for predicate/keyed checks
    viol_dir = os.path.join(res.run_dir, "violations")
    assert os.path.isdir(viol_dir) and len(os.listdir(viol_dir)) >= 3


def test_resume_skips_completed_families(spark, snapshots, tmp_path):
    rd = tmp_path / "run2"
    first = _run(spark, snapshots, rd)
    assert first.families_run and not first.families_skipped

    second = _run(spark, snapshots, rd)
    assert not second.families_run
    assert set(second.families_skipped) == set(first.families_run)
    # identical verdicts after resume
    a = {tuple(r) for r in first.verdicts.collect()}
    b = {tuple(r) for r in second.verdicts.collect()}
    assert a == b


def test_resume_after_partial_run(spark, snapshots, tmp_path):
    """Simulate a crash: truncate the manifest to k families, re-run,
    assert only the missing families execute and outputs are identical."""
    rd = tmp_path / "run3"
    full = _run(spark, snapshots, rd)
    manifest_path = os.path.join(str(rd), "manifest.json")
    with open(manifest_path) as f:
        data = json.load(f)
    kept = dict(list(data["families"].items())[:2])
    with open(manifest_path, "w") as f:
        json.dump({"families": kept}, f)

    resumed = _run(spark, snapshots, rd)
    assert set(resumed.families_skipped) == set(kept)
    assert set(resumed.families_run) == set(data["families"]) - set(kept)
    a = {tuple(r) for r in full.verdicts.collect()}
    b = {tuple(r) for r in resumed.verdicts.collect()}
    assert a == b


def test_driver_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "partition_id", "check_name", "pass", "metric_value",
        "threshold", "n_rows", "n_violations",
    }


def test_run_granularity_matches_family_granularity(spark, snapshots, tmp_path):
    """granularity='run' (2 actions) must produce identical verdicts and the
    same per-family manifest as the family-wise path."""
    from raqc_spark.runner import Manifest, run_contract
    from raqc_spark.contract import default_contract

    s1, s2, commits = snapshots
    a = run_contract(spark, default_contract(), s2, s1=s1, commits_dim=commits,
                     run_dir=str(tmp_path / "fam"), resume=False)
    b = run_contract(spark, default_contract(), s2, s1=s1, commits_dim=commits,
                     run_dir=str(tmp_path / "run"), resume=False,
                     granularity="run")
    va = {tuple(r) for r in a.verdicts.collect()}
    vb = {tuple(r) for r in b.verdicts.collect()}
    assert va == vb
    ma = Manifest(str(tmp_path / "fam")).completed()
    mb = Manifest(str(tmp_path / "run")).completed()
    assert set(ma) == set(mb)
    for fam in ma:
        ka = {(r["partition_id"], r["check_name"]) for r in ma[fam]}
        kb = {(r["partition_id"], r["check_name"]) for r in mb[fam]}
        assert ka == kb
    # and a family-wise resume over the run-granularity manifest skips all
    c = run_contract(spark, default_contract(), s2, s1=s1, commits_dim=commits,
                     run_dir=str(tmp_path / "run"), resume=True)
    assert not c.families_run


def test_resume_recomputes_only_missing_partitions(spark, snapshots, tmp_path):
    """north_rule per-partition lineage: a partially-checkpointed family
    resumes at partition granularity. Sentinel metric values planted in the
    manifest must SURVIVE the resume (proof the completed partitions were
    not recomputed) while the missing partitions come back correct."""
    rd = tmp_path / "run_pp"
    full = _run(spark, snapshots, rd)
    full_rows = {
        (r["check_name"], r["partition_id"]): tuple(r)
        for r in full.verdicts.collect()
    }

    mpath = os.path.join(str(rd), "manifest.json")
    with open(mpath) as f:
        data = json.load(f)
    entry = data["families"]["stats"]
    kept = []
    kept_pids = set()
    for r in entry["verdicts"]:
        if r["partition_id"] < 4:
            r = dict(r)
            r["metric_value"] = 123456.0  # sentinel
            kept.append(r)
            kept_pids.add(r["partition_id"])
    entry["verdicts"], entry["complete"] = kept, False
    with open(mpath, "w") as f:
        json.dump(data, f)

    res = _run(spark, snapshots, rd)
    assert res.partitions_resumed == {"stats": sorted(set(range(8)) - kept_pids)}
    assert "stats" in res.families_run
    stats_checks = {
        r["check_name"] for r in full.verdicts.collect()
    } - {"uniqueness", "ref_integrity", "drift_psi_lang", "drift_ks_length",
         "schema", "hist2d_outlier_lang_length"}
    for r in res.verdicts.collect():
        if r["check_name"] not in stats_checks:
            continue
        if r["partition_id"] < 4:
            assert r["metric_value"] == 123456.0  # reused from checkpoint
        else:
            assert tuple(r) == full_rows[(r["check_name"], r["partition_id"])]


def test_partition_batches_equivalent(spark, snapshots, tmp_path):
    """partition_batches=3 must yield identical verdicts/violations to a
    single-shot run, with every family complete in the manifest."""
    from raqc_spark.runner import Manifest

    s1, s2, commits = snapshots
    a = run_contract(spark, default_contract(), s2, s1=s1, commits_dim=commits,
                     run_dir=str(tmp_path / "one"), resume=False)
    b = run_contract(spark, default_contract(), s2, s1=s1, commits_dim=commits,
                     run_dir=str(tmp_path / "bat"), resume=False,
                     partition_batches=3)
    assert {tuple(r) for r in a.verdicts.collect()} == {
        tuple(r) for r in b.verdicts.collect()
    }
    state = Manifest(str(tmp_path / "bat")).state()
    assert all(done for _, done in state.values())
    va = spark.read.parquet(str(tmp_path / "one" / "violations"))
    vb = spark.read.parquet(str(tmp_path / "bat" / "violations"))
    key = ["check_name", "repo", "path", "commit", "content_sha"]
    assert {tuple(r) for r in va.select(*key).collect()} == {
        tuple(r) for r in vb.select(*key).collect()
    }


def test_resume_refuses_changed_contract(spark, snapshots, tmp_path):
    import pytest as _pytest

    from raqc_spark.contract import Check, Contract, Threshold

    rd = str(tmp_path / "run_fp")
    _run(spark, snapshots, rd)
    base = default_contract()
    changed = Contract(
        checks=tuple(
            Check(c.name, c.kind, c.column, Threshold("le", 0.9), c.params)
            if c.name == "null_rate_content" else c
            for c in base.checks
        ),
        partition_spec=base.partition_spec,
    )
    s1, s2, commits = snapshots
    with _pytest.raises(ValueError, match="different contract"):
        run_contract(spark, changed, s2, s1=s1, commits_dim=commits,
                     run_dir=rd, resume=True)


def test_run_mode_resume_preserves_checkpointed_violations(
    spark, snapshots, tmp_path
):
    """Regression (ADVICE r1, medium): resuming a partially-complete run_dir
    with granularity='run' must NOT wipe already-checkpointed families'
    violation parquet."""
    rd = str(tmp_path / "run_mix")
    _run(spark, snapshots, rd)
    uniq_dir = os.path.join(rd, "violations", "family=uniqueness_uniqueness")
    before = spark.read.parquet(uniq_dir).count()
    assert before > 0

    mpath = os.path.join(rd, "manifest.json")
    with open(mpath) as f:
        data = json.load(f)
    del data["families"]["stats"]  # simulate: stats family not checkpointed
    with open(mpath, "w") as f:
        json.dump(data, f)

    s1, s2, commits = snapshots
    res = run_contract(spark, default_contract(), s2, s1=s1,
                       commits_dim=commits, run_dir=rd, resume=True,
                       granularity="run")
    assert res.families_run == ["stats"]
    assert spark.read.parquet(uniq_dir).count() == before


def test_cache_off_verdicts_identical(spark, snapshots, tmp_path):
    """Caching is a local-mode convenience, never a correctness dependency
    (docs/SCALE.md): cache=False must produce bit-identical verdicts."""
    s1, s2, commits = snapshots
    a = run_contract(spark, default_contract(), s2, s1=s1, commits_dim=commits,
                     run_dir=str(tmp_path / "c1"), resume=False, cache=True)
    b = run_contract(spark, default_contract(), s2, s1=s1, commits_dim=commits,
                     run_dir=str(tmp_path / "c0"), resume=False, cache=False)
    assert {tuple(r) for r in a.verdicts.collect()} == {
        tuple(r) for r in b.verdicts.collect()
    }


def test_resume_refuses_rewritten_input_files(spark, snapshots, tmp_path):
    """Same paths, new data: the fingerprint folds file sizes/mtimes, so a
    parquet snapshot rewritten IN PLACE must not silently resume against
    stale checkpointed verdicts (ADVICE r2)."""
    import pytest as _pytest

    s1, s2, commits = snapshots
    p = str(tmp_path / "s2_rw.parquet")
    s2.write.mode("overwrite").parquet(p)
    rd = str(tmp_path / "run_rw")
    df1 = spark.read.parquet(p)
    run_contract(spark, default_contract(), df1, s1=s1, commits_dim=commits,
                 run_dir=rd, resume=True)
    # rewrite in place with different data (drop some rows)
    s2.filter("lang = 'python'").write.mode("overwrite").parquet(p)
    df2 = spark.read.parquet(p)
    with _pytest.raises(ValueError, match="different contract or inputs"):
        run_contract(spark, default_contract(), df2, s1=s1,
                     commits_dim=commits, run_dir=rd, resume=True)


def test_precount_off_forces_sequential_actions(
    spark, snapshots, tmp_path, monkeypatch
):
    """ADVICE r5 env-combination hazard: RAQC_RUN_PRECOUNT=0 with the
    default RAQC_RUN_OVERLAP=1 must NOT overlap write/collect over a cold
    cache (the measured 229s-vs-174s double-compute mode) — overlap is
    gated on the pre-count actually having run, not just on cache=True."""
    import raqc_spark.runner as runner_mod

    s1, s2, commits = snapshots
    seen: list[bool] = []
    real = runner_mod._run_batched

    def spy(work, run_dir, manifest, overlap=True):
        seen.append(overlap)
        return real(work, run_dir, manifest, overlap=overlap)

    monkeypatch.setattr(runner_mod, "_run_batched", spy)

    monkeypatch.setenv("RAQC_RUN_PRECOUNT", "0")
    monkeypatch.setenv("RAQC_RUN_OVERLAP", "1")
    run_contract(spark, default_contract(), s2, s1=s1, commits_dim=commits,
                 run_dir=str(tmp_path / "nopc"), resume=False, cache=True,
                 granularity="run")
    assert seen == [False], "cold cache must run sequential actions"

    monkeypatch.setenv("RAQC_RUN_PRECOUNT", "1")
    run_contract(spark, default_contract(), s2, s1=s1, commits_dim=commits,
                 run_dir=str(tmp_path / "pc"), resume=False, cache=True,
                 granularity="run")
    assert seen == [False, True], "pre-counted cache keeps the overlap win"
