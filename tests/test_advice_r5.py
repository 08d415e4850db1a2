"""Round-5 regression tests for the ADVICE r4 findings.

1. media_bounds with column=None is rejected at Contract.validate()
   (previously reached Spark analysis as the text 'octet_length(None)').
2. _file_stamp never percent-decodes bare filesystem paths — a literal
   '%2b' in a file name is part of the name, not an encoding.
3. _spread_small_input probes via inputFiles() (scan metadata) instead of
   converting the plan to an RDD per signature build.
4. Registry armor: the sweep tail is 4 sentinel duplicates and the two r4
   casualties lead the pipeline block.
"""

from __future__ import annotations

import os

import pytest

from raqc_spark.contract import Check, Contract, Threshold


def test_media_bounds_requires_column():
    c = Contract(checks=(
        Check("m", "media_bounds", column=None,
              threshold=Threshold("le", 0.01),
              params=(("min_bytes", 64),)),
    ))
    with pytest.raises(ValueError, match="requires a column"):
        c.validate()
    # with a column it validates fine
    Contract(checks=(
        Check("m", "media_bounds", column="content",
              threshold=Threshold("le", 0.01),
              params=(("min_bytes", 64),)),
    )).validate()


def test_file_stamp_leaves_bare_percent_paths_untouched(tmp_path):
    """A bare path containing 'a%2b' must be stat'ed verbatim (ADVICE r4):
    unquoting it would look for 'a+' and silently degrade to the path-only
    stamp, losing in-place-rewrite detection."""
    from raqc_spark.runner import _file_stamp

    p = tmp_path / "a%2b.parquet"
    p.write_bytes(b"x" * 77)
    stamp = _file_stamp(str(p))
    st = os.stat(p)
    assert f"#{st.st_size}#" in stamp and stamp.endswith(str(st.st_mtime_ns))
    # file: URIs are still decoded (the ADVICE r3 behavior is preserved)
    q = tmp_path / "has space.parquet"
    q.write_bytes(b"y" * 33)
    uri = "file://" + str(tmp_path).replace(" ", "%20") + "/has%20space.parquet"
    assert f"#{os.stat(q).st_size}#" in _file_stamp(uri)


def test_spread_small_input_no_rdd_probe(spark, code_fixture, monkeypatch):
    """The fast path (file-backed source with >= parallelism files) must
    return the frame untouched WITHOUT touching .rdd; small / in-memory
    sources get the deterministic repartition."""
    import pyspark.sql.dataframe as dfmod

    from raqc_spark.functions.dedup import _spread_small_input

    def boom(self):  # pragma: no cover - failure path
        raise AssertionError("_spread_small_input touched df.rdd")

    monkeypatch.setattr(dfmod.DataFrame, "rdd", property(boom))
    par = spark.sparkContext.defaultParallelism
    # in-memory frame: no input files -> repartitioned, still no .rdd probe
    mem = spark.range(100).selectExpr("cast(id as string) AS text")
    out = _spread_small_input(mem)
    assert "repartition" in out._jdf.queryExecution().logical().toString().lower() \
        or out is not mem
    # file-backed source: identity iff the PACKING estimate (not the bare
    # file count — ADVICE r5: Spark bin-packs small files) verifies >= par
    # scan tasks
    from raqc_spark.functions.dedup import _scan_tasks_at_least

    _, root = code_fixture
    df = spark.read.parquet(f"{root}/code_files_s2.parquet")
    files = df.inputFiles()
    spread = _spread_small_input(df)
    if len(files) >= par and _scan_tasks_at_least(df, files, par):
        assert spread is df
    else:
        assert spread is not df


def test_scan_tasks_estimate_mirrors_spark_packing(spark, tmp_path):
    """ADVICE r5 (medium): bare file count is not partition count. The fix
    re-derives FilePartition.maxSplitBytes from the scan's own inputs.

    Two regimes:
    - local sizes known: with n >= par files, bytesPerCore =
      (total + openCost*n)/par >= openCost, so Spark's formula caps the
      split at bytesPerCore and bin-packing yields ~par bins — the
      estimate agrees and fast-paths (it can only reject on degenerate
      confs it fails to parse);
    - sizes unknown (s3/hdfs paths): only the scheme-independent lower
      bound n*openCost/maxPartitionBytes counts, so a modest file count
      is NOT accepted on faith (the actual ADVICE hazard) while a
      realistic at-scale layout still verifies shuffle-free."""
    import pandas as pd

    from raqc_spark.functions.dedup import (
        _parse_byte_conf,
        _scan_tasks_at_least,
        _spread_small_input,
    )

    # conf parser: plain bytes + suffixed forms
    assert _parse_byte_conf("134217728") == 128 << 20
    assert _parse_byte_conf("128m") == 128 << 20
    assert _parse_byte_conf("128MB") == 128 << 20
    assert _parse_byte_conf("4194304b") == 4 << 20
    assert _parse_byte_conf("1g") == 1 << 30

    par = spark.sparkContext.defaultParallelism
    root = tmp_path / "many_tiny"
    root.mkdir()
    for i in range(2 * par):
        pd.DataFrame({"text": [f"doc {i}"]}).to_parquet(
            root / f"part-{i:03d}.parquet"
        )
    df = spark.read.parquet(str(root))
    files = df.inputFiles()
    assert len(files) >= par
    # local regime: estimate agrees with Spark (bytesPerCore-capped bins)
    assert _scan_tasks_at_least(df, files, par)
    assert _spread_small_input(df) is df
    # unknown scheme: the same file count is NOT accepted on faith
    fake = [f"s3://bucket/f{i}" for i in range(len(files))]
    assert not _scan_tasks_at_least(df, fake, par)
    # ...but an at-scale layout verifies via the lower bound alone
    many = [f"s3://bucket/f{i}" for i in range(64 * par)]
    assert _scan_tasks_at_least(df, many, par)


def test_registry_is_exactly_fifty_real_entries():
    """VERDICT r5 task 1: the driver sweep records EXACTLY 50 rows (hard
    row cap, measured over r3-r5), so the registry must hold <=50 REAL
    entries and zero sentinels — every operator keeps a CORRECTNESS row."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    keys = list(q)
    assert len(keys) == 50
    assert not any(k.startswith("zz_sentinel") for k in keys)
    # no duplicate callables (a sentinel in disguise)
    assert len({id(fn) for fn in q.values()}) == len(keys)
    # every oracle key has a queries() twin
    assert set(o) <= set(q)
    # the r6 consolidation kept the merged surfaces
    assert "text_quality" in q and "text_quality_filter" not in q
    assert "text_token_count" in q and "text_bpe_tokens" not in q
    assert "multimodal_frames_features" in q
    assert "run_contract_verdicts_oracle" in q and (
        "run_contract_verdicts" not in q
    )
    # the two r4 budget-cut casualties still lead the pipeline block
    from raqc_spark.queries_pipeline import PIPELINE_QUERIES

    pk = list(PIPELINE_QUERIES)
    assert pk[0] == "doc_fingerprint" and pk[1] == "dedup_embedding_cosine"
