"""Uniqueness check on (repo, path, commit) — SURVEY.md §2.4 A5 / §2.3 J3.

Two-phase: (1) hash-agg ``groupBy(keys).count()`` (partial+final, map-side
combined — safe under key skew because each group's partial collapses to one
row per map task); (2) **left-semi join back** to materialize full violation
rows. The semi-join's build side is only the duplicated keys — at healthy
data that's near-empty, so AQE turns it into a broadcast join at runtime.

Exemplar determinism: within a duplicate group, rows are ranked by
``row_number`` ordered by content_sha (SURVEY.md §2.5 dedup_exemplar) so
golden violation sets are stable under any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raqc_spark.checks.blocks import verdicts_from_partition_agg
from raqc_spark.contract import Check
from raqc_spark.results import VIOLATION_COLS


def uniqueness_check(
    df: DataFrame, check: Check
) -> tuple[DataFrame, DataFrame]:
    keys = list(check.p.get("keys", ("repo", "path", "commit")))

    dup_keys = df.groupBy(*keys).count().filter(F.col("count") > 1)

    dup_rows = df.join(dup_keys.select(*keys), keys, "left_semi")
    w = Window.partitionBy(*keys).orderBy(F.col("content_sha"), F.col("lang"))
    violations = (
        dup_rows.withColumn("dup_rank", F.row_number().over(w))
        .select(
            F.col("partition_id").cast("int").alias("partition_id"),
            F.lit(check.name).alias("check_name"),
            "repo",
            "path",
            "commit",
            F.format_string("duplicate key rank=%d", F.col("dup_rank")).alias(
                "violation_detail"
            ),
            "content_sha",
        )
        .select(*VIOLATION_COLS)
    )

    # per-partition verdict: duplicate-row rate (exact integer counts)
    agg = (
        df.join(dup_keys.select(*keys).withColumn("_dup", F.lit(1)), keys, "left")
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("_dup").isNotNull()).alias("n_viol"),
        )
    )
    verdicts = verdicts_from_partition_agg(
        agg, check, F.col("n_viol") / F.col("n_rows"), F.col("n_viol")
    )
    return verdicts, violations
