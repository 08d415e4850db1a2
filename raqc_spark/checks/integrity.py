"""Referential-integrity check commit -> repo (SURVEY.md §2.3 J2).

A fact row violates when its (repo, commit) is absent from the commits dim.
The dim is tiny relative to the fact table (one row per commit vs one per
file), so it is **broadcast** — the fact side never shuffles. Violations are
the anti-join; the verdict aggregation rides the same broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raqc_spark.checks.blocks import verdicts_from_partition_agg
from raqc_spark.contract import Check
from raqc_spark.results import VIOLATION_COLS


def ref_integrity_check(
    df: DataFrame, dim: DataFrame, check: Check
) -> tuple[DataFrame, DataFrame]:
    keys = list(check.p.get("keys", ("repo", "commit")))
    dim_keys = F.broadcast(dim.select(*keys).dropDuplicates(keys))

    violations = df.join(dim_keys, keys, "left_anti").selectExpr(
        "CAST(partition_id AS int) AS partition_id",
        f"'{check.name}' AS check_name",
        "repo",
        "path",
        "commit",
        f"format_string('orphan %s not in dim', concat_ws(':',"
        f" {', '.join(keys)})) AS violation_detail",
        "content_sha",
    ).select(*VIOLATION_COLS)

    marked = dim_keys.withColumn("_hit", F.lit(1))
    agg = (
        df.join(marked, keys, "left")
        .groupBy("partition_id")
        .agg(
            F.expr("count(1) AS n_rows"),
            F.expr("count_if(_hit IS NULL) AS n_viol"),
        )
    )
    verdicts = verdicts_from_partition_agg(
        agg, check, "n_viol / n_rows", "n_viol"
    )
    return verdicts, violations
