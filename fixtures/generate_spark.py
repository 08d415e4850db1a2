"""Spark-native code-table fixture generator (bench/scaling scale path).

The pandas generator (fixtures/generate.py) derives exact golden violation
sets for correctness tests but is single-core and superlinear — 19.2M files
ran >80 minutes. Benchmarks don't need goldens, only the same SHAPE:
(repo, path, commit, lang, content) with the mega-repo skew, lognormal-ish
content lengths, and the V-class violations (nulls / empties / dup keys /
orphan commits / 1M-char outliers) at the same rates. This generator builds
all of it from pure Column expressions over ``spark.range`` — minutes at any
size, parallel, and written as multi-file parquet (which is also the
realistic input layout: real tables are many files).

Determinism: every attribute derives from xxhash64(id, seed); content is a
repeated 16-char block truncated to the drawn length (same structure the
pandas generator uses, so scan/sha/compression cost profiles match).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOCK = "abcdefghij klmno "  # 17 chars, mixed with spaces like the pandas one


def _u(seed_tag: int) -> F.Column:
    """Deterministic uniform [0,1) per row from the id column."""
    return (
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed_tag)), F.lit(1_000_000))
        / 1_000_000.0
    )


def synth_code_files(
    spark: SparkSession, n_files: int, n_repos: int = 64, seed: int = 42
) -> DataFrame:
    """One snapshot of code_files(repo, path, commit, lang, content)."""
    df = spark.range(n_files)
    u_repo = _u(seed + 1)
    # mega-repo holds 50% of rows; the rest spread uniformly (skew preserved)
    repo_idx = F.when(u_repo < 0.5, F.lit(0)).otherwise(
        1 + F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(n_repos - 1))
    )
    repo = F.format_string("repo_%04d", repo_idx.cast("int"))
    ext_idx = F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(5)).cast("int")
    lang = F.element_at(
        F.array(*[F.lit(x) for x in
                  ("python", "markdown", "rust", "typescript", "c")]),
        ext_idx + 1,
    )
    ext = F.element_at(
        F.array(*[F.lit(x) for x in ("py", "md", "rs", "ts", "c")]),
        ext_idx + 1,
    )
    path = F.format_string(
        "dir%d/file%08d.%s",
        F.pmod(F.xxhash64("id", F.lit(seed + 4)), F.lit(10)).cast("int"),
        F.col("id").cast("int"),
        ext,
    )
    # commit: 1-5 per (repo, snapshot); 8-hex derived from (repo, bucket)
    n_commits = 1 + F.pmod(F.xxhash64(repo, F.lit(seed + 5)), F.lit(5))
    bucket = F.pmod(F.xxhash64("id", F.lit(seed + 6)), n_commits)
    commit = F.substring(
        F.sha2(F.concat_ws(":", repo, bucket.cast("string")), 256), 1, 8
    )
    # lognormal-ish length via Box-Muller over two hash uniforms
    u1 = F.greatest(_u(seed + 7), F.lit(1e-9))
    u2 = _u(seed + 8)
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * 3.141592653589793 * u2)
    length = F.least(
        F.greatest(F.exp(F.lit(6.0) + z), F.lit(1.0)), F.lit(100_000.0)
    ).cast("int")
    u_kind = _u(seed + 9)
    # V-class rates: 1% NULL content, 0.5% empty, 500-row cap of 1M outliers
    outlier_rate = min(0.005, 500.0 / max(n_files, 1))
    length = (
        F.when(u_kind < outlier_rate, F.lit(1_000_001))
        .when(u_kind < outlier_rate + 0.005, F.lit(0))
        .otherwise(length)
    )
    # branch order: 1M-char outliers, then empties, then NULLs, then normal
    # lognormal bodies (CASE branches evaluate lazily — the repeat() body
    # only runs for the normal branch)
    content = (
        F.when(u_kind < outlier_rate,
               F.substring(F.repeat(F.lit("x" * 16), 62_501), 1, 1_000_001))
        .when(u_kind < outlier_rate + 0.005, F.lit(""))
        .when(u_kind < outlier_rate + 0.005 + 0.01, F.lit(None).cast("string"))
        .otherwise(
            F.substring(
                F.repeat(F.lit(BLOCK), (length / len(BLOCK) + 1).cast("int")),
                1,
                length,
            )
        )
    )
    # 0.5% orphan commits (absent from the dim), 0.5% NULL lang
    commit = F.when(_u(seed + 10) < 0.005, F.lit("deadbeef")).otherwise(commit)
    lang = F.when(_u(seed + 11) < 0.005, F.lit(None).cast("string")).otherwise(
        lang
    )
    base = df.select(
        repo.alias("repo"), path.alias("path"), commit.alias("commit"),
        lang.alias("lang"), content.alias("content"),
    )
    # 0.6% duplicate keys: re-emit a deterministic sample verbatim
    dups = base.filter(_u(seed + 12) < 0.006)
    return base.unionByName(dups)


def commits_dim(spark: SparkSession, n_repos: int = 64, seed: int = 42) -> DataFrame:
    """Every legal (repo, commit) pair + a snapshot timestamp."""
    repos = spark.range(n_repos).select(
        F.format_string("repo_%04d", F.col("id").cast("int")).alias("repo")
    )
    buckets = spark.range(5).select(F.col("id").alias("bucket"))
    pairs = repos.crossJoin(buckets)
    n_commits = 1 + F.pmod(F.xxhash64("repo", F.lit(seed + 5)), F.lit(5))
    pairs = pairs.filter(F.col("bucket") < n_commits)
    return pairs.select(
        "repo",
        F.substring(
            F.sha2(F.concat_ws(":", "repo", F.col("bucket").cast("string")), 256),
            1, 8,
        ).alias("commit"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("snapshot_ts"),
    )


def write_spark_fixture(
    spark: SparkSession, root: str, n_files: int, n_repos: int = 64,
    seed: int = 42, files_out: int = 64,
) -> None:
    os.makedirs(root, exist_ok=True)
    s2 = synth_code_files(spark, n_files, n_repos, seed)
    # s1: deterministic ~90% subset of s2 (unchanged rows) — enough for the
    # drift/alignment paths to do full work
    s1 = s2.filter(F.pmod(F.xxhash64("path", F.lit(seed + 13)), F.lit(10)) < 9)
    s1.repartition(files_out).write.mode("overwrite").parquet(
        os.path.join(root, "code_files_s1.parquet")
    )
    s2.repartition(files_out).write.mode("overwrite").parquet(
        os.path.join(root, "code_files_s2.parquet")
    )
    commits_dim(spark, n_repos, seed).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "commits.parquet"))
