"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: broadcast the (small) query set against the
  corpus; dot products via zip_with + aggregate (JVM higher-order fns —
  deterministic left-to-right fold in double precision, no UDF).
- LSH-bucketed variant (scale path): sign-random-projection buckets from
  deterministic pseudo-random hyperplanes; candidates only join within a
  bucket, so cost tracks bucket occupancy instead of n².

Ranking uses (rounded cosine DESC, id ASC) so the selected top-k SET is
stable across engines/parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    ``queries`` (small) is broadcast; corpus never shuffles until the final
    per-query window over k·|queries| candidate rows.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_norm", _norm(F.col("q_vec")))
    c = emb.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("c_norm", _norm(F.col("c_vec")))

    scored = (
        c.join(F.broadcast(q), F.col("c_id") != F.col("q_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
        .select("q_id", "c_id", "cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cosine", "rk")
    )


def _plane_component(plane: Column, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1):
    xxhash64(plane, dim) scaled — reproducible on any engine, no RNG state."""
    return (F.xxhash64(plane, dim).cast("double") / F.lit(float(2**63))).cast(
        "double"
    )


def lsh_bucket(
    emb: DataFrame,
    num_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection bucket id per vector (one long).

    Explodes (vector × plane) rows, computes sign(dot(v, plane)) via a
    hash-derived plane, packs the sign bits. All built-in exprs; the
    groupBy is partial-agg'd so shuffle is O(rows × planes) small structs.
    """
    vp = emb.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).crossJoin(
        F.broadcast(
            emb.sparkSession.range(num_planes).select(
                F.col("id").cast("int").alias("plane")
            )
        )
    )
    contrib = vp.select(
        "doc",
        "plane",
        (F.col("x").cast("double") * _plane_component(F.col("plane"), F.col("dim"))).alias(
            "c"
        ),
    )
    signs = contrib.groupBy("doc", "plane").agg(
        (F.sum("c") > 0).cast("long").alias("bit")
    )
    return signs.groupBy("doc").agg(
        F.sum(F.expr("shiftleft(bit, plane)")).alias("bucket")
    )


def lsh_cosine_topk(
    emb: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking within LSH buckets only."""
    buckets = lsh_bucket(emb, num_planes, id_col, vec_col)
    e = emb.select(
        F.col(id_col).alias("doc"), F.col(vec_col).alias("vec")
    ).join(buckets, "doc")
    a = e.select(
        F.col("doc").alias("q_id"), F.col("vec").alias("q_vec"), "bucket"
    )
    b = e.select(
        F.col("doc").alias("c_id"), F.col("vec").alias("c_vec"), "bucket"
    )
    scored = (
        a.join(b, "bucket")
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cosine", "rk")
    )
