"""Incremental validation via Structured Streaming (SURVEY.md §2.9).

RAQC and the v1 north rule are batch (two snapshots); this module is the
forward-compatible increment: validate *appended* files as they arrive.
Checks stay pure DataFrame->DataFrame functions, so the same expressions
run under ``readStream``:

- watermark on the ingest timestamp bounds state for late data;
- tumbling-window groupBy gives per-window violation counts (the streaming
  twin of per-partition verdicts);
- sinks are append-mode; in production this feeds the same verdict store
  keyed (window, check) instead of (snapshot, partition).

The smoke path drives a bounded parquet-backed stream to completion with a
memory sink (synchronous processAllAvailable) — no external broker needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def incremental_stats_stream(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 day",
    watermark: str = "1 hour",
    bound_hi: float = 480.0,
) -> DataFrame:
    """Windowed incremental stats + bounds-violation counts over a stream.

    Works identically on a batch DataFrame (for tests/goldens) and a
    streaming one — the expression tree is the same; only the source and
    sink differ.
    """
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC so the
    # cast is value-preserving
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col(value_col) > bound_hi).alias("n_violations"),
            F.round(F.avg(value_col), 4).alias("mean_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_rows",
            "n_violations",
            "mean_value",
        )
    )


def run_incremental_smoke(
    spark: SparkSession, parquet_path: str, schema
) -> DataFrame:
    """Drive the stream over a bounded parquet dir to completion and return
    the materialized result (memory sink, synchronous). A single-file input
    is symlinked into a temp dir (the file stream source requires a
    directory basePath)."""
    import os
    import tempfile

    if os.path.isfile(parquet_path):
        d = tempfile.mkdtemp(prefix="raqc_stream_src_")
        os.symlink(parquet_path, os.path.join(d, os.path.basename(parquet_path)))
        parquet_path = d
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("path", parquet_path)
        .load()
    )
    agg = incremental_stats_stream(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("raqc_incremental_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM raqc_incremental_smoke")
