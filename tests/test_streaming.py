"""Structured Streaming smoke (SURVEY.md §2.9): the same check expressions
run under readStream; batch and stream agree on a bounded source."""

from __future__ import annotations

from raqc_spark.streaming import incremental_stats_stream, run_incremental_smoke

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_incremental_stream_matches_batch(spark):
    batch = spark.read.parquet(EVENTS)
    expected = {
        tuple(r)
        for r in incremental_stats_stream(batch).collect()
    }
    got = {
        tuple(r)
        for r in run_incremental_smoke(spark, EVENTS, batch.schema).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stateful_group_monitor_accumulates(spark, tmp_path):
    """applyInPandasWithState custom operator: cumulative per-key state
    across MULTIPLE micro-batches must equal the batch-mode totals."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from raqc_spark.streaming.stateful import stateful_group_monitor

    batch = spark.read.parquet(EVENTS)
    # split source into 2 files; maxFilesPerTrigger=1 forces 2 micro-batches
    src = tmp_path / "src"
    batch.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(src / "a")
    )
    batch.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(src / "b")
    )
    flat = tmp_path / "flat"
    os.makedirs(flat)
    n = 0
    for sub in ("a", "b"):
        for f in os.listdir(src / sub):
            if f.endswith(".parquet"):
                shutil.copy(src / sub / f, flat / f"{sub}_{n}.parquet")
                n += 1

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    out = stateful_group_monitor(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # memory sink in update mode appends every emission; the LAST row per
    # key carries the final cumulative state
    rows = spark.sql(
        "SELECT * FROM stateful_smoke"
    ).collect()
    # totals are cumulative (monotone) — the max emission per key is final
    last = {}
    for r in rows:
        cur = last.get(r["key"], (0, 0))
        last[r["key"]] = max(cur, (r["n_rows_total"], r["n_violations_total"]))
    expected = {
        r["key"]: (r["n"], r["v"])
        for r in batch.groupBy(F.col("event_type").alias("key")).agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("value") > 480.0).alias("v"),
        ).collect()
    }
    assert last == expected
    # multiple batches actually happened (update emissions > distinct keys)
    assert len(rows) > len(expected)
