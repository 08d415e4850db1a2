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
