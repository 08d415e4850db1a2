from raqc_spark.streaming.incremental import (
    incremental_stats_stream,
    run_incremental_smoke,
)

__all__ = ["incremental_stats_stream", "run_incremental_smoke"]
