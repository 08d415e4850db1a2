from raqc_spark.streaming.incremental import (
    incremental_stats_stream,
    run_incremental_smoke,
)
from raqc_spark.streaming.stateful import stateful_group_monitor

__all__ = [
    "incremental_stats_stream",
    "run_incremental_smoke",
    "stateful_group_monitor",
]
