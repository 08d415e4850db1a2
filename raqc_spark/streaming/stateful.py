"""Custom stateful streaming operator (SURVEY.md §2.9; round brief:
"applyInPandasWithState for custom stateful operators").

``stateful_group_monitor`` maintains a per-key running validation state —
cumulative row count and bounds-violation count — across micro-batches via
``applyInPandasWithState``. This is the streaming twin of the batch
per-partition verdict: state is O(keys), each micro-batch updates it with
Arrow-batched pandas (vectorized — no per-row Python, BASELINE.json:15),
and every trigger emits the updated cumulative verdict per key seen in that
batch.

Scale notes: state lives in the executor state store keyed by the groupBy
key, so it shards with the shuffle partitioning like any streaming agg;
the pandas function only ever sees one key's batch slice.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("n_rows_total", T.LongType(), False),
        T.StructField("n_violations_total", T.LongType(), False),
        T.StructField("violation_rate", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_viol", T.LongType(), False),
    ]
)


def _monitor_fn(bound_hi: float, value_col: str):
    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"], state: Any):
        n_rows, n_viol = state.get if state.exists else (0, 0)
        for pdf in pdfs:  # vectorized per Arrow batch
            n_rows += len(pdf)
            n_viol += int((pdf[value_col] > bound_hi).sum())
        state.update((n_rows, n_viol))
        import pandas as pd

        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_rows_total": [n_rows],
                "n_violations_total": [n_viol],
                "violation_rate": [round(n_viol / n_rows, 9) if n_rows else 0.0],
            }
        )

    return fn


def stateful_group_monitor(
    stream: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    bound_hi: float = 480.0,
) -> DataFrame:
    """Running per-key (rows, bounds-violations) across micro-batches.

    Each trigger emits one row per key present in the batch carrying the
    CUMULATIVE totals — exactly the resumable per-partition lineage the
    batch manifest records, maintained by the state store instead.
    """
    src = stream.select(F.col(key_col).cast("string").alias("key"), value_col)
    return src.groupBy("key").applyInPandasWithState(
        _monitor_fn(bound_hi, value_col),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
