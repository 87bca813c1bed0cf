"""Arbitrary stateful streaming: custom per-key state machines via
``applyInPandasWithState`` (SURVEY.md §2 B11 'arbitrary state').

Example operator: running per-user counters with event-time session
semantics that Spark's built-in session_window can't express (e.g.
carrying a custom accumulator across sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_counters(key, pdf_iter, state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    import pandas as pd

    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]})


def running_user_counters(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained as explicit
    streaming state; emits the updated counters every micro-batch.

    Batch-mode equivalent (the oracle): groupBy(user_id).agg(count, sum).
    """
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value")
        )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_counters,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
