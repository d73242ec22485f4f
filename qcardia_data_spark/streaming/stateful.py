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


def running_user_totals(
    events: DataFrame, watermark: str = "2 hours", evict: bool = True,
) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in explicit state.

    With ``evict=True`` (default) the state uses an event-time timeout: a
    user whose state has seen no events for one watermark horizon past its
    last event is finalized and REMOVED — state size stays proportional to
    *active* users, not all users ever. ``evict=False`` keeps state forever
    (NoTimeout), for short bounded backfills.
    """
    try:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("applyInPandasWithState unavailable") from e

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        if evict and state.hasTimedOut:
            # horizon passed with no new events: emit the final row, drop
            # the state (bounded memory — the point of the timeout)
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )
            return

        n, total = state.get if state.exists else (0, 0.0)
        last_ts_ms = 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if evict and len(pdf):
                last_ts_ms = max(last_ts_ms, int(pdf["ts"].max().timestamp() * 1000))
        state.update((n, total))
        if evict and last_ts_ms:
            state.setTimeoutTimestamp(last_ts_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    from qcardia_data_spark.streaming.events import _watermarked

    return (
        _watermarked(events, "ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout if evict else GroupStateTimeout.NoTimeout
            ),
        )
    )
