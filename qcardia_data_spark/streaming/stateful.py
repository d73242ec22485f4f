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
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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


MG_STATE_SCHEMA = StructType([
    StructField("keys", ArrayType(StringType())),
    StructField("counts", ArrayType(LongType())),
])

MG_OUTPUT_SCHEMA = StructType([
    StructField("salt", LongType()),
    StructField("value", StringType()),
    StructField("n", LongType()),
])


def streaming_heavy_hitters(
    events: DataFrame, value_col: str, m: int = 64, n_salts: int = 8,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters: per-group frequency summaries
    maintained in explicit state, the streaming twin of
    :func:`qcardia_data_spark.functions.sketches.heavy_hitters`'s first
    pass.

    Values are salted by ``xxhash64(value) % n_salts`` so (a) state
    updates parallelize across ``n_salts`` tasks and (b) every distinct
    value lives in exactly ONE group — group summaries union into the
    global summary with no cross-group collisions. Each group keeps at
    most ``m`` counters (classic MG eviction: subtract the minimum count
    and drop zeros when over budget), so total state is bounded at
    ``n_salts × m`` counters no matter how many distinct values stream
    by. Guarantees per emitted (value, n): ``n ≤ true_count`` and, for
    the FINAL summary, ``n ≥ true_count − dropped_total/m`` of its group
    — with ``m ≥`` the group's distinct-value count the counts are EXACT
    (no eviction ever fires). Emits the group's current summary every
    update (counts are monotone while no eviction fires)."""
    try:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("applyInPandasWithState unavailable") from e

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        counters: dict[str, int] = {}
        if state.exists:
            ks, cs = state.get
            counters = dict(zip(ks, cs))
        for pdf in pdfs:
            for v, c in pdf["_v"].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            while len(counters) > m:  # MG eviction: min-decrement, drop 0s
                dmin = min(counters.values())
                counters = {
                    v: c - dmin for v, c in counters.items() if c - dmin > 0
                }
        state.update((list(counters.keys()), [int(c) for c in counters.values()]))
        yield pd.DataFrame(
            {
                "salt": [key[0]] * len(counters),
                "value": list(counters.keys()),
                "n": [int(c) for c in counters.values()],
            }
        )

    from qcardia_data_spark.streaming.events import _watermarked

    salted = (
        _watermarked(events, "ts", watermark)
        .select(
            F.col("ts"),
            F.col(value_col).cast("string").alias("_v"),
            (F.pmod(F.xxhash64(F.col(value_col).cast("string")), F.lit(n_salts))).alias("_salt"),
        )
    )
    return salted.groupBy("_salt").applyInPandasWithState(
        update,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
