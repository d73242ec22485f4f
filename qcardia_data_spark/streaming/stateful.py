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

    Requires a UTC session time zone (enforced): the timeout timestamp is
    derived from pandas-naive event times, which only align with the
    engine's true-epoch watermark under UTC.
    """
    try:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("applyInPandasWithState unavailable") from e
    if evict:
        from qcardia_data_spark.streaming.events import _require_utc_session_tz

        _require_utc_session_tz(events.sparkSession, "running_user_totals")

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


TREND_STATE_SCHEMA = StructType([
    StructField("x0", LongType()),
    StructField("n", LongType()),
    StructField("sx", LongType()),
    StructField("sy", LongType()),
    StructField("sxy", LongType()),
    StructField("sx2", LongType()),
    StructField("sy2", LongType()),
])

TREND_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("slope_cph_e6", LongType()),
    StructField("intercept_c_e2", LongType()),
    StructField("r2_e6", LongType()),
])


def streaming_trend_stats(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming least-squares trend per user — the live twin of
    ``operators/timeseries.py::trend_stats``, maintained as EXACT integer
    sufficient statistics in state: (x0, n, Σx, Σy_c, Σxy_c, Σx², Σy_c²)
    with x = epoch_s − x0 and y_c = cents.

    The statistics are mergeable under ORIGIN SHIFT: when a batch brings
    an event earlier than the current origin (out-of-order arrival inside
    the watermark horizon), the shift theorem re-bases the sums exactly —
    x0' = x0 − δ gives Σx += n·δ, Σxy += δ·Σy, Σx² += 2δ·Σx_old + n·δ²,
    all integer arithmetic — so the final state is IDENTICAL to a batch
    pass whatever the arrival order (test-asserted: availableNow over
    chronologically shuffled files equals the batch operator row-for-row,
    exact ints). Emits the current fit per update; keys with zero
    x-variance emit nothing yet, like the batch twin's den>0 gate.

    State is 7 int64s per user with NO timeout — O(every key ever seen),
    not O(active keys): a running trend cannot evict its sufficient
    statistics without forgetting the fit (r10 review — the honest
    contract). For populations too large to hold 7 int64s per lifetime
    key, finalize-and-evict semantics belong to
    :func:`running_user_totals`'s timeout pattern instead. The fit itself
    is time-zone-safe (x values are relative to the per-key origin), so
    no UTC requirement here.
    """
    try:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("applyInPandasWithState unavailable") from e

    def update(key, pdfs, state: "GroupState"):
        import math

        import numpy as np
        import pandas as pd

        if state.exists:
            x0, n, sx, sy, sxy, sx2, sy2 = (int(v) for v in state.get)
        else:
            x0, n, sx, sy, sxy, sx2, sy2 = 0, 0, 0, 0, 0, 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            s = (pdf["ts"].astype("int64") // 10**9).to_numpy()
            yc = np.floor(
                pdf["value"].to_numpy(dtype="float64") * 100 + 0.5
            ).astype("int64")
            b0 = int(s.min())
            if n == 0:
                x0 = b0
            elif b0 < x0:  # shift theorem: re-base to the earlier origin
                d = x0 - b0
                sx2 += 2 * d * sx + n * d * d
                sxy += d * sy
                sx += n * d
                x0 = b0
            x = s - x0
            n += len(pdf)
            # Python-int accumulation: numpy int64 products ((x*x).sum())
            # silently WRAP past 2^63 (x ≈ 6.3e7 s for a 2-year span →
            # x² ≈ 4e15; ~2300 such rows overflow a batch sum) and would
            # corrupt the exact statistics with no error (r11 review).
            # Arbitrary-precision ints keep the sums exact; if a sum ever
            # exceeds the int64 STATE schema, state.update raises loudly
            # instead of wrapping.
            xs = x.tolist()
            ys = yc.tolist()
            sx += sum(xs)
            sy += sum(ys)
            sxy += sum(a * b for a, b in zip(xs, ys))
            sx2 += sum(a * a for a in xs)
            sy2 += sum(b * b for b in ys)
        state.update((x0, n, sx, sy, sxy, sx2, sy2))
        num = n * sxy - sx * sy
        den = n * sx2 - sx * sx
        deny = n * sy2 - sy * sy
        if den <= 0:
            return
        slope = float(num) / float(den)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        r2 = (
            int(math.floor((float(num) * float(num))
                           / (float(den) * float(deny)) * 1000000 + 0.5))
            if deny > 0 else None
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "slope_cph_e6": [int(math.floor(slope * 3600 * 1000000 + 0.5))],
                "intercept_c_e2": [int(math.floor(intercept * 100 + 0.5))],
                "r2_e6": [r2],
            }
        )

    from qcardia_data_spark.streaming.events import _watermarked

    return (
        _watermarked(events, "ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=TREND_OUTPUT_SCHEMA,
            stateStructType=TREND_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


GAPFILL_STATE_SCHEMA = StructType([
    StructField("started", LongType()),
    StructField("next_b", LongType()),
    StructField("last_v", DoubleType()),
    StructField("max_s", LongType()),
    StructField("buf_s", ArrayType(LongType())),
    StructField("buf_tb", ArrayType(LongType())),
    StructField("buf_v", ArrayType(DoubleType())),
])

GAPFILL_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("bucket_hour", LongType()),
    StructField("value", DoubleType()),
])


def streaming_gapfill_locf(
    events: DataFrame, watermark: str = "2 hours", bucket_s: int = 3600
) -> DataFrame:
    """Streaming LOCF gap-fill — the CONTINUOUS-AGGREGATE twin of the
    graded ``ev_gapfill_locf`` query: as the watermark advances, every
    (user, bucket) between the user's first event and their latest seen
    event is emitted exactly once with the value current at the bucket's
    close, including empty buckets.

    Finalization rule: a bucket emits only when ``close(b) < watermark``
    — at that point no non-late event can change what was current at the
    close, so each emission is immutable (append-mode semantics). Events
    newer than the watermark wait in a per-user buffer; consumed events
    are dropped immediately, so state is (a few scalars) + O(events
    inside the watermark horizon) per user — the same horizon bound every
    watermarked aggregation carries, NOT the corpus.

    Out-of-order safety: an event can only insert below an already-
    emitted close if it is late beyond the watermark, and the upstream
    watermark filter drops exactly those — so the emitted prefix equals
    the batch query on the same finalized horizon row-for-row
    (test-asserted, including the per-user first-bucket bootstrap under
    reordered files).

    Requires a UTC session time zone (enforced): bucket labels and the
    finalization cut compare pandas-naive event epochs against the
    engine's true-epoch watermark. Per-user scalars persist for the
    stream's lifetime — the LOCF value must survive quiet periods to
    fill their buckets; only the event buffer is horizon-bounded. Quiet
    keys with pending buckets carry an EventTimeTimeout armed at the
    next pending close, so the watermark advancing finalizes them
    WITHOUT new input for the key (r11: NoTimeout silently withheld a
    quiet user's tail buckets until their next event)."""
    try:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("applyInPandasWithState unavailable") from e
    from qcardia_data_spark.streaming.events import _require_utc_session_tz

    _require_utc_session_tz(events.sparkSession, "streaming_gapfill_locf")

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        if state.exists:
            started, next_b, last_v, max_s, buf_s, buf_tb, buf_v = state.get
            buf = list(zip(buf_s, buf_tb, buf_v))
            started = bool(started)
        else:
            started, next_b, last_v, max_s, buf = False, 0, None, -1, []
        for pdf in pdfs:
            if not len(pdf):
                continue
            s = (pdf["ts"].astype("int64") // 10**9).tolist()
            tb = pdf["event_id"].tolist()
            v = pdf["value"].tolist()
            buf.extend(zip((int(x) for x in s), (int(x) for x in tb),
                           (float(x) for x in v)))
            max_s = max(max_s, max(int(x) for x in s))
        wm_s = state.getCurrentWatermarkMs() // 1000
        if not started and buf:
            # provisional origin: the earliest event seen so far (safe —
            # a yet-earlier arrival before first emission just re-lowers
            # it; after first emission such an arrival would be late and
            # the upstream watermark filter has already dropped it)
            next_b = min(e[0] for e in buf) // bucket_s
        out_b, out_v = [], []
        if started or buf:
            buf.sort()
            # highest finalized bucket: close(b) < wm AND b within the
            # observed span (the batch twin's h1 = floor(max_s/bucket))
            b_hi = min((wm_s - bucket_s) // bucket_s, max_s // bucket_s)
            i = 0
            for b in range(next_b, b_hi + 1):
                close = b * bucket_s + (bucket_s - 1)
                while i < len(buf) and buf[i][0] <= close:
                    last_v = buf[i][2]
                    i += 1
                out_b.append(b)
                out_v.append(last_v)
            if out_b:
                started = True
                next_b = b_hi + 1
            buf = buf[i:]
        state.update((
            1 if started else 0, int(next_b),
            last_v if last_v is not None else float("nan"),
            int(max_s),
            [x[0] for x in buf], [x[1] for x in buf], [x[2] for x in buf],
        ))
        # QUIET-KEY FLUSH (r11 review): with NoTimeout, update() only ran
        # when a key received NEW rows, so a user whose span was not yet
        # finalized and who then went quiet never emitted their remaining
        # buckets even as the watermark advanced — contradicting the
        # "every (user, bucket) ... emitted exactly once" contract. With
        # EventTimeTimeout, whenever buckets remain pending we arm a
        # timeout at the next pending bucket's close; the watermark
        # passing it re-invokes update (empty input) and the same
        # finalization loop emits them.
        if (started or buf) and next_b <= max_s // bucket_s:
            ts_ms = max(
                (next_b * bucket_s + bucket_s) * 1000, (wm_s + 1) * 1000
            )
            state.setTimeoutTimestamp(ts_ms)
        if out_b:
            yield pd.DataFrame(
                {"user_id": [key[0]] * len(out_b), "bucket_hour": out_b,
                 "value": out_v}
            )

    from qcardia_data_spark.streaming.events import _watermarked

    return (
        _watermarked(events, "ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=GAPFILL_OUTPUT_SCHEMA,
            stateStructType=GAPFILL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
