"""[ext] Temporal joins Spark lacks as primitives: as-of join and bucketed
range join — expressed as compositions of built-in operators (union +
window, explode + equi-join), never a theta/cartesian join.

Reference scope note: the reference has no temporal joins (its events
analysis is [ext], SURVEY §2.14); these are the standard shapes a
training-data/event pipeline needs (attribution, feature lookup at label
time) built scale-first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame, right: DataFrame, by: Sequence[str],
    left_ts: str, right_ts: str, carry: Sequence[str],
) -> DataFrame:
    """Backward as-of join: for each left row, attach the ``carry`` columns
    of the LATEST right row with ``right_ts <= left_ts`` and equal ``by``
    keys (DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` semantics, left
    outer: unmatched left rows keep NULL carries).

    Implementation is union + running ``last(ignorenulls)`` window — one
    hash shuffle on ``by``, sort within partitions, NO range/theta join and
    no per-key state blowup: exactly the plan you want at 100 TB (both
    sides co-partitioned by key, linear scan per key). Ties on the
    timestamp: right rows order before left rows at the same instant, so
    an exactly-simultaneous right row IS visible to the left row; among
    simultaneous right rows the largest ``(ts, last carry)`` in sort order
    wins — callers needing a specific tiebreak add it to ``carry`` sorting
    upstream.

    ``carry`` names must not collide with left's columns.
    """
    by = list(by)
    carry = list(carry)
    clash = set(carry) & set(left.columns)
    if clash:
        raise ValueError(f"carry columns collide with left columns: {sorted(clash)}")

    r = right.select(
        *by,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in carry],
    )
    left_only = [c for c in left.columns if c not in by and c != left_ts]
    l = left.select(  # noqa: E741
        *by,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_only],
    )
    r_aligned = r.select(
        *by, "_t", "_side",
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_only],
        *[F.col(c) for c in carry],
    )
    l_aligned = l.select(
        *by, "_t", "_side",
        *left_only,
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in carry],
    )
    u = l_aligned.unionByName(r_aligned)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carry:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side").withColumnRenamed("_t", left_ts)


def bucketed_range_join(
    points: DataFrame, intervals: DataFrame, point_ts: str,
    start_ts: str, end_ts: str, bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join (``start_ts <= point_ts <= end_ts``)
    WITHOUT a theta join: explode each interval into the time buckets it
    covers, equi-join on (bucket), then apply the exact range residual.

    Shuffle is O(points + intervals × buckets_per_interval) with an
    equi-join the optimizer can hash-partition — versus the
    broadcast-nested-loop a raw inequality join degenerates to. Pick
    ``bucket_seconds`` ≈ median interval length so intervals explode into
    O(1) buckets. Join columns must be disambiguated by the caller
    (distinct names across the two frames)."""
    if how != "inner":
        raise ValueError("bucketed_range_join supports inner joins")
    pb = points.withColumn(
        "_bucket", (F.unix_timestamp(F.col(point_ts)) / bucket_seconds).cast("long")
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_ts)) / bucket_seconds).cast("long"),
                (F.unix_timestamp(F.col(end_ts)) / bucket_seconds).cast("long"),
            )
        ),
    )
    joined = pb.join(ib, "_bucket").filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("_bucket")
