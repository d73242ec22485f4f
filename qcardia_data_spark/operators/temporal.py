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
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of join: for each left row, attach the ``carry`` columns of the
    matching right row with equal ``by`` keys — the LATEST right row with
    ``right_ts <= left_ts`` (``direction="backward"``, DuckDB ``ASOF JOIN``
    / pandas ``merge_asof`` default) or the EARLIEST right row with
    ``right_ts >= left_ts`` (``direction="forward"``). Left outer:
    unmatched left rows keep NULL carries.

    Implementation is union + running ``last``/``first`` (ignorenulls)
    window — one hash shuffle on ``by``, sort within partitions, NO
    range/theta join and no per-key state blowup: exactly the plan you want
    at 100 TB (both sides co-partitioned by key, linear scan per key).

    All carry columns travel as ONE struct, so a match is row-atomic: the
    carries always come from the same right row, and a matched right row
    whose carry value is legitimately NULL yields NULL (it does not inherit
    an older row's value) — the pandas/DuckDB semantics. Ties: an
    exactly-simultaneous right row IS visible to the left row; among
    simultaneous right rows, when every carry type is orderable the one
    with the greatest (backward) / least (forward) carry-struct sort order
    wins deterministically; with an unorderable carry (map) the struct is
    dropped from the ordering and the pick among exact (ts) ties is
    engine-defined, as in round 1.

    ``carry`` names must not collide with left's columns.

    ``tolerance`` (pandas ``merge_asof`` parity): a match further than
    this from the left timestamp (same units as the ts columns) is
    treated as no match — carries go NULL. Implemented by riding the
    matched right timestamp inside the fill struct (appended LAST, so
    the deterministic tie-break among simultaneous right rows is
    unchanged) and nulling the carry after the fill; the plan stays one
    exchange + one window pass. ``tolerance=None`` leaves the historical
    plan byte-identical.
    """
    if direction == "nearest":
        # pandas merge_asof parity: the closer of the backward and
        # forward matches, backward winning exact-distance ties. BOTH
        # fills ride ONE union/exchange (two sorts, zero joins) — the
        # earlier composed-join form re-joined the directional results on
        # list(left.columns), which silently dropped left rows containing
        # any NULL (null-unsafe equality) and multiplied duplicate left
        # rows combinatorially (ADVICE r8, high). Each row now decides
        # its own winner in place, so NULLs and duplicates are inert.
        return _asof_nearest(
            left, right, list(by), left_ts, right_ts, list(carry), tolerance
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    by = list(by)
    carry = list(carry)
    clash = set(carry) & set(left.columns)
    if clash:
        raise ValueError(f"carry columns collide with left columns: {sorted(clash)}")

    # internal working names must never shadow a user column (a left
    # column literally named "_t"/"_side"/"_carry", or a carry column
    # named "_rts", silently corrupted the pick — ADVICE r9)
    from qcardia_data_spark.operators.joins import fresh_name

    taken = list(left.columns) + list(right.columns)
    t_c = fresh_name("_t", taken)
    side_c = fresh_name("_side", taken)
    carry_c = fresh_name("_carry", taken)
    rts_f = fresh_name("_rts", carry)

    # backward: right rows sort BEFORE left at the same instant (visible to
    # the preceding-frame fill); forward: right rows sort AFTER left
    side_left, side_right = (1, 0) if direction == "backward" else (0, 1)
    rtypes = dict(right.dtypes)
    _fields = list(carry) + ([rts_f] if tolerance is not None else [])
    _ftypes = {**rtypes, rts_f: rtypes[right_ts]}
    carry_ddl = "struct<" + ",".join(
        f"`{c}`:{_ftypes[c]}" for c in _fields
    ) + ">"

    left_only = [c for c in left.columns if c not in by and c != left_ts]
    l_aligned = left.select(
        *by,
        F.col(left_ts).alias(t_c),
        F.lit(side_left).alias(side_c),
        *left_only,
        F.lit(None).cast(carry_ddl).alias(carry_c),
    )
    r_aligned = right.select(
        *by,
        F.col(right_ts).alias(t_c),
        F.lit(side_right).alias(side_c),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_only],
        F.struct(
            *[F.col(c) for c in carry],
            *([F.col(right_ts).alias(rts_f)] if tolerance is not None else []),
        ).alias(carry_c),
    )
    u = l_aligned.unionByName(r_aligned)

    # the carry struct joins the ordering only when orderable (maps are
    # not) — it exists purely as a deterministic tie-break among
    # simultaneous right rows
    orderable = not any("map<" in rtypes[c] for c in carry)
    order_cols = [F.col(t_c), F.col(side_c)] + (
        [F.col(carry_c)] if orderable else []
    )
    base = Window.partitionBy(*by).orderBy(*order_cols)
    if direction == "backward":
        filled = F.last(carry_c, ignorenulls=True).over(
            base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        filled = F.first(carry_c, ignorenulls=True).over(
            base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
    if tolerance is not None:
        in_tol = F.abs(F.col(t_c) - filled[rts_f]) <= F.lit(tolerance)
        filled = F.when(in_tol, filled)
    u = u.withColumn(carry_c, filled)
    out = u.filter(F.col(side_c) == side_left).withColumnRenamed(t_c, left_ts)
    return out.select(
        *by, left_ts, *left_only,
        *[F.col(carry_c)[c].alias(c) for c in carry],
    )


def _asof_nearest(
    left: DataFrame, right: DataFrame, by: list, left_ts: str,
    right_ts: str, carry: list, tolerance,
) -> DataFrame:
    """Nearest-direction as-of: one union, one exchange, two in-partition
    sorts (backward ordering sorts right rows before simultaneous left
    rows; forward, after). Each left row carries both directional fills
    and picks the closer, backward winning exact ties — pandas
    ``merge_asof(direction='nearest')`` semantics. The matched right
    timestamp always rides the fill struct (appended last, so the
    deterministic carry-struct tie-break is unchanged), so ``carry`` no
    longer needs to include ``right_ts``."""
    from qcardia_data_spark.operators.joins import fresh_name

    clash = set(carry) & set(left.columns)
    if clash:
        raise ValueError(f"carry columns collide with left columns: {sorted(clash)}")
    # fresh internal names: a left column named "_t"/"_side"/"_carry"/
    # "_cb"/"_cf"/"_pick", or a carry column named "_rts", must not
    # collide with the working columns / struct field (ADVICE r9)
    taken = list(left.columns) + list(right.columns)
    t_c = fresh_name("_t", taken)
    side_c = fresh_name("_side", taken)
    carry_c = fresh_name("_carry", taken)
    cb_c = fresh_name("_cb", taken)
    cf_c = fresh_name("_cf", taken)
    pick_c = fresh_name("_pick", taken)
    rts_f = fresh_name("_rts", carry)
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    fields = list(carry) + [rts_f]
    ftypes = {**rtypes, rts_f: rtypes[right_ts]}
    carry_ddl = "struct<" + ",".join(f"`{c}`:{ftypes[c]}" for c in fields) + ">"
    left_only = [c for c in left.columns if c not in by and c != left_ts]
    l_aligned = left.select(
        *by,
        F.col(left_ts).alias(t_c),
        F.lit(1).alias(side_c),
        *left_only,
        F.lit(None).cast(carry_ddl).alias(carry_c),
    )
    r_aligned = right.select(
        *by,
        F.col(right_ts).alias(t_c),
        F.lit(0).alias(side_c),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_only],
        F.struct(
            *[F.col(c) for c in carry], F.col(right_ts).alias(rts_f)
        ).alias(carry_c),
    )
    u = l_aligned.unionByName(r_aligned)
    orderable = not any("map<" in rtypes[c] for c in carry)
    tail = [F.col(carry_c)] if orderable else []
    # backward: right rows sort BEFORE a simultaneous left row (visible in
    # the preceding frame); forward flips the side key so they sort AFTER
    wb = Window.partitionBy(*by).orderBy(
        F.col(t_c), F.col(side_c), *tail
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = Window.partitionBy(*by).orderBy(
        F.col(t_c), (F.lit(1) - F.col(side_c)), *tail
    ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cb = F.last(carry_c, ignorenulls=True).over(wb)
    cf = F.first(carry_c, ignorenulls=True).over(wf)
    if tolerance is not None:
        cb = F.when(F.abs(F.col(t_c) - cb[rts_f]) <= F.lit(tolerance), cb)
        cf = F.when(F.abs(cf[rts_f] - F.col(t_c)) <= F.lit(tolerance), cf)
    u = u.withColumn(cb_c, cb).withColumn(cf_c, cf)
    db = F.abs(F.col(t_c) - F.col(cb_c)[rts_f])
    df_ = F.abs(F.col(cf_c)[rts_f] - F.col(t_c))
    pick = (
        F.when(F.col(cb_c).isNull(), F.col(cf_c))
        .when(F.col(cf_c).isNull(), F.col(cb_c))
        .when(db <= df_, F.col(cb_c))
        .otherwise(F.col(cf_c))
    )
    out = (
        u.withColumn(pick_c, pick)
        .filter(F.col(side_c) == 1)
        .withColumnRenamed(t_c, left_ts)
    )
    return out.select(
        *by, left_ts, *left_only,
        *[F.col(pick_c)[c].alias(c) for c in carry],
    )


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
    # fresh working name (r14 review — the asof ADVICE-r9 class): a user
    # column literally named "_bucket" was silently overwritten and then
    # dropped from the output
    from qcardia_data_spark.operators.joins import fresh_name

    b_c = fresh_name("_bucket", list(points.columns) + list(intervals.columns))
    pb = points.withColumn(
        b_c, (F.unix_timestamp(F.col(point_ts)) / bucket_seconds).cast("long")
    )
    ib = intervals.withColumn(
        b_c,
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_ts)) / bucket_seconds).cast("long"),
                (F.unix_timestamp(F.col(end_ts)) / bucket_seconds).cast("long"),
            )
        ),
    )
    joined = pb.join(ib, b_c).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop(b_c)


def interval_overlap_join(
    left: DataFrame, right: DataFrame,
    start_l: str, end_l: str, start_r: str, end_r: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """[ext] Interval-OVERLAP join (``[start_l, end_l] ∩ [start_r, end_r]
    ≠ ∅``, i.e. ``end_l >= start_r AND end_r >= start_l``) — the
    interval-interval sibling of :func:`bucketed_range_join`, completing
    the temporal-join family (as-of, point-in-interval, overlap). The
    bound columns are EPOCH-SECOND numerics.

    Same no-theta-join shape: both sides explode into the time buckets
    they cover, equi-join on the bucket, apply the exact overlap
    residual, then keep each pair ONLY in its first shared bucket — the
    bucket of ``max(start_l, start_r)``, i.e. where the intersection
    begins, which both sides cover whenever the overlap is non-empty
    (the losslessness proof). A per-pair bucket predicate instead of a
    full-row DISTINCT means duplicate input rows yield duplicate joined
    pairs, exactly as a true overlap join would (ADVICE r8), and the
    dedup shuffle disappears from the plan. Shuffle is O(rows ×
    buckets_per_interval) with a hash-partitionable equi-join; pick
    ``bucket_seconds`` ≈ the median interval length so the explode
    factor stays O(1). Column names must be disjoint across the two
    frames (caller disambiguates)."""
    # fresh working name (r14 review): same silent-overwrite class as
    # bucketed_range_join above
    from qcardia_data_spark.operators.joins import fresh_name

    b_c = fresh_name("_bucket", list(left.columns) + list(right.columns))

    def buckets(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            b_c,
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bucket_seconds),
                    F.floor(F.col(e) / bucket_seconds),
                )
            ),
        )

    joined = buckets(left, start_l, end_l).join(
        buckets(right, start_r, end_r), b_c
    ).filter(
        (F.col(end_l) >= F.col(start_r)) & (F.col(end_r) >= F.col(start_l))
        & (
            F.col(b_c)
            == F.floor(F.greatest(F.col(start_l), F.col(start_r)) / bucket_seconds)
        )
    )
    return joined.drop(b_c)
