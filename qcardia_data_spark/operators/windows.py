"""Window operators (SURVEY §2.5, W1-W5) and the key-derived determinism
primitive that replaces the reference's sequential RNG.

The reference draws randomness from a per-process sequential RNG
(``Randomizable.R``, reference transforms/resampler.py:59-95) and even ships
a seed-sync hack (``RandChangeSeedd``, transforms/utils.py:186-202). Under
Spark's task-retry semantics a re-run task must reproduce the same draw, so
every "random" value in this engine is a pure function of (seed, stable row
key): ``md5(seed || key)``. Same key ⇒ same draw, in any engine — which also
makes seeded operators DuckDB-oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def keyed_rand(seed: str | int, *key_cols: Column) -> Column:
    """Deterministic pseudo-random sort key from stable row keys.

    md5 of the seed + key columns → uniformly distributed hex string.
    Identical in Spark and DuckDB (`md5(concat(...))`), unlike engine
    ``rand()`` streams. Use as an ORDER BY key wherever the reference
    shuffles with a seeded RNG (data_split.py:73-78).
    """
    parts = [F.lit(str(seed))] + [c.cast("string") for c in key_cols]
    return F.md5(F.concat_ws("|", *parts))


def count_over(df: DataFrame, partition: Sequence[str], out: str = "cnt") -> DataFrame:
    """W1 — count(*) over partition (inverse-frequency weight backbone,
    reference pipeline/utils.py:121-135)."""
    return df.withColumn(out, F.count(F.lit(1)).over(Window.partitionBy(*partition)))


def seeded_split(
    df: DataFrame, key: str, valid_fraction: float, seed: str | int = 0,
    out: str = "split", scale_safe: bool = False,
    num_ranges: int | None = None,
) -> DataFrame:
    """W2/X1 — seeded shuffle + ranked split: order rows by keyed_rand, first
    ``round(n·p)`` → 'valid', rest → 'train' (reference data_split.py:73-78).

    Subject-level semantics: apply to a *distinct-key* frame and join back
    (see sampling.subject_level_split) — never to raw rows, which would leak
    a subject across splits (SURVEY §7.3).

    KEY-GRANULARITY CONTRACT (the :func:`cumulative_sum` pattern, r12): the
    default form ranks through ONE unpartitioned window — a single sort
    task over the whole subject frame, fine at test SF and a ceiling at
    hundreds of millions of subjects. ``scale_safe=True`` computes the
    SAME global rank as a two-phase distributed prefix sum over
    ``num_ranges`` range splits plus a broadcast 1-row total — identical
    assignments (rank and threshold are exact integers), parallelism =
    ``num_ranges``. Costs one extra exchange; don't pay it for small
    subject frames.
    """
    rnd = keyed_rand(seed, F.col(key))
    if scale_safe:
        from qcardia_data_spark.operators.joins import fresh_name

        one = fresh_name("_one", df.columns)
        rk = fresh_name("_rk", [*df.columns, one])
        nt = fresh_name("_n_total", [*df.columns, one, rk])
        ranked = _cumulative_sum_ranged(
            df.withColumn(one, F.lit(1)), [], [rnd, F.col(key)],
            one, rk, num_ranges,
        )
        total_1row = df.agg(F.count(F.lit(1)).alias(nt))
        return (
            ranked.join(F.broadcast(total_1row))
            .withColumn(
                out,
                F.when(
                    F.col(rk) <= F.round(F.col(nt) * valid_fraction),
                    F.lit("valid"),
                ).otherwise(F.lit("train")),
            )
            .drop(one, rk, nt)
        )
    # fresh working names (r14 review): the plain path's fixed "_rn"/"_n"
    # silently overwrote (then dropped) user columns of those names — the
    # scale_safe branch above already fresh-names for exactly this reason
    from qcardia_data_spark.operators.joins import fresh_name

    rn_c = fresh_name("_rn", df.columns)
    n_c = fresh_name("_n", [*df.columns, rn_c])
    w = Window.orderBy(rnd, F.col(key))
    total = Window.partitionBy()
    ranked = df.withColumn(rn_c, F.row_number().over(w)).withColumn(
        n_c, F.count(F.lit(1)).over(total)
    )
    return ranked.withColumn(
        out,
        F.when(
            F.col(rn_c) <= F.round(F.col(n_c) * valid_fraction), F.lit("valid")
        ).otherwise(F.lit("train")),
    ).drop(rn_c, n_c)


def row_number_per_group(
    df: DataFrame, group: Sequence[str], order_by: Sequence[Column], out: str = "rn",
) -> DataFrame:
    """W3 — row_number per group (n-per-group sampling backbone,
    reference utils.py:25-29)."""
    w = Window.partitionBy(*group).orderBy(*order_by)
    return df.withColumn(out, F.row_number().over(w))


def cumulative_sum(
    df: DataFrame, partition: Sequence[str], order_by: Sequence[Column],
    value: str, out: str = "cum", scale_safe: bool = False,
    num_ranges: int | None = None,
) -> DataFrame:
    """W4 — running sum, rowsBetween(unboundedPreceding, currentRow)
    (CDF in histogram equalization, reference visualization/utils.py:42-44).

    Caller must pass a *total* ordering (include unique tie-breakers) or the
    running sum is nondeterministic across retries.

    KEY-GRANULARITY CONTRACT: the plain window form runs ONE sort task per
    distinct ``partition`` key. That is the right plan when the key is
    fine-grained (the reference's actual W4 is a per-image 256-bin CDF —
    millions of tiny partitions), and a scale ceiling when it is coarse
    (a 3-value flag over 6B rows = 3 giant sort tasks). For coarse keys
    pass ``scale_safe=True``: a two-phase distributed prefix sum —
    range-repartition on (partition, order) into ``num_ranges`` splits,
    local running sum within each split, then add the broadcast exclusive
    prefix of per-split subtotals. Identical results (bit-exact for
    decimal/integer values; float addition is reassociated); parallelism
    becomes ``num_ranges`` regardless of key cardinality. Costs one extra
    full exchange over the window form, so don't pay it for fine keys.
    """
    if scale_safe:
        return _cumulative_sum_ranged(
            df, partition, order_by, value, out, num_ranges
        )
    w = (
        Window.partitionBy(*partition)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(value).over(w))


def _default_num_ranges(spark) -> int:
    """Range count when the caller passes none: the session's shuffle
    parallelism. The conf may be NON-NUMERIC on managed platforms that
    accept "auto" for AQE (ADVICE r9) — fall back to the cluster's
    default parallelism instead of raising ValueError."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except ValueError:
        return spark.sparkContext.defaultParallelism


def _cumulative_sum_ranged(
    df: DataFrame, partition: Sequence[str], order_by: Sequence[Column],
    value: str, out: str, num_ranges: int | None,
) -> DataFrame:
    """Two-phase distributed prefix sum (VERDICT r8 "What's wrong" #1).

    Phase 1: ``repartitionByRange`` on (partition, order) — contiguous,
    globally ordered splits; within one partition key the split id is
    monotone in the order key (lexicographic range bounds). Phase 2: a
    local running sum within each (key, split) plus the exclusive prefix
    of per-split subtotals, joined back by broadcast (≤ num_ranges rows).

    Both consumers of the ranged frame (the local sums and the subtotals)
    live in ONE plan, so Catalyst's ReuseExchange executes the range
    exchange once and ``spark_partition_id()`` is consistent between them
    — the property the plan test pins. A driver-side collect is never
    taken; the subtotal prefix is a window over a ≤ num_ranges-row frame.

    ``spark.sql.exchange.reuse`` is read when this plan is BUILT: with
    reuse disabled the split ids are materialized via localCheckpoint
    instead (each consumer would otherwise re-sample its own range bounds
    and misattribute subtotals silently). Toggling the conf between
    building the frame and acting on it defeats that check — build and
    execute under the same session conf, the normal case.
    """
    from qcardia_data_spark.operators.joins import (
        fresh_name,
        null_safe_equi_join,
    )

    spark = df.sparkSession
    if num_ranges is None:
        num_ranges = _default_num_ranges(spark)
    # internal working columns get FRESH names — fixed "_rng"/"_loc"/"_off"
    # silently overwrote (and then dropped) user columns of those names
    rng = fresh_name("_rng", df.columns)
    loc = fresh_name("_loc", [*df.columns, rng])
    off = fresh_name("_off", [*df.columns, rng, loc])
    tot_c = fresh_name("_tot", [*df.columns, rng, loc, off])
    pcols = [F.col(c) for c in partition]
    ranged = df.repartitionByRange(num_ranges, *pcols, *order_by).withColumn(
        rng, F.spark_partition_id()
    )
    if spark.conf.get("spark.sql.exchange.reuse", "true").lower() != "true":
        # split-id consistency between the two consumers is exactly
        # exchange reuse; with reuse disabled each consumer would
        # re-execute the range exchange with its own RangePartitioner
        # sampling and the subtotal offsets would be misattributed
        # SILENTLY (verified: 87% wrong rows at 200k/16 with reuse off).
        # Materialize the split ids once instead — costlier, never wrong.
        ranged = ranged.localCheckpoint(eager=True)
    wloc = (
        Window.partitionBy(*partition, rng)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(loc, F.sum(value).over(wloc))
    tot = ranged.groupBy(*partition, rng).agg(F.sum(value).alias(tot_c))
    wpre = (
        Window.partitionBy(*partition)
        .orderBy(rng)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = tot.select(
        *partition, rng,
        F.sum(tot_c).over(wpre).alias(off),  # NULL for the first split
    )
    # null-SAFE subtotal join: a NULL partition-key value is a legitimate
    # group in the window form, so the join must not drop it — plain `==`
    # on the key columns silently loses every NULL-key row
    joined = null_safe_equi_join(
        local, pre, nullsafe_keys=partition, plain_keys=[rng],
        carry=[off], broadcast_right=True,
    )
    return joined.withColumn(
        out,
        F.when(F.col(off).isNull(), F.col(loc))
        .otherwise(F.col(loc) + F.col(off)),
    ).drop(rng, loc, off)


def first_match_over(
    df: DataFrame, partition: Sequence[str], pos: str, matches: Column,
    out: str = "first_pos",
) -> DataFrame:
    """W5 — earliest position matching a predicate, per partition
    (first-frame content match, reference reformat/utils.py:86-89)."""
    w = Window.partitionBy(*partition)
    return df.withColumn(
        out, F.min(F.when(matches, F.col(pos))).over(w)
    )
