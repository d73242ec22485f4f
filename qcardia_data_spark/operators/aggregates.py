"""Aggregation operators (SURVEY §2.4, A1-A10).

All built-in aggregates — map-side partial aggregation and AQE shuffle
coalescing come for free. NULL-keeping group semantics (the reference's
``dropna=False``) are Spark's default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def group_weights(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A1 — inverse-frequency weights per group, NULL groups kept
    (``build_sampler_weights``, reference pipeline/utils.py:88-135, core
    :121-127: ``weight = len(df) / group_size``).

    Returns one row per group with ``cnt`` and ``weight``. Spark groupBy
    keeps NULL keys by default — exactly the reference's ``dropna=False``.
    """
    total = df.count()  # scalar; broadcast into the plan as a literal
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("weight", F.lit(float(total)) / F.col("cnt"))
    )


def group_weights_window(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """W1 variant of A1 — attach the weight to every row without a join:
    ``count(*) over (partition by cols)`` (reference pipeline/utils.py:130-134
    does a merge; the window form avoids materializing + joining).

    The whole-frame total is a 1-row aggregate attached via broadcast
    nested-loop join, NOT ``count(*) over ()``: an empty window spec
    compiles to ``Exchange SinglePartition`` of the ENTIRE frame, which
    also drags the per-group window onto that one task — the r15 plan
    audit measured the whole query serialized on a single core (and at
    100 TB it would simply not run). The agg side costs one extra
    column-pruned scan whose partial counts combine map-side; results are
    identical (exact integer count either way).
    """
    from qcardia_data_spark.operators.joins import fresh_name

    w = Window.partitionBy(*[F.col(c) for c in cols])
    tot = fresh_name("_total", [*df.columns, "cnt", "weight"])
    total_1row = df.agg(F.count(F.lit(1)).alias(tot))
    return (
        df.withColumn("cnt", F.count(F.lit(1)).over(w))
        .crossJoin(F.broadcast(total_1row))
        .withColumn("weight", F.col(tot).cast("double") / F.col("cnt"))
        .drop(tot)
    )


def summary_stats(df: DataFrame, value: str, group: Sequence[str] = ()) -> DataFrame:
    """A3 — min/max/mean/std (``BuildImageMetaDatad``,
    reference transforms/utils.py:87-91)."""
    aggs = [
        F.min(value).alias("min_v"),
        F.max(value).alias("max_v"),
        F.avg(value).alias("mean_v"),
        F.stddev(value).alias("std_v"),
    ]
    return df.groupBy(*group).agg(*aggs) if group else df.agg(*aggs)


def quantile_summary(
    df: DataFrame, value: str, group: Sequence[str] = (),
    qs: Sequence[float] = (0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0),
) -> DataFrame:
    """A4 — exact multi-quantile summary (``get_exploration_df``,
    reference setup/exploration.py:82-106: mean/median/std + 9 quantiles).

    Uses exact ``percentile`` for oracle parity; at 100 TB swap for
    ``percentile_approx`` (same call shape, sketch-mergeable, no full sort).
    """
    aggs = [
        F.avg(value).alias("mean_v"),
        F.stddev(value).alias("std_v"),
    ] + [
        F.percentile(F.col(value), F.lit(q)).alias(f"q{int(q * 1000):04d}")
        for q in qs
    ]
    return df.groupBy(*group).agg(*aggs) if group else df.agg(*aggs)


def distinct_set_per_group(df: DataFrame, group: Sequence[str], value: str, out: str = "present") -> DataFrame:
    """A5 — sorted distinct set per group, joined to a canonical string
    (``present_classes`` = "_".join(unique), reference transforms/utils.py:136-141).

    The engine-native form is the sorted array; the string join is kept for
    reference-format parity.
    """
    return df.groupBy(*group).agg(
        F.array_join(F.array_sort(F.collect_set(value)), "_").alias(out)
    )


def argmax_per_group(df: DataFrame, group: Sequence[str], order_by: Sequence[Column], keep: Sequence[str]) -> DataFrame:
    """A6 — deterministic arg-max row per group (ED/ES frame selection by
    mask volume, ``get_ed_es_idxs``, reference reformat/utils.py:91-113).

    ``max_by`` is nondeterministic under ties; a full ordering (caller passes
    tie-breaker columns) + row_number makes retries reproducible.
    """
    # fresh working name (r14 review): with a user column named "_rn" in
    # ``keep``, the fixed name silently returned row numbers instead of
    # the user's data
    from qcardia_data_spark.operators.joins import fresh_name

    rn = fresh_name("_rn", df.columns)
    w = Window.partitionBy(*group).orderBy(*order_by)
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .select(*group, *keep)
    )


def count_if_agg(df: DataFrame, group: Sequence[str], pred: Column, out: str = "n_match") -> DataFrame:
    """A7 — count-if / presence reduce (nonzero detection,
    reference reformat/utils.py:46-51)."""
    return df.groupBy(*group).agg(F.count_if(pred).alias(out))


def histogram_cdf(df: DataFrame, value: str, nbins: int, lo: float, hi: float) -> DataFrame:
    """A8+W4 — fixed-range histogram with cumulative distribution
    (``histogram_equalization_np``, reference visualization/utils.py:39-46:
    256-bin hist → cumsum → min-max normalize).

    width_bucket → groupBy(bucket).count() → running sum window. The window
    is over ``nbins`` rows only (post-aggregation), so the single-partition
    sort is trivially cheap at any scale.
    """
    bucketed = df.select(
        F.width_bucket(F.col(value), F.lit(lo), F.lit(hi), F.lit(nbins)).alias("bucket")
    )
    hist = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = Window.partitionBy()
    return hist.withColumn("cum_n", F.sum("n").over(w)).withColumn(
        "cdf", F.col("cum_n").cast("double") / F.sum("n").over(total)
    )


def grouped_counts(df: DataFrame, group: Sequence[str], distinct_col: str) -> DataFrame:
    """A9 — files & distinct subjects per split (``print_dataset_summary``
    callers, reference pipeline/utils.py:74-83)."""
    return df.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(distinct_col).alias("n_distinct"),
    )


def two_level_agg(
    df: DataFrame, fine: Sequence[str], coarse: Sequence[str], value: str,
) -> DataFrame:
    """A10 — partial→final aggregation: per-fine-group summary folded into a
    per-coarse-group summary (per-subject → whole-dataset accumulation,
    reference data_predictor.py:277-290). Spark's partial/final agg handles
    the physical two-phase automatically; this is the *logical* two-level."""
    per_fine = df.groupBy(*fine, *coarse).agg(
        F.sum(value).cast("double").alias("fine_sum")
    )
    return per_fine.groupBy(*coarse).agg(
        F.avg("fine_sum").alias("mean_fine_sum"),
        F.stddev("fine_sum").alias("std_fine_sum"),
        F.count(F.lit(1)).alias("n_fine_groups"),
    )


def pivot_counts(
    df: DataFrame, key: str, pivot_col: str, values: Sequence[str],
) -> DataFrame:
    """[ext] PIVOT: long (key, pivot_col) rows to one wide row per key
    with a count column per pivoted value — the cross-tab every
    activity-matrix / feature-table build runs. ``values`` is EXPLICIT
    (never inferred): inference costs an extra distinct scan AND makes
    the output schema data-dependent, which breaks downstream plans at
    100 TB; with the list given, Spark plans ONE map-side-combined
    groupBy, no second pass. Absent combinations emit 0, not NULL (a
    count that never fired is zero)."""
    out = (
        df.groupBy(key)
        .pivot(pivot_col, list(values))
        .agg(F.count(F.lit(1)))
    )
    for v in values:
        out = out.withColumn(v, F.coalesce(F.col(f"`{v}`"), F.lit(0)))
    return out


def unpivot_long(
    df: DataFrame, key: str, value_cols: Sequence[str],
    var_name: str = "variable", value_name: str = "value",
) -> DataFrame:
    """[ext] UNPIVOT/melt: wide columns back to long (key, variable,
    value) rows — `df.unpivot`, a pure map-side generator (each input
    row emits len(value_cols) rows, zero shuffles). The roundtrip
    inverse of :func:`pivot_counts`."""
    return df.unpivot(
        [key], list(value_cols), variableColumnName=var_name,
        valueColumnName=value_name,
    )


def discrete_quantiles(
    df: DataFrame, key: str, value: str, pcts: Sequence[int] = (25, 50, 75, 90),
) -> DataFrame:
    """[ext] EXACT per-group quantiles by rank selection: for each
    percentile p, the stored value at rank ceil(p·n/100) under the value
    order — never an interpolated average, so the result is always a
    real data value and is engine-identical (the mad_outliers median
    generalized to a percentile list). Rank arithmetic is INTEGER
    ((p·n + 99) div 100): no float percent multiply whose last-ulp
    position could straddle a ceil boundary.

    One window pass (rank + count ride the same key exchange); the
    percentile list explodes per row (bounded, len(pcts)) and the rank
    filter keeps exactly one row per (key, pct). 100 TB: no global
    sort; per-key work is the sort the window already does.

    vs percentile_approx: that is the sketch path (use it when groups
    are huge and error is acceptable); this is the exact, auditable
    path whose per-key cost is one sort.
    """
    pcts = [int(p) for p in pcts]
    if not pcts or any(p < 1 or p > 100 for p in pcts):
        raise ValueError("discrete_quantiles: pcts must be in 1..100")
    if "pct" in (key, value):
        # the OUTPUT contract is (key, pct, value) — a key/value named
        # "pct" would make the result ambiguous; refuse loudly
        raise ValueError(
            "discrete_quantiles: key/value may not be named 'pct' (the "
            "output's percentile column) — rename upstream"
        )
    # fresh working names (r13 review, the carry-clash rule): a key or
    # value column literally named _rn/_n/pct was silently overwritten
    from qcardia_data_spark.operators.joins import fresh_name

    rn = fresh_name("_rn", [key, value])
    nn = fresh_name("_n", [key, value, rn])
    pc = fresh_name("pct", [key, value, rn, nn])
    w = Window.partitionBy(key).orderBy(value)
    wc = Window.partitionBy(key)
    r = df.select(key, value).withColumn(
        rn, F.row_number().over(w)
    ).withColumn(nn, F.count(F.lit(1)).over(wc))
    e = r.select(
        key, value, rn, nn,
        F.explode(F.array(*[F.lit(p) for p in pcts])).alias(pc),
    )
    target = F.floor((F.col(pc) * F.col(nn) + 99) / 100)
    return e.filter(F.col(rn) == target).select(
        key, F.col(pc).alias("pct"), value
    )
