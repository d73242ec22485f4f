"""Dataset exploration summaries (SURVEY §2.4 A4, §2.9 F22).

Reference: ``get_exploration_df`` (``src/qcardia_data/setup/exploration.py:
82-106``) builds a per-column frame of mean/median/std + 9 quantiles over
subject metadata; unit conversions (mm = pixels × pixdim, uniform size =
size / median pixdim) at ``exploration.py:52-62``.

Engine form: one ``groupBy().agg()`` producing a wide stats row per column
(exact percentiles for oracle parity; ``percentile_approx`` is the 100 TB
drop-in), then an unpivot to the reference's (column × statistic) layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_QS = (0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0)


def exploration_frame(
    df: DataFrame, value_cols: Sequence[str], qs: Sequence[float] = DEFAULT_QS,
    approx: bool = False, group: Sequence[str] = (),
) -> DataFrame:
    """One row per (group ×) value column statistic.

    ``approx=True`` switches to ``percentile_approx`` (mergeable sketch, no
    global sort) — the at-scale mode; exact mode matches DuckDB bit-for-bit.
    ``group`` adds per-dataset/per-subset breakdowns (the reference explores
    per dataset, setup/exploration.py:82-106).
    """
    pct = F.percentile_approx if approx else F.percentile
    aggs = []
    for c in value_cols:
        aggs += [
            F.avg(c).alias(f"{c}__mean"),
            F.stddev(c).alias(f"{c}__std"),
        ] + [
            pct(F.col(c), F.lit(q)).alias(f"{c}__q{int(q * 1000):04d}") for q in qs
        ]
    wide = df.groupBy(*group).agg(*aggs) if group else df.agg(*aggs)
    # unpivot to (group…, column, statistic, value) — the reference's layout
    stat_cols = [c for c in wide.columns if "__" in c]
    stack_args = ", ".join(f"'{c}', `{c}`" for c in stat_cols)
    long = wide.select(
        *group,
        F.expr(f"stack({len(stat_cols)}, {stack_args}) as (key, value)"),
    )
    split_key = F.split("key", "__")
    return long.select(
        *group,
        split_key.getItem(0).alias("column"),
        split_key.getItem(1).alias("statistic"),
        "value",
    )


def with_unit_conversion(
    df: DataFrame, size_col: str, spacing_col: str, out: str = "size_mm",
) -> DataFrame:
    """F22 — physical-unit derivation: ``mm = pixels × pixdim``
    (reference exploration.py:54-58)."""
    return df.withColumn(out, F.col(size_col) * F.col(spacing_col))


def median_spacing(df: DataFrame, spacing_col: str) -> float:
    """Median voxel spacing → target spacing for resampling
    (reference exploration.py:52)."""
    return df.agg(F.median(spacing_col)).collect()[0][0]
