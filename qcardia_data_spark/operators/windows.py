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
    out: str = "split",
) -> DataFrame:
    """W2/X1 — seeded shuffle + ranked split: order rows by keyed_rand, first
    ``round(n·p)`` → 'valid', rest → 'train' (reference data_split.py:73-78).

    Subject-level semantics: apply to a *distinct-key* frame and join back
    (see sampling.subject_level_split) — never to raw rows, which would leak
    a subject across splits (SURVEY §7.3).
    """
    w = Window.orderBy(keyed_rand(seed, F.col(key)), F.col(key))
    total = Window.partitionBy()
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(total)
    )
    return ranked.withColumn(
        out,
        F.when(F.col("_rn") <= F.round(F.col("_n") * valid_fraction), F.lit("valid"))
        .otherwise(F.lit("train")),
    ).drop("_rn", "_n")


def row_number_per_group(
    df: DataFrame, group: Sequence[str], order_by: Sequence[Column], out: str = "rn",
) -> DataFrame:
    """W3 — row_number per group (n-per-group sampling backbone,
    reference utils.py:25-29)."""
    w = Window.partitionBy(*group).orderBy(*order_by)
    return df.withColumn(out, F.row_number().over(w))


def cumulative_sum(
    df: DataFrame, partition: Sequence[str], order_by: Sequence[Column],
    value: str, out: str = "cum",
) -> DataFrame:
    """W4 — running sum, rowsBetween(unboundedPreceding, currentRow)
    (CDF in histogram equalization, reference visualization/utils.py:42-44).

    Caller must pass a *total* ordering (include unique tie-breakers) or the
    running sum is nondeterministic across retries.
    """
    w = (
        Window.partitionBy(*partition)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(value).over(w))


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
