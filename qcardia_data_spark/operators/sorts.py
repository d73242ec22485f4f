"""Sorts, limits, top-k (SURVEY §2.6, O1-O5).

Engine rule (reference sorts everywhere for determinism, O1 — e.g.
data_split.py:70-78, dataset_cacher.py:104-108): every order-sensitive
materialization is preceded by a canonical total ordering. Top-k uses
orderBy+limit, which Spark executes as TakeOrderedAndProject — per-partition
heaps, no global sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qcardia_data_spark.operators.windows import keyed_rand


def canonical_sort(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """O1 — deterministic lexicographic sort on all (or given) columns."""
    cols = list(cols) if cols else df.columns
    return df.orderBy(*[F.col(c) for c in cols])


def natural_sort_key(col: Column, int_width: int = 12) -> Column:
    """O2 — natural-sort key: zero-pad every digit run so 'file2' < 'file10'
    (``natsorted`` DICOM names, reference reformat/utils.py:139-149).

    Implemented as a pure string expression: pad each maximal digit run to
    ``int_width`` via regexp_replace with a callback-free trick — digits are
    left-padded by prefixing zeros then trimming runs to fixed width.
    """
    # Prefix every digit-run with int_width zeros, then shrink every
    # (zeros+digits) run to its last int_width chars.
    padded = F.regexp_replace(col, r"(\d+)", ("0" * int_width) + r"$1")
    return F.regexp_replace(padded, r"0*(\d{" + str(int_width) + r"})", r"$1")


def natural_sort(df: DataFrame, col: str) -> DataFrame:
    """O2 — order by the natural-sort key (then raw value as tie-break)."""
    return df.orderBy(natural_sort_key(F.col(col)), F.col(col))


def dense_rank_desc(df: DataFrame, value: str, out: str = "rank") -> DataFrame:
    """O3 — descending dense rank (slice-position indexing, reference
    reformat/utils.py:235-237: positions sorted high→low, index by rank).

    Scale-safe form: a dense rank is a function of the DISTINCT value set
    alone, so rank the distinct frame and broadcast-join back, instead of a
    global window over every record (single-task sort of the whole frame —
    the non-scalable plan shape). ASSUMES ``value`` is LOW-CARDINALITY
    (slice positions, priorities — tens to thousands of distinct values):
    the distinct frame is broadcast, so a high-cardinality column would
    make the broadcast itself the hazard; use a plain window (partitioned
    by a real key) for those. The join is null-safe: NULL values keep
    their rows and rank where the window form put them (descending order
    sorts NULLs last in Spark)."""
    from pyspark.sql.window import Window

    ranked = (
        df.select(value)
        .distinct()
        .withColumn(out, F.dense_rank().over(Window.orderBy(F.desc(value))))
        .withColumnRenamed(value, "_rank_value")
    )
    return (
        df.join(F.broadcast(ranked), df[value].eqNullSafe(F.col("_rank_value")))
        .drop("_rank_value")
    )


def seeded_sample_n(df: DataFrame, key: str, k: int, seed: str | int = 0) -> DataFrame:
    """O4 — k rows without replacement, deterministic under retry
    (``rng.choice(..., replace=False)``, reference data_predictor.py:178-182).
    Key-derived randomness → TakeOrderedAndProject, no full shuffle."""
    return df.orderBy(keyed_rand(seed, F.col(key)), F.col(key)).limit(k)


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """O1/O5 — deterministic top-k (caller includes tie-breaker columns).
    Physical plan: TakeOrderedAndProject (per-partition heap + driver merge),
    which scales as O(k) memory regardless of input size."""
    return df.orderBy(*order_by).limit(k)
