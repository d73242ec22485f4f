"""Multi-record generators — the explode family (SURVEY §2.8, G1-G6).

The reference's signature reshaping ops: one record in → many out
(``MultiSampleTrait``). 4-D volume → per-frame / per-slice records
(``SplitDimensionsd``, reference transforms/dimensions.py:20-68) maps to
``posexplode`` over array columns.

Scale rule (SURVEY §4.1): predicates on generated ordinals (frame_nr,
slice_nr) must be applied BEFORE the explode when they derive from
pre-explode data — Catalyst cannot push a filter through posexplode. The
``keep_positions`` argument of :func:`explode_with_position` does exactly
what the reference's ``selected_frame_nrs`` pre-filter does
(dimensions.py:33-37): shrink the array first, then explode.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_with_position(
    df: DataFrame,
    array_col: str,
    pos_out: str = "pos",
    val_out: str = "val",
    keep_positions: Sequence[int] | None = None,
    keep_other: Sequence[str] | None = None,
) -> DataFrame:
    """G1/G4 — frame split: array → one row per element with its ordinal
    (``split_frames``, reference dimensions.py:20-47; adds ``frame_nr`` +
    ``total_nr_frames``).

    ``keep_positions`` pre-slices the array before exploding (predicate
    placed below the generator, as the reference does with
    ``selected_frame_nrs``) so never-used elements are never generated.
    """
    arr: Column = F.col(array_col)
    others = list(keep_other) if keep_other is not None else [c for c in df.columns if c != array_col]
    if keep_positions is not None:
        # F.get is 0-based and NULL-safe out of range (element_at threw
        # under ANSI past the array end and on index 0); the bound filter
        # keeps the fused form row-identical to posexplode + isin — an
        # out-of-range or negative position matches NOTHING instead of
        # emitting a phantom NULL row (r10 review). Deduplicate + sort
        # (r13 review): a repeated position in the list emitted its
        # element TWICE where the isin form keeps one row, and posexplode
        # emits ascending ordinals — set+sort restores exact row-identity.
        pairs = F.array(*[
            F.struct(F.lit(int(p)).alias(pos_out), F.get(arr, int(p)).alias(val_out))
            for p in sorted({int(p) for p in keep_positions})
        ])
        exploded = df.select(*others, F.size(arr).alias(f"total_{pos_out}"), F.explode(pairs).alias("_pv"))
        return exploded.select(
            *others, f"total_{pos_out}", f"_pv.{pos_out}", f"_pv.{val_out}"
        ).filter(
            (F.col(pos_out) >= 0) & (F.col(pos_out) < F.col(f"total_{pos_out}"))
        )
    return df.select(
        *others,
        F.size(arr).alias(f"total_{pos_out}"),
        F.posexplode(arr).alias(pos_out, val_out),
    )


def explode_2d(
    df: DataFrame, nested_col: str,
    outer_pos: str = "frame_nr", inner_pos: str = "slice_nr", val_out: str = "val",
    keep_other: Sequence[str] | None = None,
) -> DataFrame:
    """G3 — composite 2-D split: frames × slices via chained posexplode
    (``DimensionsTo2Dd``, reference dimensions.py:77-93)."""
    others = list(keep_other) if keep_other is not None else [c for c in df.columns if c != nested_col]
    outer = df.select(*others, F.posexplode(F.col(nested_col)).alias(outer_pos, "_inner"))
    return outer.select(*others, outer_pos, F.posexplode(F.col("_inner")).alias(inner_pos, val_out))


def replicate_rows(df: DataFrame, copies: int, out: str = "copy_nr") -> DataFrame:
    """G5 — emit 1+n copies of every row tagged with a copy ordinal
    (``CopySamplesd``, reference transforms/utils.py:172-183)."""
    return df.select("*", F.explode(F.sequence(F.lit(0), F.lit(copies))).alias(out))


def flatten_nested(df: DataFrame, nested_col: str, out: str) -> DataFrame:
    """G6 — [[x]] → [x] collate flatten (``collate_fn``,
    reference dataset_cacher.py:418-434)."""
    return df.withColumn(out, F.flatten(F.col(nested_col)))


def collapse_singleton(df: DataFrame, array_col: str, pos_col: str, total_col: str):
    """G1/G2 single-element collapse semantics (reference dimensions.py:23-28,
    52-57): when the axis has exactly one element the reference does NOT
    explode — it keeps the record and records pos NULL ("__" in file ids).

    Returns (singletons, multis): caller explodes only ``multis`` and
    union_by_name's the two back (absent ordinal → NULL)."""
    is_single = F.size(F.col(array_col)) <= 1
    singles = df.filter(is_single)
    multis = df.filter(~is_single)
    return singles, multis
