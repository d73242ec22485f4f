"""Projections, filters, and scalar derivations (SURVEY §2.2, P1-P12).

Capability parity with the reference's column manipulation layer:
- reorder_df_columns (reference ``setup/reformat/utils.py:116-129``) → P1
- column drop/rename (``dataset_cacher.py:270-274``, ``mm1.py:72``) → P2/P3
- vendor-string normalization (``mm2.py:84-98``) → P8
- ED/ES flags + modular frame renumber (``dataset_cacher.py:354-358``) → P9/P10
- composite subject key encode/decode (``utils.py:65-102``) → P12
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_ordered(df: DataFrame, first: Sequence[str]) -> DataFrame:
    """P1 — put ``first`` columns first, keep the rest in original order.

    Mirrors ``reorder_df_columns`` (reference reformat/utils.py:116-129).
    Pure projection: Catalyst prunes unused columns upstream.
    """
    rest = [c for c in df.columns if c not in set(first)]
    return df.select(*first, *rest)


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P2 — drop columns (reference ``DeleteItemsd`` use, dataset_cacher.py:270-274)."""
    return df.drop(*cols)


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P3 — bulk rename (reference mm1.py:72, mm2.py:75-83)."""
    return df.withColumnsRenamed(dict(mapping))


def normalize_strings(df: DataFrame, col: str, replacements: Sequence[tuple[str, str]]) -> DataFrame:
    """P8 — chained regexp_replace canonicalization (reference mm2.py:84-98)."""
    expr: Column = F.col(col)
    for pattern, repl in replacements:
        expr = F.regexp_replace(expr, pattern, repl)
    return df.withColumn(col, expr)


def zero_pad(df: DataFrame, col: str, width: int, out: str | None = None) -> DataFrame:
    """P8 — zero-pad ids, f"{id:03}" analog (reference test_splits.py:36)."""
    return df.withColumn(out or col, F.lpad(F.col(col).cast("string"), width, "0"))


def with_flags(df: DataFrame, flags: Mapping[str, Column]) -> DataFrame:
    """P9 — derived boolean columns (``is_ed``/``is_es``, dataset_cacher.py:354-355)."""
    return df.withColumns(dict(flags))


def cyclic_renumber(df: DataFrame, out: str, value: Column, anchor: Column, modulus: Column) -> DataFrame:
    """P10 — ``(value - anchor) % modulus`` cycle-alignment
    (frame renumber relative to ED, dataset_cacher.py:357-358)."""
    return df.withColumn(out, F.pmod(value - anchor, modulus))


def nullify_placeholders(df: DataFrame, cols: Sequence[str], placeholders: Sequence[str] = ("none", "")) -> DataFrame:
    """P11 — map placeholder strings to NULL (``process_key_pairs``,
    reference pipeline/utils.py:9-24)."""
    out = df
    for c in cols:
        expr = F.col(c)
        for p in placeholders:
            expr = F.nullif(expr, F.lit(p))
        out = out.withColumn(c, expr)
    return out


def encode_composite_key(df: DataFrame, out: str, parts: Sequence[str], sep: str = "-") -> DataFrame:
    """P12 — build ``dataset-subject`` composite key
    (``dict_to_subject_list``, reference utils.py:65-83)."""
    return df.withColumn(out, F.concat_ws(sep, *[F.col(p).cast("string") for p in parts]))


def decode_composite_key(df: DataFrame, key: str, outs: Sequence[str], sep: str = "-") -> DataFrame:
    """P12 inverse — split composite key back into parts
    (``subject_list_to_dict``, reference utils.py:86-102).

    Splits on the FIRST ``sep`` occurrences only (limit = len(outs)), matching
    the reference's ``split("-", 1)`` semantics for subjects containing dashes.

    ``sep`` is taken LITERALLY (regex-escaped before F.split — r13 review:
    the encode side concatenates it literally, so a regex-meta separator
    like "." or "|" silently decoded every character as a split point,
    breaking the documented encode→decode roundtrip).
    """
    import re as _re

    parts = F.split(F.col(key), _re.escape(sep), len(outs))
    out = df
    for i, name in enumerate(outs):
        out = out.withColumn(name, parts.getItem(i))
    return out
