"""Set operations (SURVEY §2.7, U1-U3).

Union-by-name with missing columns is the reference's schema-on-write merge
(dataset_cacher.py:296-311: cached-CSV schema = union of columns across all
subset CSVs); except/intersect back the split-isolation logic
(data_split.py:59-67).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def union_by_name(dfs: Sequence[DataFrame]) -> DataFrame:
    """U1 — union with schema merge-by-name; absent columns become NULL
    (reference dataset_cacher.py:296-311, pipeline/utils.py:112-119)."""
    it = iter(dfs)
    out = next(it)
    for df in it:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def except_keys(df: DataFrame, remove: DataFrame) -> DataFrame:
    """U2 — distinct set difference (dev = all − test,
    reference data_split.py:59-63). SQL EXCEPT (distinct) semantics."""
    return df.subtract(remove.select(*df.columns))


def intersect_keys(df: DataFrame, other: DataFrame) -> DataFrame:
    """U3 — distinct intersection (mm1/mm2 overlap subjects,
    reference data_split.py:64-67,89-102)."""
    return df.intersect(other)
