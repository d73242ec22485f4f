"""Content-addressed Parquet materialization (C1/C2/C3).

Capability parity with the reference's DatasetCacher (reference
``src/qcardia_data/pipeline/dataset_cacher.py``):

- C1 cache-or-build: skip the whole build when the fingerprinted output
  exists (``:67-76``: rebuild skipped when the fingerprint CSV exists).
- C2 idempotent restart: tri-state check — absent / complete / partial;
  partial outputs (no ``_SUCCESS``) are removed and rebuilt
  (``reformat_check``, reference setup/reformat/reformat.py:21-77).
- C3 split routing: enumerate materialized records, attach split by
  subject membership, fail loudly on orphans
  (``build_dataset_paths``, reference pipeline/utils.py:27-85).

At scale this is the canonical Spark pattern: deterministic output path
keyed by the logical plan, atomic parquet commit (the ``_SUCCESS`` marker is
written by Spark's commit protocol), and readers that only ever see
fully-committed data.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Sequence
from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcardia_data_spark.plans.fingerprint import cache_name


class CacheState(Enum):
    ABSENT = "absent"
    PARTIAL = "partial"  # directory exists but no _SUCCESS → broken build
    COMPLETE = "complete"


def cache_state(path: str) -> CacheState:
    """C2 tri-state (reference reformat.py:21-77 returns {-1, 0, 1})."""
    if not os.path.isdir(path):
        return CacheState.ABSENT
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return CacheState.COMPLETE
    return CacheState.PARTIAL


def materialize(
    spark: SparkSession,
    build: Callable[[], DataFrame],
    cache_root: str,
    spec: dict,
    subjects: list[str] | None = None,
    overwrite: bool = False,
    partition_by: Sequence[str] = (),
) -> tuple[str, bool]:
    """C1 — cache-or-build. Returns (path, was_built).

    ``build`` is only invoked on a miss — a cache hit costs one existence
    check (reference dataset_cacher.py:74-76). Partial outputs from a
    crashed run are deleted and rebuilt (C2 repair, reference
    reformat.py:7-18 ``remove_folder``).
    """
    path = os.path.join(cache_root, cache_name(spec, subjects))
    state = cache_state(path)
    if state is CacheState.COMPLETE and not overwrite:
        return path, False
    if state is CacheState.PARTIAL:
        shutil.rmtree(path)

    writer = build().write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path, True


def read_cache(spark: SparkSession, path: str) -> DataFrame:
    if cache_state(path) is not CacheState.COMPLETE:
        raise FileNotFoundError(f"no complete cache at {path}")
    return spark.read.parquet(path)


def route_splits(
    records: DataFrame,
    split_assignment: DataFrame,
    on: Sequence[str],
    fail_on_orphans: bool = True,
) -> DataFrame:
    """C3 — attach ``split`` to every record by subject membership; a record
    whose subject is in no split is an orphan (reference
    pipeline/utils.py:71-72 raises). Broadcast join: the assignment table is
    subjects-sized, records are the big side and never shuffle."""
    routed = records.join(F.broadcast(split_assignment), on=list(on), how="left")
    if fail_on_orphans:
        n_orphans = routed.filter(F.col("split").isNull()).count()
        if n_orphans:
            raise ValueError(f"{n_orphans} records belong to no split")
    return routed
