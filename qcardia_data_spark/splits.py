"""Train/valid/test split resolution — the reference's ``data_split.py``
semantics on Spark (SURVEY §2.10 X1-X3, §2.3 J3, §2.7 U2-U3).

Reference flow (``src/qcardia_data/pipeline/data_split.py:13-86``):

1. If the split file already carries train+valid lists, use them (``:43-49``).
2. Else: development = all subjects − test subjects (anti join, ``:59-63``).
3. Remove cross-dataset *overlap* subjects from both dev and test — mm2
   subjects whose pathology is shared with mm1 (``:64-67`` + ``:89-102``).
4. Seeded shuffle of dev; first ``round(n·p)`` → valid, rest → train
   (``:73-78``).
5. Deterministic output: subjects sorted within each split (``:70-78``).

All subject-level (group) semantics: splits assign *subjects*, never raw
records — records join the assignment afterwards (SURVEY §7.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qcardia_data_spark.operators.joins import anti_join
from qcardia_data_spark.operators.windows import seeded_split


def overlap_subjects(
    subjects: DataFrame, other: DataFrame, on: Sequence[str] = ("Pathology",),
    key: str = "subject_id",
) -> DataFrame:
    """Step 3's overlap set: rows of ``subjects`` whose strata values also
    occur in ``other`` (reference ``:89-102``: mm2 overlap = pathologies
    ∈ {NOR, HCM, LV} shared with mm1). Semi join on the strata columns."""
    strata = other.select(*on).distinct()
    return subjects.join(F.broadcast(strata), on=list(on), how="left_semi").select(key)


def resolve_split(
    subjects: DataFrame,
    test: DataFrame,
    key: str = "subject_id",
    valid_fraction: float = 0.2,
    seed="split",
    exclude: DataFrame | None = None,
) -> DataFrame:
    """Steps 2-5: returns (key, split) with split ∈ {train, valid, test}.

    ``subjects``/``test``/``exclude`` are one-column (``key``) frames.
    Development = subjects − test − exclude; test −= exclude; dev is
    seeded-shuffle split at subject granularity.
    """
    test_keys = test.select(key).distinct()
    dev = anti_join(subjects.select(key).distinct(), test_keys, [key])
    if exclude is not None:
        excl = exclude.select(key).distinct()
        dev = anti_join(dev, excl, [key])
        test_keys = anti_join(test_keys, excl, [key])

    dev_assigned = seeded_split(dev, key, valid_fraction, seed)
    test_assigned = test_keys.withColumn("split", F.lit("test"))
    return dev_assigned.unionByName(test_assigned)


def split_from_lists(
    spark, train: Sequence[str], valid: Sequence[str], test: Sequence[str],
    key: str = "subject_id",
) -> DataFrame:
    """Step 1 fast path: explicit lists from a split file (reference
    ``:43-49``) → assignment frame; duplicates across splits are an error
    (leak detection, stricter than the reference's silent trust)."""
    all_ids = list(train) + list(valid) + list(test)
    if len(set(all_ids)) != len(all_ids):
        dupes = sorted({s for s in all_ids if all_ids.count(s) > 1})
        raise ValueError(f"subjects in multiple splits: {dupes}")
    rows = (
        [(s, "train") for s in train]
        + [(s, "valid") for s in valid]
        + [(s, "test") for s in test]
    )
    return spark.createDataFrame(rows, [key, "split"])


def assert_disjoint(assignment: DataFrame, key: str = "subject_id") -> None:
    """Invariant check: one split per subject (P7-style data-quality gate)."""
    n_bad = (
        assignment.groupBy(key)
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    if n_bad:
        raise ValueError(f"{n_bad} subjects assigned to multiple splits")
