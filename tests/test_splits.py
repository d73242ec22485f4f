"""Split resolution tests mirroring the reference's semantics
(data_split.py): dev = all − test, overlap exclusion from both sides,
seeded determinism, explicit-list fast path with leak detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qcardia_data_spark import splits as SP


@pytest.fixture()
def subject_frames(spark):
    mm1 = spark.createDataFrame(
        [(f"m1-{i:03d}", p) for i, p in enumerate(["NOR", "HCM", "DCM", "LV", "ARV"] * 8)],
        ["subject_id", "Pathology"],
    )
    mm2 = spark.createDataFrame(
        [(f"m2-{i:03d}", p) for i, p in enumerate(["NOR", "HCM", "LV", "FALL", "CIA"] * 4)],
        ["subject_id", "Pathology"],
    )
    return mm1, mm2


def test_overlap_detection(spark, subject_frames):
    mm1, mm2 = subject_frames
    # mm2 subjects whose pathology also exists in mm1 → NOR/HCM/LV rows
    ov = SP.overlap_subjects(mm2, mm1.select("Pathology"))
    assert ov.count() == 12  # 3 shared pathologies × 4 repeats
    got = {r["subject_id"] for r in ov.collect()}
    assert all(int(s.split("-")[1]) % 5 in (0, 1, 2) for s in got)


def test_resolve_split_partitions_and_determinism(spark, subject_frames):
    mm1, _ = subject_frames
    subjects = mm1.select("subject_id")
    test = subjects.filter(F.col("subject_id") < "m1-008")
    out1 = SP.resolve_split(subjects, test, "subject_id", 0.25, seed="s1")
    SP.assert_disjoint(out1, "subject_id")
    counts = {r["split"]: r["n"] for r in out1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["test"] == 8
    assert counts["valid"] == round(32 * 0.25)
    assert counts["train"] == 32 - round(32 * 0.25)
    out2 = SP.resolve_split(subjects, test, "subject_id", 0.25, seed="s1")
    assert {tuple(r) for r in out1.collect()} == {tuple(r) for r in out2.collect()}
    out3 = SP.resolve_split(subjects, test, "subject_id", 0.25, seed="s2")
    assert {tuple(r) for r in out1.collect()} != {tuple(r) for r in out3.collect()}


def test_resolve_split_with_overlap_exclusion(spark, subject_frames):
    mm1, mm2 = subject_frames
    both = mm1.select("subject_id").union(mm2.select("subject_id"))
    test = mm2.select("subject_id").filter(F.col("subject_id") >= "m2-015")
    overlap = SP.overlap_subjects(mm2, mm1.select("Pathology"))
    out = SP.resolve_split(both, test, "subject_id", 0.2, seed=3, exclude=overlap)
    assigned = {r["subject_id"] for r in out.collect()}
    excluded = {r["subject_id"] for r in overlap.collect()}
    assert assigned.isdisjoint(excluded)  # removed from BOTH dev and test
    assert out.count() == 60 - len(excluded)


def test_split_from_lists_leak_detection(spark):
    ok = SP.split_from_lists(spark, ["a", "b"], ["c"], ["d"])
    assert ok.count() == 4
    with pytest.raises(ValueError, match="multiple splits: \\['b'\\]"):
        SP.split_from_lists(spark, ["a", "b"], ["b"], ["d"])


def test_subject_kfold_balanced_and_leakfree(spark, sf_dir):
    import os as _os

    from qcardia_data_spark.operators.sampling import subject_kfold

    o = spark.read.parquet(_os.path.join(sf_dir, "orders.parquet"))
    out = subject_kfold(o, "o_custkey", k=4, seed="cv")
    # leak-free: every subject maps to exactly one fold
    per_subj = out.groupBy("o_custkey").agg(F.countDistinct("fold").alias("nf"))
    assert per_subj.filter(F.col("nf") != 1).count() == 0
    # balanced: subject counts per fold differ by at most one
    sizes = [r["n"] for r in out.select("o_custkey", "fold").distinct()
             .groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(sizes) == 4 and max(sizes) - min(sizes) <= 1
    # deterministic under same seed
    again = subject_kfold(o, "o_custkey", k=4, seed="cv")
    a = {(r["o_custkey"], r["fold"]) for r in out.select("o_custkey", "fold").distinct().collect()}
    b = {(r["o_custkey"], r["fold"]) for r in again.select("o_custkey", "fold").distinct().collect()}
    assert a == b

    import pytest

    with pytest.raises(ValueError, match="k >= 2"):
        subject_kfold(o, "o_custkey", k=1)
