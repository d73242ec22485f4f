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


# ---------------------------------------------------------------------------
# weighted_reservoir (A-Res)
# ---------------------------------------------------------------------------


def test_weighted_reservoir_matches_pure_python(spark):
    """Exact replica: the Spark top-k by ln(u)/w must equal a pure-Python
    A-Res over the same keyed uniforms."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from qcardia_data_spark.operators.sampling import weighted_reservoir

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")

    def u(i):
        h = hashlib.md5(f"9|ares|{i}".encode()).hexdigest()
        return int(h[:13], 16) / float(16**13)

    want = sorted(rows, key=lambda r: (-(math.log(u(r[0])) / r[1]), r[0]))[:10]
    got = [
        (r["id"], r["w"])
        for r in weighted_reservoir(df, "id", "w", k=10, seed=9).collect()
    ]
    assert got == [(i, w) for i, w in want]


def test_weighted_reservoir_is_weight_proportional(spark):
    """A 1000x-weight row must (with these keyed draws) appear in a small
    sample where uniform sampling would almost surely exclude it."""
    from qcardia_data_spark.operators.sampling import weighted_reservoir

    rows = [(i, 1.0) for i in range(500)] + [(999, 100000.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r["id"] for r in weighted_reservoir(df, "id", "w", k=5, seed=0).collect()}
    assert 999 in got and len(got) == 5


def test_weighted_reservoir_refuses_bad_inputs(spark):
    import pytest as _pytest

    from qcardia_data_spark.operators.sampling import weighted_reservoir

    df = spark.createDataFrame([(1, 0.0)], "id long, w double")
    with _pytest.raises(ValueError, match="non-positive"):
        weighted_reservoir(df, "id", "w", k=1)
    with _pytest.raises(ValueError, match="k must be"):
        weighted_reservoir(df, "id", "w", k=0)


def test_weighted_reservoir_plan_is_take_ordered(spark):
    from qcardia_data_spark.operators.sampling import weighted_reservoir

    df = spark.createDataFrame([(i, 1.0) for i in range(50)], "id long, w double")
    plan = (
        weighted_reservoir(df, "id", "w", k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_reservoir_spec_op(spark, sf_dir):
    from qcardia_data_spark.plans.spec import compile_pipeline

    out = compile_pipeline(
        spark,
        [
            {"op": "source", "table": "documents"},
            {"op": "filter", "expr": "n_chars > 0"},
            {"op": "weighted_reservoir", "key": "doc_id",
             "weight": "n_chars", "k": 5, "seed": 3},
        ],
        sf_dir,
    )
    assert out.count() == 5


def test_poisson_bootstrap_distribution_and_determinism(spark):
    """k-multiplicities are deterministic, mean ~ lam, and the truncated
    tail is negligible; different seeds give different resamples."""
    from pyspark.sql import functions as F

    from qcardia_data_spark.operators.sampling import poisson_bootstrap

    df = spark.range(20000).select(F.col("id"))
    b = poisson_bootstrap(df, ["id"], lam=1.0, seed=7)
    stats = b.agg(
        F.avg("boot_k").alias("mean"),
        F.max("boot_k").alias("mx"),
        F.sum((F.col("boot_k") == 0).cast("int")).alias("zeros"),
    ).collect()[0]
    assert abs(stats["mean"] - 1.0) < 0.03        # E[k]=lam
    assert stats["mx"] <= 8                        # truncation bound
    assert abs(stats["zeros"] / 20000 - 0.3679) < 0.02  # P(0)=e^-1
    again = poisson_bootstrap(df, ["id"], lam=1.0, seed=7)
    assert b.collect() == again.collect()          # deterministic
    other = poisson_bootstrap(df, ["id"], lam=1.0, seed=8)
    assert b.collect() != other.collect()          # seed matters


def test_weighted_samplers_have_no_single_task_global_window(spark):
    """r12 review: the group-count/total terms are broadcast 1-row
    aggregates now — no WINDOW runs over an unpartitioned spec (the
    one-task global funnel the old Window.partitionBy() form planned).
    Single-partition exchanges over 1-row aggregate outputs remain, and
    are the allowed driver-small class."""
    import re

    from qcardia_data_spark.operators.sampling import (
        weighted_rejection_sample,
        weighted_sample,
    )

    rows = [("g%d" % (i % 4), i) for i in range(100)]
    df = spark.createDataFrame(rows, ["g", "k"])

    # equalizer: the only window is the per-group rank — partitioned by g
    plan = weighted_sample(
        df, ["g"], "k", 20, seed=1
    )._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan[:1500]
    assert all(s.lstrip().startswith("g#") for s in specs), specs

    # rejection sampler: no window at all (joins + broadcast aggregates)
    plan2 = weighted_rejection_sample(
        df, ["g"], "k", seed=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition" not in plan2, plan2[:1500]


def test_weighted_rejection_sample_keeps_null_groups_and_column_order(spark):
    """ADVICE r12 (medium): the r12 rewrite joined group counts back with
    a plain equi-join, which silently DROPPED every NULL-group row (the
    old Window.partitionBy form treated NULL as a legitimate group, and
    the sibling weighted_sample still does). The join is null-safe now;
    this pins (a) NULL-group rows survive at the same accept rate as any
    other group of their size, and (b) the output schema keeps the
    caller's column order (the equi-join had moved group keys first)."""
    from qcardia_data_spark.operators.sampling import weighted_rejection_sample

    rows = [(("g%d" % (i % 2)) if i % 3 else None, i) for i in range(300)]
    df = spark.createDataFrame(rows, ["g", "k"]).select("k", "g")  # k first

    out = weighted_rejection_sample(df, ["g"], "k", accept_scale=1.0, seed=3)
    assert out.columns == ["k", "g"], out.columns
    got = out.collect()
    null_in = sum(1 for g, _ in rows if g is None)
    null_out = sum(1 for r in got if r["g"] is None)
    # 100 NULL-group rows vs 100-row named groups: all three groups have
    # equal counts, so accept_scale=1.0 keeps EVERY row — any drop of the
    # NULL group is the silent-loss bug.
    assert null_in == 100 and null_out == 100, (null_in, null_out)
    assert len(got) == 300


def test_seeded_split_scale_safe_equals_window_form(spark):
    """r12 (the cumulative_sum key-granularity pattern, extended to the
    split primitive): the default seeded_split ranks through one
    unpartitioned window — a single-task sort over the whole subject
    frame. scale_safe=True computes the identical assignment via the
    two-phase distributed prefix rank; this pins assignment equality and
    the distributed plan shape."""
    from qcardia_data_spark.operators.windows import seeded_split

    subjects = spark.createDataFrame(
        [("s%04d" % i,) for i in range(500)], ["subject_id"]
    )
    want = {
        r["subject_id"]: r["split"]
        for r in seeded_split(subjects, "subject_id", 0.25, seed="sw").collect()
    }
    ss = seeded_split(
        subjects, "subject_id", 0.25, seed="sw", scale_safe=True,
        num_ranges=8,
    )
    got = {r["subject_id"]: r["split"] for r in ss.collect()}
    assert got == want
    assert sum(v == "valid" for v in got.values()) == 125

    # plan shape: the only row_number windows are per range-split (the
    # local phase); no unpartitioned data window remains (the ≤num_ranges
    # subtotal window is the allowed driver-small class)
    plan = ss._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" in plan, plan[:1500]
