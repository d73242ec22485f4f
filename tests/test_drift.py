"""Drift statistics (functions/drift.py): PSI / chi-square / exact KS.

Hand-computable fixtures pin the formulas; a pure-Python exact-KS replica
cross-checks the distributed two-level prefix sum (including duplicate
values and skewed bucket occupancy); plan assertions prove the KS cumsum
never collapses to a single-partition global window."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.functions.drift import (
    chi_square_drift,
    ks_statistic,
    psi_buckets,
)


def _df(spark, vals, col="x"):
    return spark.createDataFrame([(float(v),) for v in vals], f"{col} double")


# ---------------------------------------------------------------------------
# PSI
# ---------------------------------------------------------------------------


def test_psi_identical_samples_is_zero(spark):
    a = _df(spark, [1, 2, 3, 10, 20])
    out = psi_buckets(a, a, "x", edges=[5.0]).collect()
    assert sum(r["contrib"] for r in out) == pytest.approx(0.0, abs=1e-9)


def test_psi_hand_computation(spark):
    # A: 3 low, 1 high; B: 1 low, 3 high; edges=[5] -> 2 buckets, smooth=.5
    a, b = _df(spark, [1, 2, 3, 9]), _df(spark, [1, 8, 9, 9])
    out = {r["bucket"]: r for r in psi_buckets(a, b, "x", edges=[5.0]).collect()}
    k, s = 2, 0.5
    for bkt, (na, nb) in {0: (3, 1), 1: (1, 3)}.items():
        pa, pb = (na + s) / (4 + s * k), (nb + s) / (4 + s * k)
        want = round((pa - pb) * math.log(pa / pb), 6)
        assert out[bkt]["n_a"] == na and out[bkt]["n_b"] == nb
        assert out[bkt]["contrib"] == pytest.approx(want, abs=2e-6)


def test_psi_open_ended_buckets_cover_everything(spark):
    a = _df(spark, [-100, 0.5, 100])
    out = psi_buckets(a, a, "x", edges=[0.0, 1.0])
    assert {r["bucket"] for r in out.collect()} == {0, 1, 2}
    assert out.agg(F.sum("n_a")).first()[0] == 3


def test_psi_rejects_unsorted_edges(spark):
    a = _df(spark, [1])
    with pytest.raises(ValueError, match="increasing"):
        psi_buckets(a, a, "x", edges=[2.0, 1.0])
    # duplicate edges create an unreachable bucket index while inflating
    # the Laplace denominator — refused too (r10 review)
    with pytest.raises(ValueError, match="increasing"):
        psi_buckets(a, a, "x", edges=[1.0, 1.0, 5.0])


def test_psi_emits_every_bucket(spark):
    """r10 review: a bucket empty in BOTH samples still contributes its
    Laplace-smoothed term when the totals differ — the output is always
    exactly k = len(edges)+1 rows, whatever the data occupies."""
    a = _df(spark, [0.5] * 4)
    b = _df(spark, [0.5] * 8)
    rows = psi_buckets(a, b, "x", edges=[1.0, 2.0]).collect()
    assert sorted(r["bucket"] for r in rows) == [0, 1, 2]
    by_b = {r["bucket"]: r for r in rows}
    assert by_b[1]["n_a"] == 0 and by_b[1]["n_b"] == 0
    # smoothed contrib of an empty bucket is nonzero for unequal totals
    assert by_b[1]["contrib"] != 0.0


# ---------------------------------------------------------------------------
# chi-square
# ---------------------------------------------------------------------------


def test_chisq_identical_is_zero(spark):
    a = spark.createDataFrame([("p",), ("q",), ("q",)], "x string")
    out = chi_square_drift(a, a, "x").collect()
    assert sum(r["contrib"] for r in out) == pytest.approx(0.0, abs=1e-9)


def test_chisq_hand_computation(spark):
    # a: 10 p, 10 q; b: 15 p, 5 q — classic 2x2
    a = spark.createDataFrame([("p",)] * 10 + [("q",)] * 10, "x string")
    b = spark.createDataFrame([("p",)] * 15 + [("q",)] * 5, "x string")
    out = {r["category"]: r["contrib"] for r in chi_square_drift(a, b, "x").collect()}
    # expected under pooled: p: 25*20/40=12.5 each side; q: 15*20/40=7.5
    want_p = (10 - 12.5) ** 2 / 12.5 * 2
    want_q = (10 - 7.5) ** 2 / 7.5 * 2
    assert out["p"] == pytest.approx(want_p, abs=1e-6)
    assert out["q"] == pytest.approx(want_q, abs=1e-6)


# ---------------------------------------------------------------------------
# exact KS
# ---------------------------------------------------------------------------


def _ks_exact(xs, ys):
    """Pure-Python exact two-sample KS (evaluated at every observed value)."""
    pts = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    return max(
        abs(sum(x <= v for x in xs) / na - sum(y <= v for y in ys) / nb)
        for v in pts
    )


def test_ks_disjoint_supports_is_one(spark):
    a, b = _df(spark, [1, 2, 3]), _df(spark, [10, 11, 12])
    assert ks_statistic(a, b, "x").first()["ks"] == pytest.approx(1.0)


def test_ks_identical_is_zero(spark):
    a = _df(spark, [1, 2, 2, 3])
    assert ks_statistic(a, a, "x").first()["ks"] == pytest.approx(0.0)


def test_ks_matches_pure_python_with_dups_and_skew(spark):
    # heavy duplication + values clustered into few coarse buckets, so
    # in-bucket cumsums and cross-bucket offsets both do real work
    xs = [0, 0, 0, 1, 1, 2, 5, 5, 5, 5, 100]
    ys = [0, 1, 1, 1, 3, 3, 5, 99, 100, 100]
    got = ks_statistic(_df(spark, xs), _df(spark, ys), "x", n_coarse=4).first()
    assert got["ks"] == pytest.approx(round(_ks_exact(xs, ys), 6), abs=1e-6)
    assert (got["n_a"], got["n_b"]) == (len(xs), len(ys))


def test_ks_single_distinct_value(spark):
    # degenerate width (hi == lo) must not divide by zero
    a, b = _df(spark, [7, 7, 7]), _df(spark, [7, 7])
    assert ks_statistic(a, b, "x").first()["ks"] == pytest.approx(0.0)


def test_ks_empty_sample_refuses(spark):
    a = _df(spark, [1])
    b = _df(spark, []).filter("x is not null")
    with pytest.raises(ValueError, match="no non-null"):
        ks_statistic(a, b, "x")


def test_ks_no_single_partition_global_window(spark):
    """The cumsum must ride a PARTITIONED window — a bare global orderBy
    would plan Exchange SinglePartition before the running sum."""
    a = _df(spark, range(100))
    b = _df(spark, range(50, 150))
    out = ks_statistic(a, b, "x", n_coarse=8)
    assert out.first()["ks"] > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the running sum's exchange must hash-partition on the coarse bucket,
    # and the window spec itself must be bucket-partitioned — i.e. the
    # cumsum never requires a global (single-partition) ordering
    assert "hashpartitioning(bucket" in plan
    assert "windowspecdefinition(bucket" in plan


def test_drift_spec_op(spark, sf_dir):
    """Declarative form: events even-half vs odd-half via nested side
    pipelines — all three stats through the spec dialect."""
    from qcardia_data_spark.plans.spec import compile_pipeline

    def _half(parity):
        return [
            {"op": "source", "table": "events"},
            {"op": "filter", "expr": f"event_id % 2 = {parity}"},
        ]

    psi = compile_pipeline(
        spark,
        _half(0)
        + [{"op": "drift", "stat": "psi", "col": "value",
            "against": {"pipeline": _half(1)}, "edges": [10.0, 50.0]}],
        sf_dir,
    )
    assert {r["bucket"] for r in psi.collect()} <= {0, 1, 2}
    ks = compile_pipeline(
        spark,
        _half(0)
        + [{"op": "drift", "stat": "ks", "col": "value",
            "against": {"pipeline": _half(1)}}],
        sf_dir,
    ).first()
    assert 0.0 <= ks["ks"] <= 1.0 and ks["n_a"] > 0
