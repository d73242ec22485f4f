"""Tests for F11 (smallest enclosing circle), F18 (hist equalize), the
Compose analog, and faithful weighted rejection sampling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.functions.compose import ComposeError, apply_composed, compose_transforms
from qcardia_data_spark.functions.geometry import (
    histogram_equalize,
    label_circle_udf,
    smallest_enclosing_circle,
)
from qcardia_data_spark.operators.sampling import weighted_rejection_sample


# --- Welzl (local function first, then the UDF) ----------------------------
def test_welzl_known_cases():
    assert smallest_enclosing_circle([]) is None
    assert smallest_enclosing_circle([(2, 3)]) == (2, 3, 0)
    cx, cy, r = smallest_enclosing_circle([(0, 0), (4, 0)])
    assert (cx, cy, r) == (2, 0, 2)
    # unit square → circumcircle radius √2/2 at center
    cx, cy, r = smallest_enclosing_circle([(0, 0), (1, 0), (0, 1), (1, 1)])
    assert (cx, cy) == pytest.approx((0.5, 0.5))
    assert r == pytest.approx(np.sqrt(2) / 2)
    # interior points don't change the circle
    cx2, cy2, r2 = smallest_enclosing_circle([(0, 0), (1, 0), (0, 1), (1, 1), (0.5, 0.5)])
    assert (cx2, cy2, r2) == pytest.approx((cx, cy, r))


def test_welzl_encloses_random_points():
    rng = np.random.RandomState(0)
    pts = [tuple(p) for p in rng.rand(60, 2) * 10]
    cx, cy, r = smallest_enclosing_circle(pts)
    d = [np.hypot(x - cx, y - cy) for x, y in pts]
    assert max(d) <= r + 1e-7
    assert max(d) >= r - 1e-6  # tight: some point on the boundary


def test_label_circle_udf(spark):
    img = np.zeros((8, 8), dtype=np.float32)
    img[3, 2] = 1.0  # (x=2, y=3)
    img[3, 6] = 1.0  # (x=6, y=3) → circle center (4,3) r=2
    df = spark.createDataFrame([(img.ravel().tolist(), 8, 8)], ["pixels", "h", "w"])
    circ = label_circle_udf()
    out = df.select(circ("pixels", "h", "w").alias("c")).collect()[0]["c"]
    assert (out["cx"], out["cy"], out["radius"]) == pytest.approx((4.0, 3.0, 2.0))
    # empty label → NULLs
    empty = spark.createDataFrame([([0.0] * 64, 8, 8)], ["pixels", "h", "w"])
    out2 = empty.select(circ("pixels", "h", "w").alias("c")).collect()[0]["c"]
    assert out2["cx"] is None and out2["radius"] is None


def test_histogram_equalize_uniformizes(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0, 10.0],)], ["arr"])
    out = df.select(histogram_equalize(F.col("arr")).alias("e")).collect()[0]["e"]
    assert out == [0.25, 0.75, 0.75, 1.0]  # rank-CDF values


# --- Compose ---------------------------------------------------------------
def test_compose_chain_and_pruning(spark):
    stages = [
        {"t": "floor_to_zero"},
        {"t": "normalize", "target_min": 0.0, "target_max": 1.0},
        {"t": "gaussian_noise", "std": 0.5, "prob": 0},        # pruned: prob 0
        {"t": "solarize", "enabled": False},                   # pruned: disabled
        {"t": "clamp", "lo": 0.0, "hi": 0.5},
    ]
    df = spark.createDataFrame([("k1", [2.0, 4.0, 6.0])], ["k", "arr"])
    out = apply_composed(df, stages, "arr", "k").collect()[0]["arr"]
    # floor → [0,2,4]; normalize → [0,.5,1]; clamp(0,.5) → [0,.5,.5]
    assert out == [0.0, 0.5, 0.5]


def test_compose_determinism_with_random_stages(spark):
    stages = [{"t": "scale_shift", "seed": 9}, {"t": "gamma", "seed": 9}]
    df = spark.createDataFrame([(f"k{i}", [0.2, 0.5, 0.8]) for i in range(10)], ["k", "arr"])
    a = {r["k"]: r["arr"] for r in apply_composed(df, stages, "arr", "k").collect()}
    b = {r["k"]: r["arr"] for r in apply_composed(df, stages, "arr", "k").collect()}
    assert a == b  # same seed+key → same augmentation
    assert len({tuple(v) for v in a.values()}) > 1  # but varies across keys


def test_compose_unknown_stage_fails_at_build(spark):
    with pytest.raises(ComposeError, match="unknown transform"):
        compose_transforms([{"t": "nope"}])


# --- weighted rejection sampling ------------------------------------------
def test_weighted_rejection_balances_groups(spark):
    # 900 'common' rows vs 100 'rare' rows → accepted counts roughly equal
    rows = [("common", i) for i in range(900)] + [("rare", i + 1000) for i in range(100)]
    df = spark.createDataFrame(rows, ["g", "k"])
    out = weighted_rejection_sample(df, ["g"], "k", accept_scale=0.9, seed=1)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts["rare"] == pytest.approx(90, abs=12)
    assert counts["common"] == pytest.approx(90, abs=25)
    # deterministic
    out2 = weighted_rejection_sample(df, ["g"], "k", accept_scale=0.9, seed=1)
    assert {r["k"] for r in out.collect()} == {r["k"] for r in out2.collect()}


def test_overlay_rgb_matches_reference_mask_loop(spark):
    """F19 golden check: the zip_with color-table lookup must equal the
    reference's per-class disjoint-mask accumulation loop
    (visualization/utils.py:28-36), reimplemented here in numpy."""
    import numpy as np
    from pyspark.sql import functions as F

    from qcardia_data_spark.functions.arrays import OVERLAY_COLORS, overlay_rgb

    rng = np.random.RandomState(7)
    img = np.round(rng.uniform(0, 1, size=16), 6)
    lbl = rng.randint(0, 8, size=16)
    alpha = 0.5

    # reference semantics: sum disjoint class masks, then blend
    colors = np.array(OVERLAY_COLORS)
    colored = np.zeros((16, 3))
    for class_nr in range(1, 8):
        mask = (lbl == class_nr).astype(float)[:, None]
        colored += mask * colors[class_nr - 1][None, :]
    colored = np.clip(colored, 0.0, 1.0)
    filt = 1.0 - colored.max(axis=1, keepdims=True) * alpha
    expected = np.clip(img[:, None] * filt + colored * alpha, 0.0, 1.0)

    df = spark.createDataFrame(
        [(img.tolist(), [int(x) for x in lbl])], "img array<double>, lbl array<int>"
    ).select(overlay_rgb(F.col("img"), F.col("lbl"), alpha).alias("rgb"))
    row = df.collect()[0]["rgb"]
    got = np.stack([row["r"], row["g"], row["b"]], axis=1)
    assert np.allclose(got, expected, atol=1e-12)


def test_histogram_equalize_table_matches_column_form(spark):
    """The O(n log n) row form must produce exactly the column form's CDF
    values, element-aligned, on arbitrary arrays (ties included)."""
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.integers(0, 20, size=rng.integers(1, 40))])
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, ["rid", "arr"])
    from qcardia_data_spark.functions.geometry import histogram_equalize_table

    col_form = {
        r["rid"]: r["e"]
        for r in df.select("rid", histogram_equalize(F.col("arr")).alias("e")).collect()
    }
    row_form = {
        r["rid"]: r["equalized"]
        for r in histogram_equalize_table(df, "rid", "arr").collect()
    }
    assert col_form.keys() == row_form.keys()
    for k in col_form:
        assert col_form[k] == pytest.approx(row_form[k], abs=1e-12)


def test_histogram_equalize_table_image_scale(spark):
    """A 256×256 record (65k elements) — the column form's 4×10⁹-comparison
    domain — must equalize in engine time, not quadratic time, and come back
    a valid CDF (sorted ranks in (0, 1], max exactly 1)."""
    import time

    rng = np.random.default_rng(11)
    img = [float(x) for x in rng.integers(0, 256, size=256 * 256)]
    df = spark.createDataFrame([(0, img)], ["rid", "arr"])
    from qcardia_data_spark.functions.geometry import histogram_equalize_table

    t0 = time.perf_counter()
    out = histogram_equalize_table(df, "rid", "arr").collect()[0]["equalized"]
    elapsed = time.perf_counter() - t0
    assert len(out) == 256 * 256
    assert max(out) == pytest.approx(1.0)
    assert min(out) > 0.0
    # rank of each element must equal count(x <= e) computed by numpy
    a = np.asarray(img)
    want = np.searchsorted(np.sort(a), a, side="right") / a.size
    assert np.allclose(np.asarray(out), want)
    assert elapsed < 30  # seconds — the quadratic form would take hours


def test_histogram_equalize_table_keeps_null_and_empty_records(spark):
    """NULL/empty arrays must not vanish (left join back): empty → empty
    result, NULL → NULL, matching the column form's record count."""
    from qcardia_data_spark.functions.geometry import histogram_equalize_table

    df = spark.createDataFrame(
        [(1, [3.0, 1.0]), (2, []), (3, None)],
        "rid int, arr array<double>",
    )
    got = {r["rid"]: r["equalized"] for r in histogram_equalize_table(df, "rid", "arr").collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == pytest.approx([1.0, 0.5])
    assert got[2] == []
    assert got[3] is None
