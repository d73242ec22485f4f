"""Volume-op tests (F12/F14/F15, A6/A7) with hand-computable fixtures."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.functions import volumes as V


def test_mask_volume_counts_nonzero(spark):
    df = spark.createDataFrame(
        [("a", [0.0, 1.0, 2.0, 0.0]), ("b", [0.0, 0.0, 0.0, 0.0])], ["k", "m"]
    )
    out = {r["k"]: r["v"] for r in df.select("k", V.mask_volume(F.col("m")).alias("v")).collect()}
    assert out == {"a": 2, "b": 0}


def test_ed_es_selection_with_ties_and_unannotated(spark):
    rows = [
        # subject s: volumes 5, 9, 9, 2, 0 → ED=frame1 (first argmax), ES=frame3
        ("s", 0, 5), ("s", 1, 9), ("s", 2, 9), ("s", 3, 2), ("s", 4, 0),
        # subject t: single annotated frame → ED = ES = 0
        ("t", 0, 4), ("t", 1, 0),
    ]
    df = spark.createDataFrame(rows, ["subject", "frame", "volume"])
    out = {r["subject"]: (r["ed_frame"], r["es_frame"]) for r in V.ed_es_selection(df, "subject", "frame").collect()}
    assert out == {"s": (1, 3), "t": (0, 0)}


def test_border_crop(spark):
    img = np.zeros((6, 7), dtype=np.float32)
    img[2:4, 1:5] = 3.0
    empty = np.zeros((4, 4), dtype=np.float32)
    df = spark.createDataFrame(
        [("a", img.ravel().tolist(), 6, 7), ("b", empty.ravel().tolist(), 4, 4)],
        ["k", "pixels", "h", "w"],
    )
    crop = V.border_crop_udf()
    out = {r["k"]: r["c"] for r in df.select("k", crop("pixels", "h", "w").alias("c")).collect()}
    a = out["a"]
    assert (a["height"], a["width"], a["y0"], a["x0"]) == (2, 4, 2, 1)
    assert all(v == 3.0 for v in a["pixels"])
    b = out["b"]
    assert (b["height"], b["width"], b["y0"], b["x0"]) == (4, 4, 0, 0)


def test_stack_ed_es(spark):
    rows = [
        ("s", f, [float(f)] * 2, 1, 3) for f in range(5)
    ]
    df = spark.createDataFrame(rows, ["subject", "frame", "pixels", "ed_frame", "es_frame"])
    out = V.stack_ed_es(df, "subject", "frame").collect()[0]
    assert out["ed_pixels"] == [1.0, 1.0]
    assert out["es_pixels"] == [3.0, 3.0]


def test_spacing_from_affine(spark):
    # affine with spacings (2, 3, 4): diag block scaled columns
    aff = np.diag([2.0, 3.0, 4.0, 1.0]).ravel().tolist()
    df = spark.createDataFrame([(aff,)], ["affine"])
    out = df.select(V.spacing_from_affine(F.col("affine")).alias("sp")).collect()[0]["sp"]
    assert out == pytest.approx([2.0, 3.0, 4.0])


def test_ensure_4d_shape_is_metadata_only(spark):
    from pyspark.sql import functions as F

    from qcardia_data_spark.functions.volumes import ensure_4d_shape

    df = spark.createDataFrame(
        [([2, 3],), ([2, 3, 4],), ([2, 3, 4, 5],)], "shape array<int>"
    ).select(ensure_4d_shape(F.col("shape")).alias("s"))
    assert [r["s"] for r in df.collect()] == [[2, 3, 1, 1], [2, 3, 4, 1], [2, 3, 4, 5]]


def test_permute_axes_matches_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from qcardia_data_spark.functions.volumes import permute_axes_udf

    rng = np.random.RandomState(4)
    vol = rng.rand(2, 3, 4).astype(np.float32)
    df = spark.createDataFrame(
        [(vol.ravel().tolist(), [2, 3, 4], [2, 0, 1])],
        "pixels array<float>, shape array<int>, perm array<int>",
    )
    p = permute_axes_udf()
    row = df.select(p("pixels", "shape", "perm").alias("o")).collect()[0]["o"]
    exp = vol.transpose(2, 0, 1)
    assert row["shape"] == [4, 2, 3]
    got = np.asarray(row["pixels"], dtype=np.float32).reshape(4, 2, 3)
    assert np.array_equal(got, exp)
