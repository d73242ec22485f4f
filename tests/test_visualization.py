"""Visualization surface test: 3-panel composition + PNG round trip."""
from __future__ import annotations

import numpy as np
import pytest


def test_record_panels_composition_and_png_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from qcardia_data_spark.functions.arrays import OVERLAY_COLORS
    from qcardia_data_spark.sources.png import decode_png
    from qcardia_data_spark.visualization import record_panels, write_panel_pngs

    h, w, n_classes = 4, 5, 3
    rng = np.random.default_rng(5)
    img = rng.random(h * w)
    lbl = rng.integers(0, n_classes + 1, h * w)
    rows = [("s1", "rec_a", [float(x) for x in img], [int(x) for x in lbl], h, w)]
    df = spark.createDataFrame(rows, ["subject", "name", "img", "lbl", "h", "w"])

    panels = record_panels(df, "img", "lbl", "h", "w", n_classes, alpha=0.5)
    out = panels.collect()[0]
    assert (out["panel_h"], out["panel_w"]) == (h, 3 * w)
    arr = np.asarray(out["panel"]).reshape(3, h, 3 * w)

    # left pane: equalized gray, identical across channels
    a = img
    eq = np.searchsorted(np.sort(a), a, side="right") / a.size
    for c in range(3):
        assert np.allclose(arr[c, :, :w], eq.reshape(h, w), atol=1e-9)
    # middle pane: label / n_classes gray
    for c in range(3):
        assert np.allclose(arr[c, :, w:2 * w], (lbl / n_classes).reshape(h, w), atol=1e-9)
    # right pane: the F19 overlay formula over the EQUALIZED image
    colors = np.array(OVERLAY_COLORS)
    for ci in range(3):
        base = eq.reshape(h, w).copy()
        li = lbl.reshape(h, w)
        colored = np.where(li >= 1, colors[li - 1, ci], 0.0)
        maxc = np.where(li >= 1, colors[li - 1].max(axis=-1), 0.0)
        want = np.clip(base * (1 - maxc * 0.5) + colored * 0.5, 0, 1)
        assert np.allclose(arr[ci, :, 2 * w:], want, atol=1e-9)

    # sink: one PNG per record, per-subject folder, decodable, right dims
    write_panel_pngs(panels, str(tmp_path), "subject", "name")
    png = (tmp_path / "s1" / "rec_a.png").read_bytes()
    decoded = decode_png(png)
    assert decoded.shape == (h, 3 * w, 3)
    assert np.array_equal(decoded, (arr.transpose(1, 2, 0) * 255).astype(np.uint8))


def test_record_panels_limit_mirrors_figlimit(spark):
    from qcardia_data_spark.visualization import record_panels

    rows = [
        (f"s{i}", [0.1 * i] * 4, [0] * 4, 2, 2) for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["subject", "img", "lbl", "h", "w"])
    assert record_panels(df, "img", "lbl", "h", "w", 2, limit=4).count() == 4
    assert record_panels(df, "img", "lbl", "h", "w", 2, limit=0).count() == 6
