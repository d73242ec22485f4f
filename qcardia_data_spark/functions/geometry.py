"""Geometric label metadata (SURVEY §2.9 F11, F18).

- F11 smallest enclosing circle: centroid + radius of the nonzero label
  region → ``gt_center``/``gt_size`` (``BuildLabelMetaDatad``, reference
  transforms/utils.py:129-134, which wraps the public-domain
  ``smallestenclosingcircle`` Welzl implementation). Re-implemented here
  from the published algorithm (Welzl 1991), not copied.
- F18 histogram equalization: CDF remap of intensities
  (``histogram_equalization_np``, reference visualization/utils.py:39-46).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

CIRCLE_SCHEMA = StructType([
    StructField("cx", DoubleType()),
    StructField("cy", DoubleType()),
    StructField("radius", DoubleType()),
])


def _circle_two(a, b):
    cx, cy = (a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0
    r = float(np.hypot(a[0] - b[0], a[1] - b[1])) / 2.0
    return cx, cy, r


def _circumcircle(a, b, c):
    ax, ay = a
    bx, by = b
    cx, cy = c
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if abs(d) < 1e-12:
        return None
    ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay) + (cx**2 + cy**2) * (ay - by)) / d
    uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx) + (cx**2 + cy**2) * (bx - ax)) / d
    return ux, uy, float(np.hypot(ax - ux, ay - uy))


def _in_circle(c, p, eps=1e-9):
    return c is not None and np.hypot(p[0] - c[0], p[1] - c[1]) <= c[2] + eps


def smallest_enclosing_circle(points: list[tuple[float, float]]):
    """Welzl's algorithm, incremental form (O(n) expected). Deterministic:
    points are processed in sorted order rather than shuffled — worst-case
    quadratic but reproducible under retry (engine determinism rule)."""
    pts = sorted(set(map(tuple, points)))
    if not pts:
        return None
    c = (pts[0][0], pts[0][1], 0.0)
    for i, p in enumerate(pts):
        if _in_circle(c, p):
            continue
        c = (p[0], p[1], 0.0)
        for j, q in enumerate(pts[:i]):
            if _in_circle(c, q):
                continue
            c = _circle_two(p, q)
            for k in pts[:j]:
                if _in_circle(c, k):
                    continue
                cc = _circumcircle(p, q, k)
                if cc is not None:
                    c = cc
    return c


def label_circle_udf():
    """F11 — per-record (cx, cy, radius) of the nonzero pixels of a 2-D
    label plane (pixels flattened row-major, h×w)."""

    @F.pandas_udf(CIRCLE_SCHEMA)
    def circ(pixels: pd.Series, h: pd.Series, w: pd.Series) -> pd.DataFrame:
        out = {"cx": [], "cy": [], "radius": []}
        for px, hh, ww in zip(pixels, h, w):
            img = np.asarray(px, dtype=np.float32).reshape(int(hh), int(ww))
            ys, xs = np.nonzero(img)
            c = smallest_enclosing_circle(list(zip(xs.astype(float), ys.astype(float))))
            if c is None:
                out["cx"].append(None), out["cy"].append(None), out["radius"].append(None)
            else:
                out["cx"].append(c[0]), out["cy"].append(c[1]), out["radius"].append(c[2])
        return pd.DataFrame(out)

    return circ


def histogram_equalize(arr, nbins: int = 256):
    """F18 — per-record histogram equalization as a pure column expression:
    rank-based CDF remap (value → fraction of elements ≤ value), the exact
    semantics of cumsum-normalized-histogram interpolation at the sample
    points (reference visualization/utils.py:39-46).

    The nested scan is O(n²) PER RECORD — fine for the short arrays this
    column form is used on, a scale-killer for real images (256×256 ⇒ 4×10⁹
    comparisons per record). For image-sized arrays use
    :func:`histogram_equalize_table`, the O(n log n) row form with identical
    output."""
    a = arr.cast("array<double>")
    n = F.size(a).cast("double")
    return F.transform(
        a,
        lambda e: F.size(F.filter(a, lambda x: x <= e)).cast("double") / n,
    )


def histogram_equalize_table(
    df, id_col: str, arr_col: str, out_col: str = "equalized",
):
    """F18 at image scale: identical semantics to
    :func:`histogram_equalize` (cdf(e) = count(x ≤ e)/n) but O(n log n) per
    record instead of O(n²) — the engine sorts within the rank window
    instead of re-scanning the array per element.

    Shape: posexplode → per-record range-frame count (ties share a rank, so
    the frame IS count(≤)) → reassemble in element order. Two shuffles on
    ``id_col``; each record's elements stay in one partition, so a 256×256
    image costs one 65k-row sort, milliseconds not minutes. Assumes non-null
    elements (image intensities; the column form's null→0 quirk is not
    reproduced)."""
    from pyspark.sql.window import Window

    ex = df.select(
        F.col(id_col),
        F.posexplode(F.col(arr_col).cast("array<double>")).alias("_pos", "_v"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = ex.withColumn("_le", F.count(F.lit(1)).over(w))
    reasm = (
        ranked.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_le"))).alias("_ps"))
        .select(
            F.col(id_col),
            F.transform(
                F.col("_ps"), lambda s: s["_le"].cast("double") / F.size("_ps")
            ).alias(out_col),
        )
    )
    # LEFT join back: posexplode emits nothing for NULL/empty arrays, so an
    # inner join would silently DELETE those records. Match the column
    # form's contract instead: empty array → empty result, NULL → NULL.
    out = df.join(reasm, id_col, "left")
    fixed = F.when(
        F.col(arr_col).isNull(), F.lit(None).cast("array<double>")
    ).otherwise(F.coalesce(F.col(out_col), F.array().cast("array<double>")))
    return out.withColumn(out_col, fixed)
