"""Random augmentations + invertible resampling (SURVEY §2.9 F6-F9, §2.13).

The reference's augmentation stack is MONAI MapTransforms with a sequential
per-process RNG (``RandResample2Dd``, reference transforms/resampler.py:
12-144; ``RandSolarized``, transforms/intensity.py:134-165). Two engine
rules replace that design (SURVEY §7.3):

1. **Key-derived randomness**: every draw is ``keyed_uniform(seed, row_key,
   op_id)`` — a pure column expression. Retried tasks reproduce the same
   draw; two pipelines sharing (seed, key) see the same draw (which is what
   the reference's ``RandChangeSeedd`` seed-sync hack tried to achieve).
2. **No hidden state**: the invertible resample returns (data, trace) and
   ``inverse_resample_2d`` consumes the trace column explicitly — MONAI
   hides the trace inside the record (resampler.py:176,191); here it is a
   first-class column.

Elementwise intensity augs are pure SQL (codegen); only the geometric
resample drops to an Arrow-batched pandas UDF (numpy bilinear sampling) —
the genuinely non-relational kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# keyed randomness (SQL-side, retry-safe)
# ---------------------------------------------------------------------------

_HEX_DIGITS = 13  # 13 hex digits = 52 bits < double's 53-bit mantissa


def keyed_uniform(seed, op_id: str, *key_cols: Column) -> Column:
    """U(0,1) draw as a pure function of (seed, op_id, row key): the first
    52 bits of md5 scaled to [0,1). Deterministic across retries/engines."""
    parts = [F.lit(str(seed)), F.lit(op_id)] + [c.cast("string") for c in key_cols]
    h = F.md5(F.concat_ws("|", *parts))
    return F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("double") / F.lit(
        float(16 ** _HEX_DIGITS)
    )


def rand_solarize(
    arr: Column, key: Column, threshold: float = 0.5, prob: float = 0.5, seed=0,
) -> Column:
    """F6 — with probability ``prob``, invert values above ``threshold``
    w.r.t. the record max (``RandSolarized``, reference intensity.py:134-165).
    The coin flip is keyed; both branches are pure SQL."""
    a = arr.cast("array<double>")
    mx = F.array_max(a)
    solarized = F.transform(a, lambda e: F.when(e > threshold, mx - e).otherwise(e))
    return F.when(keyed_uniform(seed, "solarize", key) < prob, solarized).otherwise(a)


def rand_intensity_scale_shift(
    arr: Column, key: Column, scale_range: float = 0.1, shift_range: float = 0.1, seed=0,
) -> Column:
    """F9 — multiplicative scale + additive shift with keyed draws
    (MONAI RandScaleIntensityd/RandShiftIntensityd wiring, reference
    pipeline/compose.py:168-204)."""
    a = arr.cast("array<double>")
    u1 = keyed_uniform(seed, "scale", key)
    u2 = keyed_uniform(seed, "shift", key)
    scale = 1.0 + (u1 - 0.5) * 2.0 * scale_range
    shift = (u2 - 0.5) * 2.0 * shift_range
    return F.transform(a, lambda e: e * scale + shift)


def rand_gamma(arr: Column, key: Column, gamma_range=(0.7, 1.5), seed=0) -> Column:
    """F9 — gamma contrast on a [0,1]-normalized array, keyed draw
    (RandAdjustContrastd wiring, compose.py:190-204)."""
    a = arr.cast("array<double>")
    u = keyed_uniform(seed, "gamma", key)
    gamma = gamma_range[0] + u * (gamma_range[1] - gamma_range[0])
    return F.transform(a, lambda e: F.pow(F.greatest(e, F.lit(0.0)), gamma))


def rand_gaussian_noise(arr: Column, key: Column, std: float = 0.05, seed=0) -> Column:
    """F9 — additive Gaussian noise; per-element normal draws via
    Box-Muller over two keyed uniforms derived from (key, element index).
    Pure SQL — noise is reproducible per element under retry."""
    a = arr.cast("array<double>")
    n = F.size(a)
    idx = F.sequence(F.lit(0), n - 1)

    def noise(i: Column) -> Column:
        u1 = keyed_uniform(seed, "gn1", key, i)
        u2 = keyed_uniform(seed, "gn2", key, i)
        # Box-Muller; clamp u1 away from 0
        return F.sqrt(-2.0 * F.log(F.greatest(u1, F.lit(1e-12)))) * F.cos(
            2.0 * float(np.pi) * u2
        )

    return F.zip_with(a, idx, lambda e, i: e + noise(i) * std)


# ---------------------------------------------------------------------------
# invertible 2-D affine resample (pandas UDF; explicit trace column)
# ---------------------------------------------------------------------------

TRACE_FIELDS = StructType([
    StructField("matrix", ArrayType(DoubleType())),  # row-major 3×3 target→source
    StructField("src_h", IntegerType()),
    StructField("src_w", IntegerType()),
])

RESAMPLED_SCHEMA = StructType([
    StructField("pixels", ArrayType(FloatType())),
    StructField("trace", TRACE_FIELDS),
])


def compose_affine(
    rotate_rad: float = 0.0, scale: float = 1.0, translate: tuple[float, float] = (0.0, 0.0),
    flip_x: bool = False,
) -> np.ndarray:
    """Pure-math 3×3 matrix compose: flip ∘ rotate ∘ scale ∘ translate in
    center-origin normalized coords (the reference composes the same chain,
    ``get_transformation_matrix``, resampler.py:115-130; matrices in
    transforms/transformation_matrices.py:4-43)."""
    c, s = float(np.cos(rotate_rad)), float(np.sin(rotate_rad))
    rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    sc = np.diag([1.0 / scale, 1.0 / scale, 1.0])
    tr = np.array([[1.0, 0.0, -translate[0]], [0.0, 1.0, -translate[1]], [0.0, 0.0, 1.0]])
    fl = np.diag([-1.0 if flip_x else 1.0, 1.0, 1.0])
    return fl @ rot @ sc @ tr


def _bilinear_sample(img: np.ndarray, mat: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Sample ``img`` at target-grid coords mapped through ``mat``
    (target→source, center-origin normalized to [-1, 1]); zero padding."""
    ys, xs = np.meshgrid(np.arange(out_h), np.arange(out_w), indexing="ij")
    # normalize to [-1, 1] center-origin
    tx = (xs + 0.5) / out_w * 2.0 - 1.0
    ty = (ys + 0.5) / out_h * 2.0 - 1.0
    coords = np.stack([tx.ravel(), ty.ravel(), np.ones(out_h * out_w)])
    sx, sy, _ = mat @ coords
    h, w = img.shape
    fx = (sx + 1.0) / 2.0 * w - 0.5
    fy = (sy + 1.0) / 2.0 * h - 0.5
    x0, y0 = np.floor(fx).astype(int), np.floor(fy).astype(int)
    wx, wy = fx - x0, fy - y0

    def at(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        out = np.zeros_like(fx)
        out[valid] = img[yy[valid], xx[valid]]
        return out

    top = at(y0, x0) * (1 - wx) + at(y0, x0 + 1) * wx
    bot = at(y0 + 1, x0) * (1 - wx) + at(y0 + 1, x0 + 1) * wx
    return (top * (1 - wy) + bot * wy).reshape(out_h, out_w)


def resample_2d_udf(out_h: int, out_w: int):
    """F7/F8 forward — Arrow-batched pandas UDF:
    (pixels, h, w, rotate, scale, tx, ty, flip) → struct(pixels, trace).

    The caller feeds keyed_uniform-derived parameter columns, so the
    augmentation is random-per-row yet reproducible. The returned trace
    (matrix + source shape) makes the op invertible with no hidden state.
    """

    @F.pandas_udf(RESAMPLED_SCHEMA)
    def fwd(
        pixels: pd.Series, h: pd.Series, w: pd.Series,
        rot: pd.Series, scale: pd.Series, tx: pd.Series, ty: pd.Series,
        flip: pd.Series,
    ) -> pd.DataFrame:
        out_pixels, traces = [], []
        for px, hh, ww, r, s, dx, dy, fl in zip(pixels, h, w, rot, scale, tx, ty, flip):
            img = np.asarray(px, dtype=np.float64).reshape(int(hh), int(ww))
            mat = compose_affine(float(r), float(s), (float(dx), float(dy)), bool(fl))
            res = _bilinear_sample(img, mat, out_h, out_w)
            out_pixels.append(res.ravel().astype(np.float32).tolist())
            traces.append({
                "matrix": mat.ravel().tolist(),
                "src_h": int(hh),
                "src_w": int(ww),
            })
        return pd.DataFrame({"pixels": out_pixels, "trace": traces})

    return fwd


def inverse_resample_2d_udf():
    """F8 inverse — replay the trace backwards: sample the resampled image
    through ``matrix⁻¹`` onto the original grid (reference
    ``PredictionResample3Dd.inverse``, resampler.py:147-212)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def inv(pixels: pd.Series, h: pd.Series, w: pd.Series, trace: pd.DataFrame) -> pd.Series:
        out = []
        for px, hh, ww, tr in zip(pixels, h, w, trace.itertuples(index=False)):
            img = np.asarray(px, dtype=np.float64).reshape(int(hh), int(ww))
            mat = np.linalg.inv(np.asarray(tr.matrix, dtype=np.float64).reshape(3, 3))
            res = _bilinear_sample(img, mat, int(tr.src_h), int(tr.src_w))
            out.append(res.ravel().astype(np.float32).tolist())
        return pd.Series(out)

    return inv
