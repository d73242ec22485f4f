"""Config-driven transform composition — the ``build_transform`` analog
(SURVEY §2.13 ``Compose``; reference ``src/qcardia_data/pipeline/compose.py:
26-234``).

The reference assembles an ordered MONAI ``Compose`` from config flags,
pruning disabled stages at build time (compose.py:130-144: the no-aug plan
zeroes every probability). Here the same config shape compiles to an ordered
chain of *column expressions* over (array, key) — a linear logical plan that
Catalyst fuses into one projection. Stages with prob 0 / enabled=False are
dropped at compile time, not evaluated at runtime.

Config example (mirrors data-config.yaml's transform section)::

    [
      {"t": "floor_to_zero"},
      {"t": "normalize", "target_min": 0.0, "target_max": 1.0},
      {"t": "solarize", "prob": 0.3, "threshold": 0.5, "seed": 7},
      {"t": "scale_shift", "scale_range": 0.1, "shift_range": 0.1, "seed": 7},
      {"t": "gamma", "range": [0.7, 1.5], "seed": 7},
      {"t": "gaussian_noise", "std": 0.05, "seed": 7, "enabled": False},
      {"t": "clamp", "lo": 0.0, "hi": 1.0},
    ]
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame

from qcardia_data_spark.functions import arrays as A
from qcardia_data_spark.functions import transforms as TR


class ComposeError(ValueError):
    pass


def _stage(cfg: dict) -> Callable[[Column, Column], Column] | None:
    """Compile one stage config → (arr, key) -> arr, or None if pruned."""
    t = cfg.get("t")
    if cfg.get("enabled") is False or cfg.get("prob") == 0:
        return None  # build-time pruning (reference compose.py:130-144)
    if t == "floor_to_zero":
        return lambda arr, key: A.floor_to_zero(arr)
    if t == "standardize":
        return lambda arr, key: A.standardize(arr)
    if t == "normalize":
        lo, hi = cfg.get("target_min", 0.0), cfg.get("target_max", 1.0)
        return lambda arr, key: A.minmax_normalize(arr, lo, hi)
    if t == "clamp":
        from pyspark.sql import functions as F

        return lambda arr, key: A.clamp(arr, F.lit(cfg["lo"]), F.lit(cfg["hi"]))
    if t == "solarize":
        return lambda arr, key: TR.rand_solarize(
            arr, key, cfg.get("threshold", 0.5), cfg.get("prob", 0.5), cfg.get("seed", 0)
        )
    if t == "scale_shift":
        return lambda arr, key: TR.rand_intensity_scale_shift(
            arr, key, cfg.get("scale_range", 0.1), cfg.get("shift_range", 0.1), cfg.get("seed", 0)
        )
    if t == "gamma":
        return lambda arr, key: TR.rand_gamma(arr, key, tuple(cfg.get("range", (0.7, 1.5))), cfg.get("seed", 0))
    if t == "gaussian_noise":
        return lambda arr, key: TR.rand_gaussian_noise(arr, key, cfg.get("std", 0.05), cfg.get("seed", 0))
    if t == "one_hot":
        return lambda arr, key: A.one_hot(arr, cfg["num_classes"])  # label column
    if t == "softmax":
        return lambda arr, key: A.softmax(arr)
    raise ComposeError(f"unknown transform {t!r}")


def compose_transforms(stages: Sequence[dict]) -> Callable[[Column, Column], Column]:
    """Compile a stage list into one (arr_col, key_col) -> arr_col chain."""
    compiled = [s for s in (_stage(cfg) for cfg in stages) if s is not None]

    def apply(arr: Column, key: Column) -> Column:
        out = arr
        for fn in compiled:
            out = fn(out, key)
        return out

    return apply


def apply_composed(
    df: DataFrame, stages: Sequence[dict], arr_col: str, key_col: str,
    out_col: str | None = None,
) -> DataFrame:
    from pyspark.sql import functions as F

    chain = compose_transforms(stages)
    return df.withColumn(out_col or arr_col, chain(F.col(arr_col), F.col(key_col)))
