"""Array/tensor math as higher-order SQL functions (SURVEY §2.9, F1-F22).

The reference applies these per-record with torch (MapTransforms); here each
is a JVM-side expression over ``array<T>`` columns — no Python in the hot
path, fully codegen'd, and oracle-checkable.

All lambdas cast elements to double FIRST so arithmetic order and precision
are identical across engines (float32 inputs convert exactly to float64).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(arr: Column) -> Column:
    return arr.cast("array<double>")


def literal_double_array(values) -> Column:
    """ONE-round-trip plan literal for a (possibly nested) list of finite
    doubles. ``F.lit(<python list>)`` expands client-side into one py4j
    JVM round trip per ELEMENT (a 6×64 hyperplane sign matrix = 384 round
    trips ≈ 0.25 s of pure driver latency PER CALL — the r15 build-time
    profile measured four such calls as HALF of sim_ann_join's timed
    wall); a single ``F.expr`` parse builds the identical
    CreateArray/Literal(double) tree in one round trip. ``repr()`` emits
    the shortest decimal string that round-trips the IEEE double and the
    SQL parser reads it back with Java's correctly-rounded parse, so
    every value is bit-identical to the F.lit form. Non-finite values
    (nan/inf have no SQL literal) and EMPTY lists (SQL ``array()`` types
    as array<string>, diverging from the F.lit form — VERDICT r15
    hardening) fall back to F.lit."""
    import math

    def fmt(v) -> str:
        if isinstance(v, (list, tuple)):
            if len(v) == 0:
                raise ValueError("empty list — SQL array() would type as array<string>")
            return "array(" + ",".join(fmt(x) for x in v) + ")"
        f = float(v)
        if not math.isfinite(f):
            raise ValueError("non-finite")
        return repr(f) + "D"

    try:
        return F.expr(fmt(values))
    except ValueError:
        return F.lit(values)


def floor_to_zero(arr: Column) -> Column:
    """F2 — ``x - min(x)`` per record (``ProcessIntensityd``,
    reference transforms/utils.py:36-53)."""
    a = _d(arr)
    return F.transform(a, lambda e: e - F.array_min(a))


def standardize(arr: Column, mean: Column | None = None, std: Column | None = None) -> Column:
    """F3 — ``(x-μ)/σ`` with stats from saved meta columns or recomputed from
    the record (``StandardizeIntensityd``, reference transforms/intensity.py:8-42:
    stats source = meta dict if present else current tensor)."""
    a = _d(arr)
    n = F.size(a).cast("double")
    mu = mean.cast("double") if mean is not None else F.aggregate(a, F.lit(0.0), lambda acc, e: acc + e) / n
    # sample std (ddof=0 in torch default is population; reference uses
    # tensor.std() = sample). Use population here; callers pick.
    var = F.aggregate(a, F.lit(0.0), lambda acc, e: acc + (e - mu) * (e - mu)) / n
    sigma = std.cast("double") if std is not None else F.sqrt(var)
    return F.transform(a, lambda e: (e - mu) / sigma)


def minmax_normalize(
    arr: Column, target_min: float = 0.0, target_max: float = 1.0,
    source_min: Column | None = None, source_max: Column | None = None,
) -> Column:
    """F4 — rescale to [target_min, target_max] from a saved/current source
    range (``NormalizeIntensityd``, reference transforms/intensity.py:45-99)."""
    a = _d(arr)
    lo = source_min.cast("double") if source_min is not None else F.array_min(a)
    hi = source_max.cast("double") if source_max is not None else F.array_max(a)
    span = hi - lo
    scale = F.lit(target_max - target_min)
    return F.transform(a, lambda e: (e - lo) / span * scale + F.lit(target_min))


def clamp(arr: Column, lo: Column, hi: Column) -> Column:
    """F5 — clip to [lo, hi] (``ClampIntensityd``,
    reference transforms/intensity.py:102-131)."""
    a = _d(arr)
    return F.transform(a, lambda e: F.least(F.greatest(e, lo.cast("double")), hi.cast("double")))


def one_hot(label: Column, num_classes: int) -> Column:
    """F10 — integer label → n-class one-hot array (``AsDiscreted`` use,
    reference pipeline/compose.py:226-233)."""
    return F.array(*[
        F.when(label == F.lit(i), F.lit(1)).otherwise(F.lit(0)) for i in range(num_classes)
    ])


def softmax(arr: Column) -> Column:
    """F20 — softmax over an array (class probabilities from logits,
    reference data_predictor.py:388-391). Max-subtracted for stability."""
    a = _d(arr)
    m = F.array_max(a)
    exps = F.transform(a, lambda e: F.exp(e - m))
    z = F.aggregate(exps, F.lit(0.0), lambda acc, e: acc + e)
    return F.transform(exps, lambda e: e / z)


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision — deterministic
    order of operations (oracle-parity critical for float reductions)."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_d(a), F.lit(0.0), lambda acc, e: acc + e * e))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity via sequential folds (same op order as the DuckDB
    oracle restatement).

    Zero-norm guard (r12 review): the raw quotient is NaN for a zero
    vector, and Spark orders NaN GREATER than every double — one zero
    embedding in a corpus would claim rank 1 of every cosine top-k.
    Zero-norm pairs score -1.0 (worst possible cosine) instead, so they
    rank last; on corpora with no zero vectors the expression is
    value-identical to the raw quotient the oracles replay.

    NULL propagation (ADVICE r12): a NULL embedding must stay NULL — the
    raw quotient propagated it and ``desc`` ordering sorts nulls last, so
    collapsing NULL into the -1.0 arm would silently promote a missing
    vector into a tie with zero vectors. Only a present-but-zero norm
    takes the -1.0 branch."""
    prod = l2_norm(a) * l2_norm(b)
    return (
        F.when(prod > 0, dot(a, b) / prod)
        .when(prod.isNotNull(), F.lit(-1.0))
    )


def array_stats(arr: Column) -> Column:
    """A3-per-record — struct(min, max, mean) over an array column
    (``BuildImageMetaDatad``, reference transforms/utils.py:87-91)."""
    a = _d(arr)
    n = F.size(a).cast("double")
    mean = F.aggregate(a, F.lit(0.0), lambda acc, e: acc + e) / n
    return F.struct(
        F.array_min(a).alias("min_v"),
        F.array_max(a).alias("max_v"),
        mean.alias("mean_v"),
    )


# Class colors 1..7 (reference visualization/utils.py:11-21); class 0 =
# background (no tint). Kept as module data so Spark and the DuckDB oracle
# restatement are generated from the same table.
OVERLAY_COLORS: list[tuple[float, float, float]] = [
    (1.0, 0.0, 0.0),
    (0.0, 1.0, 0.0),
    (0.0, 0.0, 1.0),
    (0.8, 0.0, 1.0),
    (1.0, 0.5, 0.0),
    (1.0, 1.0, 0.0),
    (0.0, 1.0, 1.0),
]


def overlay_rgb(img: Column, lbl: Column, alpha: float) -> Column:
    """F19 — blend a class-colored label map over a grayscale image
    (reference visualization/utils.py:6-36: per-pixel
    ``out = clamp(img * (1 - max_channel(color)*alpha) + color*alpha, 0, 1)``).

    ``img``: array<double> intensities in [0,1]; ``lbl``: array<int> class
    ids, same length, 0 = background. Returns struct(r, g, b) of arrays.
    Pure ``zip_with`` SQL — no UDF; the reference's per-class mask loop
    collapses to a literal color-table lookup because class masks are
    disjoint (labels are argmax'd ints, imshow.py:28)."""
    a = F.lit(float(alpha))
    max_by_class = F.array(*[F.lit(max(c)) for c in OVERLAY_COLORS])

    def channel(ci: int) -> Column:
        colors = F.array(*[F.lit(c[ci]) for c in OVERLAY_COLORS])

        def px(v: Column, l: Column) -> Column:  # noqa: E741
            colored = F.when(l >= 1, F.element_at(colors, l)).otherwise(F.lit(0.0))
            maxc = F.when(l >= 1, F.element_at(max_by_class, l)).otherwise(F.lit(0.0))
            out = v * (F.lit(1.0) - maxc * a) + colored * a
            return F.least(F.greatest(out, F.lit(0.0)), F.lit(1.0))

        return F.zip_with(_d(img), lbl.cast("array<int>"), px)

    return F.struct(channel(0).alias("r"), channel(1).alias("g"), channel(2).alias("b"))


def file_id(dataset: Column, subject: Column, slice_nr: Column, frame_nr: Column) -> Column:
    """F17 — deterministic record file id
    ``{dataset}-{subject}-{slice:02}-{frame:02}`` with ``"__"`` placeholder
    for an absent (NULL) axis (reference dataset_cacher.py:327-363)."""
    pad2 = lambda c: F.coalesce(F.lpad(c.cast("string"), 2, "0"), F.lit("__"))  # noqa: E731
    return F.concat_ws("-", dataset, subject, pad2(slice_nr), pad2(frame_nr))


def fingerprint_md5(sorted_names: Column) -> Column:
    """F16 — MD5 of a comma-joined sorted name list → cache identity
    (reference dataset_cacher.py:103-127). Input: array<string> column."""
    return F.md5(F.array_join(F.array_sort(sorted_names), ","))
