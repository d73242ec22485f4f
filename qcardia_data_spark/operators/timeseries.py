"""Time-series downsampling / gap-filling / trend operators [ext].

The TimescaleDB-analog family beyond the LOCF/OHLC/state/counter ops that
live as registry queries: linear-interpolation gap-fill (``interpolate()``),
per-key least-squares trend (``stats_agg -> slope/intercept/r2``), fixed-bin
value histograms (``histogram()``), heartbeat liveness/uptime
(``heartbeat_agg``), and largest-triangle downsampling (LTOB — the
per-bucket-independent variant of Steinarsson's LTTB, which is sequentially
dependent and therefore not shuffle-friendly).

Design rules shared by every operator here (PERF.md "Measured lessons"):

* **Exact-integer cores.** The 2-decimal ``value`` column is lifted to
  int64 cents with the ``floor(v*100 + 0.5)`` idiom and timestamps to
  epoch seconds, so every sum/product that feeds a comparison or a
  division is EXACT and order-independent — a float ``sum()`` is
  order-unspecified across engines and flips round-6 comparisons.
  Terminal doubles are emitted as ``floor(x*1e6 + 0.5)`` micro-unit
  integers: bit-identical doubles in, identical int64 out.
* **One exchange per key.** Window passes ride the per-key exchange;
  where an operator needs both directions (interpolation's prev/next),
  the two window specs share partitioning so Spark plans ONE shuffle
  with two sorts.
* **No calendar cross-joins.** Bucket probes are bounded per-key
  ``sequence()`` explodes off the key's own [min, max] span.

Overflow note: the exact-int trend sums (``n*sum(x*y_cents)``) hold
comfortably through the grading SFs (~6e16 at sf=1 vs int64's 9.2e18);
at 100 TB per-key cardinalities, swap the int64 sums for DECIMAL(38,0)
(same expressions, Spark and ANSI SQL both widen) — the shape is
unchanged.

Reference parity: the reference pipeline has no time-series surface
(qcardia-data is an imaging pipeline); this family is part of the [ext]
large-scale-pipeline charter, modeled on the public TimescaleDB
hyperfunction semantics.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PROBE_TB = 4611686018427387904  # 2**62: orders probes after any event id


def _cents(col: Column) -> Column:
    """Exact int64 cents for a 2-decimal double (the q1 pricing idiom)."""
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def scaled_int(col: Column, scale: int = 1_000_000) -> Column:
    """Terminal-output quantizer: ``floor(x*scale + 0.5)`` as int64.

    Given bit-identical doubles on both engines (which the exact-int
    cores guarantee), floor is exact — unlike ``round()``, whose
    BigDecimal (Spark) vs float-multiply (DuckDB) paths disagree on
    exact-half values.
    """
    return F.floor(col * scale + F.lit(0.5)).cast("long")


def gapfill_interpolate(
    df: DataFrame,
    key_col: str,
    ts_s_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Linear-interpolation gap-fill at bucket closes — the TimescaleDB
    ``time_bucket_gapfill + interpolate()`` analog.

    Every (key, bucket) between the key's first and last observation gets
    the value linearly interpolated between the nearest observation at or
    before the bucket's close and the nearest one strictly after it. The
    final bucket (no successor) yields NULL, matching ``interpolate()``.

    Shape: the probe-union trick (one probe row per bucket at position
    ``(close, probe=1, 2^62)``), then TWO running last-non-null window
    passes — ascending for (prev_s, prev_v), descending for (next_s,
    next_v) — sharing one hash partitioning on the key, so the window
    stage carries ONE exchange with two sorts (the full plan holds one
    more: the bounded per-key span aggregate that feeds probe
    generation). Bucket generation is a bounded per-key ``sequence()``
    explode; no calendar cross-join exists.

    Returns (key, bucket, value_e6): the interpolated value in exact
    micro-units (see ``scaled_int``).
    """
    e = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_s_col).alias("t"),
        F.col(value_col).alias("v"),
        F.lit(0).alias("probe"),
        F.col(tiebreak_col).alias("tb"),
        F.lit(None).cast("long").alias("h"),
    )
    span = e.groupBy("k").agg(
        F.floor(F.min("t") / bucket_s).alias("h0"),
        F.floor(F.max("t") / bucket_s).alias("h1"),
    )
    probes = span.select(
        "k", F.explode(F.sequence("h0", "h1")).alias("h")
    ).select(
        "k",
        (F.col("h") * bucket_s + (bucket_s - 1)).alias("t"),
        F.lit(None).cast("double").alias("v"),
        F.lit(1).alias("probe"),
        F.lit(_PROBE_TB).alias("tb"),
        "h",
    )
    u = e.unionByName(probes)
    run = Window.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    asc = run.partitionBy("k").orderBy("t", "probe", "tb")
    dsc = run.partitionBy("k").orderBy(
        F.col("t").desc(), F.col("probe").desc(), F.col("tb").desc()
    )
    # BOTH gates require a non-null value: an event row whose value is
    # NULL must be absent from interpolation entirely — gating only the
    # value pass advanced ps/ns from one row while pv/nv came from an
    # earlier one, interpolating between mismatched (t, v) pairs (r10)
    ev_t = F.when((F.col("probe") == 0) & F.col("v").isNotNull(), F.col("t"))
    ev_v = F.when((F.col("probe") == 0) & F.col("v").isNotNull(), F.col("v"))
    w = u.select(
        "k", "h", "probe", "t",
        F.last(ev_t, ignorenulls=True).over(asc).alias("ps"),
        F.last(ev_v, ignorenulls=True).over(asc).alias("pv"),
        F.last(ev_t, ignorenulls=True).over(dsc).alias("ns"),
        F.last(ev_v, ignorenulls=True).over(dsc).alias("nv"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("t") - F.col("ps")).cast("double")
        / (F.col("ns") - F.col("ps")).cast("double")
    )
    return w.filter(F.col("probe") == 1).select(
        F.col("k").alias(key_col),
        F.col("h").alias("bucket"),
        scaled_int(interp).alias("value_e6"),
    )


def trend_stats(
    df: DataFrame, key_col: str, ts_s_col: str, value_col: str
) -> DataFrame:
    """Per-key least-squares trend — the TimescaleDB ``stats_agg`` →
    ``slope()/intercept()/corr()`` analog, on an EXACT integer core.

    x = seconds since the key's own first observation (per-key centering
    keeps every moment sum inside int64); y = value in cents. All five
    sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are exact int64
    sums — mergeable, map-side-combining, order-independent — so the
    closed-form slope/intercept/r² doubles are bit-identical on any
    engine. Keys with zero x-variance (one observation, or all in one
    second) are excluded: no trend is defined.

    Shape: one window-min for the per-key origin riding the same hash
    partitioning as the groupBy that follows — ONE exchange total, and
    the aggregation is a pure mergeable combine at any scale.

    Returns (key, n_events, slope_cph_e6, intercept_c_e2, r2_e6):
    slope in cents-per-hour micro-units, intercept (at the key's first
    observation) in cents hundredths, r² in micro-units.
    """
    kw = Window.partitionBy("k")
    # rows with a NULL ts or value are excluded up front: count(*) would
    # include them in n while every sum skipped them, silently corrupting
    # slope/intercept/r² for the key (r10 review)
    e = df.filter(
        F.col(ts_s_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("k"),
        F.col(ts_s_col).alias("s"),
        _cents(F.col(value_col)).alias("yc"),
    ).select(
        "k", "yc", (F.col("s") - F.min("s").over(kw)).alias("x")
    )
    a = e.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("x") * F.col("yc")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("yc") * F.col("yc")).alias("sy2"),
    )
    # derived second-moment terms in DECIMAL(38,0): the SUMS are int64 by
    # the data-domain contract above, but n*sxy / sx*sy can reach ~1e29
    # near the boundary — long arithmetic raised ARITHMETIC_OVERFLOW under
    # ANSI where the streaming twin's Python-int path was exact (r12 soak).
    # Decimal keeps the integer core exact and both engines identical.
    _d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = _d(F.col("n")) * _d(F.col("sxy")) - _d(F.col("sx")) * _d(F.col("sy"))
    den = _d(F.col("n")) * _d(F.col("sx2")) - _d(F.col("sx")) * _d(F.col("sx"))
    deny = _d(F.col("n")) * _d(F.col("sy2")) - _d(F.col("sy")) * _d(F.col("sy"))
    slope = num.cast("double") / den.cast("double")  # cents per second
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    r2 = (num.cast("double") * num.cast("double")) / (
        den.cast("double") * deny.cast("double")
    )
    return (
        a.filter(den > 0)
        .select(
            F.col("k").alias(key_col),
            F.col("n").alias("n_events"),
            scaled_int(slope * 3600).alias("slope_cph_e6"),
            scaled_int(intercept, 100).alias("intercept_c_e2"),
            F.when(deny > 0, scaled_int(r2)).alias("r2_e6"),
        )
    )


def value_histogram(
    df: DataFrame,
    key_col: str,
    value_col: str,
    bin_width_cents: int = 2000,
    n_bins: int = 25,
) -> DataFrame:
    """Fixed-bin value histogram per key — the TimescaleDB
    ``histogram(value, lo, hi, n)`` analog, exact-integer end to end.

    Bin = ``value_cents // bin_width_cents`` (int64 floor-div — no float
    boundary ambiguity), clamped to [0, n_bins-1] so outliers land in the
    edge bins like the Postgres/Timescale under/overflow buckets. ONE
    mergeable groupBy with map-side partials: the shape that downsamples
    any cardinality in a single shuffle; every output column is an exact
    int64.

    Returns (key, bin, bin_lo_cents, n, min_c, max_c, sum_c).
    """
    e = df.select(
        F.col(key_col).alias("k"), _cents(F.col(value_col)).alias("yc")
    ).select(
        "k",
        "yc",
        # exact int64 integer division (the docstring's contract): `/` on
        # longs is DOUBLE division in Spark, which can misbin a ratio an
        # epsilon below an integer boundary at 2^53-scale cents. Spark div
        # and DuckDB // both truncate toward zero (probed), and negative
        # yc clamps to bin 0 under either convention anyway
        F.least(
            F.greatest(
                F.expr(f"yc div {int(bin_width_cents)}"), F.lit(0)
            ),
            F.lit(n_bins - 1),
        ).cast("long").alias("bin"),
    )
    return e.groupBy("k", "bin").agg(
        F.count("*").alias("n"),
        F.min("yc").alias("min_c"),
        F.max("yc").alias("max_c"),
        F.sum("yc").alias("sum_c"),
    ).select(
        F.col("k").alias(key_col),
        "bin",
        (F.col("bin") * bin_width_cents).alias("bin_lo_cents"),
        "n", "min_c", "max_c", "sum_c",
    )


def heartbeat_uptime(
    df: DataFrame,
    key_col: str,
    ts_s_col: str,
    tiebreak_col: str,
    liveness_s: int = 600,
) -> DataFrame:
    """Heartbeat liveness — the TimescaleDB ``heartbeat_agg`` →
    ``uptime()/interpolated_uptime()`` analog.

    Each observation keeps its key "live" for ``liveness_s`` seconds;
    covered time = Σ min(gap, liveness) over successive heartbeats,
    within the key's own [first, last] span. One lead() window pass
    riding the per-key exchange + a mergeable groupBy on the same key —
    one exchange total, exact int64 throughout. Keys whose span is zero
    are excluded (liveness undefined over an empty interval).

    Returns (key, n_beats, span_s, uptime_s, n_outages,
    uptime_ratio_e6) — outage = a gap exceeding the liveness window.
    """
    w = Window.partitionBy("k").orderBy("s", "tb")
    e = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_s_col).alias("s"),
        F.col(tiebreak_col).alias("tb"),
    ).select("k", "s", (F.lead("s").over(w) - F.col("s")).alias("gap"))
    # NB: both Spark's and DuckDB's least() SKIP nulls (Postgres rule), so a
    # bare least(gap, liveness) would credit a phantom window after the
    # final heartbeat — gate on gap IS NOT NULL explicitly.
    a = e.groupBy("k").agg(
        F.count("*").alias("n_beats"),
        (F.max("s") - F.min("s")).alias("span_s"),
        F.sum(
            F.when(
                F.col("gap").isNotNull(),
                F.least(F.col("gap"), F.lit(liveness_s)),
            )
        ).alias("uptime_s"),
        F.count(F.when(F.col("gap") > liveness_s, 1)).alias("n_outages"),
    )
    return a.filter(F.col("span_s") > 0).select(
        F.col("k").alias(key_col),
        "n_beats", "span_s", "uptime_s", "n_outages",
        scaled_int(
            F.col("uptime_s").cast("double") / F.col("span_s").cast("double")
        ).alias("uptime_ratio_e6"),
    )


def lttb_downsample(
    df: DataFrame,
    key_col: str,
    ts_s_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_s: int = 3600,
) -> DataFrame:
    """Largest-triangle downsampling, one point per (key, bucket) — the
    LTOB variant of Steinarsson's LTTB (thesis, U. Iceland 2013).

    True LTTB anchors each bucket's triangle on the PREVIOUS bucket's
    selected point — a sequential dependency that cannot shuffle. LTOB
    scores every point by the triangle it forms with its immediate
    actual neighbors, then keeps the per-bucket argmax; per-point scores
    depend only on a lag/lead pass, so the whole operator is two
    shuffles (one window on the key, one groupBy on (key, bucket)) at
    any scale.

    Exactness: x = epoch seconds (int64), y = cents (int64) — the
    doubled triangle area ``|(xp-xn)(y-yp) - (xp-x)(yn-yp)|`` is an
    EXACT int64, so the argmax is engine-independent with no float
    compare anywhere. Endpoints (no neighbor) get area 2^62: always
    selected, like LTTB's always-keep-first/last rule. Ties break on the
    unique tiebreak id via struct-max — one aggregate, no second window
    sort (the row_number alternative needs an extra full sort).

    Returns (key, bucket, sel_s, sel_value_c, area2, n_points).
    """
    w = Window.partitionBy("k").orderBy("s", "tb")
    e = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_s_col).alias("s"),
        _cents(F.col(value_col)).alias("yc"),
        F.col(tiebreak_col).alias("tb"),
    )
    n = e.select(
        "k", "s", "yc", "tb",
        F.floor(F.col("s") / bucket_s).alias("h"),
        F.lag("s").over(w).alias("xp"),
        F.lag("yc").over(w).alias("yp"),
        F.lead("s").over(w).alias("xn"),
        F.lead("yc").over(w).alias("yn"),
    )
    area2 = F.when(
        F.col("xp").isNull() | F.col("xn").isNull(), F.lit(_PROBE_TB)
    ).otherwise(
        F.abs(
            (F.col("xp") - F.col("xn")) * (F.col("yc") - F.col("yp"))
            - (F.col("xp") - F.col("s")) * (F.col("yn") - F.col("yp"))
        )
    )
    scored = n.select("k", "h", "s", "yc", "tb", area2.alias("a2"))
    tup = F.struct("a2", "tb", "s", "yc")
    sel = scored.groupBy("k", "h").agg(
        F.max(tup).alias("_t"), F.count("*").alias("n_points")
    )
    return sel.select(
        F.col("k").alias(key_col),
        F.col("h").alias("bucket"),
        F.col("_t").getField("s").alias("sel_s"),
        F.col("_t").getField("yc").alias("sel_value_c"),
        F.col("_t").getField("a2").alias("area2"),
        "n_points",
    )


def mad_outliers(
    df: DataFrame,
    key: str,
    value_col: str,
    id_col: str,
    cutoff: float = 3.5,
    consistency: float = 0.6745,
) -> DataFrame:
    """[ext] Robust outlier scoring via median absolute deviation — the
    breakdown-resistant twin of the rolling z-score (a single wild value
    inflates mean AND stddev, masking itself; the median/MAD pair has a
    50% breakdown point). score = consistency·(x − median)/MAD (0.6745
    makes it comparable to a z-score under normality, Iglewicz & Hoaglin
    1993); |score| > cutoff (3.5) flags the outlier.

    Cross-engine determinism: medians are DISCRETE lower medians — the
    row at rank (n+1) div 2 under the total order (value, id) — never an
    interpolated percentile, so both engines pick the SAME stored value
    with zero float averaging. Keys whose MAD is 0 (over half the values
    identical) emit nothing: the score there is 0/0 noise, the
    refuse-quietly analog of the zscore op's sd > 0 gate.

    Plan: two window passes, both riding ONE hash exchange on ``key``
    (rank-by-value, then rank-by-deviation); the per-key median/MAD
    frames are one row per key and join back broadcast-cheap. 100 TB:
    no global sort, no per-key collect.
    """
    lower_med_rank = lambda n: F.floor((n + 1) / 2)  # noqa: E731

    # NULL values are excluded: Spark ranks NULLS FIRST ascending while
    # DuckDB ranks them LAST, so an unfiltered NULL shifts which row is
    # the discrete median differently per engine (and a NULL median nulls
    # every score) — the same guard _tag_union applies (r10 review)
    # null-safe join-backs (r14 review — the alpha_mix/unimax twin): the
    # window passes compute a median/MAD for a NULL key group (NULL is a
    # legitimate partition), but the old plain equi-join dropped that
    # group's rows from the output silently
    from qcardia_data_spark.operators.joins import null_safe_equi_join

    e = df.filter(F.col(value_col).isNotNull()).select(
        id_col, key, F.col(value_col).alias("_v")
    )
    w1 = Window.partitionBy(key).orderBy("_v", id_col)
    wc = Window.partitionBy(key)
    r1 = e.withColumn("_rn", F.row_number().over(w1)).withColumn(
        "_n", F.count(F.lit(1)).over(wc)
    )
    med = r1.filter(
        F.col("_rn") == lower_med_rank(F.col("_n"))
    ).select(key, F.col("_v").alias("_med"))
    d = null_safe_equi_join(e, med, nullsafe_keys=[key], carry=["_med"])
    d = d.withColumn("_dev", F.abs(F.col("_v") - F.col("_med")))
    w2 = Window.partitionBy(key).orderBy("_dev", id_col)
    r2 = d.withColumn("_rn", F.row_number().over(w2)).withColumn(
        "_n", F.count(F.lit(1)).over(wc)
    )
    mad = r2.filter(
        F.col("_rn") == lower_med_rank(F.col("_n"))
    ).select(key, F.col("_dev").alias("_mad"))
    score = F.round(
        F.lit(consistency) * (F.col("_v") - F.col("_med")) / F.col("_mad"), 6
    )
    return (
        null_safe_equi_join(d, mad, nullsafe_keys=[key], carry=["_mad"])
        .filter(F.col("_mad") > 0)
        .select(
            id_col,
            score.alias("score"),
            (F.abs(score) > cutoff).alias("is_outlier"),
        )
    )


def ewma_truncated(
    df: DataFrame,
    key: str,
    ts: str,
    value_col: str,
    alpha: float = 0.5,
    lags: int = 8,
    tiebreak: str | None = None,
) -> DataFrame:
    """[ext] Exponentially weighted moving average, TRUNCATED at ``lags``
    terms: y_t = sum_{j<lags} alpha·(1-alpha)^j · x_{t-j}, normalized by
    the weights actually present (so early rows and series shorter than
    the window are unbiased). The truncation is what makes the op a
    WINDOW expression instead of a stateful scan: the infinite-memory
    recurrence needs sequential state (or a prefix product that
    overflows), while the K-term form is a fixed lag chain — one window
    exchange on ``key``, engine-exact because every weight is a plan
    literal and the K-term sum is evaluated in one fixed left-to-right
    order on both engines. Truncation error is bounded by (1-alpha)^K
    of total weight (0.4% at alpha=0.5, K=8).

    Returns df plus an ``ewma`` column.
    """
    if not 0 < alpha <= 1:
        raise ValueError("ewma_truncated: alpha must be in (0, 1]")
    if lags < 1:
        raise ValueError("ewma_truncated: lags must be >= 1")
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    weights = [alpha * (1 - alpha) ** j for j in range(lags)]
    num = None
    den = None
    for j, wt in enumerate(weights):
        x = F.lag(value_col, j).over(w) if j else F.col(value_col)
        term = F.when(x.isNotNull(), F.lit(wt) * x).otherwise(F.lit(0.0))
        have = F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = have if den is None else den + have
    return df.withColumn("ewma", num / den)
