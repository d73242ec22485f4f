"""Dataset drift statistics between two samples [ext].

The monitoring half of a production training-data pipeline: after every
ingest, compare the new batch's feature distributions against the standing
corpus — population stability index over fixed bucket edges, chi-square
over categorical counts, and the exact two-sample Kolmogorov–Smirnov
distance. No reference counterpart (the reference has no monitoring
surface); statistics follow the standard definitions (PSI: Siddiqi,
"Credit Risk Scorecards" 2006; KS: classical).

Scale shapes (the 100 TB question):

- ``psi_buckets`` / ``chi_square_drift``: one mergeable groupBy each —
  map-side partials, k-row results (k = bucket/category count).
- ``ks_statistic`` is the interesting one: the textbook formulation needs
  a cumulative count over GLOBALLY ordered values, and a bare
  ``Window.orderBy`` without partition keys collapses to ONE partition —
  the classic Spark anti-pattern. This implementation is the two-level
  prefix sum instead: coarse range buckets from the global min/max (two
  scalar aggregates), per-bucket totals collected to the driver (<=
  n_coarse rows, bounded), exclusive offsets broadcast back, and the
  in-bucket cumsum rides a PARTITIONED window. Every stage is
  parallel; driver state is O(n_coarse).

All outputs are exact-integer counts plus final double divisions of those
integers, so a DuckDB oracle replays them value-exactly (ln/χ² terms are
rounded at 6 decimals on both sides, the repo-wide float idiom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["psi_buckets", "chi_square_drift", "ks_statistic"]


def _tag_union(df_a: DataFrame, df_b: DataFrame, col: str) -> DataFrame:
    a = df_a.select(F.col(col).alias("v"), F.lit(1).alias("_a"), F.lit(0).alias("_b"))
    b = df_b.select(F.col(col).alias("v"), F.lit(0).alias("_a"), F.lit(1).alias("_b"))
    return a.unionByName(b).filter(F.col("v").isNotNull())


def psi_buckets(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    edges: list[float],
    smooth: float = 0.5,
) -> DataFrame:
    """Population stability index of ``col`` between two samples over
    FIXED bucket edges (half-open buckets, open-ended first and last:
    (-inf, e0], (e0, e1], ..., (ek, inf) — every value lands somewhere).

    Returns one row per bucket: (bucket, n_a, n_b, contrib) with
    contrib = (pa - pb) * ln(pa / pb) and p the add-``smooth``
    (Laplace) proportion — deterministic even for empty buckets, and the
    same formula an oracle replays. Sum contrib for the scalar PSI
    (rule of thumb: < 0.1 stable, > 0.25 drifted).

    Fixed edges (not data-derived quantiles) are deliberate: the monitor
    compares TODAY against the SAME ruler as yesterday; pass the edges
    your baseline froze.
    """
    if not edges or any(b <= a for a, b in zip(edges, edges[1:])):
        # strictly increasing: a duplicate edge makes one bucket index
        # unreachable while still inflating the Laplace denominator k
        raise ValueError(
            "psi_buckets: edges must be a strictly increasing non-empty list"
        )
    u = _tag_union(df_a, df_b, col)
    # bucket index = count of edges strictly below v — a fold over a
    # literal array, one map-side expression, no join
    bucket = F.lit(0)
    for e in edges:
        bucket = bucket + F.when(F.col("v") > F.lit(float(e)), 1).otherwise(0)
    k = len(edges) + 1
    observed = (
        u.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.sum("_a").alias("n_a"), F.sum("_b").alias("n_b"))
    )
    # full k-bucket spine: a bucket empty in BOTH samples still has a
    # nonzero Laplace-smoothed contrib whenever the totals differ, and
    # the monitor's row count must not vary with the data (the documented
    # one-row-per-bucket contract — r10 review)
    spine = u.sparkSession.range(k).select(F.col("id").cast("int").alias("bucket"))
    counts = spine.join(observed, "bucket", "left").select(
        "bucket",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    # totals ride the same pass via a grouping-free aggregate of counts
    # (k rows in, 1 out — trivially broadcast)
    totals = counts.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    s = float(smooth)
    pa = (F.col("n_a") + F.lit(s)) / (F.col("ta") + F.lit(s * k))
    pb = (F.col("n_b") + F.lit(s)) / (F.col("tb") + F.lit(s * k))
    return (
        counts.join(F.broadcast(totals))
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.round((pa - pb) * F.log(pa / pb), 6).alias("contrib"),
        )
    )


def chi_square_drift(
    df_a: DataFrame, df_b: DataFrame, col: str
) -> DataFrame:
    """Two-sample chi-square over the categories of ``col``: per category,
    observed counts in each sample vs expected under the pooled
    distribution. Returns (category, n_a, n_b, contrib) — sum contrib
    for the chi-square statistic (df = k - 1). One mergeable groupBy.
    """
    u = _tag_union(df_a, df_b, col)
    counts = u.groupBy(F.col("v").alias("category")).agg(
        F.sum("_a").alias("n_a"), F.sum("_b").alias("n_b")
    )
    totals = counts.agg(F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb"))
    ea = (F.col("n_a") + F.col("n_b")) * F.col("ta") / (F.col("ta") + F.col("tb"))
    eb = (F.col("n_a") + F.col("n_b")) * F.col("tb") / (F.col("ta") + F.col("tb"))
    contrib = (F.col("n_a") - ea) * (F.col("n_a") - ea) / ea + (
        F.col("n_b") - eb
    ) * (F.col("n_b") - eb) / eb
    return (
        counts.join(F.broadcast(totals))
        .select("category", "n_a", "n_b", F.round(contrib, 6).alias("contrib"))
    )


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    n_coarse: int = 64,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance of ``col``:
    D = max over observed values v of |F_a(v) - F_b(v)|, with F the
    empirical CDF. Returns a single row (ks, n_a, n_b).

    Distributed-exact via the two-level prefix sum (module docstring):
    global [min, max] -> ``n_coarse`` even-width range buckets -> bucket
    totals to the driver (bounded) -> exclusive offsets joined back ->
    in-bucket cumulative counts on a PARTITIONED window. No single-
    partition global sort anywhere; ties and duplicate values are exact
    (counts aggregate per distinct value before the cumsum).
    """
    u = _tag_union(df_a, df_b, col)
    # materialized once: per_v feeds THREE actions (min/max, the bucket
    # totals collect, and the final cum/agg job) — unmaterialized, each
    # re-scanned and re-shuffled both inputs, and the driver offsets and
    # distributed cumsums came from independent recomputations (r10)
    per_v = u.groupBy("v").agg(
        F.sum("_a").alias("ca"), F.sum("_b").alias("cb")
    ).localCheckpoint(eager=True)
    lohi = per_v.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    if lohi["lo"] is None:
        raise ValueError("ks_statistic: both samples are empty/null")
    lo, hi = float(lohi["lo"]), float(lohi["hi"])
    width = (hi - lo) / n_coarse or 1.0
    bucket = F.least(
        F.greatest(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(0),
        ),
        F.lit(n_coarse - 1),
    )
    bv = per_v.withColumn("bucket", bucket)
    # bounded driver collect: <= n_coarse rows -> exclusive prefix offsets
    totals = {
        r["bucket"]: (r["sa"], r["sb"])
        for r in bv.groupBy("bucket")
        .agg(F.sum("ca").alias("sa"), F.sum("cb").alias("sb"))
        .collect()
    }
    offs, oa, ob = [], 0, 0
    for b in range(n_coarse):
        offs.append((b, oa, ob))
        sa, sb = totals.get(b, (0, 0))
        oa, ob = oa + sa, ob + sb
    na, nb = oa, ob
    if na == 0 or nb == 0:
        raise ValueError(
            f"ks_statistic: a sample has no non-null values (n_a={na}, "
            f"n_b={nb}) — the empirical CDF is undefined"
        )
    off_df = bv.sparkSession.createDataFrame(
        offs, "bucket int, off_a long, off_b long"
    )
    w = Window.partitionBy("bucket").orderBy("v")
    cum = (
        bv.join(F.broadcast(off_df), "bucket")
        .select(
            "v",
            (F.sum("ca").over(w) + F.col("off_a")).alias("cum_a"),
            (F.sum("cb").over(w) + F.col("off_b")).alias("cum_b"),
        )
    )
    d = cum.agg(
        F.max(
            F.abs(
                F.col("cum_a") / F.lit(float(na))
                - F.col("cum_b") / F.lit(float(nb))
            )
        ).alias("d")
    )
    return d.select(
        F.round("d", 6).alias("ks"),
        F.lit(na).alias("n_a"),
        F.lit(nb).alias("n_b"),
    )
