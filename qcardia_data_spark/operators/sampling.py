"""Sampling & split operators (SURVEY §2.10, X1-X5).

All sampling is key-derived-deterministic (see operators.windows.keyed_rand):
reproducible across runs, task retries, and engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qcardia_data_spark.operators.windows import keyed_rand, row_number_per_group, seeded_split


def subject_level_split(
    df: DataFrame, subject_col: str, valid_fraction: float, seed: str | int = 0,
    out: str = "split", scale_safe: bool = False, num_ranges: int | None = None,
) -> DataFrame:
    """X1 — seeded train/valid partition at SUBJECT granularity
    (reference data_split.py:73-84; config ``valid_partition``).

    Splits the distinct-subject frame, then joins the assignment back —
    records of one subject can never straddle splits (the ``randomSplit``
    leak SURVEY §7.3 warns about). The distinct-subject frame is small
    relative to records, so the planner broadcasts it (map-side join back);
    no explicit hint, so a corpus with hundreds of millions of subjects
    degrades to a co-partitioned shuffle join instead of OOM.

    ``scale_safe``/``num_ranges`` forward to :func:`seeded_split`
    (VERDICT r12 #3 — the distributed two-phase rank was reachable only
    from the inner primitive): identical assignments, rank computed as a
    distributed prefix sum instead of one unpartitioned window — the
    form to pick when the SUBJECT frame itself is huge (hundreds of
    millions of subjects), not just the record frame.
    """
    subjects = df.select(subject_col).distinct()
    assigned = seeded_split(
        subjects, subject_col, valid_fraction, seed, out,
        scale_safe=scale_safe, num_ranges=num_ranges,
    )
    return df.join(assigned, on=subject_col, how="left")


def split_from_table(df: DataFrame, split_table: DataFrame, on: Sequence[str]) -> DataFrame:
    """X2 — honor an explicit split assignment table when present
    (split YAML fast path, reference data_split.py:43-49). Config-provided
    split tables are small; the planner broadcasts them without a hint."""
    return df.join(split_table, on=list(on), how="left")


def stratified_sample_n(
    df: DataFrame, group: Sequence[str], key: str, n: int, seed: str | int = 0,
) -> DataFrame:
    """X3/A2 — deterministic n-per-group stratified sample
    (``sample_from_csv_by_group``, reference utils.py:9-29; 15-per-vendor
    test split, test_splits.py:18-24).

    Window row_number over keyed_rand — one shuffle on the strata key.
    """
    ranked = row_number_per_group(
        df, group, [keyed_rand(seed, F.col(key)), F.col(key)], out="_rn"
    )
    return ranked.filter(F.col("_rn") <= n).drop("_rn")


def weighted_sample(
    df: DataFrame, group: Sequence[str], key: str, target_per_group_total: int,
    seed: str | int = 0,
) -> DataFrame:
    """X4 — inverse-frequency-weighted sampling to equalize group mix
    (``WeightedRandomSampler`` wiring, reference data_module.py:88-99,147-157).

    Deterministic restatement: every group contributes an equal share of the
    target (total/num_groups, the steady-state expectation of inverse-
    frequency weighting), drawn as its keyed_rand-first rows. Groups smaller
    than the share contribute all rows.
    """
    # group count as a 1-row broadcast aggregate, NOT an unpartitioned
    # window (r12 review: Window.partitionBy() funnels every row through
    # ONE task — the round-1 serving-iterator hazard class). Same values,
    # distributed plan: the rank window still runs per group.
    n_g = df.select(*group).distinct().agg(
        F.count(F.lit(1)).alias("_n_groups")
    )
    ranked = row_number_per_group(
        df.join(F.broadcast(n_g)), group,
        [keyed_rand(seed, F.col(key)), F.col(key)], out="_rn",
    ).withColumn(
        "_share", F.ceil(F.lit(target_per_group_total) / F.col("_n_groups"))
    )
    return ranked.filter(F.col("_rn") <= F.col("_share")).drop(
        "_rn", "_share", "_n_groups"
    )


def weighted_rejection_sample(
    df: DataFrame, group: Sequence[str], key: str, accept_scale: float = 1.0,
    seed: str | int = 0,
) -> DataFrame:
    """X4 (faithful form) — inverse-frequency rejection sampling: accept a
    row iff ``u(key) < accept_scale · w/max_w`` where ``w = total/group_cnt``
    (the ``WeightedRandomSampler`` equalization semantics, reference
    data_module.py:88-99,147-157).

    The rarest group is accepted with probability ``accept_scale``; a group
    k× more frequent at ``accept_scale/k`` — expected output is balanced
    across groups. Fully deterministic under retry (keyed uniform).
    """
    from qcardia_data_spark.functions.transforms import keyed_uniform
    from qcardia_data_spark.operators.joins import null_safe_equi_join

    # totals as broadcast aggregates, NOT unpartitioned windows (r12
    # review — Window.partitionBy() is a one-task global funnel). Same
    # values: _w = total/group_cnt, max_w = total/min group_cnt, so the
    # accept ratio _w/_maxw = min_gc/gc never even needs the total.
    # The count join-back is NULL-SAFE (ADVICE r12): groupBy treats NULL
    # as a legitimate group (as the old Window.partitionBy form did), so
    # a plain equi-join would silently drop every NULL-group row — the
    # exact hazard null_safe_equi_join exists for.
    gc = df.groupBy(*group).agg(F.count(F.lit(1)).alias("_gc"))
    min_gc = gc.agg(F.min("_gc").alias("_min_gc"))
    weighted = null_safe_equi_join(
        df, gc, nullsafe_keys=list(group), carry=["_gc"]
    ).join(F.broadcast(min_gc))
    accept = keyed_uniform(seed, "wsample", F.col(key)) < (
        F.lit(accept_scale)
        * F.col("_min_gc").cast("double") / F.col("_gc")
    )
    # preserve the caller's column order (ADVICE r12: the string-list
    # equi-join moved group keys to the front, unlike the old
    # withColumn-only form)
    return weighted.filter(accept).select(*df.columns)


def random_subset(df: DataFrame, key: str, k: int, seed: str | int = 0) -> DataFrame:
    """X5 — k random subjects for prediction runs (reference
    data_predictor.py:178-182), deterministic under retry."""
    from qcardia_data_spark.operators.sorts import seeded_sample_n

    return seeded_sample_n(df, key, k, seed)


def subject_kfold(
    df: DataFrame, subject_col: str, k: int, seed: str | int = 0,
    out: str = "fold",
) -> DataFrame:
    """[X6] Leak-free K-fold assignment at SUBJECT granularity — the
    cross-validation extension of :func:`subject_level_split` (the
    reference's split machinery stops at train/valid/test; K-fold is the
    standard next ask of the same API).

    Each distinct subject gets fold = (its keyed-md5 rank) mod k: exactly
    balanced fold sizes (they differ by at most one subject), deterministic
    under retries, and every record of a subject lands in the same fold —
    the randomSplit leak cannot happen. Same plan shape as X1: the window
    runs over the distinct-subject frame only, then broadcasts back.
    """
    from pyspark.sql.window import Window

    if k < 2:
        raise ValueError(f"k-fold needs k >= 2, got {k}")
    subjects = df.select(subject_col).distinct()
    rnd = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(subject_col).cast("string")))
    rank = F.row_number().over(Window.orderBy(rnd, subject_col))
    assigned = subjects.withColumn(out, ((rank - 1) % k).cast("int"))
    return df.join(assigned, on=subject_col, how="left")


def weighted_reservoir(
    df: DataFrame, key: str, weight: str, k: int, seed: str | int = 0,
) -> DataFrame:
    """[ext] Exact-k weighted sampling WITHOUT replacement (A-Res,
    Efraimidis & Spirakis, IPL 2006): each row draws a keyed uniform u
    and ranks by u^(1/w) — the top k are a weight-proportional sample.
    Complements X4's inverse-frequency equalizer (expected-share
    semantics) with the exact-k, caller-supplied-weight form a corpus
    sampler needs ("draw 10k documents proportional to token count").

    Determinism: u is ``keyed_uniform`` (md5 of seed+key), so the sample
    is reproducible across retries AND replayable by a SQL oracle; the
    rank uses the monotone-equivalent ln(u)/w (avoids pow; w > 0
    enforced — refuse loudly, a zero weight would divide by zero into
    NaN ordering).

    Scale shape: map-only scoring + TakeOrdered top-k (per-partition
    heaps, no global sort shuffle) — the o1_top_k plan.
    """
    from qcardia_data_spark.functions.transforms import keyed_uniform

    if k <= 0:
        raise ValueError(f"weighted_reservoir: k must be positive, got {k}")
    bad = df.filter(F.col(weight) <= 0).limit(1).count()
    if bad:
        raise ValueError(
            f"weighted_reservoir: column {weight!r} contains non-positive "
            "weights — A-Res keys u^(1/w) are undefined for w <= 0 "
            "(filter or clamp upstream)"
        )
    score = F.log(keyed_uniform(seed, "ares", F.col(key))) / F.col(weight)
    return df.orderBy(score.desc(), F.col(key)).limit(k)


def poisson_cum_thresholds(lam: float = 1.0, k_max: int = 8) -> list[float]:
    """Cumulative P(K <= k) for k in 0..k_max-1, rounded to 12dp — the
    plan literals both the Spark expression and the generated oracle SQL
    embed (the zorder/ewma zero-drift idiom), so the inverse-CDF draw is
    bit-identical cross-engine."""
    import math

    p = math.exp(-lam)
    cum = p
    out = []
    for k in range(k_max):
        out.append(round(cum, 12))
        p = p * lam / (k + 1)
        cum += p
    return out


def poisson_bootstrap(
    df: DataFrame, key_cols: Sequence[str], lam: float = 1.0,
    k_max: int = 8, seed: int | str = 0, out: str = "boot_k",
) -> DataFrame:
    """[ext] Deterministic Poisson bootstrap — the at-scale resampling
    scheme (Chamandy et al., Google 2012): instead of drawing n rows
    with replacement (a global operation), each row independently draws
    its multiplicity k ~ Poisson(lam), which converges to the true
    bootstrap for large n and is EMBARRASSINGLY parallel (map-only, no
    shuffle, no global count). The draw is the inverse CDF of a keyed
    md5 uniform against plan-literal cumulative thresholds (truncated at
    ``k_max``: P(K >= 9) at lam=1 is 1.1e-6), so replicates are
    reproducible under retries and identical in any engine — a bootstrap
    you can value-grade, unlike rand(). Returns df + the ``out``
    multiplicity column; downstream aggregates weight by it."""
    cums = poisson_cum_thresholds(lam, k_max)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(
                    "|", F.lit(str(seed)),
                    *[F.col(c).cast("string") for c in key_cols],
                )), 1, 13,
            ), 16, 10,
        ).cast("double")
        / F.lit(float(1 << 52))
    )
    k = None
    for c in cums:
        term = (u >= F.lit(c)).cast("int")
        k = term if k is None else k + term
    return df.withColumn(out, k.cast("long"))
