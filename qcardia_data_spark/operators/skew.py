"""Skew mitigation: salting for hot keys (PERF.md checklist).

AQE's skew-join splitting handles sort-merge joins automatically; salting is
the explicit tool for the two cases AQE doesn't cover: (a) skewed
``groupBy`` aggregations (one reducer owns the hot key), (b) broadcast-
infeasible joins against a skewed key distribution.

Pattern: scatter the hot side across ``n_salts`` sub-keys, do the heavy
shuffle at (key, salt) granularity, then merge partials per key — the
classic two-phase aggregation. For joins, the small side is replicated
``n_salts``× (an explode, cheap when that side is small-ish but above the
broadcast threshold).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(key: Column, n_salts: int) -> Column:
    """Deterministic salt derived from the full row via a stable hash of
    ``spark_partition_id``-free content: uses ``monotonically_increasing_id``
    -free keyed hashing so retries reproduce the same salt. Callers pass a
    row-unique column (or combination) as ``key``."""
    return F.pmod(F.xxhash64(key), F.lit(n_salts))


def salted_group_agg(
    df: DataFrame, group: Sequence[str], salt_source: str,
    aggs: dict[str, Column], merges: dict[str, Column], n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation:
    phase 1 groups by (group…, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the partials per key.

    ``aggs``: name → phase-1 aggregate over raw rows.
    ``merges``: name → phase-2 aggregate over the phase-1 columns.
    """
    # fresh working name (r14 review): a user column named "_salt" was
    # silently overwritten — and if referenced by ``aggs`` expressions,
    # they aggregated the salt instead of the user's data
    from qcardia_data_spark.operators.joins import fresh_name

    salt_c = fresh_name("_salt", df.columns)
    salted = df.withColumn(salt_c, salt_column(F.col(salt_source), n_salts))
    phase1 = salted.groupBy(*group, salt_c).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return phase1.groupBy(*group).agg(
        *[expr.alias(name) for name, expr in merges.items()]
    )


def salted_join(
    big: DataFrame, small: DataFrame, on: str, n_salts: int = 16,
    salt_source: str | None = None, how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salts, join on (key, salt). Correct for any equi-join where
    ``small`` has unique join keys or duplicates are acceptable exactly as
    in the unsalted join (replication is per-salt, not per-row).

    ``salt_source`` should be a ROW-unique (or near-unique) big-side
    column: the salt must vary WITHIN the hot key or the scatter does
    nothing. When omitted, the salt hashes ALL big-side columns (r13
    review — the old default hashed the join key itself, so every hot-key
    row landed on ONE salt and the mitigation silently no-opped; rows
    that are full duplicates still share a salt, which only matters if
    the skew IS duplicate rows — pass a unique id then)."""
    # right/full joins are WRONG under salting: the small side is
    # replicated n_salts x, so its unmatched rows would surface once per
    # salt — refuse loudly instead of silently multiplying (r12 review).
    # left/inner/semi/anti preserve the unsalted semantics exactly.
    if how.replace("_outer", "") in ("right", "full", "fullouter", "outer"):
        raise ValueError(
            f"salted_join: how={how!r} would emit each unmatched small-side "
            f"row {n_salts}x (the small side is replicated per salt) — use "
            "an unsalted join or swap the sides"
        )
    if salt_source is not None:
        salt = salt_column(F.col(salt_source), n_salts)
    else:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
        )
    # fresh working name (r14 review): a user "_salt" column on either
    # side was silently overwritten and dropped from the output
    from qcardia_data_spark.operators.joins import fresh_name

    salt_c = fresh_name("_salt", list(big.columns) + list(small.columns))
    b = big.withColumn(salt_c, salt)
    s = small.withColumn(
        salt_c, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, on=[on, salt_c], how=how).drop(salt_c)
