"""Join operators (SURVEY §2.3, J1-J5).

Physical strategy is left to Catalyst/AQE except where we *know* better:
dimension enrichment joins are explicitly broadcast (J2) so the fact table
never shuffles — at 100 TB that is the difference between a map-side join
and a petabyte shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def left_join_on(df: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """J1 — left equi-join on multiple keys (weight attach,
    reference pipeline/utils.py:130-134). Prefer :func:`qcardia_data_spark.
    operators.windows.count_over` when the right side is an aggregate of the
    left — it avoids the join entirely."""
    return df.join(right, on=list(on), how="left")


def broadcast_enrich(fact: DataFrame, dim: DataFrame, on, how: str = "left") -> DataFrame:
    """J2 — broadcast lookup join: per-record enrichment from a small
    dimension (``build_df_entry``, reference dataset_cacher.py:393-415).

    The dim side is broadcast explicitly: fact-side data never moves.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def anti_join(df: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """J3 — left anti join / set difference on keys
    (``development = all − test``, reference data_split.py:59-67)."""
    return df.join(right, on=list(on), how="left_anti")


def semi_join(df: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """J4 — left semi join / membership routing
    (cache-file → split assignment, reference pipeline/utils.py:62-72)."""
    return df.join(right, on=list(on), how="left_semi")


def first_match_per_key(
    df: DataFrame, key: str, pos: str, matches,
) -> DataFrame:
    """J5 — "find-frame" join: earliest ``pos`` per ``key`` where ``matches``
    holds (content-equality frame lookup, reference reformat/utils.py:76-89,
    first match wins at :86-89).

    filter → groupBy(key).min(pos): one shuffle, map-side partial min.
    """
    return (
        df.filter(matches)
        .groupBy(key)
        .agg(F.min(pos).alias(f"first_{pos}"))
    )


def orphan_check(df: DataFrame, universe: DataFrame, on: Sequence[str]) -> int:
    """P7 — data-quality existence check: count rows of ``df`` whose key has
    no match in ``universe`` (subject-not-in-any-split assert, reference
    pipeline/utils.py:71-72). Returns the orphan count (0 = healthy)."""
    return df.join(universe, on=list(on), how="left_anti").count()


def fresh_name(base: str, taken: Sequence[str]) -> str:
    """``base``, suffixed with underscores until it collides with nothing
    in ``taken`` — for internal working columns that must never silently
    overwrite (or be confused with) a user column of the same name.

    Comparison is CASE-INSENSITIVE: Spark resolves column names
    case-insensitively by default (``spark.sql.caseSensitive=false``), so
    a user column ``_T`` collides with a working column ``_t`` even
    though the strings differ (r10 self-review — reproduced as
    COLUMN_ALREADY_EXISTS in asof_join)."""
    name = base
    taken = {t.casefold() for t in taken}
    while name.casefold() in taken:
        name += "_"
    return name


def null_safe_equi_join(
    left: DataFrame,
    right: DataFrame,
    nullsafe_keys: Sequence[str],
    plain_keys: Sequence[str] = (),
    carry: Sequence[str] = (),
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join whose ``nullsafe_keys`` compare with ``eqNullSafe`` (a
    NULL key value is a legitimate group and must match its NULL twin —
    plain ``==`` silently drops it) while ``plain_keys`` use ``==``
    (never-NULL by construction, keeps them sargable). The right side is
    FRAME-aliased, not column-renamed, so key names on either side never
    collide with an internal prefix. Returns left's columns plus
    ``carry`` from the right; a carried name that already exists on the
    left would make the output ambiguous, so it is REFUSED loudly —
    pick a fresh output name (:func:`fresh_name`) at the call site.

    One definition for the shape that round-9's null-safety sweep found
    hand-rolled twice (the CMS probe join and the scale-safe cumsum
    subtotal join) — the next null-unsafe join fix reuses this instead
    of diverging.
    """
    clash = set(carry) & set(left.columns)
    if clash:
        raise ValueError(
            f"null_safe_equi_join: carry columns {sorted(clash)} already "
            "exist on the left frame — the joined output would be "
            "ambiguous; alias them to fresh names first"
        )
    l, r = left.alias("_nsj_l"), right.alias("_nsj_r")
    rhs = F.broadcast(r) if broadcast_right else r
    cond = F.lit(True)
    for c in plain_keys:
        cond = cond & (F.col(f"_nsj_l.{c}") == F.col(f"_nsj_r.{c}"))
    for c in nullsafe_keys:
        cond = cond & F.col(f"_nsj_l.{c}").eqNullSafe(F.col(f"_nsj_r.{c}"))
    return l.join(rhs, cond, how).select(
        "_nsj_l.*", *[F.col(f"_nsj_r.{c}").alias(c) for c in carry]
    )
