"""Local replica of the driver's DuckDB-oracle comparison (SURVEY §5.1).

Canonicalization: sort columns by name, round doubles to 9 significant
digits, sort rows, compare values. Stricter than a hash match — on mismatch
it reports the first differing rows for debugging.
"""

from __future__ import annotations

import math

import duckdb

from qcardia_data_spark.catalog import TABLES, table_path


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # NOTE: no zero-normalization here — the driver's hash compare
        # distinguishes -0.0 from +0.0, so the local harness must too
        # (a `v == 0 -> 0.0` mapping masked the round-1 f3 failure).
        if v == 0:
            return -0.0 if math.copysign(1.0, v) < 0 else 0.0
        return float(f"{v:.9g}")
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    # timestamps/dates/Decimal → canonical string
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return v


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


# DuckDB result types the driver's hasher is known to represent the same
# way as the matching Spark type. Everything else — HUGEINT above all —
# must be CAST away in the oracle SQL: `fetchall()` converts HUGEINT to a
# plain Python int, so a value-level comparison can NEVER see the type
# mismatch that made the driver hash-red 8 queries in round 9 (DuckDB
# SUM(<integer>) returns HUGEINT/int128; Spark sum(long) returns int64).
# See README "Cross-engine oracle discipline".
DRIVER_SAFE_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN", "TIMESTAMP"}


def assert_driver_safe_types(sql: str, con, name: str = "?") -> None:
    """Raise if the oracle's bound result schema has a type outside the
    driver-safe set (binding only — the query is not executed)."""
    rel = con.sql(sql)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).split("(")[0] not in DRIVER_SAFE_TYPES
    ]
    if bad:
        raise AssertionError(
            f"[{name}] oracle result types outside the driver-safe set "
            f"{sorted(DRIVER_SAFE_TYPES)}: {bad}. DuckDB SUM(<integer>) "
            f"returns HUGEINT which the driver hashes differently from "
            f"Spark's int64 — wrap the column in CAST(... AS BIGINT) in "
            f"the ORACLE SQL (the Spark side is already LongType)."
        )


def run_oracle(sql: str, sf_dir: str, name: str = "?"):
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
            )
        assert_driver_safe_types(sql, con, name)
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def compare(spark_df, sql: str, sf_dir: str, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    issues: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(sql, sf_dir, name)

    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in o_cols):
        issues.append(f"[{name}] column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return issues
    if len(s_rows) != len(o_rows):
        issues.append(f"[{name}] row count: spark={len(s_rows)} oracle={len(o_rows)}")

    cs, rs = _canon_rows([c.lower() for c in s_cols], s_rows)
    co, ro = _canon_rows([c.lower() for c in o_cols], o_rows)
    n_bad = 0
    for i, (a, b) in enumerate(zip(rs, ro)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                issues.append(f"[{name}] row {i}: spark={a} oracle={b}")
    if n_bad > 3:
        issues.append(f"[{name}] ... {n_bad} differing rows total")
    return issues
