"""Registry-wide oracle type-lint (VERDICT r9 "Next round" #2).

Round 9's only driver-red rows were 8 queries whose oracle SQL projected a
DuckDB HUGEINT (SUM over an integer column): the *values* were bit-exact,
but the driver's hasher represents int128 differently from Spark's int64,
so `hash_match` went false while `rows_match`/`schema_match` stayed true.
The local comparator fetches via `fetchall()` (HUGEINT -> Python int), so a
value-level comparison structurally cannot catch this — only a type-level
lint can. This test BINDS (does not execute) every registered oracle and
asserts the result schema uses only driver-safe types.

Keep `DRIVER_SAFE_TYPES` in tests/oracle.py as the single source of truth;
`run_oracle` applies the same assertion on every comparison, so a new query
cannot pass the parity suite with an unsafe oracle type either.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from qcardia_data_spark.catalog import TABLES, table_path
from tests.conftest import SF_TEST_DIR
from tests.oracle import assert_driver_safe_types


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_TEST_DIR, t)}')"
        )
    yield c
    c.close()


def test_every_oracle_binds_to_driver_safe_types(con):
    oracles = entry.oracle_sql()
    assert oracles, "registry has no oracles?"
    failures = []
    for name, sql in oracles.items():
        try:
            assert_driver_safe_types(sql, con, name)
        except AssertionError as e:
            failures.append(str(e))
    assert not failures, "\n".join(failures)


def test_lint_catches_hugeint(con):
    # The exact shape that red-flagged round 9: bare SUM over an integer.
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_driver_safe_types(
            "SELECT sum(event_id) AS n FROM events", con, "sentinel"
        )
