"""t2 differential tests: every declared query vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from qcardia_data_spark.queries import QUERIES
from tests.oracle import compare

ORACLE_CASES = [(name, fn, sql) for name, (fn, sql) in QUERIES.items() if sql is not None]
ROWS_ONLY_CASES = [(name, fn) for name, (fn, sql) in QUERIES.items() if sql is None]


@pytest.mark.parametrize("name,fn,sql", ORACLE_CASES, ids=[c[0] for c in ORACLE_CASES])
def test_oracle_parity(spark, sf_dir, name, fn, sql):
    df = fn(spark, sf_dir)
    issues = compare(df, sql, sf_dir, name)
    assert not issues, "\n".join(issues)


@pytest.mark.parametrize("name,fn", ROWS_ONLY_CASES, ids=[c[0] for c in ROWS_ONLY_CASES])
def test_rows_only(spark, sf_dir, name, fn):
    df = fn(spark, sf_dir)
    assert df.count() >= 0  # runs + stable schema
    assert len(df.columns) > 0
