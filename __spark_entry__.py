"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full declared-operator registry
from ``qcardia_data_spark.queries`` (one entry per implemented operator from
SURVEY.md §2; column names alias-matched between both sides).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust to being imported by file path from any cwd: the package lives
# next to this file
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qcardia_data_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["q1_pricing_summary"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
