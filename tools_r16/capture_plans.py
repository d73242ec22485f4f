#!/usr/bin/env python
"""Capture .explain('formatted') for every headline query -> plans/r16/.

Usage: python tools_r16/capture_plans.py [before|after]
Writes plans/r16/<query>_<tag>.txt. Does NOT execute the queries (explain
is plan-time only), so it can run on a busy host without contaminating
bench numbers.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, RAW_OVERRIDES  # noqa: E402
from qcardia_data_spark import get_spark  # noqa: E402
from qcardia_data_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="qds-capture-plans")
    for name in HEADLINE:
        fn = RAW_OVERRIDES.get(name) or QUERIES[name][0]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR during plan build: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
