"""CLI entry: ``python -m qcardia_data_spark [sf_dir]`` — prints engine
info, runs the flagship query, and lists the declared operator queries."""

from __future__ import annotations

import sys

from qcardia_data_spark import __version__, get_spark
from qcardia_data_spark.queries import QUERIES


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    oracles = sum(1 for _fn, sql in QUERIES.values() if sql is not None)
    print(f"qcardia-data-spark {__version__}: {len(QUERIES)} declared queries "
          f"({oracles} DuckDB-oracle-checked)")
    spark = get_spark(app_name="qds-cli")
    fn, _ = QUERIES["q1_pricing_summary"]
    print(f"\nflagship pricing summary @ {sf_dir}:")
    fn(spark, sf_dir).show()
    print("declared queries:")
    for name in sorted(QUERIES):
        mark = "oracle" if QUERIES[name][1] else "rows-only"
        print(f"  {name:40s} [{mark}]")


if __name__ == "__main__":
    main()
