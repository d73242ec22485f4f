"""Driver simulation: vanilla SparkSession (none of get_spark's confs),
import __spark_entry__ by path, run entry() + the first 50 queries() against
oracle_sql() at sf0.01 with the strict comparator."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

import __spark_entry__ as e
from tests.oracle import compare

df = e.entry(spark)
rows = df.collect()
print("entry:", len(rows), "rows, schema:", [f.name for f in df.schema.fields], flush=True)

qs, os_ = e.queries(), e.oracle_sql()
sf = __import__("os").environ.get("QDS_SIM_SF", "/root/testdata/sf0.01")
bad = []
t0 = time.time()
for i, (name, fn) in enumerate(list(qs.items())):
    try:
        d = fn(spark, sf)
        if name in os_:
            issues = compare(d, os_[name], sf, name)
            if issues:
                bad.append((name, issues[:2]))
                print("FAIL", i + 1, name, issues[:1], flush=True)
        else:
            n = d.count()
            print("rows-only", i + 1, name, n, flush=True)
    except Exception as ex:
        bad.append((name, str(ex)[:200]))
        print("ERROR", i + 1, name, str(ex)[:200], flush=True)
print(f"done in {time.time()-t0:.0f}s; failures: {len(bad)}")
for b in bad: print(b)
spark.stop()
