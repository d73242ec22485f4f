#!/usr/bin/env python
"""Capture before/after .explain("formatted") for the r15 pruned-probe
change (read_pruned_partitions). The BEFORE form is the helper's own
fallback — spark.read.parquet(root).filter(col.isin(values)) — so both
plans are captured against the SAME index in the same session; the diff
is the scan's file index (probed dirs only vs the whole root) and the
partition-filter placement, which is exactly what the change touches.

Writes plans/r15/<name>_{before,after}.txt for:
- dedup_winnow_incremental_probe  (winnow fps index)
- text_bm25_topk_probe            (BM25 postings index)
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from qcardia_data_spark.functions.dedup import (  # noqa: E402
    _read_win_meta,
    _sig_bucket,
    write_winnow_index,
)
from qcardia_data_spark.functions.retrieval import (  # noqa: E402
    bm25_topk_from_index,
    build_inverted_index,
)
from qcardia_data_spark.sources.readers import (  # noqa: E402
    read_pruned_partitions,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
WORK = "/tmp/qds_probe_plans_r15"
SF = "/root/testdata/sf0.01"


def dump(name: str, df) -> None:
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
        f.write(txt)
    print(name, "written")


shutil.rmtree(WORK, ignore_errors=True)
docs = spark.read.parquet(f"{SF}/documents.parquet")

# --- winnow fps probe ---
widx = f"{WORK}/win_idx"
write_winnow_index(docs, "doc_id", "text", widx, n_fp_buckets=64)
n_fp = int(_read_win_meta(spark, widx)["n_fp_buckets"])
probe = [3, 17, 41]
before = (
    spark.read.parquet(f"{widx}/fps")
    .filter(F.col("fp_bucket").isin(probe))
    .select(F.col("doc_id").alias("_id"), "fp")
)
after = read_pruned_partitions(spark, f"{widx}/fps", "fp_bucket", probe).select(
    F.col("doc_id").alias("_id"), "fp"
)
dump("winnow_index_probe_before", before)
dump("winnow_index_probe_after", after)

# --- BM25 postings probe (the declared text_bm25_topk path end-to-end) ---
bidx = f"{WORK}/inv_idx"
build_inverted_index(docs, bidx, "doc_id", "text", n_buckets=64)
q = ["data", "model", "training"]
res = bm25_topk_from_index(spark, bidx, q, k=10)
dump("text_bm25_topk_probe_after", res)
# before form: reconstruct with the plain read (the helper's fallback)
from qcardia_data_spark.functions.retrieval import term_bucket  # noqa: E402

nb = 64
terms = sorted({t.lower() for t in q})
buckets = sorted(
    r["b"]
    for r in spark.createDataFrame([(t,) for t in terms], ["term"])
    .select(term_bucket(F.col("term"), nb).alias("b"))
    .distinct()
    .collect()
)
postings_before = (
    spark.read.parquet(f"{bidx}/postings")
    .filter(F.col("term_bucket").isin(buckets))
    .filter(F.col("term").isin(terms))
)
dump("text_bm25_topk_probe_before", postings_before)

shutil.rmtree(WORK, ignore_errors=True)
spark.stop()
