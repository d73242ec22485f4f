"""Execution-invariance tests: declared queries must produce identical
results regardless of shuffle partitioning (the local proxy for "same
answer on a 1000-executor cluster") — guards against partition-order
dependence, which is exactly what retry/scale-up breaks."""

from __future__ import annotations

import pytest

from qcardia_data_spark.queries import QUERIES

# queries touching every risky mechanism: window rank, seeded ops,
# explode, LSH banding, cumulative sums, top-k
SENSITIVE = [
    "a2_stratified_sample",
    "w2_seeded_split",
    "w4_cumulative_sum",
    "o4_seeded_sample_k",
    "x4_weighted_sample",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "q3_shipping_priority",
    # round-5 additions: budget-walk windows, checkpointed fan-in aggs,
    # quantile thresholds, per-bucket rank caps, exact-string rebuilds
    "text_alpha_mix",
    "text_dsir_weights",
    "text_bm25_topk",
    "dedup_span_removal",
    "sim_diversity_sample",
    "text_ccnet_buckets",
    "dedup_fuzzy_keys",
    "text_unimax_mix",
    "text_corpus_report",
    # round-8 additions: probe-union running windows, exact-int argmax
    # over lag/lead neighbors, scalar-max ties, semi+anti correlation
    "ev_gapfill_interpolate",
    "ev_lttb_downsample",
    "q15_top_supplier",
    "q21_waiting_supplier",
]


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(str(r[c]) for c in cols) for r in df.collect()]
    return sorted(rows)


@pytest.mark.parametrize("name", SENSITIVE)
def test_partition_count_invariance(spark, sf_dir, name):
    fn, _ = QUERIES[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _canon(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _canon(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b
