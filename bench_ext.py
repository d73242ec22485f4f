#!/usr/bin/env python
"""Extended bench (VERDICT r7 #4): a SECOND, versioned per-round series
for the post-r4 operator half of the engine — the ops the frozen 20-query
headline set (bench.py) cannot see. Runs best-of-3 per query on a FIXED
125k-doc / 50k-vector corpus (the r5 yardstick recipe: 25 copies of the
sf0.1 tables, each documents copy under a DISTINCT alphabet rotation so
copies keep their internal near-dup structure but stay mutually
dissimilar — workload scales linearly instead of benchmarking a duplicate
blow-up) and prints ONE JSON line. The driver does not run this; each
round records the output as BENCH_EXT_r{N}.json so a regression in
ngram-jaccard / span-removal / BM25 / DSIR / incremental-dedup / IVF+PQ
shows up in a series, not only in one-off PERF.md yardsticks.

Timed sections measure the STANDING-INDEX operating mode where one
exists: index builds (inverted index, signature index, IVF+PQ) happen
once in setup, probes are what each round times — matching how the ops
run in production (the index outlives any single query)."""

from __future__ import annotations

import json
import os
import shutil
import time

CORPUS = "/tmp/qds_ext_corpus_v1"  # versioned: bump when the recipe changes
COPIES = 25
DOC_STRIDE = 1_000_000  # copy k ids live in [k*stride, k*stride + 5000)
VEC_STRIDE = 1_000_000
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _build_corpus() -> None:
    """25 rotated document copies + 25 id-offset embedding copies, one
    parquet file per copy (DuckDB COPY — seconds, not minutes). Copy k's
    ids sit in block k: monotone across copies, which is exactly the
    crawl-id layout the incremental-dedup bench needs (index = copies
    0..23, new batch = copy 24)."""
    import duckdb

    con = duckdb.connect()
    ddir = os.path.join(CORPUS, "documents.parquet")
    edir = os.path.join(CORPUS, "embeddings.parquet")
    os.makedirs(ddir, exist_ok=True)
    os.makedirs(edir, exist_ok=True)
    for k in range(COPIES):
        rot = ALPHA[k:] + ALPHA[:k]
        con.execute(
            f"""
            COPY (
              SELECT doc_id + {k * DOC_STRIDE} AS doc_id,
                     translate(text, '{ALPHA}', '{rot}') AS text,
                     lang, source, n_chars
              FROM read_parquet('/root/testdata/sf0.1/documents.parquet'))
            TO '{ddir}/part-{k:03}.parquet' (FORMAT PARQUET)
            """
        )
        con.execute(
            f"""
            COPY (
              SELECT vec_id + {k * VEC_STRIDE} AS vec_id, embedding, label
              FROM read_parquet('/root/testdata/sf0.1/embeddings.parquet'))
            TO '{edir}/part-{k:03}.parquet' (FORMAT PARQUET)
            """
        )
    con.close()


def main() -> None:
    from pyspark.sql import functions as F

    from qcardia_data_spark import get_spark
    from qcardia_data_spark.functions import selection as SEL
    from qcardia_data_spark.functions.dedup import (
        containment_join,
        near_dedup_incremental,
        ngram_jaccard_join,
        remove_duplicate_spans,
        write_signature_index,
    )
    from qcardia_data_spark.functions.text import (
        chunk_documents,
        token_entropy_stats,
    )
    from qcardia_data_spark.functions.retrieval import (
        bm25_topk_from_index,
        build_inverted_index,
    )
    from qcardia_data_spark.functions.similarity import (
        ann_ivfpq_topk_pruned,
        ivfpq_write_partitioned,
    )

    # host snapshot + load guard shared with bench.py (one definition,
    # VERDICT r8 #2)
    from bench_common import host_state as _host_state
    from bench_common import wait_for_idle_host

    host_before, guard = wait_for_idle_host(_host_state())

    if not os.path.isdir(os.path.join(CORPUS, "documents.parquet")):
        shutil.rmtree(CORPUS, ignore_errors=True)
        _build_corpus()

    spark = get_spark(app_name="qds-bench-ext")
    docs = spark.read.parquet(os.path.join(CORPUS, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(CORPUS, "embeddings.parquet"))
    n_docs, n_vecs = docs.count(), emb.count()  # also warms footers/cache

    # ---- one-time standing indexes (setup, untimed) -------------------
    setup: dict[str, float] = {}
    inv_idx = os.path.join(CORPUS, "inv_idx")
    if not os.path.isdir(inv_idx):
        t0 = time.perf_counter()
        build_inverted_index(docs, inv_idx)
        setup["inverted_index_build"] = round(time.perf_counter() - t0, 3)
    sig_idx = os.path.join(CORPUS, "sig_idx")
    if not os.path.isdir(sig_idx):
        # index = copies 0..23 (the standing corpus); copy 24 is the batch
        t0 = time.perf_counter()
        write_signature_index(
            docs.filter(F.col("doc_id") < (COPIES - 1) * DOC_STRIDE),
            "doc_id", "text", sig_idx,
        )
        setup["signature_index_build"] = round(time.perf_counter() - t0, 3)
    win_idx = os.path.join(CORPUS, "win_idx")
    if not os.path.isdir(win_idx):
        from qcardia_data_spark.functions.dedup import write_winnow_index

        t0 = time.perf_counter()
        write_winnow_index(
            docs.filter(F.col("doc_id") < (COPIES - 1) * DOC_STRIDE),
            "doc_id", "text", win_idx,
        )
        setup["winnow_index_build"] = round(time.perf_counter() - t0, 3)
    h64_idx = os.path.join(CORPUS, "h64_idx")
    if not os.path.isdir(h64_idx):
        from qcardia_data_spark.functions.dedup import (
            simhash64_md5_table,
            write_hamming64_index,
        )

        t0 = time.perf_counter()
        head_sig = simhash64_md5_table(
            docs.filter(F.col("doc_id") < (COPIES - 1) * DOC_STRIDE),
            "doc_id", "text",
        )
        write_hamming64_index(head_sig, h64_idx, max_hamming=3)
        setup["hamming64_index_build"] = round(time.perf_counter() - t0, 3)
    ivfpq_idx = os.path.join(CORPUS, "ivfpq_idx")
    if not os.path.isdir(ivfpq_idx):
        t0 = time.perf_counter()
        ivfpq_write_partitioned(emb, ivfpq_idx, n_cells=16, m=8, k_codes=16)
        setup["ivfpq_index_build"] = round(time.perf_counter() - t0, 3)

    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    batch = docs.filter(F.col("doc_id") >= (COPIES - 1) * DOC_STRIDE)

    # ---- the timed set ------------------------------------------------
    def q_ngram_jaccard():
        return ngram_jaccard_join(docs, "doc_id", "text", threshold=0.6)

    def q_span_removal():
        return remove_duplicate_spans(docs, "doc_id", "text", k=4).select(
            "doc_id", "n_removed"
        )

    def q_bm25_probe():
        return bm25_topk_from_index(
            spark, inv_idx, ["spark", "join", "fast", "table"], k=10
        )

    def q_dsir_weights():
        return SEL.dsir_log_weights(docs, F.col("lang") == "en")

    def q_incremental_dedup_batch():
        return near_dedup_incremental(batch, sig_idx, "doc_id", "text")

    def q_ivfpq_probe():
        return ann_ivfpq_topk_pruned(spark, ivfpq_idx, qvec, k=10, n_probe=4)

    # late-r8 additions: keys APPEND to the series (prior keys unchanged,
    # so per-query r8→r9 comparisons stay like-for-like; the total is
    # comparable only within same-key-set revisions)
    def q_containment():
        return containment_join(docs, "doc_id", "text", threshold=0.8)

    def q_chunk():
        return chunk_documents(docs, chunk_tokens=32, overlap=8)

    def q_token_entropy():
        return token_entropy_stats(docs)

    # r8-final additions (same append-only rule)
    def q_winnow_pairs():
        from qcardia_data_spark.functions.dedup import winnow_share_pairs

        return winnow_share_pairs(docs, "doc_id", "text", max_df=40)

    def q_winnow_verified():
        from qcardia_data_spark.functions.dedup import winnow_near_pairs

        return winnow_near_pairs(docs, "doc_id", "text", max_df=40)

    def q_winnow_incremental_batch():
        from qcardia_data_spark.functions.dedup import winnow_incremental

        return winnow_incremental(
            batch, win_idx, max_df=40, allow_replay=True
        )

    def q_hamming64_probe():
        # the honest per-batch cost: sign the batch AND probe the index
        from qcardia_data_spark.functions.dedup import (
            hamming64_index_probe,
            simhash64_md5_table,
        )

        sig = simhash64_md5_table(batch, "doc_id", "text").localCheckpoint(
            eager=True
        )
        return hamming64_index_probe(sig, h64_idx, allow_replay=True)

    def q_hll_cms_sketches():
        from qcardia_data_spark.functions.sketches import cms_table, hll_registers

        h = hll_registers(docs, ["source"], "doc_id", p=8)
        c = cms_table(docs, ["source"], "lang", depth=3, width=64)
        return h.select(F.lit("h").alias("k"), "register").unionByName(
            c.select(F.lit("c").alias("k"), F.col("bucket").alias("register"))
        )

    BENCH = {
        "ngram_jaccard": q_ngram_jaccard,
        "span_removal": q_span_removal,
        "bm25_probe": q_bm25_probe,
        "dsir_weights": q_dsir_weights,
        "incremental_dedup_batch": q_incremental_dedup_batch,
        "ivfpq_probe": q_ivfpq_probe,
        "containment": q_containment,
        "chunk": q_chunk,
        "token_entropy": q_token_entropy,
        "winnow_pairs": q_winnow_pairs,
        "winnow_verified": q_winnow_verified,
        "hll_cms_sketches": q_hll_cms_sketches,
        "hamming64_probe": q_hamming64_probe,
        "winnow_incremental_batch": q_winnow_incremental_batch,
    }

    # same-session host calibration (VERDICT r13 #3 — bench.py grew this
    # in r13; the EXT floors had to borrow the headline band by hand):
    # the SAME frozen workload and reference constant, so host_factor is
    # directly comparable across the two benches and the per-key floor
    # verdicts divide by it instead of a hand-computed session ratio.
    from bench import CALIBRATION_REF_SEC, calibration_sec

    # r15: the same I/O-weighted probe bench.py gained (VERDICT r14 #3),
    # against the EXT corpus's own documents table — diagnostic only, the
    # normalization formula is unchanged
    def _io_probe() -> float:
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            docs.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        return min(samples)

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    calib_before = calibration_sec(spark)
    io_before = _io_probe()
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name, fn in BENCH.items():
        try:
            samples = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
            timings[name] = min(samples)
            runs[name] = samples
        except Exception as e:
            errors[name] = str(e).splitlines()[0][:200]

    calib_after = calibration_sec(spark)
    io_after = _io_probe()
    total = round(sum(timings.values()), 3)
    host_factor = round(
        max(calib_before, calib_after) / CALIBRATION_REF_SEC, 3
    )
    out = {
        "metric": "bench_ext_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "corpus": {"docs": n_docs, "vecs": n_vecs, "path": CORPUS},
        "setup": setup,
        "host": {"before": host_before, "after": _host_state()},
        "load_guard": guard,
        "calibration": {
            "workload": "range20M_md5_hashagg_x32",
            "ref_sec": CALIBRATION_REF_SEC,
            "before_sec": calib_before,
            "after_sec": calib_after,
            "io_probe_before_sec": io_before,
            "io_probe_after_sec": io_after,
            "host_factor": host_factor,
            "value_normalized": round(total / host_factor, 3),
        },
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
