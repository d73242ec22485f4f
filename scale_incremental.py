#!/usr/bin/env python
"""Incremental-path scaling yardstick (VERDICT r12 stretch #7): measure
the STANDING-INDEX append paths — `near_dedup_incremental` against a
persisted signature index and `ann_index_append` against a persisted LSH
index — at 1x/2x/4x the standing corpus with a FIXED batch. The batch
dedup/ANN families all carry measured 1x/2x/4x tables (winnow r8, PPJoin
r11, MinHash-LSH + ANN pairwise r12); the append paths had only the
probe-identical-to-full-build equality proofs. The claim to verify:
append cost is O(batch), ~flat in standing-index size.

Corpora are the existing yardsticks' replicas, reused verbatim:
- documents: scale_ppjoin._build (alphabet-permuted replica blocks,
  ids offset by 100M per block — monotone, so a batch at id offset 1e9
  satisfies the incremental path's monotone-id ratchet at every scale).
- embeddings: scale_ann._build (Rademacher sign-pattern replicas).

The FIXED batch is derived from the 1x base (identity permutation /
identity signs), so its true-duplicate relationship to the index is the
SAME at every scale (its near-dups live in replica block 0, present in
all three indexes) — growth in append time can then only come from index
size, which is exactly the variable under test.

Instrumentation (same helpers as the production paths, replayed):
- dedup: index signature rows inside the batch's probed sig_buckets —
  the true read volume after partition pruning — plus buckets probed /
  total. With a FIXED n_sig_buckets a large-enough batch touches every
  directory, so read volume grows O(index) even though the probe is
  "pruned"; the yardstick prints the touched fraction so the knob's
  100 TB sizing rule (n_sig_buckets grows with the corpus, like
  auto_n_planes) is evidence, not prose.
- ANN: index rows inside the batch's bucket directories (the existence
  anti-join's read volume), in BOTH plane modes: fixed n_planes=6 (the
  hazard: occupancy grows with the corpus) and auto_n_planes at build
  (the 100 TB path: occupancy ~flat, so append read volume ~flat).

Prints one JSON line per (family, scale, mode) and a final summary.
Run idle (bench_common load guard); run bench_ext.py once first.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from scale_ppjoin import BASE as DOC_BASE
from scale_ppjoin import _build as _build_docs
from scale_ppjoin import _perms

EMB_BASE = "/tmp/qds_ext_corpus_v1/embeddings.parquet"
WORK = "/tmp/qds_incr_scale_v1"
DOC_BATCH = 2000
VEC_BATCH = 5000
N_BANDS = 8
SHINGLE_N = 3


def main() -> None:
    from pyspark.sql import functions as F

    from bench_common import host_state, wait_for_idle_host
    from qcardia_data_spark import get_spark
    from qcardia_data_spark.functions.dedup import (
        _band_signature_frame,
        _sig_bucket,
        near_dedup_incremental,
        shingle_rows,
        write_signature_index,
    )
    from qcardia_data_spark.functions.similarity import (
        ann_index_append,
        auto_n_planes,
        hyperplane_bucket,
        lsh_write_partitioned,
    )
    from scale_ann import _build as _build_emb

    host_before, guard = wait_for_idle_host(host_state())
    if not os.path.isdir(DOC_BASE) or not os.path.isdir(EMB_BASE):
        raise SystemExit("run bench_ext.py first (builds the 1x corpus)")
    perms = _perms()
    spark = get_spark(app_name="qds-incr-scale")
    results = []

    # fixed batches, identical at every scale
    doc_batch = (
        spark.read.parquet(DOC_BASE)
        .orderBy("doc_id")
        .limit(DOC_BATCH)
        .select((F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    vec_batch = (
        spark.read.parquet(EMB_BASE)
        .orderBy("vec_id")
        .limit(VEC_BATCH)
        .select((F.col("vec_id") + 1_000_000_000).alias("vec_id"), "embedding")
        .localCheckpoint(eager=True)
    )

    for scale in (1, 2, 4):
        # ---------------- dedup signature-index append ----------------
        docs = spark.read.parquet(_build_docs(scale, perms))
        n_docs = docs.count()
        idx = os.path.join(WORK, f"sigidx_{scale}x")
        shutil.rmtree(idx, ignore_errors=True)  # fresh build per run
        t0 = time.perf_counter()
        write_signature_index(
            docs, "doc_id", "text", idx,
            n_bands=N_BANDS, shingle_n=SHINGLE_N,
        )
        build_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        survivors = near_dedup_incremental(
            doc_batch, idx, "doc_id", "text", update_index=False
        ).count()
        probe_sec = time.perf_counter() - t0
        # read-volume instrumentation: index sig rows inside the batch's
        # probed sig_bucket partitions (the same bucket derivation the
        # production probe uses)
        bsigs = _band_signature_frame(
            shingle_rows(doc_batch, "doc_id", "text", SHINGLE_N),
            "doc_id", N_BANDS,
        ).withColumn("sig_bucket", _sig_bucket(F.col("sig"), 64))
        probed = [r["sig_bucket"] for r in
                  bsigs.select("sig_bucket").distinct().collect()]
        read_rows = (
            spark.read.parquet(f"{idx}/sigs")
            .filter(F.col("sig_bucket").isin(probed))
            .count()
        )
        row = {
            "family": "dedup_incremental", "scale": scale,
            "index_docs": n_docs, "batch_docs": DOC_BATCH,
            "build_sec": round(build_sec, 2),
            "append_sec": round(probe_sec, 2),
            "survivors": survivors,
            "ms_per_batch_doc": round(1000.0 * probe_sec / DOC_BATCH, 3),
            "index_rows_in_probed_buckets": read_rows,
            "buckets_probed": len(probed), "buckets_total": 64,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

        # ---------------- ANN LSH-index append ----------------
        emb = spark.read.parquet(_build_emb(spark, scale))
        n_vecs = emb.count()
        for mode, planes in (
            ("fixed6", 6),
            ("auto", auto_n_planes(n_vecs)),
        ):
            annidx = os.path.join(WORK, f"annidx_{scale}x_{mode}")
            shutil.rmtree(annidx, ignore_errors=True)
            t0 = time.perf_counter()
            lsh_write_partitioned(emb, annidx, n_planes=planes, seed=0)
            abuild_sec = time.perf_counter() - t0
            t0 = time.perf_counter()
            appended = ann_index_append(vec_batch, annidx)
            append_sec = time.perf_counter() - t0
            bb = [
                r["bucket"]
                for r in vec_batch.select(
                    hyperplane_bucket(
                        F.col("embedding"), planes, 0, 64
                    ).alias("bucket")
                ).distinct().collect()
            ]
            aread = (
                spark.read.parquet(annidx)
                .filter(F.col("bucket").isin(bb))
                .count()
            )
            arow = {
                "family": "ann_index_append", "scale": scale, "mode": mode,
                "index_vecs": n_vecs, "batch_vecs": VEC_BATCH,
                "n_planes": planes,
                "build_sec": round(abuild_sec, 2),
                "append_sec": round(append_sec, 2),
                "appended": appended,
                "ms_per_batch_vec": round(1000.0 * append_sec / VEC_BATCH, 3),
                "index_rows_in_probed_buckets": aread,
                "buckets_probed": len(bb), "buckets_total": 2 ** planes,
            }
            results.append(arow)
            print(json.dumps(arow), flush=True)

    print(json.dumps({
        "metric": "incremental_append_scaling",
        "doc_batch": DOC_BATCH, "vec_batch": VEC_BATCH,
        "host": {"before": host_before, "load_guard": guard},
        "rows": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
    # own artifacts only (the scale_minhash lesson, ADVICE r12): the doc
    # and embedding replica caches belong to scale_ppjoin / scale_ann
    shutil.rmtree(WORK, ignore_errors=True)
