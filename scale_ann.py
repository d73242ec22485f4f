#!/usr/bin/env python
"""ANN pairwise-join scaling yardstick (VERDICT r11 #3 stretch): measure
`pairwise_topk_join` at 1x/2x/4x the EXT embedding corpus (50k/100k/200k
x 64-d) — the fourth panel of the scaling series (winnow r8, PPJoin r11,
MinHash-LSH r12).

Replica construction is the embedding-space analog of the text corpora's
alphabet permutations: replica r multiplies every vector elementwise by a
deterministic Rademacher (+-1) sign pattern derived from md5(r, dim).
Sign flips preserve ALL intra-replica inner products exactly (the true
near-neighbor structure replicates), while cross-replica cosines are
sign-scrambled to ~0 in 64-d — so true workload scales linearly.

Two runs per scale:
- n_planes=6 FIXED (the sf0.1 bench configuration): bucket count is
  constant, so per-bucket occupancy grows with corpus size and candidate
  volume grows ~quadratically — the hazard the auto knob exists for.
- n_planes="auto" (the 100 TB path, auto_n_planes ~ log2(N/256)): bucket
  count grows with the corpus, occupancy stays ~flat, candidates ~linear.

Prints one JSON line per (scale, mode) with wall seconds, the exact
candidate-pair count (sum over buckets of |L_b| x |R_b| after the
hot-bucket machinery — replayed with the same helpers), output rows, and
the chosen plane count. Run idle (bench_common load guard); run
bench_ext.py once first (builds the 1x corpus).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

BASE = "/tmp/qds_ext_corpus_v1/embeddings.parquet"
SCALED = "/tmp/qds_ann_scale_v1"
DIM = 64
MAX_BUCKET = 1000


def _signs(r: int) -> list[float]:
    """Deterministic Rademacher pattern for replica r (identity at r=0)."""
    if r == 0:
        return [1.0] * DIM
    return [
        1.0
        if int(hashlib.md5(f"annscale|{r}|{j}".encode()).hexdigest()[0], 16) % 2 == 0
        else -1.0
        for j in range(DIM)
    ]


def _build(spark, scale: int) -> str:
    from pyspark.sql import functions as F

    out = os.path.join(SCALED, f"emb_{scale}x.parquet")
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    base = spark.read.parquet(BASE)
    parts = []
    for r in range(scale):
        sg = F.lit(_signs(r))
        parts.append(
            base.select(
                (F.col("vec_id") + r * 100_000_000).alias("vec_id"),
                F.zip_with(
                    F.col("embedding").cast("array<double>"), sg,
                    lambda x, s: x * s,
                ).alias("embedding"),
            )
        )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(out)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from bench_common import host_state, wait_for_idle_host
    from qcardia_data_spark import get_spark
    from qcardia_data_spark.functions.similarity import (
        auto_n_planes,
        hyperplane_bucket,
        pairwise_topk_join,
    )

    host_before, guard = wait_for_idle_host(host_state())
    if not os.path.isdir(BASE):
        raise SystemExit("run bench_ext.py first (builds the 1x corpus)")
    spark = get_spark(app_name="qds-ann-scale")
    results = []
    for scale in (1, 2, 4):
        path = _build(spark, scale)
        emb = spark.read.parquet(path)
        n = emb.count()
        for mode in ("fixed", "auto"):
            planes = 6 if mode == "fixed" else auto_n_planes(n)
            t0 = time.perf_counter()
            out_rows = pairwise_topk_join(
                emb.select(F.col("vec_id").alias("a"), "embedding"),
                emb.select(F.col("vec_id").alias("b"), "embedding"),
                k=3, id_left="a", id_right="b",
                n_planes=planes, max_bucket_size=MAX_BUCKET,
            ).count()
            sec = time.perf_counter() - t0
            # exact candidate volume, replaying the join's own guard
            # machinery: cold buckets (<= cap) contribute n^2 pairs; hot
            # buckets are subdivided by extra_planes=4 and each (bucket,
            # sub) group contributes n_sub * min(n_sub, cap) (the backstop
            # caps the RIGHT side only)
            b = hyperplane_bucket(F.col("embedding"), planes, 0, DIM)
            occ = (
                emb.select(b.alias("b"))
                .groupBy("b").agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            hot = {r["b"] for r in occ if r["n"] > MAX_BUCKET}
            cand = sum(r["n"] * r["n"] for r in occ if r["b"] not in hot)
            if hot:
                sub = hyperplane_bucket(
                    F.col("embedding"), 4, 1_000_003, DIM
                )
                socc = (
                    emb.select(b.alias("b"), sub.alias("s"))
                    .filter(F.col("b").isin(list(hot)))
                    .groupBy("b", "s").agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                )
                cand += sum(r["n"] * min(r["n"], MAX_BUCKET) for r in socc)
            row = {
                "docs": n, "mode": mode, "n_planes": planes,
                "sec": round(sec, 2), "out_rows": out_rows,
                "cand_pairs": cand, "n_buckets_occupied": len(occ),
                "cand_per_vec": round(cand / n, 1),
                "ms_per_vec": round(1000.0 * sec / n, 4),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({
        "metric": "ann_pairwise_scaling", "k": 3, "max_bucket_size": MAX_BUCKET,
        "host": {"before": host_before, "load_guard": guard},
        "rows": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
    shutil.rmtree(SCALED, ignore_errors=True)
