#!/usr/bin/env python
"""PPJoin scaling yardstick (VERDICT r10 stretch #7): measure
`ngram_jaccard_join` end-to-end at 1x/2x/4x the EXT corpus, plus the
prune ratio (prefix-join candidate pairs before vs after the two
lossless PPJoin filters) — the winnow 1x/2x/4x table's sibling.

Replica construction mirrors the winnow measurement: each extra replica
is the WHOLE 1x corpus under a distinct global alphabet permutation that
is NOT a rotation (reversal / pair-swap composed with the copies' 25
rotations stay pairwise-distinct permutations — asserted), so replicas
keep their internal near-dup structure but are mutually dissimilar:
output pairs and true workload scale linearly with corpus size.

Prints one JSON line per scale: {"docs": N, "sec": t, "pairs": P,
"cand_prefix": C0, "cand_pruned": C1, "prune_x": C0/C1, "ms_per_doc": m}.
Run idle (the bench_common load guard applies).
"""

from __future__ import annotations

import json
import os
import shutil
import time

BASE = "/tmp/qds_ext_corpus_v1/documents.parquet"  # bench_ext 1x corpus
SCALED = "/tmp/qds_ppjoin_scale_v1"
ALPHA = "abcdefghijklmnopqrstuvwxyz"
THRESH = 0.6


def _perms() -> list[str]:
    """Global permutations for replica blocks 1..3 — none a rotation, and
    composed with the 25 copy-rotations all 100 alphabets stay distinct."""
    rev = ALPHA[::-1]
    swap = "".join(
        ALPHA[i + 1] + ALPHA[i] for i in range(0, 26, 2)
    )  # badcfehg...
    revswap = "".join(rev[i + 1] + rev[i] for i in range(0, 26, 2))
    perms = [ALPHA, rev, swap, revswap]
    rots = [ALPHA[k:] + ALPHA[:k] for k in range(26)]
    composed = set()
    for p in perms:
        for r in rots[:25]:
            # copy-rotation r then global perm p: char c -> p[index(r[c])]
            composed.add("".join(p[ALPHA.index(r[ALPHA.index(c)])]
                                 for c in ALPHA))
    assert len(composed) == 4 * 25, "replica permutations collide"
    return perms


def _build(scale: int, perms: list[str]) -> str:
    """Replica blocks 0..scale-1; block r = 1x corpus under perms[r],
    doc ids offset by r * 100M (above the 25M-wide 1x id space)."""
    out = os.path.join(SCALED, f"docs_{scale}x.parquet")
    done = os.path.join(out, "_complete")
    # completion marker, not bare isdir: an interrupted build leaves a
    # partial dir that a rerun must rebuild, not silently reuse (a half
    # corpus labeled 4x would publish wrong scaling numbers, no error)
    if os.path.exists(done):
        return out
    shutil.rmtree(out, ignore_errors=True)
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for r in range(scale):
        con.execute(
            f"""
            COPY (
              SELECT doc_id + {r * 100_000_000} AS doc_id,
                     translate(text, '{ALPHA}', '{perms[r]}') AS text
              FROM read_parquet('{BASE}/*.parquet'))
            TO '{out}/block-{r}.parquet' (FORMAT PARQUET)
            """
        )
    con.close()
    open(done, "w").close()
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from bench_common import host_state, wait_for_idle_host
    from qcardia_data_spark import get_spark
    from qcardia_data_spark.functions.dedup import (
        _ceil_loose,
        _ranked_encoded_shingles,
        ngram_jaccard_join,
        shingle_rows,
        spread_small_scan,
    )

    host_before, guard = wait_for_idle_host(host_state())
    if not os.path.isdir(BASE):
        raise SystemExit("run bench_ext.py first (builds the 1x corpus)")
    perms = _perms()
    spark = get_spark(app_name="qds-ppjoin-scale")
    results = []
    for scale in (1, 2, 4):
        path = _build(scale, perms)
        docs = spark.read.parquet(path)
        n = docs.count()  # warms footers
        t0 = time.perf_counter()
        pairs = ngram_jaccard_join(docs, "doc_id", "text", THRESH).count()
        sec = time.perf_counter() - t0
        # prune-ratio instrumentation: replay the candidate stages the
        # way ngram_jaccard_join builds them (same helpers), counting
        # distinct (a, b) before/after the length+positional filters
        t = THRESH
        sh = shingle_rows(
            spread_small_scan(docs, "doc_id"), "doc_id", "text", 3
        ).persist()
        ranked = _ranked_encoded_shingles(sh, "doc_id")
        pref = ranked.filter(
            F.col("_rn")
            <= F.col("_sz") - _ceil_loose(F.lit(t) * F.col("_sz")) + 1
        )
        joined = pref.select(
            F.col("doc_id").alias("a"), "_sid",
            F.col("_rn").alias("_ra"), F.col("_sz").alias("_sza"),
        ).join(
            pref.select(
                F.col("doc_id").alias("b"), "_sid",
                F.col("_rn").alias("_rb"), F.col("_sz").alias("_szb"),
            ),
            "_sid",
        ).filter(F.col("a") < F.col("b"))
        cand_prefix = joined.select("a", "b").distinct().count()
        cand_pruned = (
            joined.filter(
                F.least("_sza", "_szb")
                >= _ceil_loose(F.lit(t) * F.greatest("_sza", "_szb"))
            )
            .groupBy("a", "b")
            .agg(
                F.min("_ra").alias("_ra"), F.min("_rb").alias("_rb"),
                F.first("_sza").alias("_sza"), F.first("_szb").alias("_szb"),
            )
            .filter(
                F.lit(1)
                + F.least(
                    F.col("_sza") - F.col("_ra"), F.col("_szb") - F.col("_rb")
                )
                >= _ceil_loose(
                    F.lit(t / (1.0 + t)) * (F.col("_sza") + F.col("_szb"))
                )
            )
            .count()
        )
        sh.unpersist()
        row = {
            "docs": n, "sec": round(sec, 2), "pairs": pairs,
            "cand_prefix": cand_prefix, "cand_pruned": cand_pruned,
            "prune_x": round(cand_prefix / max(cand_pruned, 1), 2),
            "ms_per_doc": round(1000.0 * sec / n, 4),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "metric": "ppjoin_scaling", "threshold": THRESH,
        "host": {"before": host_before, "load_guard": guard},
        "rows": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
    shutil.rmtree(SCALED, ignore_errors=True)
