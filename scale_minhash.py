#!/usr/bin/env python
"""MinHash-LSH scaling yardstick (VERDICT r11 #3): measure
`near_dedup_minhash` end-to-end at 1x/2x/4x the EXT corpus, plus the
candidate-volume instrumentation — the third panel of the scaling
trilogy (winnow r8, PPJoin r11, MinHash-LSH here). The family most
users reach for first, and the heaviest headline key (~3 s at sf0.1),
previously defended only by the structural argument (banded join,
star-hub guard, no all-pairs stage); this measures it.

Replica machinery is scale_ppjoin.py's, imported verbatim (VERDICT r11
§3: "reuse scale_ppjoin.py's permuted-replica corpus machinery"): each
extra replica is the whole 1x corpus under a distinct global alphabet
permutation that is not a rotation, so replicas keep their internal
near-dup structure but are mutually dissimilar — LSH buckets never span
replicas, and true workload scales linearly with corpus size.

Prints one JSON line per scale: {"docs": N, "sec": t, "survivors": S,
"cand_pairs": C, "verified_pairs": V, "verify_x": C/V, "ms_per_doc": m}
and a final summary line. Run idle (the bench_common load guard
applies); run bench_ext.py once first (builds the 1x corpus).
"""

from __future__ import annotations

import json
import os
import time

from scale_ppjoin import BASE, _build, _perms

N_BANDS = 8
SHINGLE_N = 3
THRESH = 0.6


def main() -> None:
    from pyspark.sql import functions as F

    from bench_common import host_state, wait_for_idle_host
    from qcardia_data_spark import get_spark
    from qcardia_data_spark.functions.dedup import (
        _band_signature_frame,
        jaccard_verify_sets,
        lsh_candidate_pairs,
        near_dedup_minhash,
        shingle_rows,
        spread_small_scan,
    )

    host_before, guard = wait_for_idle_host(host_state())
    if not os.path.isdir(BASE):
        raise SystemExit("run bench_ext.py first (builds the 1x corpus)")
    perms = _perms()
    spark = get_spark(app_name="qds-minhash-scale")
    results = []
    for scale in (1, 2, 4):
        path = _build(scale, perms)
        docs = spark.read.parquet(path)
        n = docs.count()  # warms footers
        t0 = time.perf_counter()
        survivors = near_dedup_minhash(
            docs, "doc_id", "text",
            n_bands=N_BANDS, shingle_n=SHINGLE_N, threshold=THRESH,
        ).count()
        sec = time.perf_counter() - t0
        # candidate-volume instrumentation: replay the pipeline's stages
        # with the same helpers, counting the banded-join candidate set
        # and the verified (Jaccard >= t) pair set — the two quantities
        # whose growth law decides whether the op survives 100 TB
        sh = shingle_rows(
            spread_small_scan(docs, "doc_id"), "doc_id", "text", SHINGLE_N
        ).persist()
        sigs = _band_signature_frame(sh, "doc_id", N_BANDS).localCheckpoint(
            eager=True
        )
        cands = lsh_candidate_pairs(
            sigs, "doc_id", max_bucket_size=1000, hub_ranks=[0, 1]
        ).persist()
        cand_pairs = cands.count()
        verified = jaccard_verify_sets(cands, sh, "doc_id", THRESH).count()
        cands.unpersist()
        sh.unpersist()
        row = {
            "docs": n, "sec": round(sec, 2), "survivors": survivors,
            "cand_pairs": cand_pairs, "verified_pairs": verified,
            "verify_x": round(cand_pairs / max(verified, 1), 2),
            "ms_per_doc": round(1000.0 * sec / n, 4),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({
        "metric": "minhash_lsh_scaling", "threshold": THRESH,
        "n_bands": N_BANDS, "shingle_n": SHINGLE_N,
        "host": {"before": host_before, "load_guard": guard},
        "rows": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
    # Deliberately NO cleanup of /tmp/qds_ppjoin_scale_v1 (ADVICE r12):
    # that replica-corpus cache is OWNED by scale_ppjoin.py — deleting it
    # here silently forced the ppjoin yardstick to rebuild its corpora on
    # the next run. This script writes no artifacts of its own; the shared
    # cache is rebuilt lazily by whichever yardstick needs it.
