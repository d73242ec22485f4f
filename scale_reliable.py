#!/usr/bin/env python
"""reliable_dir overhead yardstick (VERDICT r13 stretch #7): the
availability knobs are equality-tested (same values with the knob on or
off) but their COST was unmeasured — "cheaper when the cluster is
reliable" is a claim, not a number. This measures the two heavyweight
consumers on the bench_ext corpus:

- ``near_dedup_keep_best`` — with reliable_dir, the signature table AND
  the CC fixpoint (edges + per-round labels) persist as parquet instead
  of localCheckpoint executor blocks.
- ``connected_components_star`` on a deliberately deep graph (a 20k-node
  path: worst-case diameter, many alternation rounds) — with
  reliable_every 1 (every round file-backed) and 4 (every 4th round;
  the availability/cost dial).

Method: best-of-N wall seconds per variant, same session, noop-free
(.count() forces the full job; results are tiny). The DELTA is the price
of executor-loss survivability; on a real cluster it buys not re-running
the whole job when a node dies mid-fixpoint. Prints one JSON line.

Run idle (bench_common load guard); run bench_ext.py once first (builds
the 125k-doc corpus).
"""

from __future__ import annotations

import json
import os
import shutil
import time

CORPUS = "/tmp/qds_ext_corpus_v1"
WORK = "/tmp/qds_reliable_scale_v1"
REPEATS = int(os.environ.get("SPARK_GRAFT_YARDSTICK_REPEATS", "2"))
PATH_NODES = 20_000


def main() -> None:
    from bench_common import host_state, wait_for_idle_host
    from qcardia_data_spark import get_spark
    from qcardia_data_spark.functions.dedup import near_dedup_keep_best
    from qcardia_data_spark.functions.graph import connected_components_star

    host_before, guard = wait_for_idle_host(host_state())
    if not os.path.isdir(os.path.join(CORPUS, "documents.parquet")):
        raise SystemExit("run bench_ext.py first (builds the 1x corpus)")
    shutil.rmtree(WORK, ignore_errors=True)
    spark = get_spark(app_name="qds-reliable-scale")
    docs = spark.read.parquet(os.path.join(CORPUS, "documents.parquet"))
    n_docs = docs.count()  # warms footers/cache

    from pyspark.sql import functions as F

    edges = (
        spark.range(PATH_NODES - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        .localCheckpoint(eager=True)
    )
    edges.count()

    def best_of(fn):
        samples = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            n = fn()
            samples.append(round(time.perf_counter() - t0, 2))
        return min(samples), n, samples

    rows = []

    def record(op, variant, fn):
        sec, n, samples = best_of(fn)
        row = {"op": op, "variant": variant, "sec": sec,
               "runs": samples, "rows_out": n}
        rows.append(row)
        print(json.dumps(row), flush=True)

    record(
        "near_dedup_keep_best", "localCheckpoint",
        lambda: near_dedup_keep_best(docs, "doc_id", "text").count(),
    )
    record(
        "near_dedup_keep_best", "reliable_dir",
        lambda: near_dedup_keep_best(
            docs, "doc_id", "text", reliable_dir=os.path.join(WORK, "kb")
        ).count(),
    )
    record(
        "connected_components_star", "localCheckpoint",
        lambda: connected_components_star(edges, "src", "dst").count(),
    )
    record(
        "connected_components_star", "reliable_every=1",
        lambda: connected_components_star(
            edges, "src", "dst",
            reliable_dir=os.path.join(WORK, "cc1"), reliable_every=1,
        ).count(),
    )
    record(
        "connected_components_star", "reliable_every=4",
        lambda: connected_components_star(
            edges, "src", "dst",
            reliable_dir=os.path.join(WORK, "cc4"), reliable_every=4,
        ).count(),
    )

    print(json.dumps({
        "metric": "reliable_dir_overhead",
        "corpus_docs": n_docs, "path_nodes": PATH_NODES,
        "host": {"before": host_before, "after": host_state()},
        "load_guard": guard,
        "rows": rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
    shutil.rmtree(WORK, ignore_errors=True)
