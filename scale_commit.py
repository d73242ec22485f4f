#!/usr/bin/env python
"""Partitioned-append COMMIT-cost panel (VERDICT r15 #5): the standing
indexes append with ``mode("append").partitionBy(bucket)`` — the commit
protocol touches one directory per written bucket. The probe (read) side
was made flat in index size in r15 (read_pruned_partitions); this panel
measures the WRITE side: wall time of the append itself against indexes
of 512 / 2048 / 8192 total directories, with a fixed batch.

What is timed: ONLY the two partitioned append writes (sigs +
shingle_sets) of a pre-signed batch — the batch's signature/set frames
are materialized (localCheckpoint) BEFORE the clock starts, so the
reading is commit protocol + parquet encode of fixed bytes, not shingle
compute. Reported per scale: write wall (min over fresh index copies),
directories touched by the batch (the per-directory commit term),
total directories in the index.

Interpretation: wall should grow with DIRS TOUCHED (more task commits,
more directory renames) and be FLAT in TOTAL index size at fixed batch.
Super-linearity in dirs-touched would indict the per-directory commit
protocol (guide §6 — RPC-priced on object stores; staged-move batching
would be the fix).

Run idle (bench_common load guard). Committed as SCALE_COMMIT_r16.json.
"""

from __future__ import annotations

import json
import os
import shutil
import time

WORK = "/tmp/qds_commit_scale_v1"
BUCKET_COUNTS = (512, 2048, 8192)
BATCH_DOCS = 2000
REPEATS = 2


def main() -> None:
    from pyspark.sql import functions as F

    from bench_common import host_state, wait_for_idle_host
    from qcardia_data_spark import get_spark
    from qcardia_data_spark.functions.dedup import (
        _band_signature_frame,
        _id_bucket,
        _sig_bucket,
        shingle_rows,
        write_signature_index,
    )

    host_before, guard = wait_for_idle_host(host_state())
    spark = get_spark(app_name="qds-scale-commit")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    base = docs.filter(F.col("doc_id") < 3000)  # standing corpus
    batch = (
        docs.filter((F.col("doc_id") >= 3000) & (F.col("doc_id") < 3000 + BATCH_DOCS))
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )

    # Pre-sign the batch ONCE (untimed): the panel times the commit, not
    # the signing. localCheckpoint freezes the frames.
    sh = shingle_rows(batch, "doc_id", "text").localCheckpoint(eager=True)
    sigs = _band_signature_frame(sh, "doc_id", 8).localCheckpoint(eager=True)
    sets = (
        sh.groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("shingles"))
        .localCheckpoint(eager=True)
    )

    from qcardia_data_spark.sources.writers import cluster_for_partitioned_write

    rows = []
    for n_buckets in BUCKET_COUNTS:
        sig_b = sigs.withColumn("sig_bucket", _sig_bucket(F.col("sig"), n_buckets))
        set_b = sets.withColumn("id_bucket", _id_bucket(F.col("doc_id"), n_buckets))
        dirs_touched_sig = sig_b.select("sig_bucket").distinct().count()
        dirs_touched_set = set_b.select("id_bucket").distinct().count()
        # two arms per scale: "plain" = the bare partitionBy write (the
        # pre-r16 production shape, kept as the panel's control), and
        # "clustered" = cluster_for_partitioned_write first — what every
        # production index writer does since r16.
        walls: dict[str, list[float]] = {"plain": [], "clustered": []}
        # standing index built ONCE per scale (untimed — it only fixes the
        # TOTAL dir count); each timed append runs against a fresh COPY so
        # the appends never stack
        master = f"{WORK}/idx_{n_buckets}_master"
        shutil.rmtree(master, ignore_errors=True)
        write_signature_index(
            base, "doc_id", "text", master,
            n_bands=8, n_sig_buckets=n_buckets, n_id_buckets=n_buckets,
        )
        for rep in range(REPEATS):
            for arm in ("plain", "clustered"):
                path = f"{WORK}/idx_{n_buckets}_{arm}_{rep}"
                shutil.rmtree(path, ignore_errors=True)
                shutil.copytree(master, path)
                if arm == "clustered":
                    s_w = cluster_for_partitioned_write(sig_b, "sig_bucket")
                    t_w = cluster_for_partitioned_write(set_b, "id_bucket")
                else:
                    s_w, t_w = sig_b, set_b
                t0 = time.perf_counter()
                s_w.write.mode("append").partitionBy("sig_bucket").parquet(
                    f"{path}/sigs"
                )
                t_w.write.mode("append").partitionBy("id_bucket").parquet(
                    f"{path}/shingle_sets"
                )
                walls[arm].append(round(time.perf_counter() - t0, 3))
        total_dirs = sum(
            1
            for d in os.listdir(f"{WORK}/idx_{n_buckets}_plain_0/sigs")
            if d.startswith("sig_bucket=")
        )
        row = {
            "n_buckets": n_buckets,
            "total_sig_dirs": total_dirs,
            "batch_docs": BATCH_DOCS,
            "dirs_touched_sigs": dirs_touched_sig,
            "dirs_touched_sets": dirs_touched_set,
            "append_write_wall_sec_plain": min(walls["plain"]),
            "append_write_wall_sec_clustered": min(walls["clustered"]),
            "walls": walls,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({
        "metric": "partitioned_append_commit_wall",
        "rows": rows,
        "host": {"before": host_before, "after": host_state()},
        "load_guard": guard,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
