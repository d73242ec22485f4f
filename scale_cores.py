#!/usr/bin/env python
"""Core-count scaling panel (VERDICT r15 #4): the sf0.1 headline bench is
overhead-bound — the r15 driver's 8-core run BEAT the 32-core run, so its
scaling block can no longer separate parallel from serial paths. This
panel restores that signal WITHOUT touching the sf0.1 contract: it times a
compute-heavy panel on the EXT 125k-doc / 50k-vector corpus (bench_ext's
fixed corpus — 25 alphabet-rotated sf0.1 copies) at two core counts and
reports low/high wall ratios. A genuinely parallel path should show
ratio ≈ core ratio (4× here); a serial funnel shows ratio ≈ 1.

Panel keys exercise the paths the optimization rounds touched:
- minhash_dedup   near_dedup_minhash over 125k docs (shingle/md5 compute,
                  candidate join, set verify — the headline dedup family)
- simhash64       simhash64_md5_table over 125k docs (md5-per-token votes)
- token_stats     the text_token_stats expressions over 125k docs
                  (map-only regex — embarrassingly parallel)
- window_weights  group_weights_window by (lang, source) over 125k docs
                  (the w1 operator whose SinglePartition funnel r15 removed)
- ann_pairwise    pairwise_topk_join over 50k embeddings (bucket join +
                  dot-product scoring)

Protocol: the parent spawns one child process per core count (a Spark
master is fixed per JVM); each child runs the panel min-of-REPEATS with
the noop sink and prints one JSON line; the parent merges and prints the
combined panel with ratios. Run idle; run bench_ext.py once first (or let
this script build the corpus). Committed as SCALE_CORES_r16.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CORPUS = "/tmp/qds_ext_corpus_v1"
REPEATS = int(os.environ.get("QDS_SCALE_CORES_REPEATS", "3"))
CORE_COUNTS = (32, 8)


def _panel(spark):
    from pyspark.sql import functions as F

    import qcardia_data_spark.functions.dedup as D
    import qcardia_data_spark.functions.similarity as SIM
    import qcardia_data_spark.functions.text as T
    import qcardia_data_spark.operators.aggregates as agg

    docs = spark.read.parquet(os.path.join(CORPUS, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(CORPUS, "embeddings.parquet"))

    def q_minhash_dedup():
        return D.near_dedup_minhash(
            docs, "doc_id", "text", n_bands=8, shingle_n=3, threshold=0.6
        ).select("doc_id")

    def q_simhash64():
        return D.simhash64_md5_table(docs, "doc_id", "text")

    def q_token_stats():
        toks = T.word_tokens(F.col("text"))
        norm = T.normalize_ws(F.col("text"))
        n_tokens = F.size(toks)
        n_stop = F.size(
            F.filter(toks, lambda w: w.isin("the", "and", "of", "to", "in"))
        )
        n_alpha = F.length(norm) - F.length(F.regexp_replace(norm, r"[a-z]", ""))
        return docs.filter(n_tokens > 0).select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
            F.round(n_alpha.cast("double") / F.length(norm), 6).alias("alpha_ratio"),
        )

    def q_window_weights():
        return agg.group_weights_window(
            docs.select("doc_id", "lang", "source"), ["lang", "source"]
        )

    def q_ann_pairwise():
        return SIM.pairwise_topk_join(
            emb.select(F.col("vec_id").alias("a"), "embedding"),
            emb.select(F.col("vec_id").alias("b"), "embedding"),
            k=3, id_left="a", id_right="b", n_planes=8, max_bucket_size=1000,
        ).select("a", "b", F.round("score", 6).alias("score"))

    return {
        "minhash_dedup": q_minhash_dedup,
        "simhash64": q_simhash64,
        "token_stats": q_token_stats,
        "window_weights": q_window_weights,
        "ann_pairwise": q_ann_pairwise,
    }


def child() -> None:
    from qcardia_data_spark import get_spark

    spark = get_spark(app_name=f"qds-scale-cores-{os.environ['SPARK_GRAFT_CPUS']}")
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm the page cache outside the timed region (same rationale as bench)
    for t in ("documents", "embeddings"):
        spark.read.parquet(os.path.join(CORPUS, f"{t}.parquet")).write.format(
            "noop"
        ).mode("overwrite").save()
    out: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name, fn in _panel(spark).items():
        spark.sparkContext.setJobDescription(f"scale_cores: {name}")
        samples = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = min(samples)
        runs[name] = samples
    print("CHILD_JSON " + json.dumps({"queries": out, "runs": runs}))
    spark.stop()


def main() -> None:
    if os.environ.get("QDS_SCALE_CORES_CHILD"):
        child()
        return
    if not os.path.exists(os.path.join(CORPUS, "documents.parquet")):
        from bench_ext import _build_corpus

        _build_corpus()
    from bench_common import host_state, wait_for_idle_host

    host_before, guard = wait_for_idle_host(host_state())
    results: dict[int, dict] = {}
    for cpus in CORE_COUNTS:
        env = dict(os.environ)
        env["QDS_SCALE_CORES_CHILD"] = "1"
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env, check=False,
        )
        line = next(
            (ln for ln in p.stdout.splitlines() if ln.startswith("CHILD_JSON ")),
            None,
        )
        if line is None:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
            raise SystemExit(f"child (cpus={cpus}) produced no panel JSON")
        results[cpus] = json.loads(line[len("CHILD_JSON "):])
    hi, lo = CORE_COUNTS
    ratios = {
        k: round(results[lo]["queries"][k] / results[hi]["queries"][k], 3)
        for k in results[hi]["queries"]
    }
    print(json.dumps({
        "metric": "ext_corpus_core_scaling",
        "corpus": CORPUS,
        "cpus_high": hi,
        "cpus_low": lo,
        "core_ratio": round(hi / lo, 2),
        "queries_high": results[hi]["queries"],
        "queries_low": results[lo]["queries"],
        "runs_high": results[hi]["runs"],
        "runs_low": results[lo]["runs"],
        "low_over_high_ratio": ratios,
        "host": {"before": host_before, "after": host_state()},
        "load_guard": guard,
    }))


if __name__ == "__main__":
    main()
