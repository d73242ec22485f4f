"""End-to-end corpus-prep spec chain (examples/corpus_pipeline_e2e.json —
VERDICT r6 #6): one declarative pipeline covering jsonl scan, language +
quality gates, span + MinHash dedup, the frozen classifier Pareto gate,
DSIR, UniMax budgets, decontamination and sequence packing, compiled by
plans.spec.compile_pipeline."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.plans.spec import compile_pipeline


@pytest.fixture(scope="module")
def e2e_spec(spark, sf_dir, tmp_path_factory):
    spec = json.load(open("examples/corpus_pipeline_e2e.json"))
    jsonl = str(tmp_path_factory.mktemp("e2e") / "docs_jsonl")
    (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .write.mode("overwrite").json(jsonl)
    )
    spec["pipeline"][0]["path"] = jsonl
    return spec


def test_e2e_chain_runs_and_gates_monotonically(spark, sf_dir, e2e_spec):
    ops = e2e_spec["pipeline"]
    # row count after each doc-level gate must be non-increasing (every
    # stage up to packing is a filter/dedup over whole documents)
    gate_prefix_ends = [
        i + 1
        for i, op in enumerate(ops)
        if op["op"] in ("filter", "quality_filter", "gopher_rules", "near_dedup",
                        "quality_classifier", "dsir_weights", "unimax_mix",
                        "decontaminate")
    ]
    counts = [
        compile_pipeline(spark, ops[:end], sf_dir).count()
        for end in gate_prefix_ends
    ]
    assert counts[0] > 0
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    # the chain must actually select (not pass everything through)
    assert counts[-1] < counts[0]


def test_e2e_chain_final_output_shape(spark, sf_dir, e2e_spec):
    out = compile_pipeline(spark, e2e_spec["pipeline"], sf_dir)
    rows = out.collect()
    assert rows, "pipeline selected nothing"
    assert out.columns == ["doc_id", "lang", "source", "n_tokens",
                           "quality_score", "dsir_logw", "pack_id",
                           "pack_offset", "n_spans"]
    # packing invariants: offsets are non-negative and every span fits the
    # 256-token sequence (pack_offset is the span's start inside its pack)
    for r in rows:
        assert r["pack_id"] >= 0 and 0 <= r["pack_offset"] < 256
    # surviving docs all carry the gate columns
    assert all(r["quality_score"] is not None for r in rows)
    assert all(r["dsir_logw"] is not None for r in rows)
    # deterministic: recompiling the same spec gives the same selection
    again = compile_pipeline(spark, e2e_spec["pipeline"], sf_dir)
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in again.select("doc_id").collect()
    )


def test_frozen_classifier_spec_op_matches_function(spark, sf_dir, e2e_spec):
    # the spec's frozen form must equal score_frozen_quality + pareto_keep
    # called directly with the same literals
    from qcardia_data_spark.functions.classifier import (
        pareto_keep,
        score_frozen_quality,
    )

    qc = next(op for op in e2e_spec["pipeline"]
              if op["op"] == "quality_classifier")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    via_spec = compile_pipeline(
        spark,
        [{"op": "source", "table": "documents"}, qc],
        sf_dir,
    ).select("doc_id", F.round("quality_score", 9).alias("s"))
    direct = pareto_keep(
        score_frozen_quality(docs, qc["coefs"], qc["intercept"]),
        "quality_score", "doc_id", alpha=qc["pareto_alpha"], seed=qc["seed"],
    ).select("doc_id", F.round("quality_score", 9).alias("s"))
    assert sorted(map(tuple, via_spec.collect())) == sorted(
        map(tuple, direct.collect())
    )
