"""Quality classifier (functions/classifier.py): learnability, map-only
scoring, deterministic Pareto gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.functions.classifier import (
    pareto_keep,
    score_quality,
    train_quality_classifier,
)


def _corpus(spark, n=400):
    # positives carry curated-marker tokens; negatives carry crawl markers;
    # both share filler so the task is learnable but not degenerate
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        markers = "wiki cite ref article" if pos else "click spam free winner"
        rows.append((i, f"common filler text {markers} number{i % 7}", pos))
    return spark.createDataFrame(rows, ["doc_id", "text", "is_pos"])


def test_classifier_learns_separable_labels(spark):
    docs = _corpus(spark)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    hold = docs.filter(F.col("doc_id") % 5 == 0)
    model = train_quality_classifier(train, F.col("is_pos"), n_features=256)
    scored = score_quality(model, hold)
    acc = scored.filter(
        (F.col("quality_score") > 0.5) == F.col("is_pos")
    ).count() / hold.count()
    assert acc > 0.95
    # scoring keeps original columns and adds exactly the score
    assert set(scored.columns) == {"doc_id", "text", "is_pos", "quality_score"}


def test_score_quality_is_map_only(spark):
    docs = _corpus(spark, n=100)
    model = train_quality_classifier(docs, F.col("is_pos"), n_features=128)
    plan = (
        score_quality(model, docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # model broadcast, no shuffle


def test_pareto_keep_prefers_high_scores_and_is_deterministic(spark):
    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / n).cast("double").alias("s"),  # uniform scores 0..1
    )
    kept = pareto_keep(df, "s", "doc_id", alpha=9.0, seed=1)
    # P(keep | s) = (2 - s)^-alpha for a Lomax(alpha) draw: ~0.2% at
    # s=0.1, ~42% at s=0.9, ~96% at s=0.995 — the gate is aggressive by
    # design (GPT-3 kept ~10% of CommonCrawl)
    top = kept.filter(F.col("s") > 0.99).count() / (0.01 * n)
    lo = kept.filter(F.col("s") < 0.2).count() / (0.2 * n)
    hi = kept.filter(F.col("s") > 0.8).count() / (0.2 * n)
    assert top > 0.85        # near-1 scores almost always survive
    assert hi > 5 * max(lo, 1e-9)  # strongly monotone in score
    assert lo < 0.05         # low scores mostly dropped...
    assert kept.filter(F.col("s") < 0.5).count() > 0  # ...not censored
    assert 0.05 < kept.count() / n < 0.25  # overall ~10-15% keep rate
    again = pareto_keep(df, "s", "doc_id", alpha=9.0, seed=1)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # different seed -> different survivor set (it IS stochastic)
    other = pareto_keep(df, "s", "doc_id", alpha=9.0, seed=2)
    assert sorted(r["doc_id"] for r in other.collect()) != sorted(
        r["doc_id"] for r in kept.collect()
    )


def test_frozen_model_scores_streaming_ingestion(spark, sf_dir):
    # the 100 TB ingestion shape: train the quality model once on a batch
    # slice, then score documents as they ARRIVE — score_quality is
    # map-only, so the same code runs unchanged under Structured Streaming
    import os

    from qcardia_data_spark import streaming as _  # noqa: F401 (package init)
    from qcardia_data_spark.streaming.events import run_to_memory

    batch = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    model = train_quality_classifier(
        batch, F.col("lang") == "en", n_features=256
    )
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(sf_dir, "documents.*"))
    )
    scored_stream = score_quality(model, stream).select("doc_id", "quality_score")
    got = {r["doc_id"]: r["quality_score"] for r in run_to_memory(scored_stream).collect()}
    want = {r["doc_id"]: r["quality_score"]
            for r in score_quality(model, batch).select("doc_id", "quality_score").collect()}
    assert got == want  # stream scores == batch scores, doc for doc


def test_frozen_coefficient_scoring_matches_numpy_replay(spark):
    # score_frozen_quality with plan-literal coefficients must equal a
    # local numpy replay of sigmoid(intercept + coef·tf) over the same
    # md5 buckets — the invariant the DuckDB oracle of
    # text_quality_classifier relies on
    import hashlib
    import math
    import re

    from qcardia_data_spark.functions.classifier import (
        score_frozen_quality,
        train_frozen_quality_classifier,
    )

    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "pack my box with five dozen liquor jugs", "en"),
        (2, "el rapido zorro marron salta sobre el perro", "es"),
        (3, "le renard brun rapide saute sur le chien", "fr"),
        (4, "", "en"),  # zero tokens -> sigmoid(intercept)
        (5, "fox fox fox fox fox", "en"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    n = 32
    coefs, b = train_frozen_quality_classifier(
        docs, F.col("lang") == "en", n_buckets=n, max_iter=20
    )
    assert len(coefs) == n
    got = {
        r["doc_id"]: r["quality_score"]
        for r in score_frozen_quality(docs, coefs, b).collect()
    }

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % n

    for doc_id, text, _ in rows:
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower().strip()) if w]
        z = b + sum(coefs[bucket(w)] for w in toks)
        assert abs(got[doc_id] - 1.0 / (1.0 + math.exp(-z))) < 1e-12
    assert abs(got[4] - 1.0 / (1.0 + math.exp(-b))) < 1e-15
