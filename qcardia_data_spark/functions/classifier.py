"""[ext] Learned document-quality classifier (SURVEY §2.14).

The GPT-3/PaLM-style corpus-quality gate: train a logistic-regression
classifier on hashed token features to separate a curated slice (positive)
from the raw crawl (negative), score every document with P(curated), and
keep documents by a Pareto-smoothed stochastic threshold
(`np.random.pareto(alpha) > 1 - score` in the GPT-3 appendix — here the
draw is keyed-md5 deterministic, so reruns and task retries keep the same
documents).

Built on Spark ML only (JVM-side, distributed):
- `HashingTF` = the hashing trick over the engine's `word_tokens`
  tokenizer — no vocabulary build, bounded feature width at any corpus
  size (same reasoning as DSIR's hashed n-gram model).
- `LogisticRegression` trains via distributed L-BFGS `treeAggregate`
  passes; the model object is a dense coefficient vector bounded by
  `n_features` → broadcastable, scoring is a map-only pass.

Complements `selection.dsir_log_weights` (model-free importance
weighting): DSIR needs only a target SLICE, the classifier needs labels
but learns feature interactions. Both are standard pretraining-corpus
gates; a pipeline typically scores with both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qcardia_data_spark.functions.text import word_tokens

_TOKS = "_qc_toks"
_RAW = "_qc_tf"
_LABEL = "_qc_label"


def train_quality_classifier(
    docs: DataFrame,
    is_positive: Column,
    text_col: str = "text",
    n_features: int = 4096,
    reg_param: float = 0.01,
    max_iter: int = 30,
):
    """Fit HashingTF → LogisticRegression on curated-vs-raw labels.

    ``is_positive`` is a boolean Column over ``docs`` (the curated slice).
    Returns the fitted PipelineModel. Training cost: `max_iter`
    treeAggregate passes over the featurized corpus; at 100 TB train on a
    uniform sample (a quality model does not need every negative) and
    score the full corpus with the frozen model — scoring is map-only.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    train = docs.select(
        word_tokens(F.col(text_col)).alias(_TOKS),
        is_positive.cast("double").alias(_LABEL),
    )
    tf = HashingTF(inputCol=_TOKS, outputCol=_RAW, numFeatures=n_features)
    lr = LogisticRegression(
        featuresCol=_RAW, labelCol=_LABEL, regParam=reg_param, maxIter=max_iter
    )
    return Pipeline(stages=[tf, lr]).fit(train)


def score_quality(
    model,
    docs: DataFrame,
    text_col: str = "text",
    out: str = "quality_score",
) -> DataFrame:
    """Attach P(curated) for every document (map-only: the model
    broadcasts; no shuffle). Keeps all original columns."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(docs.withColumn(_TOKS, word_tokens(F.col(text_col))))
    return scored.withColumn(
        out, vector_to_array(F.col(model.stages[-1].getProbabilityCol()))[1]
    ).drop(_TOKS, _RAW, model.stages[-1].getRawPredictionCol(),
           model.stages[-1].getPredictionCol(),
           model.stages[-1].getProbabilityCol())


def frozen_feature_tf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """(id, bucket, tf) unigram term frequencies over the md5 feature hash
    (reuses ``selection.hashed_gram_rows`` so the bucket function is the
    SAME cross-engine-stable ``conv(md5(w)[:8], 16) % n`` as DSIR's — any
    SQL engine can replay it, unlike Spark ML HashingTF's murmur3).
    One tokenize+explode pass; map-side-combined counts."""
    from qcardia_data_spark.functions.selection import hashed_gram_rows

    rows = hashed_gram_rows(docs, id_col, text_col, ns=(1,), n_buckets=n_buckets)
    return rows.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )


def train_frozen_quality_classifier(
    docs: DataFrame,
    is_positive: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> tuple[list[float], float]:
    """Fit LogisticRegression over the md5-bucket tf features and return
    ``(coefficients, intercept)`` as plain floats, meant to be FROZEN as
    plan literals (the GPT-3 recipe ships the trained gate, not the
    training job — scoring with frozen weights is map-only and exactly
    replayable in any engine, which makes the whole quality gate
    oracle-checkable). Training is distributed (L-BFGS treeAggregate);
    at 100 TB train on a sample, score the full corpus frozen."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    tf = frozen_feature_tf(docs, id_col, text_col, n_buckets)
    dense = tf.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "tf"))).alias("_m")
    )
    feats = [
        F.coalesce(F.col("_m")[F.lit(i)], F.lit(0.0)) for i in range(n_buckets)
    ]
    train = (
        docs.select(F.col(id_col), is_positive.cast("double").alias(_LABEL))
        .join(dense, id_col, "left")
        .select(
            _LABEL,
            array_to_vector(
                F.array(*feats)
            ).alias(_RAW),
        )
    )
    lr = LogisticRegression(
        featuresCol=_RAW, labelCol=_LABEL, regParam=reg_param, maxIter=max_iter
    )
    model = lr.fit(train)
    return [float(c) for c in model.coefficients.toArray()], float(model.intercept)


def score_frozen_quality(
    docs: DataFrame,
    coefs: list[float],
    intercept: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "quality_score",
) -> DataFrame:
    """Map-only P(curated) scoring with FROZEN coefficients: sigmoid of
    ``intercept + Σ_b coef[b] · tf[b]`` over md5-hashed unigram buckets.
    The coefficient vector is a plan LITERAL (no model object, no
    broadcast variable) — n_buckets-bounded, so the plan stays small;
    the only shuffle is the per-doc tf groupBy. Keeps all original
    columns; docs with zero tokens score sigmoid(intercept)."""
    n = len(coefs)
    tf = frozen_feature_tf(docs, id_col, text_col, n)
    coef_arr = F.array(*[F.lit(float(c)) for c in coefs])
    dot = (
        tf.withColumn(
            "_x", F.element_at(coef_arr, F.col("bucket") + F.lit(1)) * F.col("tf")
        )
        .groupBy(id_col)
        .agg(F.sum("_x").alias("_dot"))
    )
    z = F.lit(float(intercept)) + F.coalesce(F.col("_dot"), F.lit(0.0))
    return (
        docs.join(dot, id_col, "left")
        .withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
        .drop("_dot")
    )


def pareto_keep(
    scored: DataFrame,
    score_col: str,
    key_col: str,
    alpha: float = 9.0,
    seed: int = 0,
) -> DataFrame:
    """GPT-3 Appendix-A stochastic quality gate: keep a document iff

        pareto_draw(alpha) > 1 - score

    so high-score docs almost always survive and low-score docs survive
    occasionally (keeps tail diversity instead of a hard threshold). The
    Lomax/Pareto-II draw is inverse-CDF over a keyed-md5 uniform
    (`(1-u)^(-1/alpha) - 1`) — deterministic per (seed, key): identical
    on task retry and across engines, unlike `rand()`.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(str(seed)), F.lit("pareto"),
                                  F.col(key_col).cast("string"))),
                1, 13,
            ),
            16, 10,
        ).cast("double")
        / float(16**13)
    )
    draw = F.pow(1.0 - u, F.lit(-1.0 / alpha)) - 1.0
    return scored.filter(draw > 1.0 - F.col(score_col))
