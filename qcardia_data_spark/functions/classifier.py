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
