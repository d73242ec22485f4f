"""Inference + two-level aggregation — the ``DataPredictor`` lifecycle
(SURVEY §3.3) re-expressed as a Spark pipeline.

Reference flow (``src/qcardia_data/pipeline/data_predictor.py``):
re-plan data → subset select (:178-184) → model forward + inverse resample
(:206-248) → per-subject summary (:277-287) → whole-set summary (:290).

Engine flow::

    subset → mapInPandas(model_fn)            # Arrow-batched "GPU" stage
           → groupBy(subject).applyInPandas   # per-subject partial summary
           → agg(...)                         # final fold

The model is a pluggable batch callable (pandas in → pandas out). Spark's
partial/final aggregation makes the reference's hand-rolled accumulate-
then-fold (``process_summary_3d``/``process_summary_all``) a single shuffle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from qcardia_data_spark.operators.sorts import seeded_sample_n

PRED_SCHEMA_SUFFIX = [
    StructField("pred_mean", DoubleType()),
    StructField("pred_max", DoubleType()),
]

SUBJECT_SUMMARY_SCHEMA = StructType([
    StructField("subject", StringType()),
    StructField("n_records", LongType()),
    StructField("mean_pred", DoubleType()),
    StructField("max_pred", DoubleType()),
])


def default_model(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake forward pass: per-record mean/max of the pixel
    array. STUB for a real model server / ONNX / torch call — the batch
    contract (pandas in → pandas with prediction columns out) is the real
    production shape."""
    arr = pdf["pixels"].map(lambda p: np.asarray(p, dtype=np.float64))
    pdf = pdf.drop(columns=["pixels"])
    pdf["pred_mean"] = arr.map(lambda a: float(a.mean()))
    pdf["pred_max"] = arr.map(lambda a: float(a.max()))
    return pdf


class DataPredictor:
    def __init__(
        self,
        records: DataFrame,
        subject_col: str,
        model_fn: Callable[[pd.DataFrame], pd.DataFrame] = default_model,
    ):
        self.records = records
        self.subject_col = subject_col
        self.model_fn = model_fn

    def select_subjects(self, k: int | None = None, subjects: list | None = None, seed=0) -> DataFrame:
        """X5 subset select: explicit list (P5) or k seeded-random subjects
        (O4) — reference data_predictor.py:178-184."""
        df = self.records
        if subjects is not None:
            return df.filter(F.col(self.subject_col).isin(subjects))
        if k is not None:
            chosen = seeded_sample_n(
                df.select(self.subject_col).distinct(), self.subject_col, k, seed
            )
            return df.join(F.broadcast(chosen), on=self.subject_col, how="left_semi")
        return df

    def predict(self, subset: DataFrame) -> DataFrame:
        """Model forward as mapInPandas — executors stream Arrow batches
        through the model; schema = input minus pixels plus pred columns."""
        model_fn = self.model_fn
        in_fields = [f for f in subset.schema.fields if f.name != "pixels"]
        out_schema = StructType(in_fields + PRED_SCHEMA_SUFFIX)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield model_fn(pdf)

        return subset.mapInPandas(run, out_schema)

    def summarize_subjects(self, preds: DataFrame) -> DataFrame:
        """Per-subject partial summary via applyInPandas (UDAF-update analog,
        reference data_predictor.py:277-287)."""
        subject_col = self.subject_col

        def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "subject": [str(pdf[subject_col].iloc[0])],
                "n_records": [len(pdf)],
                "mean_pred": [float(pdf["pred_mean"].mean())],
                "max_pred": [float(pdf["pred_max"].max())],
            })

        return preds.groupBy(subject_col).applyInPandas(summarize, SUBJECT_SUMMARY_SCHEMA)

    def summarize_all(self, subject_summaries: DataFrame) -> DataFrame:
        """Final fold (UDAF-merge/finish analog, data_predictor.py:290)."""
        return subject_summaries.agg(
            F.count(F.lit(1)).alias("n_subjects"),
            F.sum("n_records").alias("n_records"),
            F.avg("mean_pred").alias("mean_pred"),
            F.max("max_pred").alias("max_pred"),
        )

    def run(self, k: int | None = None, subjects: list | None = None, seed=0) -> DataFrame:
        return self.summarize_all(
            self.summarize_subjects(self.predict(self.select_subjects(k, subjects, seed)))
        )
