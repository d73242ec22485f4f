#!/usr/bin/env python
"""End-to-end demo of the engine's lifecycle — the `demo/demo.ipynb` analog.

Runs, in order, on the driver's synthetic tables (sf dir as argv[1],
default sf0.001):

1. reformat: raw binary blobs → decoded frames → ED/ES → cropped records
2. cache + DataModule: fingerprint-keyed materialization, subject split,
   weighted serving frames
3. composed augmentation over the serving frame
4. predictor: model forward → per-subject → whole-set summary
5. corpus prep: text quality gate → exact dedup → MinHash near-dedup →
   duplicate clusters
6. similarity: exact top-k vs IVF probe

Usage: python examples/end_to_end.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qcardia_data_spark import get_spark  # noqa: E402
from qcardia_data_spark.functions import dedup as D  # noqa: E402
from qcardia_data_spark.functions import similarity as SIM  # noqa: E402
from qcardia_data_spark.functions.compose import apply_composed  # noqa: E402
from qcardia_data_spark.plans.data_module import DataModule  # noqa: E402
from qcardia_data_spark.predictor import DataPredictor  # noqa: E402
from qcardia_data_spark.queries import QUERIES  # noqa: E402
from qcardia_data_spark.reformat import reformat_volumes  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="qds-demo")
    tmp = tempfile.mkdtemp(prefix="qds-demo-")

    print("== 1. reformat (raw binaries → records) ==")
    raw = os.path.join(tmp, "raw")
    os.makedirs(raw)
    for i in range(4):
        with open(os.path.join(raw, f"subj{i}.bin"), "wb") as f:
            f.write(os.urandom(256))
    records, meta = reformat_volumes(spark, raw, dataset="demo", n_frames=4)
    meta.orderBy("subject").show(truncate=False)

    print("== 2. DataModule (cache → split → weighted serve) ==")
    dm = DataModule(spark, {
        "sf_dir": sf_dir,
        "cache_root": os.path.join(tmp, "cache"),
        "pipeline": [{"op": "source", "table": "orders"}],
        "subject_col": "o_custkey",
        "split": {"valid_fraction": 0.2, "seed": "demo"},
        "weight_cols": ["o_orderstatus"],
    }).setup()
    dm.summary().show()

    print("== 3. composed augmentation over embeddings ==")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    aug = apply_composed(
        emb.select("vec_id", "embedding"),
        [{"t": "normalize"}, {"t": "solarize", "prob": 0.3, "seed": 1},
         {"t": "clamp", "lo": 0.0, "hi": 1.0}],
        "embedding", "vec_id",
    )
    aug.select("vec_id", F.round(F.element_at("embedding", 1), 4).alias("x0")).show(3)

    print("== 4. predictor (forward → two-level summary) ==")
    frames = records.select(
        F.col("subject"), F.col("frame_nr").alias("record_id"), "pixels"
    )
    DataPredictor(frames, "subject").run().show()

    print("== 5. corpus prep (quality → dedup → clusters) ==")
    quality = QUERIES["text_quality_filter"][0](spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).join(
        quality.select("doc_id"), "doc_id", "left_semi"
    )
    exact = D.exact_dedup(docs, "doc_id", "text")
    near = D.near_dedup_minhash(docs, "doc_id", "text")
    print(f"docs: {docs.count()} → exact-dedup: {exact.count()} → near-dedup: {near.count()}")

    print("== 6. similarity (exact vs IVF) ==")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    SIM.cosine_topk(emb, q, k=5).show()
    SIM.ann_ivf_topk(emb, q, k=5, n_cells=8, n_probe=2).show()

    print("demo complete; artifacts under", tmp)


if __name__ == "__main__":
    main()
