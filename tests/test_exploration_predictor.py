"""Tests for the exploration summary frame (A4) and the DataPredictor
two-level aggregation lifecycle (A10 / SURVEY §3.3)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.catalog import load_table
from qcardia_data_spark.exploration import exploration_frame, median_spacing, with_unit_conversion
from qcardia_data_spark.predictor import DataPredictor


def test_exploration_frame_layout_and_values(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = exploration_frame(li, ["l_quantity", "l_discount"], qs=(0.0, 0.5, 1.0))
    rows = {(r["column"], r["statistic"]): r["value"] for r in out.collect()}
    # layout: 2 columns × (mean, std, 3 quantiles)
    assert len(rows) == 10
    exact = li.agg(
        F.avg("l_quantity"), F.min("l_quantity"), F.max("l_quantity"), F.median("l_quantity")
    ).collect()[0]
    assert rows[("l_quantity", "mean")] == pytest.approx(exact[0])
    assert rows[("l_quantity", "q0000")] == pytest.approx(exact[1])
    assert rows[("l_quantity", "q1000")] == pytest.approx(exact[2])
    assert rows[("l_quantity", "q0500")] == pytest.approx(exact[3])


def test_exploration_approx_mode_runs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = exploration_frame(li, ["l_quantity"], qs=(0.5,), approx=True)
    rows = {r["statistic"]: r["value"] for r in out.collect()}
    assert abs(rows["q0500"] - 25) < 10  # sane approx median


def test_exploration_grouped(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = exploration_frame(li, ["l_quantity"], qs=(0.5,), group=["l_returnflag"])
    rows = out.collect()
    flags = {r["l_returnflag"] for r in rows}
    assert flags == {"A", "N", "R"}
    assert {r["statistic"] for r in rows} == {"mean", "std", "q0500"}


def test_minhash_band_width_sharpens_candidates(spark, sf_dir):
    from qcardia_data_spark.functions.dedup import lsh_candidate_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sig_r1 = minhash_signatures(docs, "doc_id", "text", n_bands=4, band_width=1)
    sig_r2 = minhash_signatures(docs, "doc_id", "text", n_bands=4, band_width=2)
    n1 = lsh_candidate_pairs(sig_r1, "doc_id").count()
    n2 = lsh_candidate_pairs(sig_r2, "doc_id").count()
    # wider bands = AND over more minhashes per band → strictly fewer-or-
    # equal candidate pairs (sharper S-curve, cheaper verification)
    assert n2 <= n1
    assert n2 > 0  # strong duplicates still collide


def test_minhash_ml_variant(spark, sf_dir):
    from qcardia_data_spark.functions.dedup import near_dedup_minhash, near_dedup_minhash_ml

    docs = load_table(spark, sf_dir, "documents")
    ml_survivors = near_dedup_minhash_ml(docs, "doc_id", "text")
    sql_survivors = near_dedup_minhash(docs, "doc_id", "text")
    n_docs = docs.count()
    # both pipelines drop duplicates; the ML hashed-space variant should
    # land in the same ballpark as the exact-shingle pipeline
    assert ml_survivors.count() <= n_docs
    assert abs(ml_survivors.count() - sql_survivors.count()) <= max(10, n_docs // 20)


def test_unit_conversion_and_median_spacing(spark):
    df = spark.createDataFrame([(10, 1.5), (20, 2.0), (30, 2.5)], ["size_px", "pixdim"])
    out = with_unit_conversion(df, "size_px", "pixdim")
    assert [r["size_mm"] for r in out.orderBy("size_px").collect()] == [15.0, 40.0, 75.0]
    assert median_spacing(df, "pixdim") == 2.0


@pytest.fixture()
def fake_records(spark):
    rng = np.random.RandomState(7)
    rows = [
        (f"s{i % 5}", i, rng.rand(16).astype(float).tolist())
        for i in range(40)
    ]
    return spark.createDataFrame(rows, ["subject", "record_id", "pixels"])


def test_predictor_two_level_agg_matches_numpy(spark, fake_records):
    pred = DataPredictor(fake_records, "subject")
    preds = pred.predict(fake_records)
    assert "pred_mean" in preds.columns and "pixels" not in preds.columns

    per_subject = pred.summarize_subjects(preds)
    assert per_subject.count() == 5
    assert {r["n_records"] for r in per_subject.collect()} == {8}

    final = pred.summarize_all(per_subject).collect()[0]
    # cross-check the whole pipeline against local numpy
    local = fake_records.collect()
    by_subj: dict = {}
    for r in local:
        by_subj.setdefault(r["subject"], []).append(np.array(r["pixels"]))
    subj_means = [float(np.mean([a.mean() for a in recs])) for recs in by_subj.values()]
    assert final["n_subjects"] == 5
    assert final["n_records"] == 40
    assert final["mean_pred"] == pytest.approx(float(np.mean(subj_means)))


def test_predictor_subset_selection(spark, fake_records):
    pred = DataPredictor(fake_records, "subject")
    explicit = pred.select_subjects(subjects=["s0", "s1"])
    assert explicit.select("subject").distinct().count() == 2
    sampled = pred.select_subjects(k=3, seed="sub")
    assert sampled.select("subject").distinct().count() == 3
    again = pred.select_subjects(k=3, seed="sub")
    assert {r["subject"] for r in sampled.select("subject").distinct().collect()} == {
        r["subject"] for r in again.select("subject").distinct().collect()
    }
