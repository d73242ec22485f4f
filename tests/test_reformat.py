"""End-to-end reformat pipeline test (SURVEY §3.2): binary scan → decode →
explode → ED/ES → crop → file-id records + metadata, wrapped in the
idempotent cache layer."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.plans.cache import materialize
from qcardia_data_spark.reformat import reformat_volumes


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    for i in range(5):
        (d / f"subj{i}.bin").write_bytes(f"volume-{i}".encode() * 10)
    return str(d)


def test_reformat_end_to_end(spark, raw_dir):
    records, metadata = reformat_volumes(spark, raw_dir, dataset="mmX", n_frames=4)
    recs = records.collect()
    assert len(recs) == 20  # 5 subjects × 4 frames
    by_subject: dict = {}
    for r in recs:
        by_subject.setdefault(r["subject"], []).append(r)
    for subj, rows in by_subject.items():
        eds = [r for r in rows if r["is_ed"]]
        ess = [r for r in rows if r["is_es"]]
        assert len(eds) == 1 and len(ess) == 1
        # ED has the max annotated volume, ES the min annotated volume
        vols = {r["frame_nr"]: r["volume"] for r in rows if r["volume"] > 0}
        assert vols[eds[0]["frame_nr"]] == max(vols.values())
        assert vols[ess[0]["frame_nr"]] == min(vols.values())
        for r in rows:
            assert r["file_id"] == f"mmX-{subj}-__-{r['frame_nr']:02d}"
            assert r["height"] <= 8 and r["width"] <= 8

    meta = {r["subject"]: r for r in metadata.collect()}
    assert set(meta) == {f"subj{i}" for i in range(5)}
    assert all(m["total_nr_frames"] == 4 for m in meta.values())


def test_reformat_is_deterministic(spark, raw_dir):
    r1, _ = reformat_volumes(spark, raw_dir, dataset="mmX")
    r2, _ = reformat_volumes(spark, raw_dir, dataset="mmX")
    k = ["subject", "frame_nr"]
    assert {tuple(r) for r in r1.select(*k, "volume").collect()} == {
        tuple(r) for r in r2.select(*k, "volume").collect()
    }


def test_reformat_under_cache_layer(spark, raw_dir, tmp_path):
    calls = []

    def build():
        calls.append(1)
        records, _ = reformat_volumes(spark, raw_dir, dataset="mmX")
        return records.drop("pixels")

    spec = {"reformat": {"dir": raw_dir, "dataset": "mmX"}}
    p1, built1 = materialize(spark, build, str(tmp_path), spec)
    p2, built2 = materialize(spark, build, str(tmp_path), spec)
    assert built1 and not built2 and len(calls) == 1
    assert spark.read.parquet(p1).count() == 20


def test_orc_roundtrip_pushdown_and_partition_prune(spark, sf_dir, tmp_path):
    """ORC source/sink: values survive the roundtrip, filters reach the
    ORC scan (PushedFilters), and directory partitioning prunes."""
    import os

    from pyspark.sql import functions as F

    from qcardia_data_spark.sources.readers import orc_scan
    from qcardia_data_spark.sources.writers import write_records_orc

    src = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    p = str(tmp_path / "nation_orc")
    write_records_orc(src, p, order_by=["n_nationkey"],
                      partition_by=["n_regionkey"])
    back = orc_scan(spark, p)
    assert sorted(map(tuple, back.select(*src.columns).collect())) == \
        sorted(map(tuple, src.collect()))
    q = back.filter(F.col("n_nationkey") > 10).select("n_name")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "n_nationkey" in plan
    pruned = back.filter(F.col("n_regionkey") == 2)
    files = {
        r["f"] for r in pruned.select(
            F.input_file_name().alias("f")).distinct().collect()
    }
    assert files and all("n_regionkey=2" in f for f in files)


def test_jsonl_shard_export_roundtrip(spark, sf_dir, tmp_path):
    """Sharded JSONL export: deterministic shard dirs, roundtrip through
    the jsonl scanner loses nothing, shard layout prunes."""
    import glob
    import os

    from pyspark.sql import functions as F

    from qcardia_data_spark.sources.writers import write_jsonl_shards

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text", "lang", "source"
    )
    p = str(tmp_path / "corpus_jsonl")
    write_jsonl_shards(docs, p, shard_col="doc_id", n_shards=8)
    dirs = sorted(os.path.basename(d) for d in glob.glob(f"{p}/shard=*"))
    assert dirs and all(d.startswith("shard=") for d in dirs)
    back = spark.read.json(f"{p}/shard=*/*.json")
    assert sorted(map(tuple, back.select(*docs.columns).collect())) == \
        sorted(map(tuple, docs.collect()))
    # same data, same layout on a rewrite (deterministic assignment)
    p2 = str(tmp_path / "corpus_jsonl2")
    write_jsonl_shards(docs, p2, shard_col="doc_id", n_shards=8)
    for d in dirs:
        a = spark.read.json(f"{p}/{d}/*.json").select("doc_id")
        b = spark.read.json(f"{p2}/{d}/*.json").select("doc_id")
        assert sorted(r["doc_id"] for r in a.collect()) == \
            sorted(r["doc_id"] for r in b.collect())


def test_per_record_sinks_refuse_unsafe_id_components(spark, tmp_path):
    """r12 review: ids interpolated into file names must refuse path
    separators/traversal — an id like '../x' through write_npy_records
    used to write OUTSIDE the output directory."""
    import pytest

    from qcardia_data_spark.sources.writers import (
        write_jsonl_shards,
        write_npy_records,
    )

    df = spark.createDataFrame(
        [("../escape", [1.0, 2.0])], ["rec_id", "arr"]
    ).coalesce(1)
    out = tmp_path / "npy"
    with pytest.raises(Exception, match="safe file-name component"):
        write_npy_records(df, str(out), "rec_id", "arr")
    assert not (tmp_path / "escape.npy").exists()

    good = spark.createDataFrame([("r1", [1.0])], ["rec_id", "arr"]).coalesce(1)
    write_npy_records(good, str(out), "rec_id", "arr")
    assert (out / "r1.npy").exists()

    # jsonl sharder refuses a pre-existing 'shard' column instead of
    # silently overwriting it
    with_shard = spark.createDataFrame([(1, "t", 9)], ["doc_id", "text", "shard"])
    with pytest.raises(ValueError, match="'shard' column"):
        write_jsonl_shards(with_shard, str(tmp_path / "js"), "doc_id")
