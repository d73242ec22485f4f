"""read_pruned_partitions (r15 optimization): the standing-index probe
read that lists ONLY the probed partition directories must be
row/schema-identical to the plain full-root read + isin filter, actually
prune the file listing, and fall back to the plain read (including its
errors) on every edge the plain read handles."""

import pytest
from pyspark.errors import AnalysisException
from pyspark.sql import functions as F

from qcardia_data_spark.sources.readers import read_pruned_partitions


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pruned") / "tbl")
    df = spark.range(0, 3000).select(
        F.col("id"),
        (F.col("id") % 32).cast("int").alias("bkt"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    df.write.mode("overwrite").partitionBy("bkt").parquet(root)
    # second file generation per bucket — the append layout probes see
    df.filter(F.col("id") < 300).write.mode("append").partitionBy(
        "bkt"
    ).parquet(root)
    return root


def _plain(spark, root, vals):
    return spark.read.parquet(root).filter(F.col("bkt").isin(vals))


def test_rows_schema_and_listing_pruned(spark, bucketed):
    probe = [1, 5, 31, 9999]  # 9999 never written
    full = _plain(spark, bucketed, probe)
    pruned = read_pruned_partitions(spark, bucketed, "bkt", probe)
    assert pruned.schema == full.schema
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )
    # the point of the helper: only the probed directories' files are in
    # the scan's file index (3 buckets x 2 generations of files, vs all 32)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert all("/bkt=" in f for f in pruned.inputFiles())
    assert not [
        f
        for f in pruned.inputFiles()
        if not any(f"/bkt={b}/" in f for b in (1, 5, 31))
    ]


def test_empty_and_all_missing_probes(spark, bucketed):
    assert read_pruned_partitions(spark, bucketed, "bkt", []).count() == 0
    assert (
        read_pruned_partitions(spark, bucketed, "bkt", [777, 888]).count()
        == 0
    )


def test_missing_root_raises_like_plain(spark, tmp_path):
    missing = str(tmp_path / "never_written")
    with pytest.raises(AnalysisException):
        read_pruned_partitions(spark, missing, "bkt", [1]).count()


def test_non_int_values_fall_back(spark, bucketed):
    # bool is not a valid partition-path int; the helper must not build
    # a bkt=True directory path — it defers to the plain read, which
    # adjudicates the type question exactly as before
    with pytest.raises(AnalysisException):
        read_pruned_partitions(spark, bucketed, "bkt", [True, 3]).count()


def test_probe_sees_files_appended_after_first_probe(spark, bucketed):
    # the directory listing is live (no cached manifest): an append
    # between probes is visible to the next probe
    before = read_pruned_partitions(spark, bucketed, "bkt", [2]).count()
    spark.range(100000, 100008).select(
        F.col("id"), F.lit(2).cast("int").alias("bkt"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).write.mode("append").partitionBy("bkt").parquet(bucketed)
    after = read_pruned_partitions(spark, bucketed, "bkt", [2]).count()
    assert after == before + 8
