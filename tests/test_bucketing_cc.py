"""Scale-mechanics tests: bucketed co-located joins (shuffle elimination)
and connected-components duplicate clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.functions.dedup import connected_components


def test_connected_components_clusters(spark):
    # components: {1,2,3,4} via chain, {10,11}, isolated pairs only
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], ["a", "b"]
    )
    out = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_star_and_cycle(spark):
    pairs = spark.createDataFrame(
        [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (9, 7)], ["a", "b"]
    )
    out = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert {out[5], out[1], out[2], out[3]} == {1}
    assert {out[7], out[8], out[9]} == {7}


def test_fact_partition_pruning_through_join(spark, sf_dir, tmp_path):
    """Date-partitioned fact joined to a dim filtered on the partition key:
    Catalyst propagates the literal through the equi-join into a STATIC
    fact-side PartitionFilter — only matching partitions are even listed
    (the star-schema IO win at 100 TB; DPP covers the non-literal case)."""
    fact_dir = str(tmp_path / "li_part")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    li.write.partitionBy("ship_year").mode("overwrite").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("ship_year", F.year("o_orderdate"))
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .filter(F.col("ship_year") == 1997)
        .select("ship_year", "o_orderkey")
        .distinct()
    )
    joined = fact.join(dim, "ship_year")
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [(ship_year" in plan  # static prune on the fact scan
    years = {r["ship_year"] for r in joined.select("ship_year").distinct().collect()}
    assert years == {1997}


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    """Incremental re-materialization: with dynamic partitionOverwriteMode,
    rewriting one split's records leaves other partitions untouched — the
    upsert-by-partition pattern for refreshing a slice of a 100 TB cache."""
    out = str(tmp_path / "dyn")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "split", F.when(F.col("o_orderkey") % 2 == 0, "a").otherwise("b")
    )
    orders.write.partitionBy("split").mode("overwrite").parquet(out)
    n_b_before = spark.read.parquet(out).filter("split = 'b'").count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch = (
            orders.filter("split = 'a'").limit(10)
            .write.partitionBy("split").mode("overwrite")
        )
        patch.parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    after = spark.read.parquet(out)
    assert after.filter("split = 'a'").count() == 10  # replaced
    assert after.filter("split = 'b'").count() == n_b_before  # untouched


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """Directory-partitioned record layout (write_records partition_by):
    a split filter becomes a PartitionFilter — non-matching directories are
    never listed or read (the serve-path IO story at 100 TB)."""
    from qcardia_data_spark.operators.sampling import subject_level_split
    from qcardia_data_spark.sources.writers import write_records

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    routed = subject_level_split(orders, "o_custkey", 0.3, seed="pp")
    out = str(tmp_path / "records")
    write_records(routed, out, order_by=["o_orderkey"], partition_by=["split"])

    back = spark.read.parquet(out).filter(F.col("split") == "train")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan
    n_train = back.count()
    n_all = spark.read.parquet(out).count()
    assert 0 < n_train < n_all


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key lets SortMergeJoin read
    co-located buckets directly — zero Exchange in the join plan. This is
    the repeated-join strategy for 100 TB fact tables (PERF.md)."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    lineitem.withColumnRenamed("l_orderkey", "o_orderkey").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("b_lineitem")

    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    # disable broadcast so the join strategy is genuinely SMJ-on-buckets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, "o_orderkey").groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either side (only the final
        # groupBy aggregation exchanges)
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
