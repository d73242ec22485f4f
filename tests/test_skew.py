"""Salting correctness: salted two-phase agg / salted join produce exactly
the unsalted results on a pathologically skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcardia_data_spark.operators.skew import salted_group_agg, salted_join


def _skewed(spark):
    # one hot key with 5000 rows, 50 cold keys with 10 each
    hot = [("hot", float(i % 7)) for i in range(5000)]
    cold = [(f"k{j}", float(j)) for j in range(50) for _ in range(10)]
    return spark.createDataFrame(hot + cold, ["k", "v"]).withColumn(
        "row_id", F.monotonically_increasing_id()
    )


def test_salted_agg_matches_direct(spark):
    df = _skewed(spark)
    direct = {
        (r["k"]): (r["n"], round(r["s"], 6))
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = salted_group_agg(
        df, ["k"], salt_source="row_id",
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
        merges={"n": F.sum("n"), "s": F.sum("s")},
        n_salts=8,
    )
    got = {r["k"]: (r["n"], round(r["s"], 6)) for r in salted.collect()}
    assert got == direct


def test_salted_agg_actually_spreads_hot_key(spark):
    df = _skewed(spark)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64("row_id"), F.lit(8))
    )
    spread = (
        salted.filter(F.col("k") == "hot").groupBy("_salt").count().count()
    )
    assert spread == 8  # hot key occupies all salt buckets


def test_salted_join_matches_direct(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"k{j}", f"C{j}") for j in range(50)], ["k", "tag"]
    )
    direct = big.join(small, "k").groupBy("tag").count()
    salted = salted_join(big, small, "k", n_salts=8, salt_source="row_id").groupBy("tag").count()
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in direct.collect()}


def test_salted_join_refuses_right_and_full(spark):
    """r12 review: the small side is replicated n_salts x, so right/full
    joins would emit each unmatched small-side row once per salt — refuse
    loudly; left/inner keep unsalted semantics."""
    import pytest

    from qcardia_data_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x")], ["k", "v"])
    small = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "w"])
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="unmatched small-side"):
            salted_join(big, small, "k", n_salts=4, how=how)
    # left join: unmatched BIG rows survive exactly once
    big2 = spark.createDataFrame([(1, "x"), (3, "y")], ["k", "v"])
    out = salted_join(big2, small, "k", n_salts=4, how="left").collect()
    assert sorted((r["k"], r["w"]) for r in out) == [(1, "a"), (3, None)]


def test_salted_join_default_salt_spreads_hot_key(spark):
    """r13 review: the old default salted by the JOIN KEY, so a hot key's
    rows all hashed to ONE salt and the scatter silently no-opped. The
    default now hashes every big-side column; a hot key with varying
    payload must occupy many salts, and results stay identical to the
    unsalted join."""
    from pyspark.sql import functions as F

    from qcardia_data_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, i) for i in range(400)] + [(2, 7)], ["k", "payload"]
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold")], ["k", "tag"])
    out = salted_join(big, small, "k", n_salts=8)
    got = out.groupBy("tag").count().collect()
    assert {(r["tag"], r["count"]) for r in got} == {("hot", 400), ("cold", 1)}
    # distribution check: replay the default salt expression on the hot key
    n_salts_used = (
        big.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64("k", "payload"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n_salts_used >= 6, n_salts_used  # 400 rows over 8 salts
