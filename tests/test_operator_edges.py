"""Edge-semantics unit tests for the operator kernel (SURVEY §5.2/§5.4):
NULL-keeping group weights, singleton-collapse explode, union-by-name with
missing columns, composite-key inverse property, natural sort, first-match
semantics, weighted sampling share math."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from qcardia_data_spark.operators import aggregates as agg
from qcardia_data_spark.operators import generators as gen
from qcardia_data_spark.operators import projections as P
from qcardia_data_spark.operators import sampling as X
from qcardia_data_spark.operators import setops as U
from qcardia_data_spark.operators import sorts as O


def test_group_weights_keeps_null_groups(spark):
    # reference: groupby(dropna=False) — pipeline/utils.py:121-127
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), (None,), (None,), ("b",)], ["g"]
    )
    out = {r["g"]: (r["cnt"], r["weight"]) for r in agg.group_weights(df, ["g"]).collect()}
    assert out[None] == (3, 2.0)
    assert out["a"] == (2, 3.0)
    assert out["b"] == (1, 6.0)


def test_singleton_collapse_matches_reference(spark):
    # reference: dimensions.py:23-28 — 1-element axis not exploded, pos NULL
    df = spark.createDataFrame(
        [("multi", [1.0, 2.0, 3.0]), ("single", [9.0])], ["k", "arr"]
    )
    singles, multis = gen.collapse_singleton(df, "arr", "pos", "total_pos")
    exploded = gen.explode_with_position(multis, "arr", keep_other=["k"])
    merged = U.union_by_name([
        exploded,
        singles.select("k", F.element_at("arr", 1).alias("val")),
    ])
    rows = {(r["k"], r["pos"]): r["val"] for r in merged.collect()}
    assert rows[("multi", 0)] == 1.0 and rows[("multi", 2)] == 3.0
    assert rows[("single", None)] == 9.0  # collapsed: NULL ordinal ("__" file-id)


def test_explode_keep_positions_prefilters(spark):
    df = spark.createDataFrame([("a", [10.0, 20.0, 30.0, 40.0])], ["k", "arr"])
    out = gen.explode_with_position(df, "arr", keep_positions=[0, 2], keep_other=["k"])
    got = {(r["pos"], r["val"]) for r in out.collect()}
    assert got == {(0, 10.0), (2, 30.0)}
    assert out.collect()[0]["total_pos"] == 4  # total reflects pre-filter axis
    # r13 review: a repeated/unsorted position list must stay row-identical
    # to the posexplode + isin form — one row per matching ordinal,
    # ascending, never a duplicate emission
    dup = gen.explode_with_position(
        df, "arr", keep_positions=[2, 0, 2, 2], keep_other=["k"]
    ).collect()
    assert [(r["pos"], r["val"]) for r in dup] == [(0, 10.0), (2, 30.0)]


def test_union_by_name_missing_columns_null(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "only_a"])
    b = spark.createDataFrame([(2, 3.5)], ["id", "only_b"])
    out = U.union_by_name([a, b]).orderBy("id").collect()
    assert out[0]["only_b"] is None and out[1]["only_a"] is None


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcxyz", min_size=1, max_size=5),
            st.text(alphabet="0123456789-", min_size=1, max_size=8),
        ),
        min_size=1, max_size=8, unique=True,
    )
)
def test_composite_key_roundtrip_property(shared_spark, pairs):
    # P12 inverse property (reference utils.py:65-102): dataset names contain
    # no '-', subject ids may — split limit must preserve the tail
    df = shared_spark.createDataFrame(pairs, ["dataset", "subject"])
    enc = P.encode_composite_key(df, "key", ["dataset", "subject"])
    dec = P.decode_composite_key(enc, "key", ["d2", "s2"])
    for r in dec.collect():
        assert (r["d2"], r["s2"]) == (r["dataset"], r["subject"])
    # r13 review: a regex-meta separator must roundtrip too — the encode
    # side is literal, so the decode split must escape it (unescaped,
    # "." split on every character)
    enc2 = P.encode_composite_key(df, "key2", ["dataset", "subject"], sep=".")
    dec2 = P.decode_composite_key(enc2, "key2", ["d3", "s3"], sep=".")
    for r in dec2.collect():
        assert (r["d3"], r["s3"]) == (r["dataset"], r["subject"])


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=6, unique=True))
def test_cyclic_renumber_inverse_property(shared_spark, values):
    # P10: renumber relative to an anchor then add the anchor back (mod n)
    # recovers the original frame number
    n = 13
    df = shared_spark.createDataFrame([(v % n,) for v in values], ["frame"])
    out = P.cyclic_renumber(df, "rel", F.col("frame"), F.lit(4), F.lit(n))
    back = out.withColumn("orig", F.pmod(F.col("rel") + 4, F.lit(n)))
    for r in back.collect():
        assert r["orig"] == r["frame"]


def test_fingerprint_golden_stability():
    # C1 golden: canonicalization changes would silently orphan every
    # existing cache — pin a reference fingerprint
    from qcardia_data_spark.plans.fingerprint import spec_fingerprint

    spec = {"pipeline": [{"op": "source", "table": "orders"}], "v": 1}
    assert spec_fingerprint(spec) == spec_fingerprint(
        {"v": 1.0, "pipeline": [{"table": "orders", "op": "source"}]}
    )
    assert spec_fingerprint(spec) == "558e30e1dd2c2dbb4b21e61ef0c0d99d"


def test_file_id_parse_inverse(spark):
    # F17 ∘ parse = identity for present axes; "__" → NULL on decode
    from qcardia_data_spark.functions.arrays import file_id

    df = spark.createDataFrame(
        [("ds", "s1", 3, 7), ("ds", "s2", None, 11)],
        ["dataset", "subject", "slice_nr", "frame_nr"],
    )
    enc = df.withColumn(
        "fid", file_id(F.col("dataset"), F.col("subject"), F.col("slice_nr"), F.col("frame_nr"))
    )
    parts = F.split("fid", "-")
    dec = enc.select(
        "fid", "slice_nr", "frame_nr",
        F.nullif(parts.getItem(2), F.lit("__")).cast("int").alias("slice_back"),
        F.nullif(parts.getItem(3), F.lit("__")).cast("int").alias("frame_back"),
    )
    for r in dec.collect():
        assert r["slice_back"] == r["slice_nr"]
        assert r["frame_back"] == r["frame_nr"]


def test_natural_sort_orders_numerically(spark):
    df = spark.createDataFrame([(f"file{i}",) for i in (2, 10, 1, 20, 3)], ["name"])
    out = [r["name"] for r in O.natural_sort(df, "name").collect()]
    assert out == ["file1", "file2", "file3", "file10", "file20"]


def test_first_match_semantics(spark):
    from qcardia_data_spark.operators.joins import first_match_per_key

    df = spark.createDataFrame(
        [("s", 0, 5.0), ("s", 1, 7.0), ("s", 2, 7.0), ("t", 0, 1.0)],
        ["subject", "frame", "vol"],
    )
    out = first_match_per_key(df, "subject", "frame", F.col("vol") == 7.0)
    got = {r["subject"]: r["first_frame"] for r in out.collect()}
    assert got == {"s": 1}  # first match wins; 't' has none → absent


def test_weighted_sample_equal_shares(spark):
    rows = [(f"g{i % 4}", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["g", "k"])
    out = X.weighted_sample(df, ["g"], "k", target_per_group_total=20, seed=5)
    per_group = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert set(per_group.values()) == {5}  # ceil(20/4) from each group


def test_seeded_split_is_exact_fraction(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["k"])
    from qcardia_data_spark.operators.windows import seeded_split

    out = seeded_split(df, "k", 0.2, seed=9)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts == {"valid": 40, "train": 160}


def test_dense_rank_desc_keeps_null_rows(spark):
    """NULL values must keep their rows (null-safe join) and take the rank
    the window form gives them: descending order sorts NULLs last."""
    df = spark.createDataFrame(
        [(1, 30.0), (2, None), (3, 10.0), (4, 30.0), (5, None)], ["id", "v"]
    )
    got = {r["id"]: r["rank"] for r in O.dense_rank_desc(df, "v").collect()}
    assert len(got) == 5  # no rows dropped
    assert got[1] == got[4] == 1  # 30.0 ranks first
    assert got[3] == 2
    assert got[2] == got[5] == 3  # NULLs last, one dense rank


def test_cumulative_sum_scale_safe_equals_window_form(spark, sf_dir):
    """VERDICT r8 'What's wrong' #1: the two-phase distributed prefix sum
    (range-repartition on (key, order), local running sums, broadcast
    subtotal prefix) must equal the window form on the w4 bench shape —
    decimal accumulation, so equality is exact, not approximate."""
    import os

    from qcardia_data_spark.operators.windows import cumulative_sum

    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .withColumn(
            "_rev",
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")),
        )
    )
    order = [
        F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber"),
        F.col("l_extendedprice"), F.col("l_discount"),
    ]
    key = lambda r: (r["l_returnflag"], r["l_orderkey"], r["l_linenumber"])  # noqa: E731

    want = {
        key(r): r["cum"]
        for r in cumulative_sum(li, ["l_returnflag"], order, "_rev")
        .select("l_returnflag", "l_orderkey", "l_linenumber",
                F.col("cum").cast("decimal(38,2)").alias("cum")).collect()
    }
    got = {
        key(r): r["cum"]
        for r in cumulative_sum(
            li, ["l_returnflag"], order, "_rev",
            scale_safe=True, num_ranges=16,
        )
        .select("l_returnflag", "l_orderkey", "l_linenumber",
                F.col("cum").cast("decimal(38,2)").alias("cum")).collect()
    }
    assert got == want


def test_cumulative_sum_scale_safe_plan_parallel_and_reuses_exchange(spark):
    """The scale-safe plan must (a) run the running sum in MANY tasks even
    on a near-constant key — the window form on a 3-value key is exactly 3
    sort tasks at any scale — and (b) read the range exchange ONCE from
    both consumers (local sums + subtotals), so spark_partition_id is
    consistent between the two phases."""
    from qcardia_data_spark.operators.windows import cumulative_sum

    df = spark.range(0, 20_000).select(
        (F.col("id") % 3).cast("string").alias("flag"),
        F.col("id").alias("ord"),
        F.lit(1).alias("v"),
    )
    out = cumulative_sum(df, ["flag"], [F.col("ord")], "v",
                         scale_safe=True, num_ranges=16)
    rows = {(r["flag"], r["ord"]): r["cum"] for r in out.collect()}
    # AQE finalizes exchange reuse at execution: inspect the FINAL plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan or (
        plan.count("Exchange rangepartitioning") == 1
    ), plan
    rng_counts = (
        df.repartitionByRange(16, F.col("flag"), F.col("ord"))
        .select(F.spark_partition_id().alias("p"))
        .distinct().count()
    )
    assert rng_counts > 3  # the sort really fans out past the key count
    assert rows[("0", 0)] == 1 and rows[("0", 3)] == 2 and rows[("0", 6)] == 3
    assert rows[("2", 19_997)] == sum(1 for i in range(20_000) if i % 3 == 2 and i <= 19_997)


def test_cumulative_sum_scale_safe_keeps_null_partition_keys(spark):
    """Self-review r9 regression: the subtotal-prefix join used null-
    unsafe key equality, silently dropping every row whose partition-key
    value is NULL — a legitimate group the window form keeps. Both forms
    must agree on a NULL-key frame."""
    from qcardia_data_spark.operators.windows import cumulative_sum

    df = spark.createDataFrame(
        [("a", 1, 10), (None, 2, 20), ("a", 3, 30), (None, 4, 40)],
        ["k", "o", "v"],
    )

    def run(**kw):
        return sorted(
            (
                (r["k"], r["o"], r["cum"])
                for r in cumulative_sum(
                    df, ["k"], [F.col("o")], "v", **kw
                ).collect()
            ),
            key=lambda t: (t[0] is None, t[0] or "", t[1]),
        )

    want = run()
    assert want == [
        ("a", 1, 10), ("a", 3, 40), (None, 2, 20), (None, 4, 60),
    ]
    assert run(scale_safe=True, num_ranges=4) == want


def test_cumulative_sum_scale_safe_survives_reuse_disabled(spark):
    """Self-review r9 regression: _rng consistency between the local-sum
    and subtotal consumers IS exchange reuse; with
    spark.sql.exchange.reuse=false each consumer re-samples its own range
    bounds and 87% of sums came back wrong SILENTLY. The fallback
    (materialize the split ids) must keep the result exact."""
    from qcardia_data_spark.operators.windows import cumulative_sum

    df = spark.range(0, 50_000).select(
        (F.col("id") % 3).cast("string").alias("flag"),
        F.col("id").alias("o"),
        F.lit(1).alias("v"),
    )
    want = sorted(
        (r["flag"], r["o"], r["cum"])
        for r in cumulative_sum(df, ["flag"], [F.col("o")], "v").collect()
    )
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        got = sorted(
            (r["flag"], r["o"], r["cum"])
            for r in cumulative_sum(
                df, ["flag"], [F.col("o")], "v",
                scale_safe=True, num_ranges=16,
            ).collect()
        )
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")
    assert got == want


def test_cumulative_sum_scale_safe_awkward_column_names(spark):
    """r9 second-review regression: the rename-prefix join scheme broke
    for a partition column literally named 'rng' (alias collision with
    the internal split id). The frame-aliased null-safe join must handle
    any column names."""
    from qcardia_data_spark.operators.windows import cumulative_sum

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 30), ("b", 1, 5)], ["rng", "o", "v"]
    )
    got = sorted(
        (r["rng"], r["o"], r["cum"])
        for r in cumulative_sum(
            df, ["rng"], [F.col("o")], "v", scale_safe=True, num_ranges=2
        ).collect()
    )
    assert got == [("a", 1, 10), ("a", 2, 40), ("b", 1, 5)]


def test_cumulative_sum_scale_safe_preserves_internal_named_columns(spark):
    """r9 deep-review regression: fixed internal names meant a user
    column literally called _rng (or _loc/_off) was silently overwritten
    and dropped from the output. Internals are fresh-named now."""
    from qcardia_data_spark.operators.windows import cumulative_sum

    df = spark.createDataFrame(
        [("a", 1, 10, 7), ("a", 2, 30, 8)], ["k", "o", "v", "_rng"]
    )
    rows = sorted(
        (r["k"], r["o"], r["cum"], r["_rng"])
        for r in cumulative_sum(
            df, ["k"], [F.col("o")], "v", scale_safe=True, num_ranges=2
        ).collect()
    )
    assert rows == [("a", 1, 10, 7), ("a", 2, 40, 8)]


def test_null_safe_equi_join_refuses_carry_clash(spark):
    """The shared helper refuses a carried name that already exists on
    the left (the output would be ambiguous) instead of producing
    duplicate columns that crash at first reference."""
    import pytest as _pytest

    from qcardia_data_spark.operators.joins import null_safe_equi_join

    left = spark.createDataFrame([("a", 1)], ["k", "x"])
    right = spark.createDataFrame([("a", 2)], ["k", "x"])
    with _pytest.raises(ValueError, match="already.*exist|ambiguous"):
        null_safe_equi_join(left, right, ["k"], carry=["x"])


def test_fixed_working_names_do_not_clobber_user_columns(spark):
    """r14 review sweep, the fresh-name class across four more public
    fronts: argmax_per_group (keep includes a user '_rn'), salted_join /
    salted_group_agg (user '_salt'), write_zorder (user '_z')."""
    import os

    from pyspark.sql import functions as F

    from qcardia_data_spark.operators.aggregates import argmax_per_group
    from qcardia_data_spark.operators.skew import salted_group_agg, salted_join

    df = spark.createDataFrame(
        [("g1", 5, "keep-a"), ("g1", 9, "keep-b"), ("g2", 1, "keep-c")],
        ["g", "v", "_rn"],
    )
    top = argmax_per_group(
        df, ["g"], [F.desc("v"), F.col("_rn")], keep=["v", "_rn"]
    )
    got = {r["g"]: (r["v"], r["_rn"]) for r in top.collect()}
    assert got == {"g1": (9, "keep-b"), "g2": (1, "keep-c")}, got

    big = spark.createDataFrame(
        [(1, i, f"s{i}") for i in range(6)], ["k", "uid", "_salt"]
    )
    small = spark.createDataFrame([(1, "dim")], ["k", "name"])
    j = salted_join(big, small, on="k", n_salts=4, salt_source="uid")
    rows = j.collect()
    assert len(rows) == 6
    assert {r["_salt"] for r in rows} == {f"s{i}" for i in range(6)}

    agg = salted_group_agg(
        big.withColumnRenamed("_salt", "_tmp").withColumn(
            "_salt", F.col("uid") * 10
        ),
        ["k"], "uid",
        aggs={"s1": F.sum("_salt")},
        merges={"total": F.sum("s1")},
    )
    # sum of uid*10 over uid 0..5 = 150 — NOT a sum of internal salts
    assert agg.collect()[0]["total"] == 150

    from qcardia_data_spark.plans.layout import zorder_write

    zdf = spark.createDataFrame(
        [(i, i % 4, f"z{i}") for i in range(20)], ["a", "b", "_z"]
    )
    path = "/tmp/qds_test_zorder_userz"
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    zorder_write(
        zdf, path, {"a": F.col("a"), "b": F.col("b")}, bits=8, n_files=2
    )
    back = spark.read.parquet(path)
    assert "_z" in back.columns and back.count() == 20
    assert {r["_z"] for r in back.collect()} == {f"z{i}" for i in range(20)}
    shutil.rmtree(path, ignore_errors=True)
