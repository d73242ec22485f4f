"""[ext] temporal joins: as-of (union+window) and bucketed range join —
semantics pinned on handmade cases and equivalence vs the naive
inequality-join form."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.catalog import load_table
from qcardia_data_spark.operators.temporal import asof_join, bucketed_range_join


def _ts(minute, second=0):
    return dt.datetime(2024, 6, 1, 12, minute, second)


def test_asof_join_handmade(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts(0), 10.0),
            ("A", _ts(5), 11.0),
            ("A", _ts(10), 12.0),
            ("B", _ts(3), 99.0),
        ],
        ["sym", "ts", "px"],
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts(4), 1),   # after 12:00 quote → 10.0
            ("A", _ts(5), 2),   # exactly at 12:05 quote → 11.0 (<= semantics)
            ("A", _ts(20), 3),  # after all → 12.0
            ("B", _ts(1), 4),   # before any B quote → NULL
            ("C", _ts(9), 5),   # no quotes at all → NULL
        ],
        ["sym", "ts", "trade_id"],
    )
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, by=["sym"], left_ts="ts", right_ts="ts", carry=["px"]
        ).collect()
    }
    assert out == {1: 10.0, 2: 11.0, 3: 12.0, 4: None, 5: None}


def test_asof_join_rejects_carry_collision(spark):
    df = spark.createDataFrame([("A", _ts(0), 1.0)], ["k", "ts", "v"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, by=["k"], left_ts="ts", right_ts="ts", carry=["v"])


def test_asof_plan_has_single_key_shuffle_no_range_join(spark):
    left = spark.createDataFrame([("A", _ts(0), 1)], ["k", "ts", "i"])
    right = spark.createDataFrame([("A", _ts(0), 2.0)], ["k", "ts", "c"])
    out = asof_join(left, right, by=["k"], left_ts="ts", right_ts="ts", carry=["c"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no join operator at all: union + window
    assert "Window" in plan


def test_bucketed_range_join_equals_naive(spark, sf_dir):
    """Every (point, interval) containment pair found by the bucketed
    equi-join form must equal the naive inequality join, for bucket sizes
    smaller and larger than the interval length."""
    e = load_table(spark, sf_dir, "events")
    points = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    intervals = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("i_id"),
            (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("start_ts"),
            F.col("ts").alias("end_ts"),
        )
        .limit(50)
    )
    naive = {
        (r["p_id"], r["i_id"])
        for r in points.join(
            intervals,
            (F.col("p_ts") >= F.col("start_ts")) & (F.col("p_ts") <= F.col("end_ts")),
        ).collect()
    }
    for bucket in (600, 7200):  # 10 min (interval spans several), 2 h (spans 1-2)
        got = {
            (r["p_id"], r["i_id"])
            for r in bucketed_range_join(
                points, intervals, "p_ts", "start_ts", "end_ts", bucket_seconds=bucket
            ).collect()
        }
        assert got == naive, f"bucket={bucket}"
    assert naive  # non-trivial corpus


def test_bucketed_range_join_is_equi_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    points = e.select(F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
    intervals = e.select(
        F.col("event_id").alias("i_id"),
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("start_ts"),
        F.col("ts").alias("end_ts"),
    )
    out = bucketed_range_join(points, intervals, "p_ts", "start_ts", "end_ts", 600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property check vs a third implementation: pandas merge_asof
    (backward, allow_exact_matches) on randomized corpora — right
    timestamps unique per key so the equal-ts tiebreak is never exercised
    (it is engine-defined in all three systems)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    for trial in range(5):
        keys = ["a", "b", "c"]
        quotes = []
        seen = set()
        for _ in range(40):
            k = keys[rng.randint(len(keys))]
            t = int(rng.randint(0, 10_000))
            if (k, t) in seen:
                continue
            seen.add((k, t))
            quotes.append((k, _ts(0) + dt.timedelta(seconds=t), float(len(seen))))
        trades = [
            (keys[rng.randint(len(keys))], _ts(0) + dt.timedelta(seconds=int(rng.randint(0, 10_000))), i)
            for i in range(60)
        ]
        qdf = spark.createDataFrame(quotes, ["k", "ts", "px"])
        tdf = spark.createDataFrame(trades, ["k", "ts", "tid"])
        got = {
            r["tid"]: r["px"]
            for r in asof_join(tdf, qdf, ["k"], "ts", "ts", ["px"]).collect()
        }

        qp = pd.DataFrame(quotes, columns=["k", "ts", "px"]).sort_values("ts")
        tp = pd.DataFrame(trades, columns=["k", "ts", "tid"]).sort_values("ts")
        ref = pd.merge_asof(tp, qp, on="ts", by="k", direction="backward")
        want = {
            int(r.tid): (None if pd.isna(r.px) else float(r.px))
            for r in ref.itertuples()
        }
        assert got == want, f"trial {trial}"


def test_asof_join_forward_matches_pandas_merge_asof(spark):
    """Forward direction: earliest right row with right_ts >= left_ts,
    property-checked vs pandas merge_asof(direction='forward') on
    randomized corpora (unique right ts per key, as above)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(23)
    for trial in range(5):
        keys = ["a", "b", "c"]
        quotes, seen = [], set()
        for _ in range(40):
            k = keys[rng.randint(len(keys))]
            t = int(rng.randint(0, 10_000))
            if (k, t) in seen:
                continue
            seen.add((k, t))
            quotes.append((k, _ts(0) + dt.timedelta(seconds=t), float(len(seen))))
        trades = [
            (keys[rng.randint(len(keys))], _ts(0) + dt.timedelta(seconds=int(rng.randint(0, 10_000))), i)
            for i in range(60)
        ]
        qdf = spark.createDataFrame(quotes, ["k", "ts", "px"])
        tdf = spark.createDataFrame(trades, ["k", "ts", "tid"])
        got = {
            r["tid"]: r["px"]
            for r in asof_join(
                tdf, qdf, ["k"], "ts", "ts", ["px"], direction="forward"
            ).collect()
        }
        qp = pd.DataFrame(quotes, columns=["k", "ts", "px"]).sort_values("ts")
        tp = pd.DataFrame(trades, columns=["k", "ts", "tid"]).sort_values("ts")
        ref = pd.merge_asof(tp, qp, on="ts", by="k", direction="forward")
        want = {
            int(r.tid): (None if pd.isna(r.px) else float(r.px))
            for r in ref.itertuples()
        }
        assert got == want, f"trial {trial}"


def test_asof_join_carry_is_row_atomic_and_null_preserving(spark):
    """A matched right row whose carry value is NULL must yield NULL (not an
    older row's value), and multiple carries must all come from the SAME
    right row — the struct-carry semantics pandas/DuckDB have."""
    left = spark.createDataFrame(
        [("k", _ts(10), 1), ("k", _ts(30), 2)], ["k", "ts", "tid"]
    )
    # at t=5: (px=1.0, qty=10); at t=25: (px=NULL, qty=20)
    right = spark.createDataFrame(
        [("k", _ts(5), 1.0, 10), ("k", _ts(25), None, 20)],
        ["k", "ts", "px", "qty"],
    )
    out = {
        r["tid"]: (r["px"], r["qty"])
        for r in asof_join(left, right, ["k"], "ts", "ts", ["px", "qty"]).collect()
    }
    assert out[1] == (1.0, 10)
    # t=30 matches the t=25 row: px must be NULL (not 1.0 carried from
    # t=5), qty must be 20 — atomically the t=25 row
    assert out[2] == (None, 20)


def test_asof_join_supports_map_carry(spark):
    """A map-typed carry (unorderable) must still work — the struct is
    dropped from the tie-break ordering, not from the fill."""
    left = spark.createDataFrame([("k", _ts(10), 1)], ["k", "ts", "tid"])
    right = spark.createDataFrame(
        [("k", _ts(5), {"a": "1"})], ["k", "ts", "props"]
    )
    out = asof_join(left, right, ["k"], "ts", "ts", ["props"]).collect()
    assert out[0]["props"] == {"a": "1"}


def test_interval_overlap_join_lossless_vs_naive(spark):
    """Bucketed interval-overlap join == naive inequality join, including
    touch-at-boundary, containment, identical, disjoint and
    bucket-straddling interval pairs."""
    import itertools

    from qcardia_data_spark.operators.temporal import interval_overlap_join

    ivs = [
        (0, 0, 100), (1, 100, 200),        # touch exactly at 100
        (2, 50, 5000), (3, 600, 700),      # containment, straddles buckets
        (4, 9000, 9010), (5, 9990, 10000), # disjoint pair
        (6, 50, 5000),                     # identical to 2
        (7, 4999, 12000),                  # long, overlaps several
    ]
    a = spark.createDataFrame([(i, s, e) for i, s, e in ivs], ["ia", "a0", "a1"])
    b = spark.createDataFrame([(i, s, e) for i, s, e in ivs], ["ib", "b0", "b1"])
    got = {
        (r["ia"], r["ib"])
        for r in interval_overlap_join(
            a, b, "a0", "a1", "b0", "b1", bucket_seconds=1000
        ).collect()
    }
    naive = {
        (x[0], y[0])
        for x, y in itertools.product(ivs, ivs)
        if x[2] >= y[1] and y[2] >= x[1]
    }
    assert got == naive
    assert (0, 1) in got and (4, 5) not in got  # boundary in, disjoint out


def test_interval_overlap_join_keeps_duplicate_rows(spark):
    """ADVICE r8 regression: the old full-row DISTINCT (to undo the
    multi-bucket explode) also collapsed legitimately duplicated input
    rows. The per-pair first-shared-bucket predicate keeps multiplicity:
    2 identical left rows x 1 right row -> 2 joined pairs, and the plan
    carries no dedup aggregate."""
    from qcardia_data_spark.operators.temporal import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0, 5000), (1, 0, 5000)], ["ia", "a0", "a1"]
    )  # duplicate rows, straddling multiple 1000s buckets
    b = spark.createDataFrame([(9, 100, 200)], ["ib", "b0", "b1"])
    out = interval_overlap_join(a, b, "a0", "a1", "b0", "b1",
                                bucket_seconds=1000)
    rows = out.collect()
    assert len(rows) == 2 and all(r["ib"] == 9 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan  # no distinct stage left


def test_overlap_join_spec_op(spark, sf_dir, tmp_path):
    """The overlap_join spec op equals the library call (pipeline side)."""
    from qcardia_data_spark.operators.temporal import interval_overlap_join
    from qcardia_data_spark.plans.spec import compile_pipeline

    ivs_a = [(i, i * 100, i * 100 + 150) for i in range(20)]
    ivs_b = [(i, i * 130 + 40, i * 130 + 90) for i in range(20)]
    a = spark.createDataFrame(ivs_a, ["ia", "a0", "a1"])
    b = spark.createDataFrame(ivs_b, ["ib", "b0", "b1"])
    pa, pb = str(tmp_path / "ov_a"), str(tmp_path / "ov_b")
    a.write.parquet(pa)
    b.write.parquet(pb)
    got = compile_pipeline(
        spark,
        [
            {"op": "source", "path": pa},
            {"op": "overlap_join",
             "pipeline": [{"op": "source", "path": pb}],
             "start_l": "a0", "end_l": "a1", "start_r": "b0", "end_r": "b1",
             "bucket_seconds": 100},
        ],
        sf_dir,
    )
    want = interval_overlap_join(a, b, "a0", "a1", "b0", "b1", bucket_seconds=100)
    key = lambda r: (r["ia"], r["ib"])  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    assert got.count() > 0


def test_asof_join_tolerance(spark):
    """pandas merge_asof tolerance parity: a match further than the
    tolerance is no match (NULL carries); within it, identical to the
    untolerated join; tolerance=None stays byte-identical."""
    from qcardia_data_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u", 100), ("u", 200), ("u", 310)], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [("u", 90, "a"), ("u", 195, "b")], ["k", "rts", "val"]
    )
    base = {(r["ts"], r["val"]) for r in asof_join(
        left, right, ["k"], "ts", "rts", ["val"]).collect()}
    assert base == {(100, "a"), (200, "b"), (310, "b")}
    tol = {(r["ts"], r["val"]) for r in asof_join(
        left, right, ["k"], "ts", "rts", ["val"], tolerance=20).collect()}
    # 310 - 195 = 115 > 20 -> no match; 100-90=10, 200-195=5 stay
    assert tol == {(100, "a"), (200, "b"), (310, None)}
    fwd = {(r["ts"], r["val"]) for r in asof_join(
        left, right, ["k"], "ts", "rts", ["val"],
        direction="forward", tolerance=10).collect()}
    # forward: 100 -> 195? gap 95 > 10 -> None; 200 -> none ahead within 10
    assert fwd == {(100, None), (200, None), (310, None)}
    fwd2 = {(r["ts"], r["val"]) for r in asof_join(
        left, right, ["k"], "ts", "rts", ["val"],
        direction="forward", tolerance=100).collect()}
    assert fwd2 == {(100, "b"), (200, None), (310, None)}


def test_asof_join_nearest(spark):
    """pandas merge_asof(direction='nearest') parity: the closer match
    wins, backward winning exact ties; tolerance bounds both sides."""
    import pytest as _pytest

    from qcardia_data_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u", 100), ("u", 200), ("u", 252)], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [("u", 90, "a"), ("u", 205, "b"), ("u", 300, "c")],
        ["k", "rts", "val"],
    )
    out = {(r["ts"], r["val"], r["rts"]) for r in asof_join(
        left, right, ["k"], "ts", "rts", ["val", "rts"],
        direction="nearest").collect()}
    # 100: back a (10) vs fwd b (105) -> a; 200: back a (110) vs fwd b
    # (5) -> b; 252: back b (47) vs fwd c (48) -> b
    assert out == {(100, "a", 90), (200, "b", 205), (252, "b", 205)}
    # exact tie -> backward wins
    tie = spark.createDataFrame([("u", 250)], ["k", "ts"])
    r2 = spark.createDataFrame(
        [("u", 200, "lo"), ("u", 300, "hi")], ["k", "rts", "val"]
    )
    got = asof_join(tie, r2, ["k"], "ts", "rts", ["val", "rts"],
                    direction="nearest").collect()[0]
    assert got["val"] == "lo"
    # tolerance applies on both sides
    far = asof_join(tie, r2, ["k"], "ts", "rts", ["val", "rts"],
                    direction="nearest", tolerance=10).collect()[0]
    assert far["val"] is None
    # right_ts no longer needs to ride in carry: the matched timestamp
    # travels inside the fill struct (one-union form, ADVICE r8 fix)
    slim = asof_join(tie, r2, ["k"], "ts", "rts", ["val"],
                     direction="nearest").collect()[0]
    assert slim["val"] == "lo"


def test_asof_join_nearest_null_and_duplicate_left_rows(spark):
    """ADVICE r8 (high) regression: the composed-join nearest form joined
    backward x forward on list(left.columns) with null-unsafe equality —
    a left row with a NULL in any column vanished, and duplicate left
    rows multiplied combinatorially. The one-union form keeps each left
    row standing alone: NULLs survive, duplicates stay 1:1."""
    from qcardia_data_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u", 100, None), ("u", 200, "x"), ("u", 200, "x")],
        ["k", "ts", "payload"],
    )
    right = spark.createDataFrame(
        [("u", 90, "a"), ("u", 205, "b")], ["k", "rts", "val"]
    )
    rows = asof_join(
        left, right, ["k"], "ts", "rts", ["val"], direction="nearest"
    ).collect()
    # 3 rows in -> 3 rows out (the NULL-payload row is kept; the two
    # duplicate rows do not become four)
    assert len(rows) == 3
    got = sorted((r["ts"], r["payload"], r["val"]) for r in rows)
    assert got == [(100, None, "a"), (200, "x", "b"), (200, "x", "b")]


def test_asof_join_nearest_plan_is_joinless(spark):
    """The nearest direction must share the directional plan shape: one
    union + windows, zero join operators (the old form had two asof
    unions PLUS an inner join)."""
    from qcardia_data_spark.operators.temporal import asof_join

    left = spark.createDataFrame([("u", 100)], ["k", "ts"])
    right = spark.createDataFrame([("u", 90, "a")], ["k", "rts", "val"])
    out = asof_join(left, right, ["k"], "ts", "rts", ["val"],
                    direction="nearest")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # and exactly ONE key exchange feeds both window sorts
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan


def test_asof_join_randomized_differential_vs_pandas(spark):
    """Permanent differential: all three directions (+tolerance) against
    pandas merge_asof on seeded random data — the reference semantics the
    operator claims parity with. Keys/timestamps collide on purpose."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    left_pd = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 120),
        "ts": rng.randint(0, 500, 120),
        "lid": np.arange(120),
    }).sort_values("ts").reset_index(drop=True)
    right_pd = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 80),
        "rts": rng.randint(0, 500, 80),
        "val": np.arange(80),
    }).drop_duplicates(
        # equal (k, rts) right rows are an ENGINE-DEFINED tie in
        # merge_asof (positional) vs this operator (carry-struct order)
        # — same caveat the older differentials document; left-side
        # collisions and duplicates stay in
        subset=["k", "rts"]
    ).sort_values("rts").reset_index(drop=True)
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 30):
            want = pd.merge_asof(
                left_pd.sort_values("ts"),
                right_pd.sort_values("rts").rename(columns={"rts": "ts"}),
                on="ts", by="k", direction=direction,
                tolerance=tol,
            )
            want_map = {
                int(r.lid): (None if pd.isna(r.val) else int(r.val))
                for r in want.itertuples()
            }
            got = asof_join(
                left, right, ["k"], "ts", "rts", ["val"],
                direction=direction, tolerance=tol,
            ).collect()
            # raw row count FIRST: a dict keyed by lid would silently
            # absorb the r8 duplicate-multiplication regression
            assert len(got) == 120, (direction, tol, len(got))
            got_map = {r["lid"]: r["val"] for r in got}
            assert len(got_map) == 120, (direction, tol)
            mismatches = {
                lid: (got_map[lid], want_map[lid])
                for lid in want_map
                if got_map[lid] != want_map[lid]
            }
            assert not mismatches, (direction, tol, mismatches)


def test_asof_join_reserved_internal_names(spark):
    """ADVICE r9 regression: internal working names (_t/_side/_carry/
    _cb/_cf/_pick) and the reserved struct field (_rts) are now FRESH —
    a left column or carry column with those literal names must flow
    through untouched instead of colliding/corrupting the pick."""
    from qcardia_data_spark.operators.temporal import asof_join

    # left carries columns literally named after the old working names
    left = spark.createDataFrame(
        [("u", 100, "L1", "S1", "C1"), ("u", 252, "L2", "S2", "C2")],
        ["k", "ts", "_t", "_side", "_carry"],
    )
    # right carries a column literally named _rts (reserved struct field)
    right = spark.createDataFrame(
        [("u", 90, "a", 900), ("u", 205, "b", 2050), ("u", 300, "c", 3000)],
        ["k", "rts", "val", "_rts"],
    )
    for direction, want in (
        ("backward", {(100, "a", 900), (252, "b", 2050)}),
        ("forward", {(100, "b", 2050), (252, "c", 3000)}),
        ("nearest", {(100, "a", 900), (252, "b", 2050)}),
    ):
        rows = asof_join(
            left, right, ["k"], "ts", "rts", ["val", "_rts"],
            direction=direction,
        ).collect()
        assert {(r["ts"], r["val"], r["_rts"]) for r in rows} == want, direction
        # the left passenger columns are intact
        assert {(r["ts"], r["_t"], r["_side"], r["_carry"]) for r in rows} == {
            (100, "L1", "S1", "C1"), (252, "L2", "S2", "C2"),
        }, direction
    # tolerance path exercises the fresh _rts field inside the fill struct
    got = asof_join(
        left, right, ["k"], "ts", "rts", ["val", "_rts"],
        direction="nearest", tolerance=10,
    ).collect()
    by_ts = {r["ts"]: (r["val"], r["_rts"]) for r in got}
    assert by_ts[100] == ("a", 900)       # |100-90| = 10, in tolerance
    assert by_ts[252] == (None, None)     # nearest is 47 away, out


def test_asof_join_case_variant_reserved_names(spark):
    """r10 self-review reproduction: a left column named '_T' (case
    variant of the internal working name) raised COLUMN_ALREADY_EXISTS
    because fresh_name compared case-sensitively while Spark's column
    namespace is case-insensitive."""
    from qcardia_data_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u", 100, "L1"), ("u", 252, "L2")], ["k", "ts", "_T"]
    )
    right = spark.createDataFrame(
        [("u", 90, "a"), ("u", 205, "b")], ["k", "rts", "val"]
    )
    for direction in ("backward", "forward", "nearest"):
        rows = asof_join(
            left, right, ["k"], "ts", "rts", ["val"], direction=direction
        ).collect()
        assert len(rows) == 2, direction
        assert {r["_T"] for r in rows} == {"L1", "L2"}, direction


def test_range_joins_keep_user_bucket_column(spark):
    """r14 review (the asof ADVICE-r9 fresh-name class): both range joins
    used a FIXED "_bucket" working name — a user column literally named
    _bucket was silently overwritten and then dropped from the output."""
    from datetime import datetime

    from qcardia_data_spark.operators.temporal import (
        bucketed_range_join,
        interval_overlap_join,
    )

    pts = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 30), "keep-me")],
        ["pid", "ts", "_bucket"],
    )
    iv = spark.createDataFrame(
        [(10, datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 1, 0))],
        ["iid", "start", "end"],
    )
    out = bucketed_range_join(pts, iv, "ts", "start", "end")
    rows = out.collect()
    assert len(rows) == 1
    assert "_bucket" in out.columns and rows[0]["_bucket"] == "keep-me"

    l = spark.createDataFrame([(1, 0, 100, "keep-l")],
                              ["lid", "ls", "le", "_bucket"])
    r = spark.createDataFrame([(2, 50, 150)], ["rid", "rs", "re"])
    out2 = interval_overlap_join(l, r, "ls", "le", "rs", "re",
                                 bucket_seconds=60)
    rows2 = out2.collect()
    assert len(rows2) == 1
    assert rows2[0]["_bucket"] == "keep-l"
