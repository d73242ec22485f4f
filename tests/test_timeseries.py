"""Unit + plan-shape tests for operators/timeseries.py (the TimescaleDB
``interpolate / stats_agg / histogram / heartbeat_agg / LTTB`` analogs).

Oracle value-parity for the five registry queries is covered by
test_oracle_parity's registry parameterization; these tests pin the
hand-computable semantics on tiny frames and the exchange-count plan
shapes the module docstrings promise.
"""
from __future__ import annotations

from qcardia_data_spark.operators import timeseries as TS
from qcardia_data_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name][0](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# semantics on hand-computed frames
# ---------------------------------------------------------------------------


def test_interpolate_linear_between_points(spark):
    # events at t=0 (v=10.0) and t=7200 (v=20.0); bucket closes at 3599
    # and 7199 interpolate on the line v = 10 + 10*t/7200; bucket 2's
    # close (10799) has no successor -> NULL.
    df = spark.createDataFrame(
        [(1, 0, 10.0, 100), (1, 7200, 20.0, 101)], "k long, s long, v double, tb long"
    )
    out = TS.gapfill_interpolate(df, "k", "s", "v", "tb", bucket_s=3600)
    rows = {r["bucket"]: r["value_e6"] for r in out.collect()}
    assert rows[0] == round((10 + 10 * 3599 / 7200) * 1e6)
    assert rows[1] == round((10 + 10 * 7199 / 7200) * 1e6)
    assert rows[2] is None  # interpolate() yields NULL past the last point


def test_interpolate_exact_hit_is_identity(spark):
    # an event exactly at a bucket close makes prev==close -> value is the
    # event's own value, exactly (ratio term is 0; no 0/0 is possible
    # because "next" is strictly later by the probe tiebreak ordering)
    df = spark.createDataFrame(
        [(1, 3599, 12.31, 100), (1, 9000, 50.0, 101)],
        "k long, s long, v double, tb long",
    )
    out = TS.gapfill_interpolate(df, "k", "s", "v", "tb", bucket_s=3600)
    rows = {r["bucket"]: r["value_e6"] for r in out.collect()}
    assert rows[0] == 12_310_000


def test_trend_recovers_exact_line(spark):
    # y = 2 cents/second * x + 500 cents, sampled at 4 points: slope and
    # intercept recovered exactly; r2 == 1 (scaled to 1e6)
    pts = [(7, s, (2 * s + 500) / 100.0) for s in (1000, 2000, 3000, 5000)]
    df = spark.createDataFrame(pts, "k long, s long, v double")
    r = TS.trend_stats(df, "k", "s", "v").collect()[0]
    assert r["n_events"] == 4
    assert r["slope_cph_e6"] == 2 * 3600 * 1_000_000
    assert r["intercept_c_e2"] == (2 * 1000 + 500) * 100  # at first obs
    assert r["r2_e6"] == 1_000_000


def test_trend_excludes_zero_variance_keys(spark):
    df = spark.createDataFrame(
        [(1, 100, 5.0), (1, 100, 7.0), (2, 0, 1.0), (2, 10, 2.0)],
        "k long, s long, v double",
    )
    out = TS.trend_stats(df, "k", "s", "v")
    assert [r["k"] for r in out.collect()] == [2]


def test_histogram_bins_and_clamping(spark):
    # bin width 2000 cents: 19.99 -> bin 0, 20.00 -> bin 1 (exact integer
    # boundary), 9999.99 clamps into the top bin (n_bins-1)
    df = spark.createDataFrame(
        [("a", 19.99), ("a", 20.00), ("a", 9999.99)], "k string, v double"
    )
    out = TS.value_histogram(df, "k", "v", bin_width_cents=2000, n_bins=25)
    rows = {r["bin"]: r for r in out.collect()}
    assert rows[0]["n"] == 1 and rows[0]["max_c"] == 1999
    assert rows[1]["n"] == 1 and rows[1]["min_c"] == 2000
    assert rows[24]["n"] == 1 and rows[24]["bin_lo_cents"] == 48000


def test_heartbeat_gates_final_open_beat(spark):
    # beats at 0, 100, 1000: gaps 100 (covered) and 900 (capped at 600,
    # one outage); the final beat contributes NOTHING (least() skips
    # nulls in both engines — the explicit gate is the regression target)
    df = spark.createDataFrame(
        [(1, 0, 10), (1, 100, 11), (1, 1000, 12)], "k long, s long, tb long"
    )
    r = TS.heartbeat_uptime(df, "k", "s", "tb", liveness_s=600).collect()[0]
    assert r["n_beats"] == 3
    assert r["uptime_s"] == 100 + 600
    assert r["n_outages"] == 1
    assert r["span_s"] == 1000
    assert r["uptime_ratio_e6"] == 700_000


def test_lttb_keeps_endpoints_with_sentinel_area(spark):
    # global endpoints carry area 2^62: always selected in their buckets
    df = spark.createDataFrame(
        [(1, 0, 1.0, 0), (1, 3660, 1.1, 1), (1, 3720, 100.0, 2),
         (1, 3780, 1.2, 3), (1, 7200, 1.0, 4)],
        "k long, s long, v double, tb long",
    )
    out = TS.lttb_downsample(df, "k", "s", "v", "tb", bucket_s=3600)
    rows = {r["bucket"]: r for r in out.collect()}
    assert rows[0]["sel_s"] == 0 and rows[0]["area2"] == 2**62
    assert rows[2]["sel_s"] == 7200 and rows[2]["area2"] == 2**62
    assert set(rows) == {0, 1, 2}


def test_lttb_selects_hand_computed_largest_area(spark):
    # bucket 1 holds 4 points (3600, 3660, 3720=spike, 3780); raw LTOB
    # areas are x-scale-weighted, so the winner is the point bridging the
    # spike to the far endpoint — t=3780 with doubled area
    # |(3720-7200)(120-10000) - (3720-3780)(100-10000)| = 33_788_400.
    # (Selecting a spike NEIGHBOR over the spike is the documented LTOB
    # characteristic of unnormalized areas, faithful to the thesis form.)
    df = spark.createDataFrame(
        [(1, 0, 1.0, 0), (1, 3600, 1.0, 1), (1, 3660, 1.1, 2),
         (1, 3720, 100.0, 3), (1, 3780, 1.2, 4), (1, 7200, 1.0, 5)],
        "k long, s long, v double, tb long",
    )
    out = TS.lttb_downsample(df, "k", "s", "v", "tb", bucket_s=3600)
    rows = {r["bucket"]: r for r in out.collect()}
    assert rows[1]["sel_s"] == 3780
    assert rows[1]["area2"] == 33_788_400
    assert rows[1]["n_points"] == 4


# ---------------------------------------------------------------------------
# plan shapes: the exchange counts the docstrings promise
# ---------------------------------------------------------------------------


def test_trend_plan_single_exchange(spark, sf_dir):
    # window-min origin + groupBy ride the SAME per-user exchange
    plan = _plan(spark, sf_dir, "ev_trend_slope")
    assert plan.count("Exchange hashpartitioning") == 1


def test_lttb_plan_single_exchange_two_sorts(spark, sf_dir):
    # the (k, h) groupBy's ClusteredDistribution is satisfied by the
    # window's hashpartitioning(k): no second shuffle
    plan = _plan(spark, sf_dir, "ev_lttb_downsample")
    assert plan.count("Exchange hashpartitioning") == 1


def test_interpolate_plan_two_window_sorts_one_window_exchange(spark, sf_dir):
    # 2 exchanges total: span-agg (probe generation) + the shared window
    # exchange; the two opposite-direction window passes add 2 sorts
    plan = _plan(spark, sf_dir, "ev_gapfill_interpolate")
    assert plan.count("Exchange hashpartitioning") == 2


def test_histogram_plan_partial_final_agg(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ev_value_histogram")
    assert plan.count("HashAggregate") >= 2  # map-side combine
    assert plan.count("Exchange hashpartitioning") == 1


def test_mad_outliers_robust_where_zscore_masks(spark):
    """One wild value among near-constant readings: MAD flags it. The
    same value's plain z-score stays under 2 sigma on short frames (it
    inflates its own stddev) — the masking MAD is immune to."""
    from qcardia_data_spark.operators.timeseries import mad_outliers

    vals = [10.0, 10.1, 9.9, 10.0, 10.2, 9.8, 10.1, 1000.0]
    rows = [(i, "u1", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "value"])
    out = {r["event_id"]: (r["score"], r["is_outlier"])
           for r in mad_outliers(df, "user_id", "value", "event_id").collect()}
    assert out[7][1] is True and abs(out[7][0]) > 100
    assert all(not flag for eid, (_, flag) in out.items() if eid != 7)
    # the masking check: classic z-score of the wild point on this frame
    import statistics
    z = (1000.0 - statistics.mean(vals)) / statistics.stdev(vals)
    assert z < 2.7  # below a 3-sigma rule — masked


def test_mad_outliers_zero_mad_keys_emit_nothing(spark):
    from qcardia_data_spark.operators.timeseries import mad_outliers

    rows = [(i, "const", 5.0) for i in range(6)] + [(10, "const", 7.0)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "value"])
    assert mad_outliers(df, "user_id", "value", "event_id").count() == 0


def test_mad_outliers_single_exchange(spark, sf_dir):
    from qcardia_data_spark.catalog import load_table
    from qcardia_data_spark.operators.timeseries import mad_outliers

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    plan = (
        mad_outliers(ev, "user_id", "value", "event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # every window/join rides user_id hash exchanges; no global sort
    assert "Exchange rangepartitioning" not in plan


def test_ewma_truncated_matches_reference_and_normalizes_head(spark):
    from qcardia_data_spark.operators.timeseries import ewma_truncated

    vals = [1.0, 2.0, 4.0, 8.0, 16.0]
    rows = [(i, "u", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "s", "value"])
    got = {r["event_id"]: r["ewma"]
           for r in ewma_truncated(df, "user_id", "s", "value",
                                   alpha=0.5, lags=8).collect()}
    # reference: truncated weights, normalized by present weights
    a = 0.5
    for t in range(len(vals)):
        ws = [a * (1 - a) ** j for j in range(min(8, t + 1))]
        want = sum(w * vals[t - j] for j, w in enumerate(ws)) / sum(ws)
        assert abs(got[t] - want) < 1e-12, (t, got[t], want)
    assert got[0] == vals[0]  # head row: only its own weight -> identity


def test_ewma_validation(spark):
    import pytest as _pytest

    from qcardia_data_spark.operators.timeseries import ewma_truncated

    df = spark.createDataFrame([(1, "u", 1, 1.0)],
                               ["event_id", "user_id", "s", "value"])
    with _pytest.raises(ValueError, match="alpha"):
        ewma_truncated(df, "user_id", "s", "value", alpha=0.0)
    with _pytest.raises(ValueError, match="lags"):
        ewma_truncated(df, "user_id", "s", "value", lags=0)


def test_mad_outliers_keeps_null_key_group(spark):
    """r14 review (the alpha_mix/unimax null-group twin): the window
    passes compute a median/MAD for a NULL key partition, but the old
    plain equi-join-backs dropped that group's rows from the output
    silently. A NULL key (attribution failures, anonymous users) is a
    legitimate group and must score like any other."""
    from qcardia_data_spark.operators.timeseries import mad_outliers

    rows = (
        [(i, "u1", float(v)) for i, v in enumerate([1, 2, 3, 4, 100])]
        + [(100 + i, None, float(v)) for i, v in enumerate([10, 20, 30, 40, 9999])]
    )
    df = spark.createDataFrame(rows, "event_id LONG, user_id STRING, value DOUBLE")
    out = mad_outliers(df, key="user_id", value_col="value", id_col="event_id")
    got = {r["event_id"]: r["is_outlier"] for r in out.collect()}
    # both groups fully present (5 rows each)
    assert len(got) == 10, sorted(got)
    assert got[4] is True     # 100 in the u1 group
    assert got[104] is True   # 9999 in the NULL group
    assert got[0] is False and got[100] is False
