"""Streaming tests: batch/stream result equality under availableNow
(the Structured Streaming correctness contract), session windows, stateful
dedup, and the custom applyInPandasWithState operator."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from qcardia_data_spark.catalog import load_table
from qcardia_data_spark.streaming import events as S


def _batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_tumbling_stream_equals_batch(spark, sf_dir):
    # complete mode: append would (correctly) hold back the final windows
    # still inside the watermark horizon — for batch equality we want all
    stream_out = S.run_to_memory(S.tumbling_counts(S.events_stream(spark, sf_dir)), "complete")
    batch_out = S.tumbling_counts(_batch_events(spark, sf_dir))
    got = {tuple(r) for r in stream_out.collect()}
    want = {tuple(r) for r in batch_out.collect()}
    assert got == want
    assert len(want) > 0


def test_ohlc_stream_equals_batch(spark, sf_dir):
    # the struct-min/max candle is a pure mergeable aggregate: micro-batch
    # partials must combine to exactly the one-pass batch result
    stream_out = S.run_to_memory(S.ohlc_candles(S.events_stream(spark, sf_dir)), "complete")
    batch_out = S.ohlc_candles(_batch_events(spark, sf_dir))
    got = {tuple(r) for r in stream_out.collect()}
    want = {tuple(r) for r in batch_out.collect()}
    assert got == want and len(want) > 0


def test_ohlc_stream_twin_matches_graded_query(spark, sf_dir):
    # bridge to the oracle-graded batch query: same candles keyed by
    # epoch-hour (window start // 3600 == bucket_hour)
    from qcardia_data_spark.queries import QUERIES
    twin = S.ohlc_candles(_batch_events(spark, sf_dir))
    got = {
        (r["event_type"], int(r["win_start"].timestamp()) // 3600,
         r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in twin.collect()
    }
    graded = QUERIES["ev_ohlc_hourly"][0](spark, sf_dir)
    want = {
        (r["event_type"], r["bucket_hour"], r["open"], r["high"], r["low"],
         r["close"], r["n_events"])
        for r in graded.collect()
    }
    assert got == want


def test_histogram_stream_equals_batch(spark, sf_dir):
    stream_out = S.run_to_memory(
        S.value_histogram_stream(S.events_stream(spark, sf_dir)), "complete")
    batch_out = S.value_histogram_stream(_batch_events(spark, sf_dir))
    got = {tuple(r) for r in stream_out.collect()}
    want = {tuple(r) for r in batch_out.collect()}
    assert got == want and len(want) > 0


def test_sliding_windows_overlap(spark, sf_dir):
    out = S.sliding_counts(_batch_events(spark, sf_dir), "1 hour", "30 minutes")
    tumb = S.tumbling_counts(_batch_events(spark, sf_dir), "1 hour")
    # every event lands in 2 overlapping windows → total count doubles
    n_slide = out.agg(F.sum("n_events")).collect()[0][0]
    n_tumb = tumb.agg(F.sum("n_events")).collect()[0][0]
    assert n_slide == 2 * n_tumb


def test_session_windows(spark, sf_dir):
    sess = S.session_counts(_batch_events(spark, sf_dir), gap="30 minutes")
    rows = sess.collect()
    assert rows
    # sessions for one user never overlap (gap semantics)
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["sess_start"], r["sess_end"]))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert s2 >= e1  # next session starts after previous ends


def test_streaming_dedup(spark, sf_dir):
    ev = _batch_events(spark, sf_dir)
    duplicated = ev.union(ev)  # every event twice
    out = S.run_to_memory(
        S.dedup_within_watermark(S.events_stream(spark, sf_dir).union(S.events_stream(spark, sf_dir)), ["event_id"])
    )
    assert out.count() == ev.count()
    assert duplicated.count() == 2 * ev.count()


def test_dedup_first_per_key_within_watermark(spark, tmp_path):
    """Same key arriving again with a DIFFERENT event time inside the
    watermark horizon is dropped (first wins); dedup_exact_events keeps it
    (only identical (key, ts) re-deliveries collapse)."""
    import datetime as dt

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        ("k1", t0, 1.0),
        ("k1", t0 + dt.timedelta(minutes=10), 2.0),  # same key, later ts
        ("k1", t0, 1.0),                              # exact re-delivery
        ("k2", t0 + dt.timedelta(minutes=5), 3.0),
    ]
    src = tmp_path / "stream"
    spark.createDataFrame(rows, ["user_id", "ts", "value"]).coalesce(1).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = S.stream_from_dir(spark, str(src) + "/*.parquet", schema)

    first_wins = S.run_to_memory(S.dedup_within_watermark(stream, ["user_id"], "2 hours"))
    assert first_wins.count() == 2  # one event per key
    assert {r["user_id"] for r in first_wins.collect()} == {"k1", "k2"}

    exact = S.run_to_memory(S.dedup_exact_events(stream, ["user_id"], "2 hours"))
    assert exact.count() == 3  # k1@t0 collapses; k1@t0+10m survives


def test_watermark_drops_late_data(spark, tmp_path):
    """Events arriving (in a later file) with timestamps beyond the
    watermark horizon are dropped from append-mode aggregations — the
    bounded-state / late-data policy in action."""
    import datetime as dt
    import time

    src = tmp_path / "stream"
    src.mkdir()
    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)

    def write_file(name, rows):
        pdf = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
        pdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp" / name))
        # move the single part file into the stream dir (atomic arrival)
        import glob
        import shutil

        part = glob.glob(str(tmp_path / "tmp" / name / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_available_now():
        schema = spark.read.parquet(str(src)).schema
        stream = S.stream_from_dir(spark, str(src) + "/*.parquet", schema)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("win_start"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    # run 1: events at t0, t0+1h, t0+5h → watermark persists at t0+4h;
    # windows [t0, t0+1h) and [t0+1h, t0+2h) finalize with n=1 each
    write_file("f1", [(i, t0 + dt.timedelta(hours=h), 1, 1.0) for i, h in enumerate([0, 1, 5])])
    run_available_now()
    first = {(r["win_start"], r["n"]) for r in spark.read.parquet(out_dir).collect()}
    assert (t0, 1) in first

    # run 2 (same checkpoint): a 5h-late event at t0 arrives — its window is
    # already finalized and its state evicted; the late event is DROPPED and
    # can never resurrect or double-count the t0 window
    time.sleep(0.2)
    write_file("f2", [(10, t0 + dt.timedelta(hours=5, minutes=30), 1, 1.0),
                      (11, t0, 1, 1.0)])
    run_available_now()
    final = [r for r in spark.read.parquet(out_dir).collect() if r["win_start"] == t0]
    assert [r["n"] for r in final] == [1]  # exactly one emission, count 1


def test_file_sink_with_checkpoint_resume(spark, sf_dir, tmp_path):
    """Exactly-once parquet sink: first availableNow run processes the
    input; a restarted query against the same checkpoint reprocesses
    nothing (the production restart/recovery contract)."""
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            S.tumbling_counts(S.events_stream(spark, sf_dir))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    q1 = start()
    q1.awaitTermination()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    q2 = start()  # same checkpoint, no new files → no duplicates
    q2.awaitTermination()
    n2 = spark.read.parquet(out_dir).count()
    assert n2 == n1


def test_stream_stream_attribution_join(spark, sf_dir):
    # stream-stream join result == the same join on batch frames
    stream_out = S.run_to_memory(
        S.attribution_join(S.events_stream(spark, sf_dir)), "append"
    )
    batch_out = S.attribution_join(_batch_events(spark, sf_dir))
    got = {tuple(r) for r in stream_out.collect()}
    want = {tuple(r) for r in batch_out.collect()}
    assert want  # the synthetic stream contains click→purchase sequences
    assert got == want
    # every attribution is within the 1h bound, trigger before outcome
    assert all(0 <= r["lag_sec"] <= 3600 for r in batch_out.collect())


def test_stateful_running_totals(spark, sf_dir):
    from qcardia_data_spark.streaming.stateful import running_user_totals

    out = S.run_to_memory(running_user_totals(S.events_stream(spark, sf_dir)), "update")
    # final update per user equals the batch aggregate
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
    )
    batch = (
        _batch_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    got = {(r["user_id"], r["n_events"], round(r["total_value"], 6)) for r in final.collect()}
    want = {(r["user_id"], r["n_events"], round(r["total_value"], 6)) for r in batch.collect()}
    assert got == want


def test_streaming_ingest_dedup_matches_batch_exact_dedup(spark, tmp_path):
    """Streaming document dedup keeps exactly one copy per canonical text —
    the same survivor set as the batch exact_dedup when arrival order is id
    order (single file → source preserves row order)."""
    import datetime as dt

    from qcardia_data_spark.functions.dedup import exact_dedup

    t0 = dt.datetime(2024, 6, 1, 8, 0, 0)
    rows = []
    for i in range(30):
        text = f"shared boilerplate {i % 10}"  # 10 distinct texts, 3 copies each
        rows.append((i, text, t0 + dt.timedelta(seconds=i)))
    df = spark.createDataFrame(rows, ["doc_id", "text", "ingest_ts"])
    src = tmp_path / "docs"
    df.coalesce(1).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = S.stream_from_dir(spark, str(src) + "/*.parquet", schema)

    kept = S.run_to_memory(S.streaming_ingest_dedup(stream, watermark="1 hour"))
    got = sorted(r["doc_id"] for r in kept.collect())
    want = sorted(r["doc_id"] for r in exact_dedup(df, "doc_id", "text").collect())
    assert got == want == list(range(10))  # first/min-id copy of each text


# ---------------------------------------------------------------------------
# NTZ regression guard (round-4 verdict #6): every streaming entry point must
# analyze AND run when fed from the parquet-backed events stream, whatever
# timestamp type the environment's parquet reader produces (Spark 4.1.2 reads
# the testdata as TIMESTAMP_NTZ; withWatermark requires TIMESTAMP — the
# _watermarked/ensure_event_time boundary converts). A failure here means a
# watermark call site bypassed the boundary.
# ---------------------------------------------------------------------------
_STREAM_ENTRY_POINTS = {
    "tumbling": lambda ev: S.tumbling_counts(ev),
    "sliding": lambda ev: S.sliding_counts(ev),
    "session": lambda ev: S.session_counts(ev),
    "attribution": lambda ev: S.attribution_join(ev),
    "dedup_within_watermark": lambda ev: S.dedup_within_watermark(ev, ["event_id"]),
    "dedup_exact_events": lambda ev: S.dedup_exact_events(ev, ["event_id"]),
    "stateful_totals": lambda ev: __import__(
        "qcardia_data_spark.streaming.stateful", fromlist=["running_user_totals"]
    ).running_user_totals(ev),
    "ohlc": lambda ev: S.ohlc_candles(ev),
    "histogram": lambda ev: S.value_histogram_stream(ev),
    "trend": lambda ev: __import__(
        "qcardia_data_spark.streaming.stateful",
        fromlist=["streaming_trend_stats"],
    ).streaming_trend_stats(ev),
    # streaming_gapfill_locf is append-mode watermark-gated (a single
    # availableNow batch emits nothing by design) — its NTZ coverage is
    # the chronological-files prefix test above
}


@pytest.mark.parametrize("name", sorted(_STREAM_ENTRY_POINTS))
def test_every_entry_point_runs_from_parquet_stream(spark, sf_dir, name):
    ev = S.events_stream(spark, sf_dir)
    assert ev.isStreaming
    mode = {"stateful_totals": "update",
            "trend": "update",
            "dedup_within_watermark": "append",
            "dedup_exact_events": "append",
            "attribution": "append"}.get(name, "complete")
    out = S.run_to_memory(_STREAM_ENTRY_POINTS[name](ev), mode)
    assert out.count() > 0


def test_spec_watermark_op_runs_from_parquet_stream(spark, sf_dir):
    import os as _os

    from qcardia_data_spark.plans.spec import compile_stream_pipeline

    raw_schema = spark.read.parquet(_os.path.join(sf_dir, "events.parquet")).schema
    ops = [
        {"op": "stream_source", "path": _os.path.join(sf_dir, "events.*"),
         "schema": raw_schema, "max_files_per_trigger": 1},
        {"op": "watermark", "col": "ts", "delay": "2 hours"},
        {"op": "window_agg", "col": "ts", "width": "1 hour",
         "by": ["event_type"], "aggs": {"n": "count(*)"}},
    ]
    out = S.run_to_memory(compile_stream_pipeline(spark, ops), "complete")
    assert out.count() > 0


def test_streaming_ingest_dedup_runs_with_ntz_ingest_ts(spark, tmp_path):
    # ingest_ts written as TIMESTAMP_NTZ parquet (pyarrow default, no tz) —
    # the docs-side twin of the events guard above
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "docs"
    src.mkdir()
    pdf = pd.DataFrame({
        "doc_id": range(6),
        "text": [f"t{i % 3}" for i in range(6)],
        "ingest_ts": pd.date_range("2024-06-01 08:00:00", periods=6, freq="s"),
    })
    tbl = pa.Table.from_pandas(pdf)
    # micros precision: nanos would read back as bigint under the session's
    # nanosAsLong legacy conf — this test targets the NTZ path specifically
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ingest_ts"), "ingest_ts",
        tbl["ingest_ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(tbl, str(src / "f.parquet"))
    schema = spark.read.parquet(str(src)).schema
    assert dict((f.name, f.dataType.simpleString()) for f in schema)["ingest_ts"] in (
        "timestamp_ntz", "timestamp"
    )
    stream = S.stream_from_dir(spark, str(src) + "/*.parquet", schema)
    out = S.run_to_memory(S.streaming_ingest_dedup(stream, watermark="1 hour"))
    assert out.count() == 3


def test_ntz_cast_refuses_dst_session_timezone(spark, sf_dir):
    """The fixed-offset guard: reinterpreting NTZ event times under a
    DST-observing session tz must fail loudly at plan time."""
    ev = load_table(spark, sf_dir, "events")
    if dict(ev.dtypes).get("ts") != "timestamp_ntz":
        pytest.skip("environment reads parquet ts as TIMESTAMP already")
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="observes DST"):
            S.ensure_event_time(ev, "ts")
        spark.conf.set("spark.sql.session.timeZone", "+05:30")  # fixed offset OK
        assert dict(S.ensure_event_time(ev, "ts").dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)


def test_streaming_heavy_hitters_exact_with_generous_budget(spark, sf_dir):
    """With m >= per-group distinct values, MG never evicts: the final
    streamed summary equals the exact batch frequency table; with a tiny
    m, every emitted count obeys the undercount bound (n <= true)."""
    from qcardia_data_spark.streaming.stateful import streaming_heavy_hitters

    out = S.run_to_memory(
        streaming_heavy_hitters(S.events_stream(spark, sf_dir), "event_type", m=64),
        "update",
    )
    # counts are monotone without eviction -> take the max per value
    got = {
        r["value"]: r["n"]
        for r in out.groupBy("value").agg(F.max("n").alias("n")).collect()
    }
    want = {
        str(r["event_type"]): r["n"]
        for r in _batch_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want

    capped = S.run_to_memory(
        streaming_heavy_hitters(S.events_stream(spark, sf_dir), "event_type", m=2, n_salts=2),
        "update",
    )
    got_capped = {
        r["value"]: r["n"]
        for r in capped.groupBy("value").agg(F.max("n").alias("n")).collect()
    }
    for v, n in got_capped.items():
        assert n <= want[v]  # MG never overcounts


def test_streaming_jsonl_corpus_ingestion_pipeline(spark, tmp_path):
    """End-to-end streaming corpus intake: JSONL files arriving in a
    directory → schema'd readStream → stateless quality gate → watermarked
    exact dedup → collected set matches the batch twin doc-for-doc."""
    import json as _json

    from pyspark.sql import functions as F

    from qcardia_data_spark.functions.text import doc_fingerprint, word_tokens

    d = tmp_path / "incoming"
    d.mkdir()
    rows = [
        {"doc_id": 1, "text": "a solid document with plenty of tokens here ok fine",
         "ingest_ts": "2024-01-01 10:00:00"},
        {"doc_id": 2, "text": "short", "ingest_ts": "2024-01-01 10:01:00"},  # gated
        {"doc_id": 3, "text": "a solid document with plenty of tokens here ok fine",
         "ingest_ts": "2024-01-01 10:02:00"},  # dup of 1
        {"doc_id": 4, "text": "another acceptable document body with enough words in it",
         "ingest_ts": "2024-01-01 10:03:00"},
    ]
    # two arrival batches (files)
    (d / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows[:2]))
    (d / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows[2:]))

    schema = "doc_id BIGINT, text STRING, ingest_ts TIMESTAMP"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    gated = stream.filter(F.size(word_tokens(F.col("text"))) >= 6)
    deduped = S.streaming_ingest_dedup(gated, watermark="1 hour")
    got = {r["doc_id"] for r in S.run_to_memory(deduped).collect()}

    batch = spark.read.schema(schema).json(str(d))
    bg = batch.filter(F.size(word_tokens(F.col("text"))) >= 6)
    bfp = bg.withColumn("fp", doc_fingerprint(F.col("text")))
    import pyspark.sql.window as _w

    first = (
        bfp.withColumn(
            "rn",
            F.row_number().over(
                _w.Window.partitionBy("fp").orderBy("ingest_ts", "doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    want = {r["doc_id"] for r in first.collect()}
    assert got == want == {1, 4}


def test_streaming_near_dedup_intake_chains_and_resumes(spark, sf_dir, tmp_path):
    """Streaming NEAR-dedup intake (foreachBatch over the standing
    signature index): two availableNow drains over a growing crawl dir ==
    the full-corpus batch dedup; the second run reprocesses nothing."""
    import glob
    import shutil
    import time as _time

    from qcardia_data_spark.functions.dedup import (
        near_dedup_minhash,
        write_signature_index,
    )

    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    near = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tail")).alias("text"),
    )
    # fresh content: an interleaved token destroys every original shingle
    fresh = base.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1_500_000).alias("doc_id"),
        F.regexp_replace(F.col("text"), " ", " zq ").alias("text"),
    )
    b1 = near.unionByName(fresh)
    clones2 = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), F.col("text")
    )

    # standing index = deduped base corpus
    a = near_dedup_minhash(base, "doc_id", "text", threshold=0.6)
    idx = str(tmp_path / "idx")
    write_signature_index(a, "doc_id", "text", idx)

    src = tmp_path / "crawl"
    src.mkdir()

    def land(name, df):
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp" / name))
        part = glob.glob(str(tmp_path / "tmp" / name / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{name}.parquet"))

    out_dir = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")
    schema = base.schema

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*.parquet")
        q = S.streaming_near_dedup_intake(stream, idx, out_dir, ckpt)
        q.awaitTermination()

    # crawl batch 1: near-copies (dropped vs index) + fresh docs (kept)
    land("b1", b1)
    drain()
    got1 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    want1 = {
        r["doc_id"]
        for r in near_dedup_minhash(
            base.unionByName(b1), "doc_id", "text", threshold=0.6
        ).collect()
    }
    assert {r["doc_id"] for r in a.collect()} | got1 == want1

    # crawl batch 2 (same checkpoint): exact copies → ALL dropped against
    # the (updated) index; survivors unchanged, batch 1 not reprocessed
    _time.sleep(0.2)
    land("b2", clones2)
    drain()
    got2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    full = {
        r["doc_id"]
        for r in near_dedup_minhash(
            base.unionByName(b1).unionByName(clones2),
            "doc_id", "text", threshold=0.6,
        ).collect()
    }
    assert {r["doc_id"] for r in a.collect()} | got2 == full


def test_streaming_c4_and_line_format_gates_match_batch(spark, tmp_path):
    """The r8 rule gates (C4 §2.2, Gopher A1.1 line-format) are stateless
    map-only expressions, so they compose with readStream unchanged — the
    streaming intake can gate pages before the stateful dedup stages.
    Collected survivors must match the batch twin doc-for-doc."""
    import json as _json

    from pyspark.sql import functions as F

    from qcardia_data_spark.functions.text import c4_rules, line_format_scores

    d = tmp_path / "c4_incoming"
    d.mkdir()
    good = ("this is a proper sentence with words.\n"
            "another good long sentence right here!\n"
            "a third fine sentence is present here.")
    rows = [
        {"doc_id": 1, "text": good},
        {"doc_id": 2, "text": "only one good sentence lives here today.\nnope"},
        {"doc_id": 3, "text": good.replace(
            "another good long sentence right here!",
            "lorem ipsum dolor sit amet consectetur.")},
        {"doc_id": 4, "text": "- a\n- b\n- c\n- d\n- e"},  # all-bullet page
        {"doc_id": 5, "text": good},
    ]
    (d / "b0.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows[:3]))
    (d / "b1.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows[3:]))

    schema = "doc_id BIGINT, text STRING"

    def gate(df):
        lined = df.withColumn(
            "_l", F.explode(F.array(F.split(F.col("text"), "\n")))
        )
        c = c4_rules(F.col("_l"))
        g = line_format_scores(F.col("_l"))
        return lined.filter(c["keep"] & g["line_format_ok"]).drop("_l")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    got = {r["doc_id"] for r in S.run_to_memory(gate(stream)).collect()}
    batch = spark.read.schema(schema).json(str(d))
    want = {r["doc_id"] for r in gate(batch).collect()}
    assert got == want == {1, 5}


def test_streaming_chunk_spec_op_matches_batch(spark, tmp_path):
    """`chunk` is a stateless generator expression, so the same spec op
    runs mid-stream — a crawl intake can chunk pages for embedding before
    the sink. Streamed chunks must match the batch twin exactly."""
    import json as _json

    from qcardia_data_spark.functions.text import chunk_documents
    from qcardia_data_spark.plans.spec import compile_stream_pipeline

    d = tmp_path / "chunk_incoming"
    d.mkdir()
    rows = [
        {"doc_id": i, "text": " ".join(f"w{i}_{j}" for j in range(5 + 13 * i))}
        for i in range(6)
    ]
    (d / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows[:3]))
    (d / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in rows[3:]))

    schema = "doc_id BIGINT, text STRING"
    stream = compile_stream_pipeline(spark, [
        {"op": "stream_source", "path": str(d), "schema": schema,
         "format": "json"},
        {"op": "chunk", "chunk_tokens": 16, "overlap": 4},
    ])
    got = sorted(map(tuple, S.run_to_memory(stream).collect()))
    batch = spark.read.schema(schema).json(str(d))
    want = sorted(
        map(tuple, chunk_documents(batch, chunk_tokens=16, overlap=4).collect())
    )
    assert got == want and len(got) > 6  # multi-chunk docs exist


def test_streaming_ann_index_intake_converges_to_full_build(spark, sf_dir, tmp_path):
    """Streaming ANN intake: head-build the LSH index, stream the tail in
    per-file micro-batches, and the grown index must be probe-identical
    to a full-corpus build. A replay from a FRESH checkpoint re-offers
    every batch and the same-id guard keeps the index unchanged."""
    from qcardia_data_spark.functions.similarity import (
        lsh_write_partitioned,
        pairwise_topk_join_pruned,
    )
    from qcardia_data_spark.streaming.events import streaming_ann_index_intake

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    head, tail = emb.filter("vec_id < 150"), emb.filter("vec_id >= 150")

    grown, full = str(tmp_path / "grown_idx"), str(tmp_path / "full_idx")
    lsh_write_partitioned(head, grown, n_planes=4, seed=3)
    lsh_write_partitioned(emb, full, n_planes=4, seed=3)

    incoming = str(tmp_path / "incoming")
    tail.repartition(3).write.parquet(incoming)  # 3 micro-batches
    schema = spark.read.parquet(incoming).schema

    def drain(checkpoint):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(incoming)
        )
        q = streaming_ann_index_intake(
            stream, grown, str(tmp_path / checkpoint)
        )
        q.awaitTermination(120)
        q.stop()

    drain("ckpt1")
    probe = emb.filter("vec_id < 30").withColumnRenamed("vec_id", "qid")
    key = lambda r: (r[0], r[1], round(r[2], 9))  # noqa: E731
    want = sorted(map(key, pairwise_topk_join_pruned(
        probe, full, k=3, id_left="qid").collect()))
    got = sorted(map(key, pairwise_topk_join_pruned(
        probe, grown, k=3, id_left="qid").collect()))
    assert got == want

    n_before = spark.read.parquet(grown).count()
    drain("ckpt2")  # fresh checkpoint: full replay, all guarded out
    assert spark.read.parquet(grown).count() == n_before
    got2 = sorted(map(key, pairwise_topk_join_pruned(
        probe, grown, k=3, id_left="qid").collect()))
    assert got2 == want


def test_streaming_retrieval_ingest_chunk_embed_append_probe(spark, tmp_path):
    """The retrieval-ingest capstone: streamed documents are chunked (spec
    op), encoded with the deterministic embed stand-in, and appended to
    the standing LSH index — then a probe finds the cross-document
    duplicate chunk at cosine 1.0. Every stage is map-only/stream-safe up
    to the foreachBatch append."""
    import json as _json

    from qcardia_data_spark.functions.similarity import (
        hashed_embedding,
        hashed_token_buckets,
        lsh_write_partitioned,
        pairwise_topk_join_pruned,
    )
    from qcardia_data_spark.functions.text import word_tokens
    from qcardia_data_spark.plans.spec import compile_stream_pipeline
    from qcardia_data_spark.streaming.events import streaming_ann_index_intake

    shared = " ".join(f"boiler{i}" for i in range(20))  # cross-doc dup chunk
    docs0 = [{"doc_id": 1, "text": shared + " " + " ".join(f"a{i}" for i in range(30))}]
    docs1 = [
        {"doc_id": 2, "text": " ".join(f"b{i}" for i in range(25))},
        {"doc_id": 3, "text": shared},  # the duplicate arrives by stream
    ]
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in docs0))

    def embed(df):
        with_toks = df.withColumn(
            "_bk",
            F.explode(
                F.array(hashed_token_buckets(word_tokens(F.col("chunk_text"))))
            ),
        )
        return with_toks.select(
            (F.col("doc_id") * 1000 + F.col("chunk_id")).alias("vec_id"),
            hashed_embedding(F.col("_bk")).alias("embedding"),
        )

    schema = "doc_id BIGINT, text STRING"
    # seed index from the first file, BATCH form of the same chain
    batch0 = spark.read.schema(schema).json(str(d / "b0.jsonl"))
    from qcardia_data_spark.functions.text import chunk_documents

    idx = str(tmp_path / "retrieval_idx")
    lsh_write_partitioned(
        embed(chunk_documents(batch0, chunk_tokens=20, overlap=0)),
        idx, n_planes=4, seed=7,
    )

    # stream the second file through the SAME declarative chunk op
    (d / "b1.jsonl").write_text("\n".join(_json.dumps(r) for r in docs1))
    chunks = compile_stream_pipeline(spark, [
        {"op": "stream_source", "path": str(d), "schema": schema,
         "format": "json", "max_files_per_trigger": 1},
        {"op": "chunk", "chunk_tokens": 20, "overlap": 0},
    ])
    q = streaming_ann_index_intake(
        embed(chunks), idx, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    q.stop()

    # doc 3 == the shared chunk; its nearest indexed neighbor must be
    # doc 1's first chunk (identical text -> identical stub embedding)
    probe = embed(chunk_documents(
        spark.createDataFrame([(3, shared)], ["doc_id", "text"]),
        chunk_tokens=20, overlap=0,
    )).withColumnRenamed("vec_id", "qid")
    top = pairwise_topk_join_pruned(probe, idx, k=2, id_left="qid").collect()
    best = max(top, key=lambda r: r["score"])
    assert best["vec_id"] == 1000 and round(best["score"], 6) == 1.0


def test_streaming_trend_stats_exact_match_with_origin_shift(spark, tmp_path):
    """The integer sufficient-statistics state must reproduce the batch
    trend EXACTLY (int-for-int) even when files arrive in REVERSE
    chronological order — the origin-shift merge path."""
    import glob
    import shutil

    from qcardia_data_spark.operators.timeseries import trend_stats
    from qcardia_data_spark.streaming.stateful import streaming_trend_stats

    ev = _batch_events(spark, "/root/testdata/sf0.001").select(
        "event_id", "ts", "user_id", "value"
    )
    med = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    src = tmp_path / "stream"
    src.mkdir()
    # file 0 = LATER half, file 1 = EARLIER half (event_id ~ time order)
    for i, pred in enumerate([F.col("event_id") >= med, F.col("event_id") < med]):
        ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "tmp" / str(i))
        )
        part = glob.glob(str(tmp_path / "tmp" / str(i) / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{i}.parquet"))

    stream = S.stream_from_dir(spark, str(src) + "/*.parquet", ev.schema)
    out = S.run_to_memory(
        streaming_trend_stats(stream, watermark="100 days"), "update"
    )
    # last update per user = the fit over everything seen
    final = (
        out.withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("n_events"))
            ),
        )
        .filter("_rn = 1")
        .drop("_rn")
    )
    batch = trend_stats(
        ev.withColumn("s", F.unix_timestamp("ts")), "user_id", "s", "value"
    )
    got = sorted(tuple(r) for r in final.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(want) > 0


def _chronological_files(spark, ev, tmp_path, n_files=4):
    import glob
    import shutil

    src = tmp_path / "stream"
    src.mkdir()
    qs = ev.approxQuantile(
        "event_id", [i / n_files for i in range(1, n_files)], 0.0
    )
    bounds = [float("-inf")] + qs + [float("inf")]
    for i in range(n_files):
        part_df = ev.filter(
            (F.col("event_id") >= bounds[i]) & (F.col("event_id") < bounds[i + 1])
        )
        part_df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "tmp" / str(i))
        )
        part = glob.glob(str(tmp_path / "tmp" / str(i) / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{i}.parquet"))
    return str(src) + "/*.parquet"


def test_streaming_gapfill_locf_hand_timeline(spark, tmp_path):
    """Controlled watermark walk: buckets emit exactly when finalized
    (close < watermark), gap buckets carry the LOCF value, unfinalized
    buckets stay unemitted."""
    import datetime as dt
    import glob
    import shutil

    from qcardia_data_spark.streaming.stateful import streaming_gapfill_locf

    src = tmp_path / "stream"
    src.mkdir()
    rows = [
        [(0, dt.datetime(2024, 6, 1, 10, 30), 1, 1.0)],
        [(1, dt.datetime(2024, 6, 1, 14, 5), 1, 2.0)],
        [(2, dt.datetime(2024, 6, 1, 18, 20), 1, 3.0)],
    ]
    for i, rs in enumerate(rows):
        df = spark.createDataFrame(rs, ["event_id", "ts", "user_id", "value"])
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp" / str(i)))
        part = glob.glob(str(tmp_path / "tmp" / str(i) / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{i}.parquet"))
    schema = spark.createDataFrame(rows[0], ["event_id", "ts", "user_id", "value"]).schema
    stream = S.stream_from_dir(spark, str(src) + "/*.parquet", schema)
    out = S.run_to_memory(streaming_gapfill_locf(stream, "1 hour"), "append")
    h10 = int(dt.datetime(2024, 6, 1, 10, 0, tzinfo=dt.timezone.utc).timestamp()) // 3600
    got = {(r["user_id"], r["bucket_hour"], r["value"]) for r in out.collect()}
    # the last DATA batch sees wm = 14:05 - 1h = 13:05 -> H10..H12; the
    # armed event-time timeout then fires as wm reaches 18:20 - 1h =
    # 17:20 and flushes H13..H16 WITHOUT new input (r11: quiet-key
    # finalization). H13 closes before 14:05 so it still carries 1.0;
    # H17 closes 17:59:59 > wm and stays unemitted.
    assert got == {
        (1, h10, 1.0), (1, h10 + 1, 1.0), (1, h10 + 2, 1.0),
        (1, h10 + 3, 1.0), (1, h10 + 4, 2.0), (1, h10 + 5, 2.0),
        (1, h10 + 6, 2.0),
    }


def test_streaming_gapfill_locf_prefix_matches_batch_query(spark, tmp_path):
    """Over real data in chronological files: every emitted row must equal
    the graded batch query's row exactly, and each user's emitted buckets
    must be a contiguous prefix of the batch row set starting at h0."""
    from qcardia_data_spark.queries import QUERIES
    from qcardia_data_spark.streaming.stateful import streaming_gapfill_locf

    ev = _batch_events(spark, "/root/testdata/sf0.001").select(
        "event_id", "ts", "user_id", "value"
    )
    path = _chronological_files(spark, ev, tmp_path)
    stream = S.stream_from_dir(spark, path, ev.schema)
    out = S.run_to_memory(streaming_gapfill_locf(stream, "2 hours"), "append")
    got = {(r["user_id"], r["bucket_hour"]): r["value"] for r in out.collect()}
    assert len(got) > 0
    batch = QUERIES["ev_gapfill_locf"][0](spark, "/root/testdata/sf0.001")
    want = {(r["user_id"], r["bucket_hour"]): r["value"] for r in batch.collect()}
    # exact-subset: every emitted value identical to the batch twin's
    for k, v in got.items():
        assert k in want and v == want[k], k
    # contiguous prefix per user from the user's first batch bucket
    import collections

    by_user = collections.defaultdict(list)
    for (u, b) in got:
        by_user[u].append(b)
    want_h0 = collections.defaultdict(lambda: 1 << 62)
    for (u, b) in want:
        want_h0[u] = min(want_h0[u], b)
    for u, bs in by_user.items():
        bs.sort()
        assert bs[0] == want_h0[u]
        assert bs == list(range(bs[0], bs[-1] + 1))


def test_streaming_hll_intake_converges_and_replays(spark, sf_dir, tmp_path):
    """Streaming HLL intake: per-file micro-batches max-merge into the
    store, which must equal the one-pass sketch over the whole table; a
    full replay from a fresh checkpoint leaves it unchanged (max is
    idempotent); param drift is refused by _hll_meta."""
    import pytest as _pytest

    from qcardia_data_spark.functions.sketches import (
        hll_registers,
        hll_store_merge,
        hll_store_read,
    )
    from qcardia_data_spark.streaming.events import streaming_hll_intake

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    incoming = str(tmp_path / "incoming")
    ev.repartition(3).write.parquet(incoming)
    schema = spark.read.parquet(incoming).schema
    store = str(tmp_path / "hll_store")

    def drain(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(incoming)
        )
        q = streaming_hll_intake(
            stream, store, str(tmp_path / ckpt),
            keys=["event_type"], value_col="user_id", p=4,
        )
        q.awaitTermination(120)
        q.stop()

    drain("ck1")
    want = sorted(
        map(tuple, hll_registers(ev, ["event_type"], "user_id", p=4)
            .select("event_type", "register", "max_rho").collect())
    )
    got = sorted(
        map(tuple, hll_store_read(spark, store)
            .select("event_type", "register", "max_rho").collect())
    )
    assert got == want

    drain("ck2")  # fresh checkpoint: full replay must converge unchanged
    got2 = sorted(
        map(tuple, hll_store_read(spark, store)
            .select("event_type", "register", "max_rho").collect())
    )
    assert got2 == want

    with _pytest.raises(ValueError, match="do not merge"):
        hll_store_merge(
            spark, store,
            hll_registers(ev, ["event_type"], "user_id", p=8), p=8,
        )


def test_streaming_cms_intake_converges_and_replays(spark, sf_dir, tmp_path):
    """Streaming CMS intake: per-file micro-batches land their sketches
    as _batch partitions; the sum-merged read equals the one-pass sketch;
    a full replay from a fresh checkpoint overwrites each batch's own
    partition (exactly-once), leaving the read unchanged; geometry drift
    refuses."""
    import pytest as _pytest

    from qcardia_data_spark.functions.sketches import (
        cms_store_append_batch,
        cms_store_read,
        cms_table,
    )
    from qcardia_data_spark.streaming.events import streaming_cms_intake

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    incoming = str(tmp_path / "incoming")
    ev.repartition(3).write.parquet(incoming)
    schema = spark.read.parquet(incoming).schema
    store = str(tmp_path / "cms_store")

    def drain(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(incoming)
        )
        q = streaming_cms_intake(
            stream, store, str(tmp_path / ckpt),
            keys=["event_type"], value_col="user_id", depth=3, width=64,
        )
        q.awaitTermination(120)
        q.stop()

    drain("ck1")
    want = sorted(map(tuple, cms_table(
        ev, ["event_type"], "user_id", depth=3, width=64,
    ).select("event_type", "row", "bucket", "n").collect()))
    got = sorted(map(tuple, cms_store_read(spark, store)
                     .select("event_type", "row", "bucket", "n").collect()))
    assert got == want

    drain("ck2")  # fresh checkpoint: same epoch ids replace themselves
    got2 = sorted(map(tuple, cms_store_read(spark, store)
                      .select("event_type", "row", "bucket", "n").collect()))
    assert got2 == want

    with _pytest.raises(ValueError, match="do not merge"):
        cms_store_append_batch(
            ev, store, ["event_type"], "user_id",
            batch_id=99, depth=4, width=64,
        )

    # store-resolved probe (ADVICE r8): width/keys come from _cms_meta,
    # so the estimate equals a cms_lookup with the BUILD geometry even
    # though the caller never states it — and a non-store path refuses
    from qcardia_data_spark.functions.sketches import (
        cms_lookup,
        cms_store_lookup,
    )

    probes = ev.select("event_type", "user_id").distinct().limit(8)
    want_est = sorted(map(tuple, cms_lookup(
        cms_store_read(spark, store), probes,
        ["event_type"], "user_id", width=64,
    ).collect()))
    got_est = sorted(map(tuple, cms_store_lookup(
        spark, store, probes, "user_id",
    ).collect()))
    assert got_est == want_est
    with _pytest.raises(ValueError, match="no _cms_meta"):
        cms_store_lookup(spark, str(tmp_path / "nope"), probes, "user_id")


def test_streaming_hll_intake_time_bucketed_keys(spark, sf_dir, tmp_path):
    """Distinct users per (event_type, hour) continuously: the intake's
    keys are just columns, so a time bucket computed upstream in the
    stream makes the store a windowed-distinct table with no extra
    machinery."""
    from pyspark.sql import functions as F

    from qcardia_data_spark.functions.sketches import (
        hll_registers,
        hll_store_read,
    )
    from qcardia_data_spark.streaming.events import streaming_hll_intake

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    incoming = str(tmp_path / "incoming")
    ev.repartition(2).write.parquet(incoming)
    schema = spark.read.parquet(incoming).schema
    store = str(tmp_path / "hll_hourly")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(incoming)
        .withColumn("hour", F.date_trunc("hour", F.col("ts")))
    )
    q = streaming_hll_intake(
        stream, store, str(tmp_path / "ck"),
        keys=["event_type", "hour"], value_col="user_id", p=4,
    )
    q.awaitTermination(120)
    q.stop()

    want = sorted(map(tuple, hll_registers(
        ev.withColumn("hour", F.date_trunc("hour", F.col("ts"))),
        ["event_type", "hour"], "user_id", p=4,
    ).collect()))
    got = sorted(map(tuple, hll_store_read(spark, store)
                     .select("event_type", "hour", "register", "max_rho")
                     .collect()))
    assert got == want


def test_stateful_ops_require_utc_session_tz(spark, sf_dir):
    """r10 streaming review: the stateful ops mix pandas-naive event
    epochs with true-epoch watermark APIs — coherent only under UTC, so
    a non-UTC (even fixed-offset) session tz must refuse at build time."""
    import pytest as _pytest

    from qcardia_data_spark.catalog import load_table
    from qcardia_data_spark.streaming.stateful import (
        running_user_totals,
        streaming_gapfill_locf,
    )

    ev = load_table(spark, sf_dir, "events")
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Etc/GMT+8")  # fixed offset, non-UTC
    try:
        with _pytest.raises(ValueError, match="not UTC"):
            running_user_totals(ev)
        with _pytest.raises(ValueError, match="not UTC"):
            streaming_gapfill_locf(ev)
        # evict=False has no timeout arithmetic -> allowed
        running_user_totals(ev, evict=False)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_attribution_join_rejects_unparseable_within(spark, sf_dir):
    from qcardia_data_spark.catalog import load_table
    from qcardia_data_spark.streaming.events import attribution_join

    ev = load_table(spark, sf_dir, "events")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="within"):
        attribution_join(ev, within="1 day")


def test_run_to_memory_releases_temp_view(spark, sf_dir):
    """r10 streaming review: the memory sink pinned every result table in
    driver memory for the session; run_to_memory now materializes and
    drops the temp view."""
    from qcardia_data_spark.streaming.events import (
        events_stream,
        run_to_memory,
        tumbling_counts,
    )

    before = {t.name for t in spark.catalog.listTables()}
    stream = tumbling_counts(events_stream(spark, sf_dir))
    out = run_to_memory(stream, output_mode="complete")
    assert out.count() > 0
    after = {t.name for t in spark.catalog.listTables()}
    assert not {n for n in after - before if n.startswith("qds_mem_")}


def test_streaming_gapfill_locf_quiet_key_flushes_on_watermark(spark, tmp_path):
    """r11 regression: a user who goes QUIET must still have their
    finalized buckets emitted as OTHER users' events advance the
    watermark (the EventTimeTimeout flush; under NoTimeout these rows
    were withheld until the quiet user's next event — possibly forever)."""
    import datetime as dt
    import glob
    import shutil

    from qcardia_data_spark.streaming.stateful import streaming_gapfill_locf

    src = tmp_path / "stream_q"
    src.mkdir()
    rows = [
        # user 1: two events spanning H10..H12, then silence
        [(0, dt.datetime(2024, 6, 1, 10, 30), 1, 1.0),
         (1, dt.datetime(2024, 6, 1, 12, 40), 1, 5.0)],
        # user 2 only: advances the watermark past user 1's whole span
        [(2, dt.datetime(2024, 6, 1, 16, 10), 2, 9.0)],
        [(3, dt.datetime(2024, 6, 1, 20, 30), 2, 9.5)],
    ]
    for i, rs in enumerate(rows):
        df = spark.createDataFrame(rs, ["event_id", "ts", "user_id", "value"])
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "tmp_q" / str(i))
        )
        part = glob.glob(str(tmp_path / "tmp_q" / str(i) / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{i}.parquet"))
    schema = spark.createDataFrame(
        rows[0], ["event_id", "ts", "user_id", "value"]
    ).schema
    stream = S.stream_from_dir(spark, str(src) + "/*.parquet", schema)
    out = S.run_to_memory(streaming_gapfill_locf(stream, "1 hour"), "append")
    h10 = int(
        dt.datetime(2024, 6, 1, 10, 0, tzinfo=dt.timezone.utc).timestamp()
    ) // 3600
    got1 = {
        (r["bucket_hour"], r["value"])
        for r in out.collect() if r["user_id"] == 1
    }
    # user 1's span is H10..H12 (max_s bound); the final watermark
    # (20:30 - 1h = 19:30) finalizes all three via the timeout even
    # though user 1 received no rows after the first batch
    assert got1 == {(h10, 1.0), (h10 + 1, 1.0), (h10 + 2, 5.0)}


def test_streaming_gapfill_locf_randomized_multikey_soak(spark, tmp_path):
    """VERDICT r11 #6 soak: random event gaps and quiet periods over many
    keys — every emitted (user, bucket) appears EXACTLY ONCE, equals the
    batch twin's row, and forms a contiguous prefix of the batch row set
    from the user's first bucket. Exercises the EventTimeTimeout flush
    under arbitrary interleavings (some users go quiet mid-stream and
    only other users' events advance the watermark past their span)."""
    import datetime as dt
    import glob
    import random
    import shutil

    from qcardia_data_spark.queries import QUERIES
    from qcardia_data_spark.streaming.stateful import streaming_gapfill_locf

    rng = random.Random(0xC0FFEE)
    t0 = int(dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc).timestamp())
    rows = []
    eid = 0
    for user in range(1, 7):
        # each user: 2-4 activity clusters separated by multi-hour quiet
        # gaps; users START at different times and STOP at different
        # times, so late users' events finalize early users' tails
        t = t0 + rng.randrange(0, 48) * 3600
        for _ in range(rng.randrange(2, 5)):
            for _ in range(rng.randrange(1, 6)):
                rows.append((eid, dt.datetime.fromtimestamp(
                    t, dt.timezone.utc).replace(tzinfo=None),
                    user, round(rng.uniform(-50, 50), 2)))
                eid += 1
                t += rng.randrange(60, 7200)
            t += rng.randrange(2, 30) * 3600  # quiet gap
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])

    # batch twin over the same rows, via the graded query on a tmp sf_dir
    sf = tmp_path / "sf"
    sf.mkdir()
    ev.write.parquet(str(sf / "events.parquet"))
    batch = QUERIES["ev_gapfill_locf"][0](spark, str(sf))
    want = {(r["user_id"], r["bucket_hour"]): r["value"] for r in batch.collect()}

    # stream the same rows in chronological files (event time order)
    src = tmp_path / "stream_soak"
    src.mkdir()
    ordered = sorted(rows, key=lambda r: r[1])
    n_files = 7
    per = (len(ordered) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = ordered[i * per:(i + 1) * per]
        if not chunk:
            continue
        df = spark.createDataFrame(chunk, ["event_id", "ts", "user_id", "value"])
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "tmp_soak" / str(i))
        )
        part = glob.glob(str(tmp_path / "tmp_soak" / str(i) / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{i:02}.parquet"))
    stream = S.stream_from_dir(spark, str(src) + "/*.parquet", ev.schema)
    out = S.run_to_memory(streaming_gapfill_locf(stream, "1 hour"), "append")
    emitted = [(r["user_id"], r["bucket_hour"], r["value"]) for r in out.collect()]
    assert emitted

    # exactly once: no (user, bucket) appears twice
    keys = [(u, b) for (u, b, _) in emitted]
    assert len(keys) == len(set(keys)), "duplicate bucket emission"
    # every emitted row equals the batch twin's row
    for (u, b, v) in emitted:
        assert (u, b) in want and v == want[(u, b)], (u, b, v)
    # contiguous prefix per user from the user's first batch bucket
    import collections

    by_user = collections.defaultdict(list)
    for (u, b) in keys:
        by_user[u].append(b)
    want_h0 = collections.defaultdict(lambda: 1 << 62)
    for (u, b) in want:
        want_h0[u] = min(want_h0[u], b)
    for u, bs in by_user.items():
        bs.sort()
        assert bs[0] == want_h0[u], f"user {u} prefix starts late"
        assert bs == list(range(bs[0], bs[0] + len(bs))), f"user {u} gap"
    # the quiet-key flush must have finalized EVERY user's span up to the
    # final watermark (max event time - 1h), not just users with late rows
    final_wm_s = int(max(r[1] for r in rows).replace(
        tzinfo=dt.timezone.utc).timestamp()) - 3600
    for u in by_user:
        span_hi = max(b for (uu, b) in want if uu == u)
        expect_hi = min((final_wm_s - 3600) // 3600, span_hi)
        assert max(by_user[u]) >= expect_hi, f"user {u} tail withheld"


def test_streaming_trend_stats_large_magnitude_soak(spark, tmp_path):
    """VERDICT r11 #6 soak: random large-magnitude values with sufficient
    statistics NEAR the int64 boundary (sy2 within ~25% of 2^63), random
    multi-file arrival exercising the origin-shift merge — the final
    streamed fit must equal the batch trend_stats int-for-int."""
    import datetime as dt
    import glob
    import random
    import shutil

    from qcardia_data_spark.operators.timeseries import trend_stats
    from qcardia_data_spark.streaming.stateful import streaming_trend_stats

    rng = random.Random(0xBEEF)
    t0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    span = 2 * 365 * 24 * 3600  # x up to ~6.3e7: x^2 ~ 4e15 per row
    rows = []
    eid = 0
    for user in range(1, 5):
        # 300 rows x (1.5e8 cents)^2 = 6.75e18 ~ 73% of 2^63: the sums
        # stay representable, but any silent wrap would corrupt them
        for _ in range(300):
            s = t0 + rng.randrange(0, span)
            v = rng.uniform(-1.5e6, 1.5e6)
            rows.append((eid, dt.datetime.fromtimestamp(
                s, dt.timezone.utc).replace(tzinfo=None), user, v))
            eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])

    src = tmp_path / "stream_mag"
    src.mkdir()
    shuffled = rows[:]
    rng.shuffle(shuffled)  # non-chronological files: origin shifts fire
    n_files = 5
    per = (len(shuffled) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = shuffled[i * per:(i + 1) * per]
        df = spark.createDataFrame(chunk, ["event_id", "ts", "user_id", "value"])
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "tmp_mag" / str(i))
        )
        part = glob.glob(str(tmp_path / "tmp_mag" / str(i) / "part-*.parquet"))[0]
        shutil.move(part, str(src / f"{i}.parquet"))
    stream = S.stream_from_dir(spark, str(src) + "/*.parquet", ev.schema)
    out = S.run_to_memory(
        streaming_trend_stats(stream, watermark="10000 days"), "update"
    )
    final = (
        out.withColumn(
            "_rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("n_events"))
            ),
        )
        .filter("_rn = 1")
        .drop("_rn")
    )
    batch = trend_stats(
        ev.withColumn("s", F.unix_timestamp("ts")), "user_id", "s", "value"
    )
    got = sorted(tuple(r) for r in final.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(want) == 4
