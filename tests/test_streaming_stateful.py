"""Stateful streaming operators: keyed-state doc assembly
(applyInPandasWithState) and watermarked windowed aggregation."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from onnxtr_spark.streaming.stateful import (
    SPAN_INPUT_DDL,
    assemble_docs_stream,
    windowed_event_counts,
)


def _write_batch(spark, path, rows, schema, name_prefix):
    import glob
    import os
    import time

    df = spark.createDataFrame(pd.DataFrame(rows))
    for c, t in [(f.split(" ")[0], " ".join(f.split(" ")[1:])) for f in schema.split(", ")]:
        df = df.withColumn(c, F.col(c).cast(t))
    df.coalesce(1).write.mode("append").parquet(path)
    # the file source orders batches by modification time: make each
    # write strictly newer so maxFilesPerTrigger=1 replays them in order
    # (touch ONLY files this call created — re-touching earlier ones
    # would recreate the tie)
    now = time.time()
    _write_batch.seq = getattr(_write_batch, "seq", 0) + 1
    seen = getattr(_write_batch, "seen", set())
    for f in glob.glob(f"{path}/*.parquet"):
        if f not in seen:
            os.utime(f, (now + _write_batch.seq * 10, now + _write_batch.seq * 10))
            seen.add(f)
    _write_batch.seen = seen


def test_assemble_docs_across_microbatches(spark, tmp_path):
    """Doc A's spans split across two micro-batches: nothing emits after
    batch 1; the full ordered doc emits in batch 2. Doc B completes in
    batch 1. Doc C never completes -> never emitted (held in state)."""
    src = str(tmp_path / "spans_src")
    out_table = "assembled_docs"

    def span(doc, off, text, n_total, media=""):
        return {"doc_id": doc, "offset": off, "kind": "text", "text": text,
                "media_ref": media, "n_total": n_total}

    # file 1: half of A, all of B, part of C
    _write_batch(spark, src, [
        span("A", 1, "a-mid", 3), span("A", 0, "a-head", 3),
        span("B", 0, "b-only", 1),
        span("C", 0, "c-head", 2),
    ], SPAN_INPUT_DDL, "b1")
    # file 2: the rest of A
    _write_batch(spark, src, [span("A", 2, "a-tail", 3)], SPAN_INPUT_DDL, "b2")

    stream = (
        spark.readStream.schema(SPAN_INPUT_DDL).format("parquet")
        .option("path", src).option("maxFilesPerTrigger", "1").load()
    )
    q = (
        assemble_docs_stream(stream)
        .writeStream.format("memory").queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"SELECT * FROM {out_table}").toPandas()
    a = got[got.doc_id == "A"].sort_values("offset")
    assert list(a.text) == ["a-head", "a-mid", "a-tail"]
    assert list(got[got.doc_id == "B"].text) == ["b-only"]
    assert (got.doc_id != "C").all()  # incomplete doc held in state


def test_windowed_counts_drop_late_events(spark, tmp_path):
    src = str(tmp_path / "events_src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(minute, etype, value=1.0):
        return {"ts": t0 + dt.timedelta(minutes=minute), "event_type": etype, "value": value}

    schema = "ts timestamp, event_type string, value double"
    # batch 1: window [0,10) gets 2 clicks; max ts 31 -> watermark 26
    _write_batch(spark, src, [ev(1, "click"), ev(2, "click"), ev(31, "view")], schema, "b1")
    # batch 2: clock only — at its end the watermark (26) has passed
    # [0,10): that window finalizes (emits n=2) and its state is evicted
    _write_batch(spark, src, [ev(50, "view")], schema, "b2")
    # batch 3: a TOO-LATE click at minute 3. Spark enforces the drop via
    # state eviction (pre-aggregation filtering is best-effort): the
    # window is gone, so the row must NOT resurrect it
    _write_batch(spark, src, [ev(3, "click"), ev(65, "view")], schema, "b3")
    # batch 4: flush remaining windows
    _write_batch(spark, src, [ev(90, "view")], schema, "b4")

    stream = spark.readStream.schema(schema).format("parquet").option("path", src).option(
        "maxFilesPerTrigger", "1"
    ).load()
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory").queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM win_counts").toPandas()
    clicks = got[got.event_type == "click"]
    # exactly one finalized click window, count 2 — the too-late click
    # neither joined it nor resurrected it
    assert len(clicks) == 1
    assert clicks.window_start.iloc[0] == t0 and int(clicks.n.iloc[0]) == 2
    w30 = got[got.window_start == t0 + dt.timedelta(minutes=30)]
    assert len(w30) == 1 and w30.event_type.iloc[0] == "view"


def test_dedup_stream_suppresses_cross_batch_duplicates(spark, tmp_path):
    """Streaming exact dedup: the first document per content
    fingerprint is emitted once; duplicates arriving in the SAME or in
    LATER micro-batches are suppressed (per-fp keyed state)."""
    from onnxtr_spark.streaming.stateful import DEDUP_INPUT_DDL, dedup_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    # batch 1: two uniques + an intra-batch duplicate of doc 1
    _write_batch(spark, src, [
        {"doc_id": "1", "text": "alpha  beta"},
        {"doc_id": "2", "text": "gamma delta"},
        {"doc_id": "9", "text": "alpha beta"},  # same normalized content as 1
    ], DEDUP_INPUT_DDL, "b1")
    # batch 2: duplicate of doc 2 + one new unique
    _write_batch(spark, src, [
        {"doc_id": "3", "text": " gamma   delta "},
        {"doc_id": "4", "text": "epsilon"},
    ], DEDUP_INPUT_DDL, "b2")
    # batch 3: duplicates of everything
    _write_batch(spark, src, [
        {"doc_id": "5", "text": "alpha beta"},
        {"doc_id": "6", "text": "epsilon"},
    ], DEDUP_INPUT_DDL, "b3")

    stream = spark.readStream.schema(DEDUP_INPUT_DDL).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {"1", "2", "4"}
    # one row per distinct fingerprint, exactly once
    assert spark.read.parquet(out).count() == 3


def test_funnel_stream_across_microbatches(spark, tmp_path):
    """Per-user funnel state machine: user 1 completes across THREE
    micro-batches (state carries stage+timestamps); user 2's purchase
    arrives before any view and must not count; user 3 completes twice
    but emits once (stage pins at 3); out-of-order rows inside one
    batch are replayed in event time."""
    from onnxtr_spark.streaming.stateful import FUNNEL_INPUT_DDL, funnel_stream

    src = str(tmp_path / "funnel_src")
    t0 = dt.datetime(2024, 1, 1)

    def ev(user, minute, etype):
        return {"user_id": user, "event_type": etype, "ts": t0 + dt.timedelta(minutes=minute)}

    # batch 1: u1 views; u2 purchases (no view yet: ignored); u3's
    # click+view arrive OUT OF ORDER in one batch (view first in time)
    _write_batch(spark, src, [
        ev(1, 0, "view"), ev(2, 1, "purchase"),
        ev(3, 2, "click"), ev(3, 1, "view"),
    ], FUNNEL_INPUT_DDL, "b1")
    # batch 2: u1 clicks; u3 purchases (completes)
    _write_batch(spark, src, [ev(1, 5, "click"), ev(3, 6, "purchase")], FUNNEL_INPUT_DDL, "b2")
    # batch 3: u1 purchases (completes); u3 runs the whole funnel again
    # -> must NOT re-emit; u2 views (stage 1 only)
    _write_batch(spark, src, [
        ev(1, 9, "purchase"), ev(2, 10, "view"),
        ev(3, 11, "view"), ev(3, 12, "click"), ev(3, 13, "purchase"),
    ], FUNNEL_INPUT_DDL, "b3")

    stream = (
        spark.readStream.schema(FUNNEL_INPUT_DDL).format("parquet")
        .option("path", src).option("maxFilesPerTrigger", "1").load()
    )
    q = (
        funnel_stream(stream)
        .writeStream.format("memory").queryName("funnel_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM funnel_out").toPandas().sort_values("user_id")
    assert list(got.user_id) == [1, 3]
    u1 = got[got.user_id == 1].iloc[0]
    us = lambda minute: int((t0 + dt.timedelta(minutes=minute)).timestamp() * 1_000_000)
    assert (u1.t_view, u1.t_click, u1.t_purchase) == (us(0), us(5), us(9))
    u3 = got[got.user_id == 3].iloc[0]
    assert (u3.t_view, u3.t_click, u3.t_purchase) == (us(1), us(2), us(6))


def test_neardup_stream_flags_cross_batch_near_duplicates(spark, tmp_path):
    """Streaming MinHash-LSH near-dup: a doc whose band signature
    collides with an earlier doc's — in the same OR a later micro-batch
    — is flagged against that bucket's first document; unrelated docs
    emit nothing. Identical normalized text shares all bands; the
    emitted (doc_id, dup_of) pairs deduplicate across bands like the
    batch operator's candidate distinct."""
    from onnxtr_spark.streaming.stateful import NEARDUP_INPUT_DDL, neardup_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    other = "completely different words about spark catalyst tungsten execution engines"
    _write_batch(spark, src, [
        {"doc_id": "1", "text": base},
        {"doc_id": "7", "text": base + "  "},  # same normalized shingles, same batch
        {"doc_id": "2", "text": other},
    ], NEARDUP_INPUT_DDL, "b1")
    _write_batch(spark, src, [
        {"doc_id": "3", "text": "  " + base},  # near-dup arriving a batch later
        {"doc_id": "4", "text": "fully unrelated tokens epsilon zeta eta theta iota kappa lambda"},
    ], NEARDUP_INPUT_DDL, "b2")

    stream = spark.readStream.schema(NEARDUP_INPUT_DDL).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        neardup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    pairs = {(r.doc_id, r.dup_of) for r in rows}
    assert pairs == {("7", "1"), ("3", "1")}
    flagged = {r.doc_id for r in rows}
    assert "2" not in flagged and "4" not in flagged
    # doc 3 collides in every band (identical signature) but the
    # distinct pair set above is what downstream consumes
    assert sum(1 for r in rows if r.doc_id == "3") >= 1


def test_session_stream_gap_and_timeout_closure(spark, tmp_path):
    """Both closure paths: u1's first session closes when a later event
    opens the next one (cross-batch state), and the still-open second
    session drains via EventTimeTimeout once other users' events push
    the watermark past its gap."""
    from onnxtr_spark.streaming.stateful import SESSION_INPUT_DDL, session_stream

    src = str(tmp_path / "sess_src")
    t0 = dt.datetime(2024, 1, 1)

    def ev(user, minute):
        return {"user_id": user, "ts": t0 + dt.timedelta(minutes=minute)}

    us = lambda minute: int((t0 + dt.timedelta(minutes=minute)).timestamp() * 1_000_000)

    # b1: u1 two events 5 min apart -> one building session
    _write_batch(spark, src, [ev(1, 0), ev(1, 5)], SESSION_INPUT_DDL, "b1")
    # b2: u1 returns after 95 min -> closes session 1, opens session 2
    _write_batch(spark, src, [ev(1, 100)], SESSION_INPUT_DDL, "b2")
    # b3+b4: u2 far in the future pushes the watermark past u1's
    # session-2 gap; the next micro-batch fires the timeout
    _write_batch(spark, src, [ev(2, 300)], SESSION_INPUT_DDL, "b3")
    _write_batch(spark, src, [ev(2, 310)], SESSION_INPUT_DDL, "b4")

    stream = (
        spark.readStream.schema(SESSION_INPUT_DDL).format("parquet")
        .option("path", src).option("maxFilesPerTrigger", "1").load()
    )
    q = (
        session_stream(stream)
        .writeStream.format("memory").queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_out").toPandas().sort_values(["user_id", "start_us"])
    u1 = got[got.user_id == 1]
    assert len(u1) == 2
    assert list(u1.iloc[0][["start_us", "end_us", "n_events"]]) == [us(0), us(5), 2]
    assert list(u1.iloc[1][["start_us", "end_us", "n_events"]]) == [us(100), us(100), 1]


def test_interval_join_stream_pairs_and_window_bounds(spark, tmp_path):
    """Stream-stream interval join: purchases pair with same-user
    clicks in the preceding hour, across microbatches; clicks outside
    the window, clicks after the purchase, and other users' clicks
    never pair."""
    from onnxtr_spark.streaming.stateful import (
        ATTR_JOIN_INPUT_DDL,
        attributed_purchases_stream,
    )

    src = str(tmp_path / "ev_src")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, minute, uid, etype):
        return {
            "event_id": eid,
            "ts": t0 + dt.timedelta(minutes=minute),
            "user_id": uid,
            "event_type": etype,
        }

    # b1: u1 click @12:10; u2 click @10:00 (will be out of window);
    #     u3 purchase @11:50 (precedes u3's click -> never pairs)
    _write_batch(
        spark,
        src,
        [ev(1, 10, 1, "click"), ev(2, -120, 2, "click"), ev(3, -10, 3, "purchase")],
        ATTR_JOIN_INPUT_DDL,
        "b1",
    )
    # b2: u1 purchase @12:30 (pairs with the b1 click cross-batch);
    #     u2 purchase @11:30 (click was 90 min earlier: no pair);
    #     u3 click @12:00 (after u3's purchase: no pair)
    _write_batch(
        spark,
        src,
        [ev(4, 30, 1, "purchase"), ev(5, -30, 2, "purchase"), ev(6, 0, 3, "click")],
        ATTR_JOIN_INPUT_DDL,
        "b2",
    )
    # b3: u1 purchase @13:05 — 55 min after the click, still in window;
    #     plus a second u1 click @13:00 so this purchase pairs TWICE
    _write_batch(
        spark,
        src,
        [ev(7, 60, 1, "click"), ev(8, 65, 1, "purchase")],
        ATTR_JOIN_INPUT_DDL,
        "b3",
    )
    stream = (
        spark.readStream.schema(ATTR_JOIN_INPUT_DDL)
        .format("parquet")
        .option("path", src)
        .option("maxFilesPerTrigger", "1")
        .load()
    )
    q = (
        attributed_purchases_stream(stream)
        .writeStream.format("memory")
        .queryName("attr_pairs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the declared output contract must match the join's actual schema
    from pyspark.sql.types import StructType

    from onnxtr_spark.streaming.stateful import ATTR_JOIN_OUTPUT_DDL

    # names + types must match the declared contract (the memory sink
    # tightens nullability, so compare the type signature, not equality)
    assert (
        spark.table("attr_pairs").schema.simpleString()
        == StructType.fromDDL(ATTR_JOIN_OUTPUT_DDL).simpleString()
    )
    got = spark.sql("SELECT event_id, click_ts FROM attr_pairs").toPandas()
    pairs = sorted(
        (int(r.event_id), (r.click_ts - t0).total_seconds() / 60) for r in got.itertuples()
    )
    # purchase 4 <- click @12:10; purchase 8 <- clicks @12:10 and @13:00
    assert pairs == [(4, 10.0), (8, 10.0), (8, 60.0)]


def test_frontier_dedup_stream_collapses_spellings_across_batches(spark, tmp_path):
    """Streaming URL-frontier dedup: alternate spellings of one
    resource arriving in LATER micro-batches are suppressed; the
    canonical form is emitted exactly once with its first url_id."""
    from onnxtr_spark.streaming.stateful import FRONTIER_INPUT_DDL, frontier_dedup_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    _write_batch(spark, src, [
        {"url_id": 1, "raw_url": "https://a.example/doc/7"},
        {"url_id": 2, "raw_url": "https://b.example/page?z=2&a=1"},
    ], FRONTIER_INPUT_DDL, "b1")
    _write_batch(spark, src, [
        # same resources, different spellings
        {"url_id": 3, "raw_url": "HTTPS://A.EXAMPLE:443/doc/7#frag"},
        {"url_id": 4, "raw_url": "https://b.example/page?a=1&utm_source=x&z=2"},
        # genuinely new
        {"url_id": 5, "raw_url": "http://c.example/x/"},
    ], FRONTIER_INPUT_DDL, "b2")

    stream = spark.readStream.schema(FRONTIER_INPUT_DDL).option("maxFilesPerTrigger", "1").parquet(src)
    q = (
        frontier_dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas().set_index("url_id")["canonical_url"].to_dict()
    assert got == {
        1: "https://a.example/doc/7",
        2: "https://b.example/page?a=1&z=2",
        5: "http://c.example/x",
    }
