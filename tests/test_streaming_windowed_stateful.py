"""Watermarked windowed aggregation (append finalization, late-drop) and the
applyInPandasWithState streaming sessionizer (exactly-once closed sessions,
state carried across micro-batches)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from iceberg_ingestion_spark.streaming.stateful import sessionize_stream
from iceberg_ingestion_spark.streaming.windowed import windowed_event_stats

EV_DDL = "ts timestamp, event_type string, value double"
US_DDL = "user_id long, ts_us long"
HOUR_US = 3600 * 1_000_000


def _drop(spark, path, ddl, rows):
    spark.createDataFrame(rows, ddl).coalesce(1).write.mode("append").parquet(path)


def _drain(spark, input_dir, ddl, out_dir, ckpt, transform):
    schema = spark.createDataFrame([], ddl).schema
    stream = spark.readStream.schema(schema).parquet(input_dir)
    q = (
        transform(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_windowed_stats_finalize_and_late_drop(spark, tmp_path):
    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(input_dir)
    tf = lambda st: windowed_event_stats(st, "ts", "1 hour", "2 hours")

    # batch 1: events in the 10:00 and 11:00 windows; watermark -> 09:00
    _drop(spark, input_dir, EV_DDL, [
        (_ts("2026-01-01 10:10:00"), "click", 1.0),
        (_ts("2026-01-01 10:40:00"), "click", 2.0),
        (_ts("2026-01-01 11:05:00"), "view", 5.0),
    ])
    _drain(spark, input_dir, EV_DDL, out_dir, ckpt, tf)

    # batch 2: event at 14:00 pushes the watermark to 12:00 -> both earlier
    # windows finalize; a too-late event (08:30 < watermark 09:00 from batch 1)
    # is dropped entirely.
    _drop(spark, input_dir, EV_DDL, [
        (_ts("2026-01-01 14:00:00"), "click", 1.0),
        (_ts("2026-01-01 08:30:00"), "click", 99.0),
    ])
    _drain(spark, input_dir, EV_DDL, out_dir, ckpt, tf)

    got = {
        (r.window_start.isoformat(), r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[("2026-01-01T10:00:00", "click")] == (2, 3.0)
    assert got[("2026-01-01T11:00:00", "view")] == (1, 5.0)
    # late 08:30 event was dropped, not added to a new 08:00 window
    assert not any(k[0] == "2026-01-01T08:00:00" for k in got)


def test_sessionize_stream_closes_on_gap_across_batches(spark, tmp_path):
    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(input_dir)
    tf = lambda st: sessionize_stream(st, gap_us=8 * HOUR_US)

    # batch 1: user 1 has two events 1h apart (one open session); user 2 has
    # two events 20h apart -> first session closes within the batch.
    _drop(spark, input_dir, US_DDL, [
        (1, 0), (1, HOUR_US),
        (2, 0), (2, 20 * HOUR_US),
    ])
    _drain(spark, input_dir, US_DDL, out_dir, ckpt, tf)
    got = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(2, 0): (0, 1)}

    # batch 2: user 1 events at +30h close the session carried in state
    # (2 events, ended at 1h); user 2's open session (started 20h) stays open.
    _drop(spark, input_dir, US_DDL, [(1, 30 * HOUR_US), (1, 31 * HOUR_US)])
    _drain(spark, input_dir, US_DDL, out_dir, ckpt, tf)
    got = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(2, 0): (0, 1), (1, 0): (HOUR_US, 2)}


def test_sessionize_stream_matches_batch_semantics(spark, tmp_path):
    """Streaming closed sessions == batch sessionizer's non-final sessions."""
    from iceberg_ingestion_spark.operators.sessionize import sessionize

    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(input_dir)
    rows = [
        (u, int(t * HOUR_US))
        for u in range(1, 6)
        for t in [0, 1, 2, 12, 13, 30, 30.5, 55]
    ]
    _drop(spark, input_dir, US_DDL, rows)
    _drain(spark, input_dir, US_DDL, out_dir, ckpt,
           lambda st: sessionize_stream(st, gap_us=8 * HOUR_US))

    batch = sessionize(
        spark.createDataFrame(rows, US_DDL),
        "user_id",
        "ts_us",
        order_tiebreak="ts_us",
        gap_seconds=8 * HOUR_US,
    )
    bs = (
        batch.groupBy("user_id", "session_index")
        .agg(
            F.min("ts_us").alias("s"),
            F.max("ts_us").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # drop each user's last (still-open) session from the batch view
    w_last = bs.groupBy("user_id").agg(F.max("session_index").alias("last_idx"))
    closed_batch = {
        (r.user_id, r.s): (r.e, r.n)
        for r in bs.join(w_last, "user_id")
        .filter(F.col("session_index") != F.col("last_idx"))
        .collect()
    }
    got = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == closed_batch


def test_sessionize_stream_event_time_timeout_flushes_idle(spark, tmp_path):
    """With watermark_delay set, an idle open session closes when the
    watermark passes last_event + gap — WITHOUT a new event for that key.
    User 1 never appears after batch 1; other users' events advance the
    watermark and flush user 1's session."""
    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(input_dir)
    tf = lambda st: sessionize_stream(st, gap_us=8 * HOUR_US, watermark_delay="1 hour")
    # keep all events strictly above the initial watermark (epoch 0): Spark's
    # event-time pre-filter drops rows at/behind the watermark before they
    # reach the stateful operator.
    base = 100 * HOUR_US

    # batch 1: user 1 open session (base, base+1h); user 2 event at base+40h
    # pushes the post-batch watermark to base+39h — past user 1's timeout at
    # base + 1h + 8h.
    _drop(spark, input_dir, US_DDL,
          [(1, base), (1, base + HOUR_US), (2, base + 40 * HOUR_US)])
    _drain(spark, input_dir, US_DDL, out_dir, ckpt, tf)

    # batch 2: only user 2 again (base+41h). User 1's timed-out session must
    # be flushed by now; user 2's own session (timeout base+49h > watermark
    # base+40h) stays open.
    _drop(spark, input_dir, US_DDL, [(2, base + 41 * HOUR_US)])
    _drain(spark, input_dir, US_DDL, out_dir, ckpt, tf)

    got = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(1, base): (base + HOUR_US, 2)}


def test_exact_dedup_stream_drops_replays(spark, tmp_path):
    from iceberg_ingestion_spark.streaming.dedup_stream import exact_dedup_stream

    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(input_dir)
    ddl = "event_id long, ts timestamp, v string"
    tf = lambda st: exact_dedup_stream(st, ["event_id"], "ts", "1 hour")

    # batch 1 contains an in-batch duplicate of event 1
    _drop(spark, input_dir, ddl, [
        (1, _ts("2026-01-01 10:00:00"), "a"),
        (1, _ts("2026-01-01 10:10:00"), "a-dup"),
        (2, _ts("2026-01-01 10:20:00"), "b"),
    ])
    _drain(spark, input_dir, ddl, out_dir, ckpt, tf)
    # batch 2 replays event 2 within the watermark horizon and adds event 3
    _drop(spark, input_dir, ddl, [
        (2, _ts("2026-01-01 10:25:00"), "b-replay"),
        (3, _ts("2026-01-01 10:30:00"), "c"),
    ])
    _drain(spark, input_dir, ddl, out_dir, ckpt, tf)

    got = sorted((r.event_id, r.v) for r in spark.read.parquet(out_dir).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join: each micro-batch enriches against a static dimension
    (re-read per batch; broadcast by Catalyst) — the standard lookup shape."""
    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(input_dir)
    ddl = "user_id long, ts timestamp, amount double"
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )

    _drop(spark, input_dir, ddl, [
        (1, _ts("2026-01-01 10:00:00"), 10.0),
        (2, _ts("2026-01-01 10:01:00"), 20.0),
        (3, _ts("2026-01-01 10:02:00"), 30.0),  # no dim row -> null tier
    ])
    _drain(spark, input_dir, ddl, out_dir, ckpt,
           lambda st: st.join(dim, "user_id", "left"))
    got = {r.user_id: r.tier for r in spark.read.parquet(out_dir).collect()}
    assert got == {1: "gold", 2: "silver", 3: None}


def test_sessionize_stream_drops_late_events(spark, tmp_path):
    """An event arriving in a later micro-batch with ts BEHIND the open
    session's last-seen timestamp must not rewind state: without the guard it
    would re-extend the session (or mis-close it) retroactively."""
    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(input_dir)
    tf = lambda st: sessionize_stream(st, gap_us=8 * HOUR_US)

    # batch 1: open session for user 1 (events at 0 and 5h, within the gap)
    _drop(spark, input_dir, US_DDL, [(1, 0), (1, 5 * HOUR_US)])
    _drain(spark, input_dir, US_DDL, out_dir, ckpt, tf)

    # batch 2: a LATE event at 2h (behind last=5h) plus a closer at 30h.
    # The late event is dropped: the closed session must read
    # (start=0, end=5h, n=2) — not n=3.
    _drop(spark, input_dir, US_DDL, [(1, 2 * HOUR_US), (1, 30 * HOUR_US)])
    _drain(spark, input_dir, US_DDL, out_dir, ckpt, tf)
    got = {
        (r.user_id, r.session_start_us): (r.session_end_us, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(1, 0): (5 * HOUR_US, 2)}


def test_interval_join_stream_matches_batch_across_batches(spark, tmp_path):
    """Stream-stream interval join == the batch binned interval join on the
    same data, including a pair whose two halves arrive in DIFFERENT
    micro-batches (the buffered-state case) and a click outside the lag
    window (must not match)."""
    from iceberg_ingestion_spark.operators.interval import interval_join
    from iceberg_ingestion_spark.streaming.join_stream import interval_join_stream

    ddl = "event_id long, ts timestamp, user_id long, event_type string"
    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(input_dir)
    tf = lambda st: interval_join_stream(st, max_lag="2 hours", watermark_delay="2 hours")

    batch1 = [
        (1, _ts("2026-01-01 10:00:00"), 7, "error"),
        (2, _ts("2026-01-01 10:30:00"), 7, "click"),   # in-window, same batch
        (3, _ts("2026-01-01 09:00:00"), 8, "error"),
    ]
    batch2 = [
        (4, _ts("2026-01-01 10:45:00"), 8, "click"),   # > 90 min after err 3? no: 1h45 in 2h window
        (5, _ts("2026-01-01 11:50:00"), 7, "click"),   # 110 min after err 1 -> match
        (6, _ts("2026-01-01 13:00:00"), 8, "click"),   # 4h after err 3 -> no match
    ]
    _drop(spark, input_dir, ddl, batch1)
    _drain(spark, input_dir, ddl, out_dir, ckpt, tf)
    _drop(spark, input_dir, ddl, batch2)
    _drain(spark, input_dir, ddl, out_dir, ckpt, tf)

    streamed = {
        (r.user_id, r.click_id, r.error_id, r.us_after_error)
        for r in spark.read.parquet(out_dir).collect()
    }

    ev = spark.createDataFrame(batch1 + batch2, ddl).withColumn(
        "ts_us", F.unix_micros("ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts_us"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + F.lit(2 * HOUR_US)).alias("end_us"),
    )
    j = interval_join(
        clicks, errors, "ts_us", "start_us", "end_us",
        key_cols=["user_id"], bin_width=float(2 * HOUR_US),
    )
    batch = {
        (r.user_id, r.click_id, r.error_id, r.us_after_error)
        for r in j.select(
            "user_id", "click_id",
            F.col("iv_error_id").alias("error_id"),
            (F.col("ts_us") - F.col("iv_start_us")).alias("us_after_error"),
        ).collect()
    }
    assert streamed == batch
    assert (7, 2, 1, 30 * 60 * 1_000_000) in streamed     # same-batch pair
    assert (8, 4, 3, 105 * 60 * 1_000_000) in streamed    # cross-batch pair
    assert not any(c == 6 for (_, c, _, _) in streamed)   # outside lag window


SEQ_DDL = "user_id long, event_id long, event_type string, ts_us long"


def test_sequence_detect_stream_across_batches_with_reset(spark, tmp_path):
    from iceberg_ingestion_spark.streaming.stateful import sequence_detect_stream

    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(input_dir)
    tf = lambda st: sequence_detect_stream(
        st, ["view", "click", "purchase"], reset_types=["error"]
    )

    # batch 1: user 1 completes view+click (automaton mid-flight in state);
    # user 2 completes a FULL match in-batch; user 3 views then errors.
    _drop(spark, input_dir, SEQ_DDL, [
        (1, 1, "view", 10), (1, 2, "click", 20),
        (2, 3, "view", 10), (2, 4, "click", 20), (2, 5, "purchase", 30),
        (3, 6, "view", 10), (3, 7, "error", 20),
    ])
    _drain(spark, input_dir, SEQ_DDL, out_dir, ckpt, tf)
    got = {(r.user_id, r.matched_at_us, r.match_seq)
           for r in spark.read.parquet(out_dir).collect()}
    assert got == {(2, 30, 1)}

    # batch 2: user 1's purchase completes the match carried in state; user
    # 3's click+purchase do NOT match (the error reset their view); user 2
    # starts and completes a SECOND match -> match_seq increments.
    _drop(spark, input_dir, SEQ_DDL, [
        (1, 8, "purchase", 30),
        (3, 9, "click", 30), (3, 10, "purchase", 40),
        (2, 11, "view", 40), (2, 12, "click", 50), (2, 13, "purchase", 60),
    ])
    _drain(spark, input_dir, SEQ_DDL, out_dir, ckpt, tf)
    got = {(r.user_id, r.matched_at_us, r.match_seq)
           for r in spark.read.parquet(out_dir).collect()}
    assert got == {(2, 30, 1), (1, 30, 1), (2, 60, 2)}


def test_sequence_detect_stream_split_invariant_and_batch_parity(spark, tmp_path):
    """Feeding the fixture event log in 1 drop vs 3 drops yields identical
    matches, and both equal a reference automaton run over the fully-sorted
    log — the CEP operator is micro-batch-split invariant."""
    from iceberg_ingestion_spark.streaming.stateful import sequence_detect_stream

    rows = [
        (int(r.user_id), int(r.event_id), r.event_type, int(r.ts_us))
        for r in spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .select("user_id", "event_id", "event_type", "ts_us")
        .collect()
    ]
    stages, resets = ["view", "click", "purchase"], {"error"}
    stage_of = {s: i for i, s in enumerate(stages)}

    # reference: one pass over the globally-sorted log
    expected = set()
    state: dict[int, tuple[int, int]] = {}
    for uid, eid, et, ts in sorted(rows, key=lambda r: (r[0], r[3], r[1])):
        idx, n = state.get(uid, (0, 0))
        if et in resets:
            idx = 0
        elif stage_of.get(et) == idx:
            idx += 1
            if idx == len(stages):
                n += 1
                expected.add((uid, ts, n))
                idx = 0
        state[uid] = (idx, n)

    tf = lambda st: sequence_detect_stream(st, stages, reset_types=["error"])
    by_ts = sorted(rows, key=lambda r: r[3])
    for label, chunks in [("one", [by_ts]), ("three", [by_ts[:300], by_ts[300:700], by_ts[700:]])]:
        input_dir, out_dir, ckpt = (
            str(tmp_path / f"{label}_{d}") for d in ("in", "out", "ckpt")
        )
        os.makedirs(input_dir)
        for chunk in chunks:
            _drop(spark, input_dir, SEQ_DDL, chunk)
            _drain(spark, input_dir, SEQ_DDL, out_dir, ckpt, tf)
        got = {
            (r.user_id, r.matched_at_us, r.match_seq)
            for r in spark.read.parquet(out_dir).collect()
        }
        assert got == expected, label
