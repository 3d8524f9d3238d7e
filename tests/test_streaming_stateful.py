"""Watermarked windows + custom stateful sessionization over real
micro-batched streams (file source, one file per trigger)."""

import datetime

import pyspark.sql.functions as F

from grower_spark.streaming.stateful import streaming_sessionize, windowed_counts


def _write_events(spark, path, rows):
    df = spark.createDataFrame(rows, ["user_id", "ts_str", "event_type"]).select(
        "user_id", F.col("ts_str").cast("timestamp").alias("ts"), "event_type"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_windowed_counts_with_watermark(spark, tmp_path):
    batch1 = str(tmp_path / "in" / "b1")
    batch2 = str(tmp_path / "in" / "b2")
    _write_events(spark, batch1, [
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:50:00", "click"),
        (2, "2024-01-01 11:10:00", "view"),
    ])
    # batch2 is far ahead: advances the watermark past the 10:00 window
    _write_events(spark, batch2, [(1, "2024-01-01 20:00:00", "click")])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    out = windowed_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["window_start"], r["event_type"]): r["cnt"]
        for r in spark.sql("select * from wincounts").collect()
    }
    # the 10:00 and 11:00 windows closed once the 20:00 event advanced the
    # watermark; the 20:00 window stays open (no emission in append mode)
    assert rows[(datetime.datetime(2024, 1, 1, 10, 0), "click")] == 2
    assert rows[(datetime.datetime(2024, 1, 1, 11, 0), "view")] == 1
    assert (datetime.datetime(2024, 1, 1, 20, 0), "click") not in rows


def test_session_window_under_streaming(spark, tmp_path):
    """The same F.session_window expression the batch driver query uses
    (q_events_session_window) runs under readStream with a watermark:
    gap-closed sessions emit in append mode once the watermark passes."""
    batch1 = str(tmp_path / "in" / "b1")
    batch2 = str(tmp_path / "in" / "b2")
    _write_events(spark, batch1, [
        (1, "2024-01-01 10:00:00", "a"),
        (1, "2024-01-01 10:10:00", "a"),   # same session (gap 30m)
        (1, "2024-01-01 11:30:00", "a"),   # new session
    ])
    _write_events(spark, batch2, [(1, "2024-01-02 09:00:00", "a")])  # advances watermark

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    sessions = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("start"),
            F.col("session_window.end").alias("end"),
            "n_events",
        )
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sesswin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["start"], r["end"]): r["n_events"]
        for r in spark.sql("select * from sesswin").collect()
    }
    # first session: 10:00-10:10 -> closes at 10:40; second: 11:30 -> 12:00
    assert rows[(datetime.datetime(2024, 1, 1, 10, 0),
                 datetime.datetime(2024, 1, 1, 10, 40))] == 2
    assert rows[(datetime.datetime(2024, 1, 1, 11, 30),
                 datetime.datetime(2024, 1, 1, 12, 0))] == 1
    # the 09:00 next-day session stays open (no emission in append mode)
    assert all(s.date() == datetime.date(2024, 1, 1) for s, _ in rows)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup: dropDuplicatesWithinWatermark keeps one copy
    of a key across micro-batches while its state lives, and expires state
    by the watermark (bounded memory — the streaming analog of
    exact_dedup)."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _write_events(spark, str(in_dir / "b1"), [
        (1, "2024-01-01 10:00:00", "e1"),
        (1, "2024-01-01 10:00:30", "e1"),   # dup key in same batch
        (2, "2024-01-01 10:01:00", "e2"),
    ])
    _write_events(spark, str(in_dir / "b2"), [
        (1, "2024-01-01 10:02:00", "e1"),   # dup key across batches
        (3, "2024-01-01 10:03:00", "e3"),
    ])
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_type"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [r["event_type"] for r in spark.sql("select * from sdedup").collect()]
    assert sorted(rows) == ["e1", "e2", "e3"]  # exactly one copy each


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: impressions joined to clicks within
    [0, 10 min) — Spark buffers both sides in state bounded by the
    watermark + interval condition (the streaming analog of range_join)."""
    imp_dir = str(tmp_path / "imp")
    clk_dir = str(tmp_path / "clk")
    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00")],
        ["imp_id", "ts_str"],
    ).select("imp_id", F.col("ts_str").cast("timestamp").alias("imp_ts")) \
     .coalesce(1).write.mode("overwrite").parquet(imp_dir)
    spark.createDataFrame(
        [(101, 1, "2024-01-01 10:05:00"),   # within 10 min of imp 1
         (102, 1, "2024-01-01 10:20:00"),   # too late for imp 1
         (103, 2, "2024-01-01 11:09:00")],  # within 10 min of imp 2
        ["click_id", "imp_id", "ts_str"],
    ).select("click_id", "imp_id", F.col("ts_str").cast("timestamp").alias("clk_ts")) \
     .coalesce(1).write.mode("overwrite").parquet(clk_dir)

    imps = (
        spark.readStream.schema("imp_id long, imp_ts timestamp").parquet(imp_dir)
        .withWatermark("imp_ts", "1 hour")
    )
    clicks = (
        spark.readStream.schema("click_id long, imp_id long, clk_ts timestamp")
        .parquet(clk_dir)
        .withWatermark("clk_ts", "1 hour")
    )
    joined = imps.join(
        clicks,
        (imps.imp_id == clicks.imp_id)
        & (clicks.clk_ts >= imps.imp_ts)
        & (clicks.clk_ts < imps.imp_ts + F.expr("INTERVAL 10 MINUTES")),
    ).select(imps.imp_id, "click_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["imp_id"], r["click_id"]) for r in spark.sql("select * from ssjoin").collect()}
    assert got == {(1, 101), (2, 103)}


def test_streaming_sessionize_closes_on_gap_and_timeout(spark, tmp_path):
    b1 = str(tmp_path / "in" / "b1")
    b2 = str(tmp_path / "in" / "b2")
    # user 1: two bursts separated by > 30min inside one batch -> first
    # session closes on the in-batch gap
    _write_events(spark, b1, [
        (1, "2024-01-01 09:00:00", "a"),
        (1, "2024-01-01 09:10:00", "a"),
        (1, "2024-01-01 10:30:00", "a"),
        (2, "2024-01-01 09:00:00", "a"),
    ])
    # batch 2 advances the watermark far ahead -> open sessions time out
    _write_events(spark, b2, [(3, "2024-01-02 12:00:00", "a")])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    sessions = streaming_sessionize(stream, gap_seconds=1800, watermark="10 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start_us"]): (r["session_end_us"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    }

    def us(s):
        return int(datetime.datetime.fromisoformat(s + "+00:00").timestamp() * 1_000_000)

    # user 1 burst 1: closed by the in-batch gap
    assert got[(1, us("2024-01-01 09:00:00"))] == (us("2024-01-01 09:10:00"), 2)
    # user 1 burst 2 and user 2: closed by event-time timeout after batch 2
    assert got[(1, us("2024-01-01 10:30:00"))] == (us("2024-01-01 10:30:00"), 1)
    assert got[(2, us("2024-01-01 09:00:00"))] == (us("2024-01-01 09:00:00"), 1)


def test_late_rows_beyond_watermark_dropped_exactly(spark, tmp_path):
    """Late-data contract, pinned row by row against Spark's ACTUAL
    two-watermark semantics (3.4+): late-row FILTERING in batch N uses the
    eviction watermark of batch N-1 (one batch lagged), the filter
    predicate is window-END <= late-events watermark (not per-row event
    time), and EVICTION/emission uses the current batch's watermark.  So a
    drop requires the late row to arrive two batches after the advancing
    event; a row whose event time is below the watermark but whose window
    is still open is kept and counted."""
    _write_events(spark, str(tmp_path / "in" / "b1"), [
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:20:00", "click"),
    ])
    _write_events(spark, str(tmp_path / "in" / "b2"), [
        (1, "2024-01-01 10:10:00", "click"),  # late vs b1 max, window open: KEPT
        (1, "2024-01-01 12:00:00", "click"),  # watermark -> 11:30 (evicts 10:00 win next batch)
    ])
    _write_events(spark, str(tmp_path / "in" / "b3"), [
        (1, "2024-01-01 13:00:00", "click"),  # filler: ages 11:30 into the late-filter
    ])
    _write_events(spark, str(tmp_path / "in" / "b4"), [
        (1, "2024-01-01 10:15:00", "click"),  # win end 11:00 <= 11:30: DROPPED
        (1, "2024-01-01 11:05:00", "click"),  # event < wm but win end 12:00 > 11:30: KEPT
        (1, "2024-01-01 14:00:00", "click"),  # advances wm; stays open itself
    ])
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    out = windowed_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("latewin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r["window_start"], r["event_type"]): r["cnt"]
        for r in spark.sql("select * from latewin").collect()
    }
    assert rows == {
        # 10:05 + 10:20 + the late-but-kept 10:10; NOT the dropped 10:15
        (datetime.datetime(2024, 1, 1, 10, 0), "click"): 3,
        # the still-open-window late row 11:05, emitted on eviction
        (datetime.datetime(2024, 1, 1, 11, 0), "click"): 1,
        (datetime.datetime(2024, 1, 1, 12, 0), "click"): 1,
        # 13:00 and 14:00 windows still open in append mode -> absent
    }
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1


def test_transform_with_state_running_profile(spark, tmp_path):
    """Spark-4 transformWithStateInPandas path: per-user running totals
    accumulate across micro-batches in RocksDB-backed typed state.

    Auto-skips while google.protobuf is absent (the transformWithState
    driver worker needs it; see running_profile's dated env note)."""
    import pytest

    pytest.importorskip(
        "google.protobuf", reason="transformWithState state server needs protobuf"
    )
    from grower_spark.streaming.stateful import running_profile

    in_dir = str(tmp_path / "in")
    rows1 = [(1, "2024-01-01 10:00:00", 1.25), (1, "2024-01-01 10:01:00", 2.0),
             (2, "2024-01-01 10:02:00", 0.5)]
    df = spark.createDataFrame(rows1, ["user_id", "ts_str", "value"]).select(
        "user_id", F.col("ts_str").cast("timestamp").alias("ts"), "value"
    )
    df.coalesce(1).write.mode("append").parquet(in_dir)

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(in_dir)
        out = running_profile(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("twstate_profile")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.user_id: (r.n_events, r.sum_value_centis)
            for r in spark.sql("SELECT * FROM twstate_profile").collect()
        }
        assert got[1] == (2, 325)   # 1.25 + 2.00 in centis
        assert got[2] == (1, 50)

        # second batch: state must carry over (125 more centis for user 1)
        rows2 = [(1, "2024-01-01 11:00:00", 1.25)]
        df2 = spark.createDataFrame(rows2, ["user_id", "ts_str", "value"]).select(
            "user_id", F.col("ts_str").cast("timestamp").alias("ts"), "value"
        )
        df2.coalesce(1).write.mode("append").parquet(in_dir)
        q2 = (
            out.writeStream.format("memory")
            .queryName("twstate_profile2")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        got2 = {
            r.user_id: (r.n_events, r.sum_value_centis)
            for r in spark.sql("SELECT * FROM twstate_profile2").collect()
        }
        assert got2[1] == (3, 450)
        assert 2 not in got2  # update mode: only keys the batch touched
    finally:
        if old is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_sessionizer_state_survives_restart(spark, tmp_path):
    """Exactly-once stateful recovery (r9): a session OPEN when the query
    stops must resume from checkpointed state on restart and close with
    ALL its events counted once — the operational contract that lets a
    100 TB ingestion pipeline be redeployed mid-stream.  A file sink
    (not memory, which dies with the query) proves no duplicate and no
    split session across the restart boundary."""
    import glob
    import json as _json

    from grower_spark.streaming.stateful import streaming_sessionize

    def _us(s):
        return int(
            datetime.datetime.fromisoformat(s + "+00:00").timestamp()
            * 1_000_000
        )

    indir = tmp_path / "in"
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    # run 1: an OPEN session (two events, nothing can close it yet)
    _write_events(spark, str(indir / "b1"), [
        (1, "2024-01-01 09:00:00", "a"),
        (1, "2024-01-01 09:10:00", "a"),
    ])

    def run_once():
        stream = (
            spark.readStream
            .schema("user_id long, ts timestamp, event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(indir / "*"))
        )
        q = (
            streaming_sessionize(stream, gap_seconds=1800,
                                 watermark="10 minutes")
            .writeStream.format("json")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()  # stops with user 1's session still open in state
    # run 2: one more event INSIDE the same session, a gap-opener, and a
    # far-future row to advance the watermark and close everything
    _write_events(spark, str(indir / "b2"), [
        (1, "2024-01-01 09:20:00", "a"),
        (1, "2024-01-01 12:00:00", "a"),
    ])
    _write_events(spark, str(indir / "b3"), [(9, "2024-01-03 00:00:00", "a")])
    run_once()

    rows = []
    for f in glob.glob(out + "/part-*.json"):
        with open(f) as fh:
            rows += [_json.loads(line) for line in fh if line.strip()]
    got = {
        (r["user_id"], r["session_start_us"]): (r["session_end_us"],
                                                r["n_events"])
        for r in rows if r["user_id"] == 1
    }
    # the pre-restart session absorbed the post-restart 09:20 event: ONE
    # session of 3 events, not a 2-event + 1-event split, and no dupes
    assert len(rows) == len({(r["user_id"], r["session_start_us"])
                             for r in rows})
    assert got[(1, _us("2024-01-01 09:00:00"))] == (
        _us("2024-01-01 09:20:00"), 3)
    assert got[(1, _us("2024-01-01 12:00:00"))] == (
        _us("2024-01-01 12:00:00"), 1)
