"""Streaming sessionized funnel (r9, VERDICT r8 item 5): the batch
sessionized_funnel_depth semantics run incrementally over micro-batched
streams — streaming-equals-batch pin, watermark-timeout behavior, and the
reference's flagship domain end-to-end: nginx access-log lines -> parse
(P1-P9) -> sessionize -> funnel, one streaming pipeline."""

import datetime

import pyspark.sql.functions as F

from grower_spark.streaming.stateful import streaming_session_funnel

STEPS = ["view", "click", "purchase"]


def _write_events(spark, path, rows):
    df = spark.createDataFrame(rows, ["user_id", "ts_str", "event_type"]).select(
        "user_id", F.col("ts_str").cast("timestamp").alias("ts"), "event_type"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _us(s):
    return int(datetime.datetime.fromisoformat(s + "+00:00").timestamp() * 1_000_000)


def test_streaming_funnel_equals_batch(spark, tmp_path):
    """Closed streaming sessions must carry exactly the batch operator's
    (n_events, funnel_depth) per (user, session-ordinal) — same gap, same
    steps, same strictly-after fold — for in-order arrival."""
    from grower_spark.operators.funnel import sessionized_funnel_depth

    rows_b1 = [
        # user 1, session 1: full funnel with distractor events
        (1, "2024-01-01 09:00:00", "view"),
        (1, "2024-01-01 09:01:00", "scroll"),
        (1, "2024-01-01 09:02:00", "click"),
        (1, "2024-01-01 09:03:00", "purchase"),
        # user 1, session 2 (>30min gap): out-of-order steps -> depth 1
        (1, "2024-01-01 11:00:00", "click"),
        (1, "2024-01-01 11:01:00", "view"),
        # user 2, session 1: view only
        (2, "2024-01-01 09:00:00", "view"),
    ]
    rows_b2 = [
        # user 2's session CONTINUES across the batch boundary (in-order)
        (2, "2024-01-01 09:10:00", "click"),
        (2, "2024-01-01 09:11:00", "purchase"),
        # user 3: simultaneous view+click (strictly-after excludes click)
        (3, "2024-01-01 09:00:00", "view"),
        (3, "2024-01-01 09:00:00", "click"),
        (3, "2024-01-01 09:05:00", "click"),
    ]
    sentinel = [(99, "2024-01-03 00:00:00", "noop")]  # times everyone out
    _write_events(spark, str(tmp_path / "in" / "b1"), rows_b1)
    _write_events(spark, str(tmp_path / "in" / "b2"), rows_b2)
    _write_events(spark, str(tmp_path / "in" / "b3"), sentinel)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    out = streaming_session_funnel(stream, STEPS, gap_seconds=1800,
                                   watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sfunnel")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = [
        r for r in spark.sql("select * from sfunnel").collect()
        if r["user_id"] != 99
    ]
    # session ordinal by start time -> comparable to batch session_seq
    got = {}
    for r in sorted(streamed, key=lambda r: (r["user_id"], r["session_start_us"])):
        seq = sum(1 for k in got if k[0] == r["user_id"]) + 1
        got[(r["user_id"], seq)] = (r["n_events"], r["funnel_depth"])

    batch_events = spark.createDataFrame(
        rows_b1 + rows_b2, ["user_id", "ts_str", "event_type"]
    ).select(
        "user_id",
        F.unix_micros(F.col("ts_str").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    expected = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["funnel_depth"])
        for r in sessionized_funnel_depth(
            batch_events, STEPS, gap=1800 * 1_000_000, ts_col="ts_us"
        ).collect()
    }
    assert got == expected
    # and the hand-checked values, so the pin can't be trivially green
    assert expected[(1, 1)] == (4, 3)
    assert expected[(1, 2)] == (2, 1)
    assert expected[(2, 1)] == (3, 3)   # session spans the batch boundary
    assert expected[(3, 1)] == (3, 2)   # tie click excluded, later click advances


def test_streaming_funnel_timeout_and_gap_close(spark, tmp_path):
    """A session closes EITHER on an in-batch gap or on the event-time
    timeout once the watermark passes session_end + gap; open sessions
    never emit in append mode."""
    _write_events(spark, str(tmp_path / "in" / "b1"), [
        (1, "2024-01-01 09:00:00", "view"),
        (1, "2024-01-01 09:05:00", "click"),
        # same batch, >30 min later -> first session closes on the gap
        (1, "2024-01-01 10:00:00", "view"),
    ])
    # advances the watermark far enough to time out user 1's open session
    _write_events(spark, str(tmp_path / "in" / "b2"), [
        (2, "2024-01-01 20:00:00", "view"),
    ])
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    out = streaming_session_funnel(stream, STEPS, gap_seconds=1800,
                                   watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sfunnel_to")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start_us"]):
            (r["session_end_us"], r["n_events"], r["funnel_depth"])
        for r in spark.sql("select * from sfunnel_to").collect()
    }
    # gap-closed: view->click chains to depth 2
    assert got[(1, _us("2024-01-01 09:00:00"))] == (
        _us("2024-01-01 09:05:00"), 2, 2)
    # timeout-closed: the 10:00 singleton
    assert got[(1, _us("2024-01-01 10:00:00"))] == (
        _us("2024-01-01 10:00:00"), 1, 1)
    # user 2's session is still open -> absent
    assert not any(u == 2 for u, _ in got)


def test_nginx_stream_to_session_funnel_end_to_end(spark, tmp_path):
    """The reference's flagship domain, end to end in ONE streaming
    pipeline: raw nginx access-log lines on disk -> the config-compiled
    LogPipeline parse (P1-P9: format->regex, casts, time parse) ->
    per-IP gap sessionization with an in-session funnel
    (view page -> add to cart -> checkout), closed sessions emitted.
    Reference parity: internal/services/filelog/impl.go:189-216 runs the
    same scan->parse chain but stops at the insert; the funnel is the
    analytics layer its users build downstream."""
    from grower_spark.config import PipelineConfig
    from grower_spark.plans.pipeline import LogPipeline
    from grower_spark.sources.file import stream_lines

    logs = tmp_path / "logs"
    logs.mkdir()
    lines_b1 = [
        # ip 10.0.0.1: full funnel in one sitting
        '10.0.0.1 [2024-01-01T09:00:00Z] "GET /product HTTP/1.1" 200',
        '10.0.0.1 [2024-01-01T09:01:00Z] "POST /cart HTTP/1.1" 200',
        '10.0.0.1 [2024-01-01T09:02:00Z] "POST /checkout HTTP/1.1" 200',
        # ip 10.0.0.2: browses, never buys
        '10.0.0.2 [2024-01-01T09:00:30Z] "GET /product HTTP/1.1" 200',
        '10.0.0.2 [2024-01-01T09:03:00Z] "GET /product HTTP/1.1" 304',
        'this line does not parse',
    ]
    lines_b2 = [
        # far-future line: advances the watermark, times out both sessions
        '10.0.0.9 [2024-01-02T09:00:00Z] "GET /product HTTP/1.1" 200',
    ]
    (logs / "access.log.1").write_text("\n".join(lines_b1) + "\n")
    (logs / "access.log.2").write_text("\n".join(lines_b2) + "\n")

    cfg = PipelineConfig.from_dict({
        "nginx": {
            "log_format":
                '$remote_addr [$time_iso8601] "$request_method $request_uri'
                ' $server_protocol" $status',
        },
        "scheme": {
            "logs_table": "t.access",
            "columns": {
                "remote_addr": "remote_addr",
                "time_iso8601": "time_iso8601",
                "request_method": "request_method",
                "request_uri": "request_uri",
                "server_protocol": "server_protocol",
                "status": "status",
            },
        },
    })
    lines = stream_lines(spark, str(logs), max_files_per_trigger=1)
    good, _bad = LogPipeline(cfg).parse_with_deadletter(lines)
    events = good.select(
        # IP as the session key: hash to the operator's long user_id,
        # deterministic and collision-checked at this cardinality
        F.xxhash64("remote_addr").alias("user_id"),
        F.col("time_iso8601").alias("ts"),
        F.col("request_uri").alias("event_type"),
    )
    out = streaming_session_funnel(
        events, ["/product", "/cart", "/checkout"],
        gap_seconds=1800, watermark="10 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("nginx_funnel")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from nginx_funnel").collect()
    ip1 = [r for r in rows if r["user_id"] ==
           spark.sql("select xxhash64('10.0.0.1') h").collect()[0]["h"]]
    ip2 = [r for r in rows if r["user_id"] ==
           spark.sql("select xxhash64('10.0.0.2') h").collect()[0]["h"]]
    assert len(ip1) == 1 and (ip1[0]["n_events"], ip1[0]["funnel_depth"]) == (3, 3)
    assert len(ip2) == 1 and (ip2[0]["n_events"], ip2[0]["funnel_depth"]) == (2, 1)


def test_streaming_dau_equals_batch(spark, tmp_path):
    """Closed-day streaming DAU must equal the batch panel's dau column
    (active_user_stats) for every day the watermark finalized — the
    dedup-then-count composition is exactly the batch .distinct()."""
    from grower_spark.operators.retention import active_user_stats
    from grower_spark.streaming.stateful import streaming_dau

    rows = [
        (1, "2024-01-01 09:00:00", "a"),
        (1, "2024-01-01 17:00:00", "a"),   # same user+day: one DAU
        (2, "2024-01-01 10:00:00", "a"),
        (1, "2024-01-02 09:00:00", "a"),
        (3, "2024-01-03 09:00:00", "a"),
        (3, "2024-01-03 10:00:00", "a"),
    ]
    sentinel = [(99, "2024-01-10 00:00:00", "a")]  # closes all real days
    _write_events(spark, str(tmp_path / "in" / "b1"), rows[:3])
    _write_events(spark, str(tmp_path / "in" / "b2"), rows[3:])
    _write_events(spark, str(tmp_path / "in" / "b3"), sentinel)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    q = (
        streaming_dau(stream, watermark="1 day")
        .writeStream.format("memory")
        .queryName("sdau")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["day"]: r["dau"]
           for r in spark.sql("select * from sdau").collect()
           if r["day"] < "2024-01-10"}

    batch = spark.createDataFrame(rows, ["user_id", "ts_str", "event_type"]) \
        .select("user_id", F.col("ts_str").cast("timestamp").alias("ts"))
    expected = {r["day"]: r["dau"]
                for r in active_user_stats(batch).collect() if r["dau"] > 0}
    assert got == expected
    assert expected == {"2024-01-01": 2, "2024-01-02": 1, "2024-01-03": 1}


def test_streaming_hourly_anomaly_equals_batch(spark, tmp_path):
    """Closed-cell streaming hourly anomaly must equal the batch
    hourly_baseline_outliers row-for-row when the baselines are fit on
    the same history: the stream adds only the watermark lifecycle, not
    semantics.  The spike hour (20 events vs a baseline median of ~2)
    must flag in BOTH."""
    from grower_spark.operators.anomaly import (
        hourly_baselines_from_cells,
        hourly_baseline_outliers,
        hourly_cells,
    )
    from grower_spark.streaming.stateful import streaming_hourly_anomaly

    rows = []
    # 6 quiet days: type "a" sees 2-3 events in the 09:00 hour (the
    # alternation keeps the baseline MAD nonzero — perfectly uniform
    # history would have MAD 0, which by contract flags nothing) and 1
    # at 17:00
    for d in range(1, 7):
        rows += [(1, f"2024-01-0{d} 09:10:00", "a"),
                 (2, f"2024-01-0{d} 09:40:00", "a"),
                 (1, f"2024-01-0{d} 17:05:00", "a")]
        if d % 2 == 0:
            rows.append((3, f"2024-01-0{d} 09:50:00", "a"))
    # day 7: a 20-event spike in the 09:00 hour
    spike = [(10 + i, f"2024-01-07 09:{i:02d}:00", "a") for i in range(20)]
    sentinel = [(99, "2024-01-20 00:00:00", "zzz")]  # closes everything real
    _write_events(spark, str(tmp_path / "ha" / "b1"), rows)
    _write_events(spark, str(tmp_path / "ha" / "b2"), spike)
    _write_events(spark, str(tmp_path / "ha" / "b3"), sentinel)

    batch = spark.read.schema("user_id long, ts timestamp, event_type string") \
        .parquet(str(tmp_path / "ha" / "b1"), str(tmp_path / "ha" / "b2"))
    baselines = hourly_baselines_from_cells(hourly_cells(batch))
    want = {tuple(r) for r in hourly_baseline_outliers(batch).collect()}
    # sanity: the spike actually flags in batch
    assert any(r[1] == "2024-01-07" and r[2] == 9 and r[6] == 1 for r in want)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "ha" / "*"))
    )
    q = (
        streaming_hourly_anomaly(stream, baselines, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("shourly")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ha"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.sql("select * from shourly").collect()
           if r["event_type"] != "zzz"}
    assert got == want


def test_streaming_drift_bins_equals_batch(spark, tmp_path):
    """Each watermark-closed window's drift rows must match the batch
    distribution_drift_bins run over (old snapshot, that window's rows):
    same bins, same counts, bit-equal shares and chi-square
    contributions — the streaming side adds only the window lifecycle."""
    from grower_spark.operators.diff import distribution_drift_bins
    from grower_spark.streaming.stateful import streaming_drift_bins

    old = spark.createDataFrame(
        [(i % 1000,) for i in range(200)], "score long"
    )
    # one real ingestion hour: a distribution skewed to the top bins
    win_rows = [(i, "2024-01-01 09:%02d:00" % (i % 60), 900 + (i % 100))
                for i in range(80)]
    win_rows += [(100 + i, "2024-01-01 09:30:00", 50) for i in range(20)]
    sentinel = [(999, "2024-01-02 00:00:00", 10)]

    def write(path, rows):
        spark.createDataFrame(
            rows, ["doc_id", "ts_str", "score"]
        ).select(
            "doc_id", F.col("ts_str").cast("timestamp").alias("ts"), "score"
        ).coalesce(1).write.mode("overwrite").parquet(path)

    write(str(tmp_path / "dr" / "b1"), win_rows)
    write(str(tmp_path / "dr" / "b2"), sentinel)

    new_batch = spark.createDataFrame(
        [(r[2],) for r in win_rows], "score long"
    )
    batch = distribution_drift_bins(old, new_batch)
    # NO n_new>0 filter: the old snapshot covers all 10 bins while the
    # window hits only bins 0 and 9, so bins 1-8 are VANISHED classes
    # (share_new=0, contrib=share_old — the strongest drift signal) and
    # the streaming side must emit them too (r9 advice: the old filter
    # masked exactly these rows on both sides of this comparison)
    want = {
        (r.bin, r.n_new, r.share_new, r.drift_contrib)
        for r in batch.collect()
    }
    assert any(n == 0 for (_, n, _, _) in want)  # non-vacuous: vanished bins
    baseline = batch.select("bin", "share_old")

    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, score long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "dr" / "*"))
    )
    q = (
        streaming_drift_bins(stream, baseline)
        .writeStream.format("memory")
        .queryName("sdrift")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.bin, r.n_new, r.share_new, r.drift_contrib)
        for r in spark.sql(
            "select * from sdrift where win_start = '2024-01-01 09:00:00'"
        ).collect()
    }
    # streaming emits the FULL fixed alphabet per window; batch's outer
    # join emits only bins present in old ∪ new.  On that union the rows
    # must be identical, and the streaming-only rows are exactly the
    # all-zero fillers (n_new=0, share_new=0, no baseline -> contrib NULL)
    want_bins = {b for (b, _, _, _) in want}
    assert {t for t in got if t[0] in want_bins} == want
    assert all(
        t[1] == 0 and t[2] == 0.0 and t[3] is None
        for t in got if t[0] not in want_bins
    )
    # the vanished class itself (bin 1: in the baseline, absent from the
    # window) surfaces with contrib == share_old — the signal the old
    # n_new>0 filter dropped
    vanished = [t for t in got if t[0] == 1]
    assert vanished == [(1, 0, 0.0, 0.5)]


def test_streaming_weighted_sample_equals_batch(spark, tmp_path):
    """The literal-W filter must keep exactly the batch sample's rows when
    given the batch aggregate's W — on a readStream source."""
    from grower_spark.operators.sampling import (
        weighted_poisson_sample,
        weighted_sample_filter,
    )

    rows = [(i, (i % 9) * 100 + 10) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    w_total = sum(r[1] for r in rows)
    want = sorted(
        r.doc_id for r in
        weighted_poisson_sample(df, "w", target_rows=100).collect()
    )
    path = str(tmp_path / "ws")
    df.coalesce(2).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema("doc_id long, w long").parquet(path)
    q = (
        weighted_sample_filter(stream, "w", 100, w_total)
        .writeStream.format("memory")
        .queryName("swsample")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r.doc_id for r in spark.sql("select doc_id from swsample").collect()
    )
    assert got == want


def test_streaming_contamination_monitor_equals_batch(spark, tmp_path):
    """Per closed window the monitor's n_contaminated must equal the
    count of docs contamination_hits flags on the same rows — the
    plan-literal flag and the broadcast-join batch op agree doc-for-doc."""
    from grower_spark.operators.decontam import (
        benchmark_ngrams,
        contamination_hits,
    )
    from grower_spark.streaming.stateful import (
        streaming_contamination_monitor,
    )

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    win_rows = [
        (1, "2024-01-01 09:01:00",
         "prefix alpha beta gamma delta epsilon zeta eta theta suffix"),
        (2, "2024-01-01 09:02:00", "totally clean document content here"),
        (3, "2024-01-01 09:03:00",
         "another alpha beta gamma delta epsilon zeta eta theta hit"),
        (4, "2024-01-01 09:04:00", None),
    ]
    sentinel = [(9, "2024-01-02 00:00:00", "late window closer text")]

    def write(path, rows):
        spark.createDataFrame(
            rows, ["doc_id", "ts_str", "text"]
        ).select(
            "doc_id", F.col("ts_str").cast("timestamp").alias("ts"), "text"
        ).coalesce(1).write.mode("overwrite").parquet(path)

    write(str(tmp_path / "cm" / "b1"), win_rows)
    write(str(tmp_path / "cm" / "b2"), sentinel)

    batch_docs = spark.createDataFrame(
        [(r[0], r[2]) for r in win_rows], "doc_id long, text string"
    )
    want_contaminated = contamination_hits(batch_docs, bench, n=8).count()
    assert want_contaminated == 2  # sanity: docs 1 and 3

    hashes = [r.gram_h for r in benchmark_ngrams(bench, n=8).collect()]
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "cm" / "*"))
    )
    q = (
        streaming_contamination_monitor(stream, hashes, n=8)
        .writeStream.format("memory")
        .queryName("scontam")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_cm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.win_start.isoformat(): (r.n_docs, r.n_contaminated)
        for r in spark.sql("select * from scontam").collect()
    }
    assert got["2024-01-01T09:00:00"] == (4, want_contaminated)


def test_streaming_contamination_monitor_rejects_empty_hashes(spark):
    """An empty gram list would build a void-typed F.array() whose
    arrays_overlap fails analysis mid-stream — reject it upfront."""
    import pytest

    from grower_spark.streaming.stateful import (
        streaming_contamination_monitor,
    )

    df = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    ).withColumn("ts", F.current_timestamp())
    with pytest.raises(ValueError, match="bench_gram_hashes is empty"):
        streaming_contamination_monitor(df, [])
