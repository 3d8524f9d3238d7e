"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful processing at all (SURVEY.md §2.5); these are
the engine-capability extensions for stream analytics over the parsed
events: watermarked tumbling-window aggregation (pure built-ins) and a
gap-based streaming sessionizer with explicit per-key state + event-time
timeout.

Scale shape: state lives in the state store partitioned by the group key;
the only shuffle is on that key.  The sessionizer's state per key is O(1)
(current session bounds + counters), so state size is bounded by key
cardinality, not event volume.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts (late rows beyond the watermark
    are dropped; append mode emits a window once the watermark passes it)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


def _make_session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [[user_id, start_us, end_us, n]],
                columns=["user_id", "session_start_us", "session_end_us", "n_events"],
            )
            return
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(int(v) for v in pdf["ts_us"])
        ts_list.sort()
        closed: list[list[int]] = []
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us = end_us = ts_list[0]
            n = 0
            ts_list = ts_list[:]  # first event counted in loop
        for t in ts_list:
            if t - end_us > gap_us:
                closed.append([user_id, start_us, end_us, n])
                start_us = t
                n = 0
            end_us = max(end_us, t)
            n += 1
        # event-time timeout: close the open session once the watermark
        # passes its end by the gap.  If the watermark ALREADY passed it
        # (an old-session user touched by a later batch), registering the
        # timer would throw INVALID_TIMEOUT_TIMESTAMP — and the session is
        # semantically over (sub-watermark rows are dropped at the
        # operator, nothing can extend it): close it now.
        timeout_ms = end_us // 1000 + gap_seconds * 1000
        if timeout_ms <= state.getCurrentWatermarkMs():
            closed.append([user_id, start_us, end_us, n])
            state.remove()
        else:
            state.update((start_us, end_us, n))
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_us", "session_end_us", "n_events"],
            )

    return fn


def streaming_sessionize(events: DataFrame, gap_seconds: int = 1800,
                         watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessionization over a stream: custom per-user state with
    event-time timeout.  ``events`` needs ``ts`` (timestamp) and
    ``user_id``; emits one row per *closed* session."""
    prepared = events.withWatermark("ts", watermark).withColumn(
        "ts_us", F.unix_micros("ts")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- sessionized funnel over a stream (r9, VERDICT r8 item 5) ---------------

FUNNEL_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("funnel_depth", T.IntegerType()),
    ]
)

_FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("adv_us", T.LongType()),
    ]
)

_T_NEG_INF_US = -(1 << 62)


def _make_session_funnel_fn(gap_seconds: int, steps: list[str]):
    gap_us = gap_seconds * 1_000_000
    n_steps = len(steps)
    step_index = {s: i for i, s in enumerate(steps)}
    cols = ["user_id", "session_start_us", "session_end_us", "n_events",
            "funnel_depth"]

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, depth, _adv = state.get
            state.remove()
            yield pd.DataFrame([[user_id, start_us, end_us, n, depth]],
                               columns=cols)
            return
        evs: list[tuple[int, str]] = []
        for pdf in pdfs:
            evs.extend(
                (int(t), str(e)) for t, e in zip(pdf["ts_us"], pdf["e"])
            )
        evs.sort()  # (ts, type) — the same tie order as the batch
        # array_sort(struct(t, e)) fold
        closed: list[list] = []
        if state.exists:
            start_us, end_us, n, depth, adv_us = state.get
        else:
            start_us = end_us = evs[0][0]
            n, depth, adv_us = 0, 0, _T_NEG_INF_US
        for t, e in evs:
            if t - end_us > gap_us:
                closed.append([user_id, start_us, end_us, n, depth])
                start_us, n, depth, adv_us = t, 0, 0, _T_NEG_INF_US
            end_us = max(end_us, t)
            n += 1
            if depth < n_steps and step_index.get(e) == depth and t > adv_us:
                depth += 1
                adv_us = t
        # A timeout below the current watermark is ILLEGAL to register —
        # and semantically the session is already over: the operator drops
        # sub-watermark input rows, so nothing can extend a session whose
        # end + gap the watermark has passed.  Close it now instead of
        # waiting for a timer that could never be set.
        timeout_ms = end_us // 1000 + gap_seconds * 1000
        if timeout_ms <= state.getCurrentWatermarkMs():
            closed.append([user_id, start_us, end_us, n, depth])
            state.remove()
        else:
            state.update((start_us, end_us, n, depth, adv_us))
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(closed, columns=cols)

    return fn


def streaming_session_funnel(events: DataFrame, steps: list[str],
                             gap_seconds: int = 1800,
                             watermark: str = "1 hour") -> DataFrame:
    """Sessionized funnel over a stream: the batch
    ``operators.funnel.sessionized_funnel_depth`` semantics (gap-based
    sessions over ALL events; within each session a single left-to-right
    fold advancing on ``steps`` in order, each strictly after the last
    advance) run incrementally with per-user state + event-time timeout.
    Emits one row per CLOSED session (in-batch gap or watermark timeout):
    ``(user_id, session_start_us, session_end_us, n_events,
    funnel_depth)``.

    State per key is O(len(steps)) — session bounds, counters, the fold
    cursor — so the store is bounded by user cardinality, not event
    volume (the applyInPandasWithState analog of the batch one-shuffle
    plan; the only shuffle is on user_id).

    Ordering contract: the fold is exact when each user's events arrive
    in non-decreasing event-time order ACROSS micro-batches (within a
    batch they are sorted here).  An intra-session event that arrives in
    a later batch with an earlier timestamp still extends/keeps the
    session alive and is counted, but cannot retroactively advance a
    fold the cursor already passed — the standard incremental-fold
    trade; exact replay is the batch operator's job.  ``events`` needs
    ``ts`` (timestamp), ``user_id`` and ``event_type``.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    prepared = events.withWatermark("ts", watermark).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_type").alias("e"),
        "ts",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_session_funnel_fn(gap_seconds, list(steps)),
        outputStructType=FUNNEL_SESSION_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_dau(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Exact streaming DAU: per calendar day, the distinct active users —
    the streaming twin of ``operators.retention.active_user_stats``'s
    ``dau`` column (WAU's trailing window wants the batch replay; its
    explode trick composes here too but stacks a third stateful
    operator, so the panel's streaming surface is DAU + stickiness
    downstream).

    Streaming has no ``count(DISTINCT)``; the supported composition is
    two chained stateful operators: ``dropDuplicatesWithinWatermark`` on
    (user_id, day) — state bounded by active (user, day) pairs inside
    the watermark, exactly the dedup the batch ``.distinct()`` does —
    into a watermarked 1-day tumbling count, emitted in append mode once
    the watermark passes the day.  ``events`` needs ``ts`` + ``user_id``.

    Output: ``(day yyyy-MM-dd string, dau bigint)`` per closed day.
    """
    deduped = (
        events.withWatermark("ts", watermark)
        .select("ts", F.to_date("ts").alias("day"), "user_id")
        .dropDuplicatesWithinWatermark(["user_id", "day"])
    )
    return (
        deduped.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("dau"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "dau",
        )
    )


def streaming_hourly_anomaly(events: DataFrame, baselines: DataFrame,
                             z_cut: float = 3.0,
                             watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of
    ``operators.anomaly.hourly_baseline_outliers``: the diurnal
    (type, hour-of-day) median/MAD baselines are fit OFFLINE on a
    trusted history window (``hourly_baselines_from_cells`` — the
    model step; percentile aggregation can't run inside an unbounded
    stream), then each live hour cell is scored the moment the
    watermark closes it.

    Plan: one watermarked 1-hour tumbling count per (window, type) —
    the only stateful operator, state bounded by types × open windows —
    then a STREAM-STATIC broadcast join against the bounded
    (types × 24)-row baseline table and the same multiplied-out MAD
    comparison as batch.  Append mode: each (type, day, hod) row is
    emitted exactly once, when its hour closes.

    Output matches the batch op row-for-row on closed cells:
    ``(event_type, day, hod, n, med, mad, is_outlier)``.
    """
    from grower_spark.operators.anomaly import score_hourly_cells

    counts = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    cells = counts.select(
        "event_type",
        F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
        F.hour(F.col("w.start")).cast("int").alias("hod"),
        "n",
    )
    return score_hourly_cells(cells, baselines, z_cut=z_cut)


# --- transformWithState (Spark 4 native stateful API) -----------------------

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_centis", T.LongType()),
    ]
)


def _make_profile_processor(ttl_ms: int | None):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningProfileProcessor(StatefulProcessor):
        """Per-user running profile (event count + cent-scaled value sum).

        Spark-4 ``transformWithState`` processor: typed ValueState handle,
        optional state TTL (idle keys age out of the store — the unbounded-
        key-cardinality guard applyInPandasWithState lacks), one emitted
        row per key per batch that saw the key.  Cent-scaling keeps the
        running sum an exact bigint under any accumulation order.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "profile", "n LONG, total_centis LONG", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            prev = self._state.get()
            n, total = (prev[0], prev[1]) if prev is not None else (0, 0)
            for pdf in rows:
                n += len(pdf)
                total += int(pdf["value_centis"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value_centis": [total],
                }
            )

        def close(self) -> None:
            pass

    return RunningProfileProcessor()


def running_profile(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Streaming per-user running totals via ``transformWithStateInPandas``.

    ``events`` needs ``user_id`` and ``value`` (double); emits the updated
    (n_events, sum_value_centis) for each user touched by the batch.
    Requires the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass``) — transformWithState
    is implemented only there; the caller's session must set it before the
    query starts.  State per key is O(1); the only shuffle is on user_id.

    Env note (2026-08-14 r6): PySpark's transformWithState driver worker
    speaks protobuf to the JVM state server, and ``google.protobuf`` is
    not installed in this container (``ModuleNotFoundError: google``), so
    the query crashes at init here — the operator is correct Spark-4 API
    usage and the e2e test auto-skips until protobuf appears (same class
    of env block as PIL and the Kafka connector jar).  The
    applyInPandasWithState sessionizer above is the runnable stateful
    path in this environment.
    """
    prepared = events.withColumn(
        "value_centis", F.round(F.col("value") * 100).cast("long")
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_profile_processor(ttl_ms),
        outputStructType=PROFILE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def streaming_drift_bins(docs: DataFrame, baseline: DataFrame,
                         score_col: str = "score", ts_col: str = "ts",
                         window: str = "1 hour", watermark: str = "2 hours",
                         n_bins: int = 10, bin_width: int = 100) -> DataFrame:
    """Streaming twin of ``operators.diff.distribution_drift_bins``: the
    reference score distribution is fit OFFLINE on the release snapshot
    (``baseline`` = (bin, share_old) — model-sized, the lm_tail_filter
    contract), and each watermark-closed ingestion window is scored
    against it the moment it closes — "is what we're crawling TODAY
    shaped like the release?" as a live gate instead of a post-hoc diff.

    Plan: ONE stateful aggregation per window — the bins are a FIXED
    alphabet (0..n_bins-1), so the per-bin counts are n_bins conditional
    sums inside a single tumbling-window groupBy (a (window, bin) key
    would also work but doubles the state rows for no reason; chained
    windowed aggregations would need a second stateful operator).  The
    pivoted row explodes back to (bin, n_new) rows statelessly, joins the
    broadcast baseline, and applies the identical chi-square contribution
    arithmetic — bit-equal to batch on the same rows (pinned in pytest).

    Output per closed window × bin: ALL ``n_bins`` rows (the bins are a
    fixed alphabet and the pivoted row already holds every count) — a
    score class present in the baseline but ABSENT from a live window
    (share_new=0, contrib=share_old) is the strongest drift signal and
    must surface, not vanish (r9 advice: the old ``n_new > 0`` filter
    silently dropped exactly those rows).  Contrib NULL where the
    baseline share is 0 or the bin is missing from the baseline.
    """
    b = F.least(
        F.floor(F.col(score_col) / F.lit(bin_width)).cast("long"),
        F.lit(n_bins - 1),
    )
    aggs = [
        F.sum(F.when(b == i, 1).otherwise(0)).cast("long").alias(f"_b{i}")
        for i in range(n_bins)
    ]
    pivoted = (
        docs.where(F.col(score_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(*aggs, F.count(F.lit(1)).cast("long").alias("_tn"))
    )
    exploded = pivoted.select(
        F.col("w.start").alias("win_start"),
        "_tn",
        F.posexplode(F.array(*[F.col(f"_b{i}") for i in range(n_bins)]))
        .alias("bin", "n_new"),
    )
    share_n = F.col("n_new").cast("double") / F.col("_tn").cast("double")
    contrib = F.when(
        F.col("share_old") > 0,
        (share_n - F.col("share_old")) * (share_n - F.col("share_old"))
        / F.col("share_old"),
    )
    return (
        exploded.join(F.broadcast(baseline), "bin", "left")
        .select(
            "win_start",
            F.col("bin").cast("long").alias("bin"),
            "n_new",
            share_n.alias("share_new"),
            contrib.alias("drift_contrib"),
        )
    )


def streaming_contamination_monitor(docs: DataFrame,
                                    bench_gram_hashes: list[int],
                                    ts_col: str = "ts",
                                    text_col: str = "text",
                                    window: str = "1 hour",
                                    watermark: str = "2 hours",
                                    n: int = 8) -> DataFrame:
    """Live contamination monitor: per watermark-closed ingestion window,
    how many documents arrived and how many carry at least one benchmark
    n-gram — "is the crawler eating the eval set RIGHT NOW" as a gate
    that fires while the batch decontamination job is still hours away.

    The benchmark gram hashes are fit OFFLINE (``benchmark_ngrams`` +
    one bounded collect — eval sets are model-sized by contract, the
    same bound semantic_contamination's broadcast row lives under) and
    ride as a PLAN LITERAL array, so the per-row flag is a pure
    stateless ``arrays_overlap`` — no join, no shuffle before the single
    windowed aggregation.  Plan-literal guidance from decontam.py
    applies: beyond ~10^5 grams switch to the broadcast-join shape.

    NULL text flags clean (no grams).  Output per closed window:
    ``(win_start, n_docs, n_contaminated)``; batch-equals-streaming is
    pinned against contamination_hits in pytest.
    """
    from grower_spark.functions.hashing import md5_60
    from grower_spark.operators.dedup import shingles

    if not bench_gram_hashes:
        # F.array() with zero elements is a void-typed array and
        # arrays_overlap against array<long> fails analysis with an
        # unhelpful error mid-stream (r9 advice); an empty benchmark is
        # a caller bug — there is nothing to monitor for.
        raise ValueError(
            "bench_gram_hashes is empty: fit benchmark_ngrams first "
            "(an empty gram set would flag nothing, silently)"
        )
    gh = F.transform(
        shingles(F.col(text_col), n), lambda g: md5_60(g)
    )
    lit_set = F.array(
        *[F.lit(int(h)).cast("long") for h in sorted(set(bench_gram_hashes))]
    )
    flag = F.coalesce(
        F.arrays_overlap(gh, lit_set).cast("int"), F.lit(0)
    )
    return (
        docs.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(flag).cast("long").alias("n_contaminated"),
        )
        .select(
            F.col("w.start").alias("win_start"), "n_docs", "n_contaminated"
        )
    )
