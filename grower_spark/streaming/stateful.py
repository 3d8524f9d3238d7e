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
        state.update((start_us, end_us, n))
        # event-time timeout: close the open session once the watermark
        # passes its end by the gap
        state.setTimeoutTimestamp(end_us // 1000 + gap_seconds * 1000)
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
