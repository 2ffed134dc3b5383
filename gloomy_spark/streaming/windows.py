"""Streaming event analytics: watermarked windowed aggregation and a
custom stateful operator (gap sessionization) on applyInPandasWithState.

These are the streaming twins of the batch entries `event_window_counts`
and `event_sessions` (entry_queries.py) — equality with the batch
results is asserted in tests, which is the strongest correctness
statement a streaming op can make (same input → same answer as batch).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events int"
)
_STATE_SCHEMA = "start long, last long, n int"


def windowed_event_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream.
    Late rows beyond the watermark are dropped; in append mode a window
    emits once, when the watermark passes its end — the standard Spark
    late-data story, no custom state needed."""
    return (
        stream.withWatermark("ts", watermark)
        # group by the window STRUCT (extracting .start here would break
        # the watermark→aggregation link Spark requires for append mode)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def sessionize_stream(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization as a CUSTOM STATEFUL operator
    (applyInPandasWithState): per user, events within `gap_minutes` of
    each other belong to one session; a session is emitted when the gap
    is exceeded by a later event or when the event-time timeout fires
    (watermark passed last_event + gap). State per user is three ints —
    bounded regardless of stream length."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000  # state holds epoch MICROseconds

    def _frame(user_id, sessions):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
                "n_events": [n for _, _, n in sessions],
            }
        )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield _frame(user_id, [(start, last, n)])
            return
        ts = sorted(
            int(t.value // 1000)  # ns → µs, full precision
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"])
        )
        if not ts:
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0], 0
        out = []
        for t in ts:
            if t - last > gap_us:
                out.append((start, last, n))
                start, n = t, 0
            last = max(last, t)
            n += 1
        state.update((start, last, n))
        # close via event-time timeout once the watermark passes last+gap
        state.setTimeoutTimestamp((last + gap_us) // 1000)
        if out:
            yield _frame(user_id, out)

    return (
        stream.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
