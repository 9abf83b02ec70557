"""Custom stateful streaming operator: session windows via
applyInPandasWithState (SURVEY.md §2.8 — the Spark-native home for the
reference's stateful behaviors like rate limiting and crawl-frontier state).

Sessionizes an event stream per user with an inactivity gap: a session
closes when no event arrives within `gap_seconds` (processing-time timeout).
Emits one row per closed session. The batch twin (same semantics, lag-based)
is __spark_entry__._q_events_sessions, which IS oracle-checked — this module
is the streaming cadence of the same operator.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
# start/end are EPOCH MICROSECONDS: sub-second event times must survive the
# state round-trip — flooring to whole seconds would shift gap decisions and
# the emitted session bounds. Converted to timestamps only at output.
SESSION_STATE_SCHEMA = "start long, end long, n long"


def sessionize(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator. State = (start_epoch, end_epoch, count);
    emits the session when the processing-time timeout fires."""
    (user_id,) = key
    if state.hasTimedOut:
        start, end, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(end, unit="us")],
                "n_events": [n],
            }
        )
        return

    start, end, n = state.get if state.exists else (None, None, 0)
    for batch in batches:
        ts = batch["ts"].astype("int64") // 1_000  # ns -> us
        if len(ts) == 0:
            continue
        lo, hi = int(ts.min()), int(ts.max())
        start = lo if start is None else min(start, lo)
        end = hi if end is None else max(end, hi)
        n += len(ts)
    if n:
        state.update((start, end, n))
        state.setTimeoutDuration(10_000)  # 10 s processing-time inactivity
    yield pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "session_start": pd.Series([], dtype="datetime64[ns]"),
            "session_end": pd.Series([], dtype="datetime64[ns]"),
            "n_events": pd.Series([], dtype="int64"),
        }
    )


def sessionized_stream(events):
    """events(user_id, ts, ...) streaming DF -> closed-session rows."""
    return events.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def make_event_time_sessionizer(gap_seconds: int = 1800):
    """EVENT-time sessionizer: sessions split on event-time gaps (in-batch
    splits emit immediately; the trailing open session is kept in state with
    an event-time timeout at session_end + gap, fired by WATERMARK advance,
    not wall clock). Use on a stream with withWatermark('ts', ...). The
    processing-time form above reacts to arrival lulls; this one is
    deterministic in event time — replaying the same input yields the same
    sessions."""

    def sessionize_event_time(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def frame(sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([user_id] * len(sessions), dtype="int64"),
                    "session_start": pd.Series(
                        [pd.Timestamp(s, unit="us") for s, _e, _n in sessions],
                        dtype="datetime64[ns]",
                    ),
                    "session_end": pd.Series(
                        [pd.Timestamp(e, unit="us") for _s, e, _n in sessions],
                        dtype="datetime64[ns]",
                    ),
                    "n_events": pd.Series([n for _s, _e, n in sessions], dtype="int64"),
                }
            )

        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield frame([(start, end, n)])
            return

        all_ts: list[int] = []
        for batch in batches:
            all_ts.extend(int(v) for v in (batch["ts"].astype("int64") // 1_000))
        all_ts.sort()

        gap_us = gap_seconds * 1_000_000
        cur = list(state.get) if state.exists else None
        closed: list[tuple[int, int, int]] = []
        for t in all_ts:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] <= gap_us:
                cur[1] = max(cur[1], t)
                cur[2] += 1
            else:
                closed.append(tuple(cur))
                cur = [t, t, 1]
        if cur is not None:
            state.update(tuple(cur))
            # timeout API takes epoch milliseconds
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        yield frame(closed)

    return sessionize_event_time


def sessionized_stream_event_time(events, gap_seconds: int = 1800, watermark: str = "10 seconds"):
    """events(user_id, ts) streaming DF -> event-time session rows (closed
    by in-stream gaps immediately, by watermark-fired timeout otherwise)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_event_time_sessionizer(gap_seconds),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
