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
                "session_start": [pd.Timestamp(start, unit="s")],
                "session_end": [pd.Timestamp(end, unit="s")],
                "n_events": [n],
            }
        )
        return

    start, end, n = state.get if state.exists else (None, None, 0)
    for batch in batches:
        ts = batch["ts"].astype("int64") // 1_000_000_000
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
