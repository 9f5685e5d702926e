"""Custom stateful streaming operator: user sessionization via
applyInPandasWithState.

The reference has no stateful operators (SURVEY.md §2.10) — this is the
extension shape for semantics Spark's built-ins can't express: group
events into per-user sessions that close after `gap` of event-time
inactivity, emitting one row per closed session.

Scale notes: state is per-user (bounded by the watermark-driven timeout,
not by history); Arrow-batched transfer; the shuffle is the normal
groupBy hash partition on user_id. For the built-in-only variant of the
same semantics, see F.session_window (operators/relational.py users can
prefer it when no custom per-session logic is needed).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, n_events BIGINT"
)
STATE_SCHEMA = "start_us BIGINT, end_us BIGINT, n BIGINT"

_GAP_MS = 30 * 60 * 1000  # 30 min inactivity closes a session


def _runs(ts_sorted_us: np.ndarray, gap_us: int) -> Iterator[tuple[int, int, int]]:
    """Split a sorted int64 timestamp array into gap-delimited runs,
    yielding (start, end, count) per run."""
    if len(ts_sorted_us) == 0:
        return
    breaks = np.where(np.diff(ts_sorted_us) > gap_us)[0]
    starts = np.concatenate(([0], breaks + 1))
    ends = np.concatenate((breaks, [len(ts_sorted_us) - 1]))
    for s, e in zip(starts, ends):
        yield int(ts_sorted_us[s]), int(ts_sorted_us[e]), int(e - s + 1)


def _sessionize(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold new events into the open session; emit closed sessions."""
    (user_id,) = key
    if state.hasTimedOut:
        start_us, end_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
            }
        )
        return

    closed: list[tuple[int, int, int]] = []
    if state.exists:
        start_us, end_us, n = state.get
    else:
        start_us = end_us = n = None

    # vectorized gap detection: sort once, break where diff > gap,
    # reduce each run to (min, max, count) — no per-event Python loop
    arrays = [
        pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64") for pdf in pdfs
    ]
    ts_us_all = np.sort(np.concatenate(arrays)) if arrays else np.empty(0, dtype="int64")
    for chunk_start, chunk_end, chunk_n in _runs(ts_us_all, _GAP_MS * 1000):
        if start_us is None:
            start_us, end_us, n = chunk_start, chunk_end, chunk_n
        elif chunk_start - end_us > _GAP_MS * 1000:
            closed.append((start_us, end_us, n))
            start_us, end_us, n = chunk_start, chunk_end, chunk_n
        else:
            end_us, n = chunk_end, n + chunk_n

    if start_us is not None:
        state.update((start_us, end_us, n))
        state.setTimeoutTimestamp(end_us // 1000 + _GAP_MS)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """events (streaming) -> closed sessions per user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
