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

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, n_events BIGINT"
)
STATE_SCHEMA = "start_us BIGINT, end_us BIGINT, n BIGINT"

_GAP_MS = 30 * 60 * 1000  # 30 min inactivity closes a session


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

    for pdf in pdfs:
        for ts in sorted(pdf["ts"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if start_us is None:
                start_us, end_us, n = ts_us, ts_us, 1
            elif ts_us - end_us > _GAP_MS * 1000:
                closed.append((start_us, end_us, n))
                start_us, end_us, n = ts_us, ts_us, 1
            else:
                end_us, n = ts_us, n + 1

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
