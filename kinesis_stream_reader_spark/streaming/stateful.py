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

# Idempotent protobuf shim at module level: when a TWS processor class
# is unpickled inside a Python worker this module imports first, so the
# shim lands on sys.path before the worker touches the pb2 state
# protocol — covering workers even when the JVM env predates the shim
# (e.g. the correctness driver's own session).
from ..session import HAVE_PROTOBUF, ROCKSDB_PROVIDER  # noqa: F401

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
    """events (streaming) -> closed sessions per user.

    This is the ARBITRARY-STATE API DEMO, not the default
    sessionization path: per-group state lives in Python, so every
    micro-batch pays an Arrow round-trip plus a pandas loop per user —
    the one non-codegen stateful hot loop in the repo. The 100 TB
    default is `sessionize_native` below (JVM session_window
    aggregation, whole-stage codegen, mergeable partial aggregation);
    reach for this shape only when per-session logic genuinely exceeds
    an aggregate (model scoring inside the session, rolling custom
    payloads)."""
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


PROFILE_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, first_seen TIMESTAMP, last_seen TIMESTAMP"
)


class RunningProfileProcessor:
    """transformWithStateInPandas processor (Spark 4 arbitrary-state
    API): maintains one ValueState row per user — cumulative event
    count plus first/last seen timestamps — and emits the updated
    profile once per (user, micro-batch).

    Counts and timestamps only (exact integers): the emitted profile
    is reproducible regardless of batch slicing, which is what lets
    the batch oracle check the drained stream bit-for-bit. Versus
    applyInPandasWithState: state here is named and typed per field,
    timers are explicit, and the runtime can evict/checkpoint each
    state variable independently — the API Spark 4 positions for
    custom stateful operators.

    NOTE: executing this operator requires `google.protobuf` (the
    TWS Python worker speaks a protobuf state-server protocol) and the
    RocksDB state store provider (TWS state uses multiple column
    families, which the HDFS-backed default rejects). session.py's
    gated shim supplies protobuf from the image's google-cloud-sdk
    bundle, so the pytest coverage runs for real in this sandbox; the
    op stays out of the driver-checked queries() registry because the
    driver's own JVM may predate the shim's PYTHONPATH."""

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "profile", "n BIGINT, first_us BIGINT, last_us BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        n, first_us, last_us = 0, None, None
        if self._state.exists():
            n, first_us, last_us = self._state.get()
        for pdf in rows:
            ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            if len(ts_us) == 0:
                continue
            n += len(ts_us)
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        if first_us is None:
            return iter(())
        self._state.update((n, first_us, last_us))
        out = pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "first_seen": [pd.Timestamp(first_us, unit="us")],
                "last_seen": [pd.Timestamp(last_us, unit="us")],
            }
        )
        return iter((out,))

    def close(self) -> None:
        pass


def running_profiles(events: DataFrame) -> DataFrame:
    """events (streaming) -> per-(user, batch) updated running profiles."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclassing at call time keeps the module importable even if a
    # future build moves the ABC; the processor itself is duck-typed
    cls = type("_Proc", (StatefulProcessor,), dict(RunningProfileProcessor.__dict__))
    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=cls(),
            outputStructType=PROFILE_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
