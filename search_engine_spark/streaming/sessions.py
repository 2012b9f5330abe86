"""Custom stateful streaming operator: event-time sessionization via
applyInPandasWithState (SURVEY.md 2.10 extension; the batch analogue
is entry_queries.q_sessionization).

Each user's events are grouped into sessions separated by > gap
minutes of inactivity. Closed sessions are emitted in append mode;
the open tail of each user's stream lives in GroupState (one small
tuple per user — state is O(active users), not O(events)) and is
flushed either by the next batch that closes it or by an event-time
timeout once the watermark passes last_ts + gap.

Scale notes: state is hash-partitioned by user_id across executors;
the per-group kernel is numpy on the group's batch (no per-row Python
over the stream — the segment walk is per-session, and sessions per
batch per user are few).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start double, last_ts double, n long"


def _session_fn(gap_s: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])

        def mk(rows: list[tuple]) -> pd.DataFrame:
            return pd.DataFrame(
                rows, columns=["user_id", "session_start", "session_end", "n_events"]
            ).astype(
                {
                    "user_id": "int64",
                    "session_start": "datetime64[us]",
                    "session_end": "datetime64[us]",
                    "n_events": "int64",
                }
            )

        def row(start_us: float, end_us: float, n: int) -> tuple:
            # timestamps carried as integral microseconds (exact in
            # float64 up to 2^53 — no sub-us rounding drift)
            return (
                user_id,
                pd.Timestamp(int(start_us), unit="us"),
                pd.Timestamp(int(end_us), unit="us"),
                int(n),
            )

        if state.hasTimedOut:
            start, last_ts, n = state.get
            state.remove()
            yield mk([row(start, last_ts, n)])
            return

        parts = [pdf for pdf in pdfs if len(pdf)]
        ts = (
            np.sort(
                np.concatenate(
                    [p["ts"].to_numpy("datetime64[us]").astype("int64") for p in parts]
                )
            ).astype(np.float64)  # integral us, exact in float64
            if parts
            else np.empty(0)
        )
        out: list[tuple] = []
        if state.exists:
            start, last_ts, n = state.get
        else:
            start, last_ts, n = None, None, 0

        gap_us = gap_s * 1e6
        if ts.size:
            # session boundaries: gap exceeded between consecutive events
            brk = np.flatnonzero(np.diff(ts) > gap_us)
            seg_starts = np.concatenate(([0], brk + 1))
            seg_ends = np.concatenate((brk, [ts.size - 1]))
            for i, (s, e) in enumerate(zip(seg_starts, seg_ends)):
                seg_start, seg_end, seg_n = ts[s], ts[e], int(e - s + 1)
                if i == 0 and start is not None:
                    if seg_start - last_ts <= gap_us:
                        # continues the open session from state
                        seg_start, seg_n = start, n + seg_n
                    else:
                        out.append(row(start, last_ts, n))  # state session closed
                if i < len(seg_starts) - 1:
                    out.append(row(seg_start, seg_end, seg_n))
                else:
                    start, last_ts, n = seg_start, seg_end, seg_n  # stays open

        if last_ts is not None:
            state.update((float(start), float(last_ts), int(n)))
            # flush the open tail once the watermark passes last_ts + gap
            # (clamped: a tail already behind the watermark times out at
            # the next opportunity — Spark rejects timestamps in the past)
            timeout_ms = max(
                int((last_ts + gap_us) / 1000), state.getCurrentWatermarkMs() + 1
            )
            state.setTimeoutTimestamp(timeout_ms)
        if out:
            yield mk(out)

    return fn


def streaming_sessionize(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: float = 30.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """events stream -> closed sessions (append mode)."""
    src = events.withWatermark(ts_col, watermark).select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts")
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60.0),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
