"""Custom stateful streaming operator: per-key session/gap detection.

The reference's gap detector (M4, clickhouse_gap_detector.py:57-193) is a
batch set-difference at month granularity. The streaming-native
generalization is a **session operator**: ticks for an instrument belong to
one trading session until a silence gap exceeds ``gap_seconds``; a session
is emitted when it closes (a longer gap arrives, or state times out).

This is exactly the shape Spark's ``applyInPandasWithState`` exists for
(arbitrary per-key state the built-in window/session aggregates can't
express — here the emitted row carries open/close prices, not just
bounds). State per key is O(1): (session_start, last_ts, first/last price,
count) — a 1000-executor job holds one tiny struct per instrument.

Batch differential: on a static frame the same semantics are expressible
with a lag-window session id (``tests/test_streaming.py`` and the
``session_gaps`` registry entry check the streaming operator against that
SQL-expressible twin).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("instrument", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_ticks", LongType()),
        StructField("open", DoubleType()),
        StructField("close", DoubleType()),
    ]
)

# state: (start_us, last_us, n, open, close) — epoch micros keep the state
# tuple primitive (GroupState round-trips plain Python values).
_STATE_SCHEMA = "start BIGINT, last BIGINT, n BIGINT, open DOUBLE, close DOUBLE"


def _sessionize(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_us: int,
    timeout_ms: int | None,
) -> Iterator[pd.DataFrame]:
    instrument = key[0]

    if state.hasTimedOut:
        start, last, n, op, cl = state.get
        state.remove()
        yield _emit(instrument, start, last, n, op, cl)
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    sessions: list[tuple] = []
    cur = list(state.get) if state.exists else None
    if len(rows):
        rows = rows.sort_values("timestamp", kind="mergesort")
        ts_us = (rows["timestamp"].astype("int64") // 1000).to_numpy()
        px = rows["bid"].astype("float64").to_numpy()
        for t, p in zip(ts_us, px):
            t, p = int(t), float(p)
            if cur is None:
                cur = [t, t, 1, p, p]
            elif t - cur[1] > gap_us:
                sessions.append(tuple(cur))
                cur = [t, t, 1, p, p]
            elif cur[0] - t > gap_us:
                # older than the open by more than the gap: it belongs
                # to an already-closed epoch — emit it as its own
                # degenerate session rather than stretch the current one
                # across a silence that DID happen
                sessions.append((t, t, 1, p, p))
            elif t < cur[0]:
                # cross-batch late arrival BEFORE the open (review find:
                # sorting fixes only intra-batch order): extend the
                # session backwards — it becomes the open, never rewinds
                # session_end/close
                cur[0] = t
                cur[2] += 1
                cur[3] = p
            elif t < cur[1]:
                # late arrival inside the session: counts, but the
                # newest-by-event-time tick keeps close and last_ts
                cur[2] += 1
            else:
                cur[1] = t
                cur[2] += 1
                cur[4] = p
    if cur is not None:
        state.update(tuple(cur))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
    if sessions:
        yield pd.concat(
            [_emit(instrument, *s) for s in sessions], ignore_index=True
        )


def _emit(instrument, start_us, last_us, n, op, cl) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "instrument": [instrument],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_ticks": [n],
            "open": [op],
            "close": [cl],
        }
    )


def stateful_gap_sessions(
    ticks: DataFrame,
    gap_seconds: float = 300.0,
    key: str = "instrument",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming session detection over a tick stream.

    Emits one row per CLOSED session — a newer tick arrived more than
    ``gap_seconds`` after the session's last tick. The trailing open
    session stays in state (exactly-once emission; state-store
    checkpointing covers restarts).

    ``idle_timeout_ms``: optionally also close sessions after that much
    processing-time silence (long-running production streams). Leave None
    for bounded drains — with a timeout armed, ``availableNow`` runs
    keep scheduling micro-batches until the timeout fires.
    """
    gap_us = int(gap_seconds * 1_000_000)
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return ticks.groupBy(key).applyInPandasWithState(
        lambda key, pdfs, state: _sessionize(
            key, pdfs, state, gap_us, idle_timeout_ms
        ),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
