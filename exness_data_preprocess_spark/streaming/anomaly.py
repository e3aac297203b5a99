"""Custom stateful streaming operator #2: per-key running-stats anomaly
flags.

Where the session operator (stateful.py) keeps *event-time* state, this
one keeps *numeric accumulator* state: per key, the count and sum of all
values seen so far; each incoming event is flagged when it deviates from
the key's prior running mean by more than a threshold — the online
feature-drift / outlier gate of a streaming feature pipeline.

Determinism contract (what makes this hash-checkable): values are
quantized to 6 decimals and carried as scaled int64 (v6 = round(v,6)·10⁶),
so the accumulators are exact integers and the flag comparison
|v6·n_prev − sum6_prev| > thr6·n_prev is pure integer arithmetic — no
float summation order anywhere, in either engine. The batch twin is an
expanding ROWS window (UNBOUNDED PRECEDING → 1 PRECEDING) over the same
ints.

State per key is two int64s — a 1000-executor job holds 16 bytes per key,
and the operator never buffers events (emit is 1:1 with input).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

ANOMALY_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("v6", LongType()),
        StructField("n_prev", LongType()),
        StructField("sum6_prev", LongType()),
        StructField("anomaly", LongType()),
    ]
)

_STATE_SCHEMA = "n BIGINT, sum6 BIGINT"


def _running_stats(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    thr6: int,
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    pdf = pd.concat(list(pdfs), ignore_index=True)
    # keyed groups arrive unordered within a micro-batch — impose the
    # deterministic (event time, id) order the batch twin uses
    pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
    n0, sum0 = state.get if state.exists else (0, 0)

    v6 = (pdf["value"].round(6) * 1_000_000).round().astype("int64").to_numpy()
    k = len(v6)
    n_prev = n0 + np.arange(k, dtype="int64")
    csum = np.concatenate(([0], np.cumsum(v6)[:-1]))
    sum6_prev = sum0 + csum
    # The deviation test multiplies by n_prev, which overflows int64 at
    # n ~ 9.2e6 events for values ~1e6 — numpy wraps silently and the
    # flag flips to garbage (review find). Python-object arithmetic is
    # arbitrary-precision; k per micro-batch is small, so the exactness
    # costs microseconds. (The EMITTED sum6_prev column stays BIGINT —
    # its own horizon is the cumulative sum at 2^63 µ-units ≈ 9.2e12 in
    # value units, vastly beyond the product's former overflow.)
    v6o, n_prev_o = v6.astype(object), n_prev.astype(object)
    sum6_prev_o = sum0 + np.concatenate(([0], np.cumsum(v6o)[:-1]))
    dev_exceeds = np.abs(v6o * n_prev_o - sum6_prev_o) > thr6 * n_prev_o
    anomaly = ((n_prev > 0) & dev_exceeds.astype(bool)).astype("int64")

    state.update((int(n0 + k), int(sum0 + v6.sum())))
    yield pd.DataFrame(
        {
            "event_id": pdf["event_id"].astype("int64"),
            "user_id": np.full(k, user_id, dtype="int64"),
            "ts_us": pdf["ts"].astype("int64") // 1000,  # ns → µs
            "n_prev": n_prev,
            "v6": v6,
            "sum6_prev": sum6_prev,
            "anomaly": anomaly,
        }
    )


def stateful_running_anomaly(
    events: DataFrame,
    key_col: str = "user_id",
    threshold: float = 250.0,
) -> DataFrame:
    """Flag events deviating from their key's prior running mean by more
    than ``threshold`` (in value units). Expects columns
    (event_id, user_id, ts, value)."""
    thr6 = int(round(threshold * 1_000_000))

    def fn(key, pdfs, state):
        return _running_stats(key, pdfs, state, thr6)

    return (
        events.select("event_id", key_col, "ts", "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=ANOMALY_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
