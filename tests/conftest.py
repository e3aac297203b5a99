"""Shared fixtures: one local SparkSession + synthetic tick streams with
every edge case from FIXTURES.md §6 (month boundary, missing month, minute
without standard ticks, single-tick minute, leading raw ticks, duplicate
keys, end-date boundary instants, DST transition, multiple instruments).
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from exness_data_preprocess_spark import get_spark
from exness_data_preprocess_spark.schema import TICK_SCHEMA


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


def _walk(rng: random.Random, t0: dt.datetime, n: int, level: float,
          max_step_s: float, spread: float | None) -> list[tuple[dt.datetime, float, float]]:
    rows, t, p = [], t0, level
    for _ in range(n):
        t += dt.timedelta(seconds=rng.uniform(0.5, max_step_s))
        p += rng.uniform(-1e-4, 1e-4)
        if spread is None:  # raw variant: ~98% zero spread
            sp = 0.0 if rng.random() < 0.98 else 2e-5
        else:
            sp = spread
        rows.append((t, p, p + sp))
    return rows


@pytest.fixture(scope="session")
def tick_fixture():
    """Deterministic two-instrument tick set, Jan + Mar 2024 (Feb missing),
    including a DST transition window (2024-03-10 America/New_York)."""
    rng = random.Random(1234)
    raw, std = [], []
    for inst, level in [("EURUSD", 1.08), ("XAUUSD", 2030.0)]:
        for start in [dt.datetime(2024, 1, 29, 20), dt.datetime(2024, 3, 9, 22)]:
            # spans a month boundary (Jan 29 -> Feb 1 would... stays in month,
            # runs ~8h so the Jan block crosses midnight into Jan 30)
            raw += [(inst, *r) for r in _walk(rng, start, 900, level, 30, None)]
            std += [(inst, *r) for r in
                    _walk(rng, start + dt.timedelta(seconds=40), 800, level, 34, 4e-5)]
    # leading raw ticks before ANY standard tick
    raw.append(("EURUSD", dt.datetime(2024, 1, 29, 19, 0, 0, 1), 1.0799, 1.0799))
    # single-tick minute, far from others
    raw.append(("EURUSD", dt.datetime(2024, 3, 11, 23, 59, 2), 1.0811, 1.0812))
    # duplicate (instrument, timestamp) rows
    raw.append(raw[0])
    raw.append(raw[1])
    # end-date boundary instants: exactly midnight (included by <=) and 1s after
    raw.append(("EURUSD", dt.datetime(2024, 3, 12, 0, 0, 0), 1.0801, 1.0801))
    raw.append(("EURUSD", dt.datetime(2024, 3, 12, 0, 0, 1), 1.0802, 1.0802))
    return raw, std


@pytest.fixture(scope="session")
def tick_dfs(spark, tick_fixture):
    raw, std = tick_fixture
    return (
        spark.createDataFrame(raw, TICK_SCHEMA),
        spark.createDataFrame(std, TICK_SCHEMA),
    )


@pytest.fixture(scope="session")
def tick_pandas(tick_fixture):
    raw, std = tick_fixture
    cols = ["instrument", "timestamp", "bid", "ask"]
    return (
        pd.DataFrame(raw, columns=cols).sort_values("timestamp").reset_index(drop=True),
        pd.DataFrame(std, columns=cols).sort_values("timestamp").reset_index(drop=True),
    )
