"""Property-based asof-join parity: random tick streams vs pandas
merge_asof. Randomization hunts the edges the fixture can't enumerate —
equal timestamps across sides, empty right side per key, matches exactly
at bucket boundaries, tolerance equal to the gap."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from exness_data_preprocess_spark.operators.asof import asof_join_backward
from exness_data_preprocess_spark.schema import TICK_SCHEMA

EPOCH = dt.datetime(2024, 1, 1)

# Offsets in seconds over ~3 days so day-bucket boundaries get crossed;
# duplicates across sides are likely (small grid + rounding to whole secs).
offsets = st.lists(
    st.integers(min_value=0, max_value=3 * 86_400), min_size=0, max_size=25
)
# Right side keeps unique keys: duplicate (key, ts) right rows are
# tie-broken arbitrarily by BOTH engines, and the ingest path dedups them
# anyway (D8) — left-side duplicates stay allowed (each matches
# independently).
unique_offsets = st.lists(
    st.integers(min_value=0, max_value=3 * 86_400),
    min_size=0,
    max_size=25,
    unique=True,
)


def _mk(rows_offsets: list[int], instrument: str, base: float):
    return [
        (instrument, EPOCH + dt.timedelta(seconds=o), base + i * 1e-4, base)
        for i, o in enumerate(sorted(rows_offsets))
    ]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_off=offsets,
    right_off=unique_offsets,
    bucket=st.sampled_from(["day", "hour", None]),
    tol=st.sampled_from([None, 0.0, 60.0, 86_400.0]),
)
def test_asof_matches_merge_asof(spark, left_off, right_off, bucket, tol):
    left_rows = _mk(left_off, "EURUSD", 1.08) + _mk(left_off[:7], "XAUUSD", 2000.0)
    right_rows = _mk(right_off, "EURUSD", 1.07)
    if not left_rows:
        return
    left = spark.createDataFrame(left_rows, TICK_SCHEMA)
    right = spark.createDataFrame(
        right_rows if right_rows else [], TICK_SCHEMA
    )

    out = (
        asof_join_backward(
            left, right, matched_prefix="m_", bucket=bucket, tolerance_seconds=tol
        )
        .toPandas()
        .sort_values(["instrument", "timestamp", "bid"])
        .reset_index(drop=True)
    )

    cols = ["instrument", "timestamp", "bid", "ask"]

    def _pdf(rows):
        df = pd.DataFrame(rows, columns=cols)
        df["timestamp"] = pd.to_datetime(df["timestamp"])
        df[["bid", "ask"]] = df[["bid", "ask"]].astype("float64")
        return df.sort_values("timestamp")

    pl = _pdf(left_rows)
    pr = _pdf(right_rows)
    kw = {"tolerance": pd.Timedelta(seconds=tol)} if tol is not None else {}
    exp = (
        pd.merge_asof(
            pl,
            pr,
            on="timestamp",
            by="instrument",
            direction="backward",
            suffixes=("", "_m"),
            **kw,
        )
        .sort_values(["instrument", "timestamp", "bid"])
        .reset_index(drop=True)
    )

    assert len(out) == len(exp)
    pd.testing.assert_series_equal(
        out["m_bid"], exp["bid_m"], check_names=False, check_exact=True
    )
    pd.testing.assert_series_equal(
        out["m_ask"], exp["ask_m"], check_names=False, check_exact=True
    )
