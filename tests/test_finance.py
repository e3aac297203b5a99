"""operators/finance.py: TWAP, realized volatility, count-series corr.

Covers the ANSI-mode edge cases the operators are contractually safe
against (Spark 4 defaults spark.sql.ansi.enabled=true):
- zero observation value → NULL return, excluded from rv / n_returns
  (no DIVIDE_BY_ZERO);
- constant hourly count series (single-hour days guarantee it) → NULL
  correlation (no DIVIDE_BY_ZERO from corr internals);
- parameterized tie column (frames without an event_id column).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from exness_data_preprocess_spark.operators.finance import (
    hourly_count_corr_daily,
    realized_volatility_daily,
    twap_hourly,
)


def _ts(minute: int, second: int = 0, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, 1, hour, minute, second)


@pytest.fixture(scope="module")
def events_df(spark):
    rows = [
        # series "a", one hour: values 10 → 20 at :30 → bucket end
        (1, _ts(0), "a", 10.0),
        (2, _ts(30), "a", 20.0),
        # series "b": a zero value in the middle (return after it undefined)
        (3, _ts(0), "b", 5.0),
        (4, _ts(20), "b", 0.0),
        (5, _ts(40), "b", 10.0),
        # series "c": constant (zero variance)
        (6, _ts(0), "c", 7.0),
        (7, _ts(15), "c", 7.0),
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")


def test_twap_weights_by_holding_time(events_df):
    out = {
        r["event_type"]: r
        for r in twap_hourly(events_df).collect()
    }
    # series a: 10 held 30 min, 20 held 30 min → twap 15
    assert out["a"]["twap"] == pytest.approx(15.0)
    assert out["a"]["n_events"] == 2
    # weighted_us covers first-event → bucket end only (event-anchored)
    assert out["a"]["weighted_us"] == 3_600_000_000
    # series b: 5*20min + 0*20min + 10*20min over 60min → 5
    assert out["b"]["twap"] == pytest.approx(5.0)


def test_twap_custom_tie_col(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "x", 1.0), (2, _ts(30), "x", 3.0)],
        "row_id long, ts timestamp, event_type string, value double",
    )
    out = twap_hourly(df, tie_col="row_id").collect()
    assert len(out) == 1 and out[0]["twap"] == pytest.approx(2.0)


def test_realized_vol_zero_price_yields_null_return(events_df):
    out = {r["event_type"]: r for r in realized_volatility_daily(events_df).collect()}
    # series a: one return (20/10 - 1 = 1.0) → rv = 1.0
    assert out["a"]["n_returns"] == 1
    assert out["a"]["rv"] == pytest.approx(1.0)
    # series b: return into 0 is (0/5 - 1)² = 1; return FROM 0 is NULL
    # (try_divide) and excluded from both rv and the count — no
    # DIVIDE_BY_ZERO under ANSI mode.
    assert out["b"]["n_returns"] == 1
    assert out["b"]["rv"] == pytest.approx(1.0)
    # series c: constant → single zero return
    assert out["c"]["n_returns"] == 1
    assert out["c"]["rv"] == pytest.approx(0.0)


def test_realized_vol_custom_tie_col(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "x", 2.0), (2, _ts(1), "x", 3.0)],
        "k long, ts timestamp, event_type string, value double",
    )
    out = realized_volatility_daily(df, tie_col="k").collect()
    assert out[0]["rv"] == pytest.approx(0.25)


def test_corr_constant_series_is_null_not_error(spark):
    # Two hours; 'click' counts vary (1, 2) but 'view' is constant (1, 1):
    # zero variance → corr must be NULL, not an ANSI DIVIDE_BY_ZERO.
    rows = [
        (1, _ts(0, hour=0), "click", 1.0),
        (2, _ts(0, hour=1), "click", 1.0),
        (3, _ts(5, hour=1), "click", 1.0),
        (4, _ts(0, hour=0), "view", 1.0),
        (5, _ts(0, hour=1), "view", 1.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = hourly_count_corr_daily(df).collect()
    assert len(out) == 1
    assert out[0]["corr_ab"] is None
    assert out[0]["n_hours"] == 2


def test_corr_single_hour_day_is_null(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "click", 1.0), (2, _ts(1), "view", 1.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    out = hourly_count_corr_daily(df).collect()
    assert len(out) == 1 and out[0]["corr_ab"] is None


def test_corr_perfect_anticorrelation(spark):
    # counts: click (2,1), view (1,2) over two hours → corr exactly -1
    rows = (
        [(i, _ts(i, hour=0), "click", 1.0) for i in range(2)]
        + [(10, _ts(0, hour=1), "click", 1.0)]
        + [(20, _ts(0, hour=0), "view", 1.0)]
        + [(30 + i, _ts(i, hour=1), "view", 1.0) for i in range(2)]
    )
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    out = hourly_count_corr_daily(df).collect()
    assert math.isclose(out[0]["corr_ab"], -1.0)


def test_twap_null_values_do_not_deflate(spark):
    """Review find: a NULL-valued observation contributed holding time to
    the denominator but nothing to the weighted sum. It must be excluded
    BEFORE duration assignment so the prior value holds across the gap."""
    import datetime as dt

    from exness_data_preprocess_spark.operators.finance import twap_hourly

    rows = [
        (1, "a", dt.datetime(2024, 1, 1, 10, 0, 0), 2.0),
        (2, "a", dt.datetime(2024, 1, 1, 10, 30, 0), None),
        (3, "a", dt.datetime(2024, 1, 1, 10, 45, 0), 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    out = twap_hourly(df).first()
    # value 2.0 holds 10:00->10:45 (45 min), 4.0 holds 10:45->11:00 (15)
    assert float(out["twap"]) == (2.0 * 45 + 4.0 * 15) / 60
    assert out["n_events"] == 2
