"""Resampling semantics (D2/D3): epoch-aligned buckets for every
timeframe, conservation laws, null-safe ratios, deterministic label pick."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from exness_data_preprocess_spark.functions.timefuncs import to_start_of_interval
from exness_data_preprocess_spark.models import TIMEFRAME_MINUTES
from exness_data_preprocess_spark.operators.ohlc import generate_ohlc_1m
from exness_data_preprocess_spark.operators.resample import resample_ohlc


@pytest.fixture(scope="module")
def bars(spark, tick_dfs):
    raw, std = tick_dfs
    df = generate_ohlc_1m(raw.dropDuplicates(["instrument", "timestamp"]), std)
    df.cache()
    yield df
    df.unpersist()


@pytest.mark.parametrize("minutes", [5, 15, 30, 60, 240, 1440])
def test_bucket_alignment(spark, bars, minutes):
    out = resample_ohlc(bars, minutes)
    misaligned = out.filter(
        (F.unix_timestamp("timestamp") % (60 * minutes)) != 0
    )
    assert misaligned.count() == 0


def test_epoch_alignment_4h():
    """toStartOfInterval parity: 15:30 → 12:00 for 4h buckets (ClickHouse
    aligns to epoch, SURVEY.md §7 risk register)."""
    import pandas as pd

    from exness_data_preprocess_spark import get_spark

    spark = get_spark("t", master="local[2]")
    df = spark.createDataFrame(
        [(dt.datetime(2024, 7, 1, 15, 30, 45),)], "ts timestamp"
    )
    got = df.select(to_start_of_interval(F.col("ts"), 240).alias("b")).first()["b"]
    assert got == dt.datetime(2024, 7, 1, 12, 0)


def test_tick_count_conservation(bars):
    for minutes in (5, 1440):
        total_1m = bars.agg(F.sum("tick_count_raw_spread")).first()[0]
        total_n = (
            resample_ohlc(bars, minutes).agg(F.sum("tick_count_raw_spread")).first()[0]
        )
        assert total_1m == total_n


def test_high_low_envelope(bars):
    r = resample_ohlc(bars, 60)
    hi_1m = bars.agg(F.max("high")).first()[0]
    hi_n = r.agg(F.max("high")).first()[0]
    assert hi_1m == hi_n
    lo_1m = bars.agg(F.min("low")).first()[0]
    lo_n = r.agg(F.min("low")).first()[0]
    assert lo_1m == lo_n


def test_derived_ratio_null_safety(spark):
    """raw_spread_avg == 0 → NULL ratio, not div-by-zero
    (clickhouse_query_engine.py:258-261)."""
    from exness_data_preprocess_spark.schema import TICK_SCHEMA

    t = dt.datetime(2024, 5, 1, 12, 0, 1)
    # zero-spread raw ticks → raw_spread_avg == 0.0
    raw = spark.createDataFrame([("EURUSD", t, 1.0, 1.0)], TICK_SCHEMA)
    std = spark.createDataFrame([], TICK_SCHEMA)
    bars1 = generate_ohlc_1m(raw, std)
    row = resample_ohlc(bars1, 5).first()
    assert row["range_per_spread"] is None
    assert row["body_per_spread"] is None
    assert row["range_per_tick"] is not None  # tick count 1 > 0


def test_resampled_columns(bars):
    out = resample_ohlc(bars, 60)
    assert "range_per_spread" in out.columns
    assert out.columns.index("tick_count_standard") < out.columns.index(
        "range_per_spread"
    )


def test_timeframe_map_covers_all(bars):
    for tf, minutes in TIMEFRAME_MINUTES.items():
        if minutes == 1:
            continue
        assert resample_ohlc(bars, minutes).count() > 0, tf


def test_fill_minute_gaps_cross_day_carry(spark):
    """Gap minutes carry the previous close across day boundaries —
    including over a whole day with no bars (the day-carry frame)."""
    import datetime as dt

    import pyspark.sql.functions as F

    from exness_data_preprocess_spark.operators.resample import (
        fill_minute_gaps,
    )

    rows = [
        ("X", dt.datetime(2024, 1, 1, 23, 58), 1.0, 3),
        ("X", dt.datetime(2024, 1, 3, 0, 2), 2.0, 1),
    ]
    bars = spark.createDataFrame(
        rows, "instrument string, timestamp timestamp, close double, n long"
    )
    out = {
        r["minute"]: r
        for r in fill_minute_gaps(bars, count_col="n").collect()
    }
    # span is inclusive: 23:58 … (day 3) 00:02 = 2 + 1440 + 3 minutes
    assert len(out) == 1445
    m = dt.datetime(2024, 1, 1, 23, 58)
    assert out[m]["close_filled"] == 1.0 and out[m]["is_gap"] == 0
    assert out[m]["n_events"] == 3
    # same-day gap minute
    assert out[dt.datetime(2024, 1, 1, 23, 59)]["close_filled"] == 1.0
    # entire day 2 is synthesized, carried from day 1's last close
    assert out[dt.datetime(2024, 1, 2, 12, 0)]["close_filled"] == 1.0
    assert out[dt.datetime(2024, 1, 2, 12, 0)]["is_gap"] == 1
    assert out[dt.datetime(2024, 1, 2, 12, 0)]["n_events"] == 0
    # day-3 minutes before the bar still carry day 1's close
    assert out[dt.datetime(2024, 1, 3, 0, 1)]["close_filled"] == 1.0
    assert out[dt.datetime(2024, 1, 3, 0, 2)]["close_filled"] == 2.0
    # no row outside the span
    assert dt.datetime(2024, 1, 3, 0, 3) not in out


def test_interval_floor_pre_epoch(spark):
    """Review find (verified): Spark's % takes the dividend's sign, so
    pre-epoch timestamps bucketed to the interval END; pmod floors both
    eras like ClickHouse toStartOfInterval."""
    import datetime as dt

    from exness_data_preprocess_spark.functions.timefuncs import (
        to_start_of_interval,
    )

    df = spark.createDataFrame(
        [
            (dt.datetime(1960, 1, 1, 0, 7, 0),),
            (dt.datetime(2024, 1, 1, 0, 7, 0),),
            (dt.datetime(1969, 12, 31, 23, 58, 0),),
        ],
        "ts timestamp",
    )
    got = [
        r["b"]
        for r in df.select(to_start_of_interval(F.col("ts"), 5).alias("b"))
        .orderBy("b")
        .collect()
    ]
    assert got == [
        dt.datetime(1960, 1, 1, 0, 5, 0),
        dt.datetime(1969, 12, 31, 23, 55, 0),
        dt.datetime(2024, 1, 1, 0, 5, 0),
    ]
