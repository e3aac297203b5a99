"""OHLC generation semantics (D1/E2/E3/K1-K5) including the deliberate
``tick_count_standard`` = matched-RAW-tick-count semantic
(clickhouse_ohlc_generator.py:162) and DST-correct tz hours."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from exness_data_preprocess_spark.operators.ohlc import generate_ohlc_1m
from exness_data_preprocess_spark.schema import OHLC_1M_COLUMNS, TICK_SCHEMA


@pytest.fixture(scope="module")
def bars(spark, tick_dfs):
    raw, std = tick_dfs
    raw = raw.dropDuplicates(["instrument", "timestamp"])
    df = generate_ohlc_1m(raw, std)
    df.cache()
    yield df
    df.unpersist()


def test_27_columns(bars):
    assert bars.columns == OHLC_1M_COLUMNS


def test_ohlc_invariants(bars):
    bad = bars.filter(
        (F.col("low") > F.col("high"))
        | (F.col("open") > F.col("high")) | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high")) | (F.col("close") < F.col("low"))
    )
    assert bad.count() == 0


def test_single_tick_minute(spark):
    t = dt.datetime(2024, 3, 11, 23, 59, 2)
    raw = spark.createDataFrame([("EURUSD", t, 1.0811, 1.0812)], TICK_SCHEMA)
    std = spark.createDataFrame([], TICK_SCHEMA)
    row = generate_ohlc_1m(raw, std).first()
    assert row["open"] == row["high"] == row["low"] == row["close"] == 1.0811
    assert row["tick_count_raw_spread"] == 1
    assert row["tick_count_standard"] == 0
    assert row["standard_spread_avg"] is None
    assert row["timestamp"] == dt.datetime(2024, 3, 11, 23, 59)


def test_tick_count_standard_counts_matched_raw_ticks(spark):
    """3 raw ticks all matched to ONE standard tick → count = 3 (matched
    raw ticks), NOT 1 (distinct standard ticks)."""
    base = dt.datetime(2024, 5, 1, 12, 0)
    raw = spark.createDataFrame(
        [("EURUSD", base + dt.timedelta(seconds=s), 1.0, 1.0) for s in (5, 20, 40)],
        TICK_SCHEMA,
    )
    std = spark.createDataFrame(
        [("EURUSD", base + dt.timedelta(seconds=1), 2.0, 2.5)], TICK_SCHEMA
    )
    row = generate_ohlc_1m(raw, std).first()
    assert row["tick_count_raw_spread"] == 3
    assert row["tick_count_standard"] == 3
    assert row["standard_spread_avg"] == pytest.approx(0.5)


def test_open_close_ordering(spark):
    base = dt.datetime(2024, 5, 1, 12, 0)
    rows = [
        ("EURUSD", base + dt.timedelta(seconds=1), 5.0, 5.0),   # open
        ("EURUSD", base + dt.timedelta(seconds=30), 9.0, 9.0),  # high
        ("EURUSD", base + dt.timedelta(seconds=31), 1.0, 1.0),  # low
        ("EURUSD", base + dt.timedelta(seconds=59), 7.0, 7.0),  # close
    ]
    raw = spark.createDataFrame(rows, TICK_SCHEMA)
    std = spark.createDataFrame([], TICK_SCHEMA)
    row = generate_ohlc_1m(raw, std).first()
    assert (row["open"], row["high"], row["low"], row["close"]) == (5.0, 9.0, 1.0, 7.0)


def test_dst_transition_hours(spark):
    """US DST began 2024-03-10 07:00 UTC: 12:00 UTC is NY 7 (EST) the day
    before and NY 8 (EDT) after (clickhouse_ohlc_generator.py:164-165)."""
    raw = spark.createDataFrame(
        [
            ("EURUSD", dt.datetime(2024, 3, 9, 12, 0, 1), 1.0, 1.0),
            ("EURUSD", dt.datetime(2024, 3, 10, 12, 0, 1), 1.0, 1.0),
        ],
        TICK_SCHEMA,
    )
    std = spark.createDataFrame([], TICK_SCHEMA)
    got = {
        r["timestamp"].day: r["ny_hour"]
        for r in generate_ohlc_1m(raw, std).collect()
    }
    assert got == {9: 7, 10: 8}


def test_session_labels_domain(bars):
    ny = {r["ny_session"] for r in bars.select("ny_session").distinct().collect()}
    lon = {
        r["london_session"]
        for r in bars.select("london_session").distinct().collect()
    }
    assert ny <= {"NY_Session", "NY_After_Hours", "NY_Closed"}
    assert lon <= {"London_Session", "London_Closed"}


def test_holiday_and_session_flags_are_int01(bars):
    flag_cols = [c for c in bars.columns if c.startswith("is_")]
    for c in flag_cols:
        vals = {r[c] for r in bars.select(c).distinct().collect()}
        assert vals <= {0, 1}, c


def test_weekend_has_no_sessions(spark):
    # 2024-03-09 is a Saturday: all 10 exchange session flags must be 0
    raw = spark.createDataFrame(
        [("EURUSD", dt.datetime(2024, 3, 9, 14, 30, 0), 1.0, 1.0)], TICK_SCHEMA
    )
    std = spark.createDataFrame([], TICK_SCHEMA)
    row = generate_ohlc_1m(raw, std).first()
    assert all(
        row[c] == 0
        for c in OHLC_1M_COLUMNS
        if c.startswith("is_") and c.endswith("_session")
    )
