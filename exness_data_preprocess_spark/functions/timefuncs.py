"""Time-bucketing and timezone column expressions.

Parity targets (SURVEY.md §2.H):
- ``toStartOfMinute`` / ``toStartOfInterval(INTERVAL m MINUTE)``
  (clickhouse_ohlc_generator.py:154, clickhouse_query_engine.py:223) —
  ClickHouse aligns intervals to the Unix epoch, exactly like Spark's
  ``window()`` / floor-division on epoch seconds. We use explicit epoch
  floor-division so alignment is visible in the plan and works for any
  minute count (including 240/1440).
- ``toTimezone(ts, tz)`` + ``toHour`` (clickhouse_ohlc_generator.py:164-180)
  -> ``hour(from_utc_timestamp(...))`` with the same IANA tzdb.
- Session labels: multiIf CASE ladders re-expressed as when/otherwise.

Everything here is a pure Column expression → whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_start_of_minute(ts: Column) -> Column:
    """ClickHouse ``toStartOfMinute`` (clickhouse_ohlc_generator.py:154)."""
    return F.date_trunc("minute", ts)


def to_start_of_interval(ts: Column, minutes: int) -> Column:
    """Epoch-aligned bucket start, ClickHouse ``toStartOfInterval`` parity.

    ``window(ts, f"{m} minutes").start`` is equivalent, but an explicit
    floor keeps the output a flat column (no struct) and makes the epoch
    alignment auditable: bucket = floor(unix_seconds / (60*m)) * (60*m).

    ``pmod``, not ``%`` (review find, verified): Spark's ``%`` takes the
    dividend's sign, so pre-epoch timestamps (negative unix seconds)
    rounded UP to the bucket END — 1960-01-01 00:07 bucketed to 00:10 at
    5m width — while ClickHouse floors everywhere. ``pmod`` is sign-
    correct for both eras.
    """
    secs = 60 * int(minutes)
    return F.timestamp_seconds(
        (F.unix_timestamp(ts) - F.pmod(F.unix_timestamp(ts), F.lit(secs)))
        .cast("long")
    )


def hour_in_tz(ts: Column, tz: str) -> Column:
    """``toHour(toTimezone(ts, tz))`` (clickhouse_ohlc_generator.py:164-165)."""
    return F.hour(F.from_utc_timestamp(ts, tz))


def ny_session_label(ts: Column) -> Column:
    """NY session CASE ladder (clickhouse_ohlc_generator.py:166-175).

    9-16 → NY_Session, 17-20 → NY_After_Hours, else NY_Closed (hour bounds
    inclusive, matching the reference's >=/<= comparisons).
    """
    h = hour_in_tz(ts, "America/New_York")
    return (
        F.when((h >= 9) & (h <= 16), F.lit("NY_Session"))
        .when((h >= 17) & (h <= 20), F.lit("NY_After_Hours"))
        .otherwise(F.lit("NY_Closed"))
    )


def london_session_label(ts: Column) -> Column:
    """London session if/else (clickhouse_ohlc_generator.py:176-180)."""
    h = hour_in_tz(ts, "Europe/London")
    return (
        F.when((h >= 8) & (h <= 16), F.lit("London_Session"))
        .otherwise(F.lit("London_Closed"))
    )


def year_month(ts: Column) -> Column:
    """``toYYYYMM(timestamp)`` partition expression (clickhouse_manager.py:160)."""
    return F.date_format(ts, "yyyyMM")


def null_safe_ratio(numerator: Column, denominator: Column) -> Column:
    """``if(d > 0, n / d, NULL)`` (clickhouse_query_engine.py:258-261)."""
    return F.when(denominator > 0, numerator / denominator).otherwise(F.lit(None))
