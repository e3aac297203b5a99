"""Exchange-calendar dimension builders (holiday + trading-session flags).

The reference computes these client-side in pandas per row
(session_detector.py:74-187): it enumerates every open trading minute per
exchange via ``exchange_calendars.is_open_on_minute`` (honoring lunch breaks
and DST) and flags bars with ``.isin``; holidays come from
``calendar.regular_holidays`` for NYSE/LSE (session_detector.py:159-178).

Spark-first redesign (SURVEY.md §2.K): generate two **dimension tables**
and broadcast-join them onto the bar stream — flag computation fuses into
the same plan that writes OHLC, eliminating the reference's
select→pandas→delete→re-insert round-trip (clickhouse_ohlc_generator.py:
217-329).

- ``build_holiday_dim``: (date, is_us_holiday, is_uk_holiday,
  is_major_holiday) — one row per calendar day.
- ``build_trading_minutes_dim``: (minute_ts, is_{exchange}_session × 10) —
  one row per UTC minute in which at least one exchange is open.

Scale: both dims grow with *calendar time*, not data volume — ~0.5M
minute-rows/year wide-pivoted. At 100 TB of ticks the dim for a 5-year range
is ~2.5M rows ≈ 30 MB: comfortably broadcastable, so the enrichment join
never shuffles the tick-derived side.

``exchange_calendars`` is not available in this environment, so session
intervals come from a deterministic rule-based calendar (exchanges.py
registry hours + lunch breaks + weekends + the holiday dim). Rule-based
holidays implement the public NYSE/LSE holiday rules (fixed dates with
weekend observance shifts, US floating Monday/Thursday holidays, Easter via
the anonymous Gregorian computus). If ``exchange_calendars`` is importable
it is used instead (feature-gated).
"""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from exness_data_preprocess_spark.exchanges import (
    EXCHANGES,
    SESSION_FLAG_COLUMNS,
)

try:  # pragma: no cover - optional dependency, absent in this container
    import exchange_calendars as _xcals  # noqa: F401

    HAVE_XCALS = True
except ImportError:
    HAVE_XCALS = False


# ---------------------------------------------------------------------------
# Holiday rules (public knowledge)
# ---------------------------------------------------------------------------
def _easter_sunday(year: int) -> dt.date:
    """Anonymous Gregorian computus."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    g = (8 * b + 13) // 25
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7  # noqa: E741
    m = (a + 11 * h + 22 * l) // 451
    month = (h + l - 7 * m + 114) // 31
    day = (h + l - 7 * m + 114) % 31 + 1
    return dt.date(year, month, day)


def _observed_us(d: dt.date) -> dt.date:
    """US weekend-shift: Sat → Fri, Sun → Mon."""
    if d.weekday() == 5:
        return d - dt.timedelta(days=1)
    if d.weekday() == 6:
        return d + dt.timedelta(days=1)
    return d


def _nth_weekday(year: int, month: int, weekday: int, n: int) -> dt.date:
    d = dt.date(year, month, 1)
    offset = (weekday - d.weekday()) % 7
    return d + dt.timedelta(days=offset + 7 * (n - 1))


def _last_weekday(year: int, month: int, weekday: int) -> dt.date:
    if month == 12:
        d = dt.date(year, 12, 31)
    else:
        d = dt.date(year, month + 1, 1) - dt.timedelta(days=1)
    return d - dt.timedelta(days=(d.weekday() - weekday) % 7)


def nyse_holidays(year: int) -> list[tuple[dt.date, str]]:
    """NYSE full-day closures (public holiday schedule).

    New Year's Day is special-cased: when Jan 1 falls on a Saturday the
    Exchange does NOT observe it on the preceding Friday (NYSE Rule 7.2's
    accounting-period exception — Dec 31 ends the yearly period, so e.g.
    2021-12-31 was a full trading day); a Sunday Jan 1 still moves to
    Monday. The other fixed-date holidays take the standard Sat→Fri /
    Sun→Mon shift (Jul 3 2020 and Dec 24 2021 were closures).
    """
    easter = _easter_sunday(year)
    ny = dt.date(year, 1, 1)
    out = [
        (_nth_weekday(year, 1, 0, 3), "Martin Luther King Jr. Day"),
        (_nth_weekday(year, 2, 0, 3), "Washington's Birthday"),
        (easter - dt.timedelta(days=2), "Good Friday"),
        (_last_weekday(year, 5, 0), "Memorial Day"),
        (_observed_us(dt.date(year, 7, 4)), "Independence Day"),
        (_nth_weekday(year, 9, 0, 1), "Labor Day"),
        (_nth_weekday(year, 11, 3, 4), "Thanksgiving Day"),
        (_observed_us(dt.date(year, 12, 25)), "Christmas Day"),
    ]
    if ny.weekday() != 5:  # Saturday Jan 1 → not observed (Rule 7.2)
        out.append((_observed_us(ny), "New Year's Day"))
    if year >= 2022:
        out.append((_observed_us(dt.date(year, 6, 19)), "Juneteenth"))
    out.extend(NYSE_ONE_OFF.get(year, []))
    return sorted(out)


# One-off NYSE closures the RULES cannot derive (review find: the
# "exact public schedule" claim needs them). Public knowledge, scoped
# to the modern era this engine serves data for.
NYSE_ONE_OFF: dict[int, list[tuple[dt.date, str]]] = {
    2025: [(dt.date(2025, 1, 9), "National Day of Mourning (Carter)")],
    2018: [(dt.date(2018, 12, 5), "National Day of Mourning (Bush)")],
    2012: [
        (dt.date(2012, 10, 29), "Hurricane Sandy"),
        (dt.date(2012, 10, 30), "Hurricane Sandy"),
    ],
}

# UK bank-holiday amendments the rules cannot derive: royal one-offs
# and PROCLAIMED moves of rule-derived holidays (the moved source date
# was a normal trading day). (year -> (added, removed-rule-dates))
UK_ONE_OFF: dict[int, tuple[list[tuple[dt.date, str]], list[dt.date]]] = {
    2020: (
        [(dt.date(2020, 5, 8), "Early May Bank Holiday (VE Day move)")],
        [dt.date(2020, 5, 4)],  # rule's first-Monday May was a trading day
    ),
    2022: (
        [
            (dt.date(2022, 6, 2), "Spring Bank Holiday (moved)"),
            (dt.date(2022, 6, 3), "Platinum Jubilee"),
            (dt.date(2022, 9, 19), "State Funeral of Queen Elizabeth II"),
        ],
        [dt.date(2022, 5, 30)],  # rule's last-Monday May was a trading day
    ),
    2023: (
        [(dt.date(2023, 5, 8), "Coronation of King Charles III")],
        [],
    ),
}


def _observed_uk(d: dt.date) -> dt.date:
    """UK observance: holiday falling on a weekend moves to next weekday."""
    while d.weekday() >= 5:
        d += dt.timedelta(days=1)
    return d


def lse_holidays(year: int) -> list[tuple[dt.date, str]]:
    """LSE full-day closures (public UK bank-holiday schedule, including
    proclaimed moves and royal one-offs — review find)."""
    easter = _easter_sunday(year)
    xmas = _observed_uk(dt.date(year, 12, 25))
    boxing = _observed_uk(xmas + dt.timedelta(days=1))
    out = [
        (_observed_uk(dt.date(year, 1, 1)), "New Year's Day"),
        (easter - dt.timedelta(days=2), "Good Friday"),
        (easter + dt.timedelta(days=1), "Easter Monday"),
        (_nth_weekday(year, 5, 0, 1), "Early May Bank Holiday"),
        (_last_weekday(year, 5, 0), "Spring Bank Holiday"),
        (_last_weekday(year, 8, 0), "Summer Bank Holiday"),
        (xmas, "Christmas Day"),
        (boxing, "Boxing Day"),
    ]
    added, removed = UK_ONE_OFF.get(year, ([], []))
    out = [(d, n) for d, n in out if d not in removed]
    out.extend(added)
    return sorted(out)


def early_closes(exchange: str, year: int) -> dict[dt.date, tuple[int, int]]:
    """Scheduled half-day closes, local time (review find: without them
    the afternoon minutes of short sessions were flagged in-session).

    Public schedules: NYSE closes 13:00 ET on July 3 (when a weekday and
    July 4 is the observed holiday), the day after Thanksgiving, and
    Christmas Eve (when a weekday); LSE closes 12:30 on Dec 24 and
    Dec 31 (when weekdays). Other registry venues keep full sessions
    (callers may supply richer tables the same way as holidays).
    """
    out: dict[dt.date, tuple[int, int]] = {}
    if exchange == "nyse":
        jul3 = dt.date(year, 7, 3)
        if jul3.weekday() < 5 and dt.date(year, 7, 4).weekday() < 5:
            out[jul3] = (13, 0)
        thanksgiving = _nth_weekday(year, 11, 3, 4)
        out[thanksgiving + dt.timedelta(days=1)] = (13, 0)
        xmas_eve = dt.date(year, 12, 24)
        if xmas_eve.weekday() < 5 and dt.date(year, 12, 25).weekday() < 5:
            out[xmas_eve] = (13, 0)
    elif exchange == "lse":
        for d in (dt.date(year, 12, 24), dt.date(year, 12, 31)):
            if d.weekday() < 5:
                out[d] = (12, 30)
    return out


def holidays_for_exchange(exchange: str, year: int) -> list[tuple[dt.date, str]]:
    """Full-day closures for any registry exchange.

    NYSE/LSE use the exact public schedules above (they drive the
    is_us/uk/major_holiday flags, session_detector.py:159-178); the other 8
    exchanges reuse a reasonable subset (New Year + Christmas) sufficient
    for session-flag suppression; callers may supply richer tables.
    """
    if exchange == "nyse":
        return nyse_holidays(year)
    if exchange == "lse":
        return lse_holidays(year)
    return [
        (dt.date(year, 1, 1), "New Year's Day"),
        (dt.date(year, 12, 25), "Christmas Day"),
    ]


# ---------------------------------------------------------------------------
# Dimension builders
# ---------------------------------------------------------------------------
def build_holidays_table(
    spark: SparkSession, start: dt.date, end: dt.date
) -> DataFrame:
    """Long-format holiday lookup (clickhouse_manager.py:258-269):
    (date, exchange_code, holiday_name)."""
    rows = []
    for name, cfg in EXCHANGES.items():
        for year in range(start.year, end.year + 1):
            for d, label in holidays_for_exchange(name, year):
                if start <= d <= end:
                    rows.append((d, cfg.code, label))
    schema = T.StructType(
        [
            T.StructField("date", T.DateType(), False),
            T.StructField("exchange_code", T.StringType(), False),
            T.StructField("holiday_name", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def build_holiday_dim(
    spark: SparkSession, start: dt.date, end: dt.date
) -> DataFrame:
    """Wide per-date holiday flags: one row per day in [start, end].

    is_major_holiday = is_us AND is_uk (session_detector.py:176-178).
    """
    us = {d for d, _ in _years_holidays("nyse", start, end)}
    uk = {d for d, _ in _years_holidays("lse", start, end)}
    rows = []
    d = start
    while d <= end:
        u, k = int(d in us), int(d in uk)
        rows.append((d, u, k, int(u and k)))
        d += dt.timedelta(days=1)
    schema = T.StructType(
        [
            T.StructField("date", T.DateType(), False),
            T.StructField("is_us_holiday", T.IntegerType(), False),
            T.StructField("is_uk_holiday", T.IntegerType(), False),
            T.StructField("is_major_holiday", T.IntegerType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _years_holidays(
    exchange: str, start: dt.date, end: dt.date
) -> list[tuple[dt.date, str]]:
    out: list[tuple[dt.date, str]] = []
    for year in range(start.year, end.year + 1):
        out.extend(
            (d, n)
            for d, n in holidays_for_exchange(exchange, year)
            if start <= d <= end
        )
    return out


def build_session_intervals(
    spark: SparkSession, start: dt.date, end: dt.date
) -> DataFrame:
    """Per-exchange, per-trading-day UTC session intervals.

    Columns: exchange, session_date (local), open_utc, close_utc,
    lunch_start_utc, lunch_end_utc (NULL when no lunch break). DST handled
    exactly by zoneinfo at each local date. Weekends and the exchange's
    holiday list are excluded — the rule-based analog of
    ``calendar.sessions_in_range`` (session_detector.py:103-105).

    Driver-side cost is O(exchanges × days) tuples — trivial; the heavy
    per-minute expansion happens in Spark (build_trading_minutes_dim).
    """
    rows = []
    for name, cfg in EXCHANGES.items():
        tz = ZoneInfo(cfg.timezone)
        hol = {d for d, _ in _years_holidays(name, start, end)}
        early: dict[dt.date, tuple[int, int]] = {}
        for y in range(start.year, end.year + 1):
            early.update(early_closes(name, y))
        d = start
        while d <= end:
            if d.weekday() < 5 and d not in hol:
                open_local = dt.datetime(
                    d.year, d.month, d.day, cfg.open_hour, cfg.open_minute, tzinfo=tz
                )
                # close may carry dated amendments (TSE 15:00 → 15:30 on
                # 2024-11-05) and scheduled HALF-DAY closes — resolve
                # per local date, earliest wins
                c_h, c_m = cfg.close_on(d)
                if d in early:
                    c_h, c_m = early[d]
                close_local = dt.datetime(
                    d.year, d.month, d.day, c_h, c_m, tzinfo=tz
                )
                lunch_s = lunch_e = None
                if cfg.lunch_break is not None:
                    lsh, lsm, leh, lem = cfg.lunch_break
                    lunch_s = dt.datetime(
                        d.year, d.month, d.day, lsh, lsm, tzinfo=tz
                    ).astimezone(dt.timezone.utc).replace(tzinfo=None)
                    lunch_e = dt.datetime(
                        d.year, d.month, d.day, leh, lem, tzinfo=tz
                    ).astimezone(dt.timezone.utc).replace(tzinfo=None)
                rows.append(
                    (
                        name,
                        d,
                        open_local.astimezone(dt.timezone.utc).replace(tzinfo=None),
                        close_local.astimezone(dt.timezone.utc).replace(tzinfo=None),
                        lunch_s,
                        lunch_e,
                    )
                )
            d += dt.timedelta(days=1)
    schema = T.StructType(
        [
            T.StructField("exchange", T.StringType(), False),
            T.StructField("session_date", T.DateType(), False),
            T.StructField("open_utc", T.TimestampType(), False),
            T.StructField("close_utc", T.TimestampType(), False),
            T.StructField("lunch_start_utc", T.TimestampType(), True),
            T.StructField("lunch_end_utc", T.TimestampType(), True),
        ]
    )
    return spark.createDataFrame(rows, schema)


def build_trading_minutes_dim(
    spark: SparkSession, start: dt.date, end: dt.date
) -> DataFrame:
    """Wide per-minute session-flag dim: (minute_ts, is_{ex}_session × 10).

    Trading minutes are [open, close) minus the lunch break [ls, le) —
    the rule-based analog of iterating ``is_open_on_minute``
    (session_detector.py:106-118). Expansion runs in Spark
    (``sequence`` + ``explode``, JVM-side), then pivots to one row per
    minute so enrichment needs exactly ONE broadcast hash join.
    """
    intervals = build_session_intervals(spark, start, end)
    minutes = intervals.select(
        "exchange",
        F.explode(
            F.sequence(
                F.col("open_utc"),
                F.col("close_utc") - F.expr("INTERVAL 1 MINUTE"),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("minute_ts"),
        "lunch_start_utc",
        "lunch_end_utc",
    ).filter(
        F.col("lunch_start_utc").isNull()
        | ~(
            (F.col("minute_ts") >= F.col("lunch_start_utc"))
            & (F.col("minute_ts") < F.col("lunch_end_utc"))
        )
    )
    aggs = [
        F.max(
            F.when(F.col("exchange") == name, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"is_{name}_session")
        for name in EXCHANGES
    ]
    return minutes.groupBy("minute_ts").agg(*aggs)


def enrich_with_sessions(
    bars: DataFrame,
    holiday_dim: DataFrame,
    minutes_dim: DataFrame,
    ts_col: str = "timestamp",
) -> DataFrame:
    """Broadcast-join holiday + session flags onto a bar stream.

    Replaces the reference's K5 read-back/delete/re-insert flow
    (clickhouse_ohlc_generator.py:217-329) with two map-side joins in the
    same plan — zero extra shuffles on the bar side.
    """
    flag_cols = SESSION_FLAG_COLUMNS
    # rename the dim's join column before joining (review find: a bare
    # drop("date") after the join removed a caller-supplied bar column
    # of the same name along with the dim's)
    hol = holiday_dim.withColumnRenamed("date", "__hol_date")
    out = bars.withColumn("__date", F.to_date(F.col(ts_col)))
    out = out.join(
        F.broadcast(hol), out["__date"] == hol["__hol_date"], "left"
    )
    out = out.drop("__hol_date", "__date")
    out = out.join(
        F.broadcast(minutes_dim), out[ts_col] == minutes_dim["minute_ts"], "left"
    ).drop("minute_ts")
    fills = {c: 0 for c in ["is_us_holiday", "is_uk_holiday", "is_major_holiday", *flag_cols]}
    return out.fillna(fills)
