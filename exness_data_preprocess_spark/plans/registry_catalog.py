"""Catalog-path oracle queries — the production storage surface under the
differential gate.

The base registry oracle-checks operators over the raw test parquet; these
entries instead drive the REAL pipeline the reference exposes
(processor.py:285-454): ``SparkDataProcessor.insert_ticks`` (partitioned,
sorted, deduped write — A3/D8) → ``regenerate_ohlc`` (asof join + 1m
aggregation + enrichment — C1/D1/K5) → ``query_ticks/query_ohlc``
(partition-pruned read + resample — A4/A5/B1/B2/D2). The DuckDB oracle
reproduces the same result straight from the events table, so a mismatch
anywhere in write layout, dedup, partition pruning, asof fill, or resample
arithmetic fails the hash.

The tick fixture is derived deterministically from the events stream
(click → raw_spread, view → standard; per-timestamp min(value) makes the
(instrument, timestamp) key unique so write-side dedup is the identity and
both engines agree without modeling survivor choice).

Determinism notes:
- spread averages are fp-order-dependent across engines → rounded (9 dp on
  values ~1e-4, well away from the documented .5-boundary hazard);
- min/max/arg_min/arg_max/counts are exact and stay unrounded;
- timestamps egress as epoch microseconds.
"""

from __future__ import annotations

import hashlib
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exness_data_preprocess_spark.plans.registry import QuerySpec, load

RAW_SPREAD = 0.0001
STD_SPREAD = 0.0003


def _derive_ticks(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = load(spark, sf_dir, "events")

    def side(event_type: str, spread: float) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .groupBy(F.col("ts").alias("timestamp"))
            .agg(F.min("value").alias("bid"))
            .select(
                F.lit("EURUSD").alias("instrument"),
                "timestamp",
                "bid",
                (F.col("bid") + F.lit(spread)).alias("ask"),
            )
        )

    return side("click", RAW_SPREAD), side("view", STD_SPREAD)


def _staged_processor(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir) a real catalog store under /tmp via the
    production facade; subsequent calls reuse the written partitions.

    The stage key is salt-stable (hashlib, not Python ``hash``) so
    re-invocations across processes land on the same store, and includes
    the fixture's size+mtime fingerprint (review find): a path-only key
    would serve a stale store forever after the fixture at that path is
    regenerated — the exact staleness hazard the IVF-centroid and
    JSONL-stage caches already fingerprint against.
    """
    from exness_data_preprocess_spark.config import UserConfig
    from exness_data_preprocess_spark.processor import SparkDataProcessor

    st = Path(f"{sf_dir}/events.parquet").stat()
    key = hashlib.md5(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    base = Path(tempfile.gettempdir()) / f"catalog_stage_{key}"
    proc = SparkDataProcessor(spark, base, config=UserConfig())
    marker = base / "_BUILD_DONE"
    if not marker.exists():
        raw, std = _derive_ticks(spark, sf_dir)
        proc.insert_ticks(raw, "raw_spread")
        proc.insert_ticks(std, "standard")
        proc.regenerate_ohlc("EURUSD")
        marker.touch()
    return proc


# Shared oracle CTE prefix: the same derivation, written in ANSI SQL.
_ORACLE_TICKS_CTE = f"""
WITH raw AS (
  SELECT ts AS timestamp, min(value) AS bid, min(value) + {RAW_SPREAD} AS ask
  FROM events WHERE event_type = 'click' GROUP BY ts
), std AS (
  SELECT ts AS timestamp, min(value) AS bid, min(value) + {STD_SPREAD} AS ask
  FROM events WHERE event_type = 'view' GROUP BY ts
)"""


# ---------------------------------------------------------------------------
# Catalog tick scan: write_ticks → partition-pruned read → B1/B2 filters
# ---------------------------------------------------------------------------
def q_catalog_tick_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    proc = _staged_processor(spark, sf_dir)
    df = proc.engine.query_ticks_df(
        "EURUSD",
        "raw_spread",
        start_date="2024-01-05",
        end_date="2024-01-12",
        limit=400,
    )
    return df.select(
        F.unix_micros("timestamp").alias("ts_us"), "bid", "ask"
    )


ORACLE_CATALOG_TICK_SCAN = (
    _ORACLE_TICKS_CTE
    + """
SELECT epoch_us(timestamp) AS ts_us, bid, ask
FROM raw
WHERE timestamp >= TIMESTAMP '2024-01-05'
  AND timestamp <= TIMESTAMP '2024-01-12'
ORDER BY timestamp
LIMIT 400
"""
)


# Oracle 1m-bar CTE: asof join + minute aggregation, mirroring
# generate_ohlc_1m (operators/ohlc.py) on the derived ticks.
_ORACLE_BARS_CTE = (
    _ORACLE_TICKS_CTE
    + """
, j AS (
  SELECT r.timestamp, r.bid, r.ask,
         s.timestamp AS std_ts, s.bid AS std_bid, s.ask AS std_ask
  FROM raw r ASOF LEFT JOIN std s ON r.timestamp >= s.timestamp
), m AS (
  SELECT date_trunc('minute', timestamp) AS minute,
         arg_min(bid, timestamp) AS open,
         max(bid) AS high,
         min(bid) AS low,
         arg_max(bid, timestamp) AS close,
         avg(ask - bid) AS raw_spread_avg,
         avg(std_ask - std_bid) AS standard_spread_avg,
         count(timestamp) AS tick_count_raw_spread,
         count(CASE WHEN std_ts IS NOT NULL THEN 1 END) AS tick_count_standard
  FROM j GROUP BY 1
)"""
)


# ---------------------------------------------------------------------------
# Catalog 1m read-back: the stored ohlc_1m table (A5 direct path)
# ---------------------------------------------------------------------------
def q_catalog_ohlc_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    proc = _staged_processor(spark, sf_dir)
    df = proc.engine.query_ohlc_df("EURUSD", "1m")
    return df.select(
        F.unix_micros("timestamp").alias("ts_us"),
        "open",
        "high",
        "low",
        "close",
        F.round("raw_spread_avg", 9).alias("raw_spread_avg"),
        F.round("standard_spread_avg", 9).alias("standard_spread_avg"),
        "tick_count_raw_spread",
        "tick_count_standard",
    )


ORACLE_CATALOG_OHLC_1M = (
    _ORACLE_BARS_CTE
    + """
SELECT epoch_us(minute) AS ts_us, open, high, low, close,
       round(raw_spread_avg, 9) AS raw_spread_avg,
       round(standard_spread_avg, 9) AS standard_spread_avg,
       CAST(tick_count_raw_spread AS BIGINT) AS tick_count_raw_spread,
       CAST(tick_count_standard AS BIGINT) AS tick_count_standard
FROM m
"""
)


# ---------------------------------------------------------------------------
# Catalog 1h resample: stored 1m bars → query_ohlc(timeframe="1h") (D2)
# ---------------------------------------------------------------------------
def q_catalog_ohlc_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    proc = _staged_processor(spark, sf_dir)
    df = proc.engine.query_ohlc_df("EURUSD", "1h")
    return df.select(
        F.unix_micros("timestamp").alias("ts_us"),
        "open",
        "high",
        "low",
        "close",
        F.round("raw_spread_avg", 9).alias("raw_spread_avg"),
        "tick_count_raw_spread",
        "tick_count_standard",
        "range_per_tick",
        "body_per_tick",
    )


ORACLE_CATALOG_OHLC_1H = (
    _ORACLE_BARS_CTE
    + """
SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, minute)) AS ts_us,
       arg_min(open, minute) AS open,
       max(high) AS high,
       min(low) AS low,
       arg_max(close, minute) AS close,
       round(avg(raw_spread_avg), 9) AS raw_spread_avg,
       CAST(sum(tick_count_raw_spread) AS BIGINT) AS tick_count_raw_spread,
       CAST(sum(tick_count_standard) AS BIGINT) AS tick_count_standard,
       CASE WHEN sum(tick_count_raw_spread) > 0
            THEN (max(high) - min(low)) / sum(tick_count_raw_spread)
       END AS range_per_tick,
       CASE WHEN sum(tick_count_raw_spread) > 0
            THEN abs(arg_max(close, minute) - arg_min(open, minute))
                 / sum(tick_count_raw_spread)
       END AS body_per_tick
FROM m
GROUP BY time_bucket(INTERVAL 1 HOUR, minute)
"""
)


def catalog_query_specs() -> dict[str, QuerySpec]:
    return {
        "catalog_tick_scan": QuerySpec(
            q_catalog_tick_scan,
            ORACLE_CATALOG_TICK_SCAN,
            "Production path: write_ticks → pruned scan → B1/B2 filters",
        ),
        "catalog_ohlc_1m": QuerySpec(
            q_catalog_ohlc_1m,
            ORACLE_CATALOG_OHLC_1M,
            "Production path: regenerate_ohlc → stored 1m bars (asof+D1)",
        ),
        "catalog_ohlc_1h": QuerySpec(
            q_catalog_ohlc_1h,
            ORACLE_CATALOG_OHLC_1H,
            "Production path: stored 1m bars → query_ohlc 1h resample (D2/D3)",
        ),
    }
