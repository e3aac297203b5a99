"""One-shot store migration into the ParquetCatalog (SURVEY.md §2 A8).

Spark twin of the reference's ``scripts/migrate_duckdb_to_clickhouse.py``
(:186-260): move historical tick tables from an external store into the
engine's partitioned-parquet catalog, converting timestamps to UTC and
stamping the instrument column.

Two source shapes, two physical strategies:

- **parquet / CSV directory** — read distributed (``spark.read``), one
  lineage straight into the partitioned write. No driver round-trip; this
  is the 100 TB path.
- **DuckDB file** — DuckDB is an in-process engine, so rows must cross the
  driver. We page with keyset cursors on the timestamp ORDER BY (the
  reference pages with LIMIT/OFFSET; keyset stays O(1) per page instead of
  O(offset)) and hand each Arrow batch to Spark for the partitioned,
  deduped write.

Usage:
    python scripts/migrate_store.py --source /path/eurusd.duckdb \
        --instrument EURUSD --table raw_spread_ticks --base /path/catalog
    python scripts/migrate_store.py --source /path/ticks.parquet \
        --instrument EURUSD --table raw_spread_ticks --base /path/catalog \
        --dry-run
"""

from __future__ import annotations

import argparse
import sys
import time
from dataclasses import dataclass, field
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exness_data_preprocess_spark.models import validate_pair, validate_variant
from exness_data_preprocess_spark.sources.catalog import ParquetCatalog

#: source column spellings accepted, reference schema (Timestamp/Bid/Ask)
RENAMES = {"Timestamp": "timestamp", "Bid": "bid", "Ask": "ask"}


@dataclass
class MigrationStats:
    """Progress bookkeeping (reference MigrationStats, :60-120)."""

    total_rows: int = 0
    rows_migrated: int = 0
    batches_processed: int = 0
    started_at: float = field(default_factory=time.time)

    def rows_per_second(self) -> float:
        dt = time.time() - self.started_at
        return self.rows_migrated / dt if dt > 0 else 0.0


def normalize(df: DataFrame, instrument: str) -> DataFrame:
    """Rename, stamp instrument, coerce to UTC µs timestamps, order cols
    (reference insert path :230-267)."""
    from pyspark.sql.types import LongType

    for old, new in RENAMES.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    ts = F.col("timestamp")
    if isinstance(df.schema["timestamp"].dataType, LongType):
        # nanos-as-long parquet source (see migrate_file_source): truncate
        # to Spark's native µs precision, like the reference preserves µs.
        ts = F.timestamp_micros(F.expr("timestamp div 1000"))
    return df.select(
        F.lit(instrument).alias("instrument"),
        ts.cast("timestamp").alias("timestamp"),
        F.col("bid").cast("double").alias("bid"),
        F.col("ask").cast("double").alias("ask"),
    )


def migrate_file_source(
    spark: SparkSession,
    source: Path,
    catalog: ParquetCatalog,
    instrument: str,
    table: str,
    dry_run: bool = False,
) -> MigrationStats:
    """Distributed migration of a parquet/CSV source — single lineage."""
    if source.suffix == ".csv":
        df = spark.read.csv(str(source), header=True, inferSchema=True)
    else:
        # tolerate TIMESTAMP(NANOS) sources (pandas/pyarrow default), which
        # Spark's vectorized reader otherwise rejects; normalize() truncates
        # the long nanos back to µs timestamps.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(str(source))
    ticks = normalize(df, instrument)
    if dry_run:
        stats = MigrationStats(total_rows=ticks.count())
        print(f"[dry-run] would migrate {stats.total_rows:,} rows into {table}")
        return stats
    # single pass (review find): write_ticks returns the stored count
    # from the materialization the write consumed — no pre-write scan
    written = catalog.write_ticks(ticks, table)
    stats = MigrationStats(total_rows=written)
    stats.rows_migrated = written
    stats.batches_processed = 1
    return stats


def migrate_duckdb_source(
    spark: SparkSession,
    source: Path,
    catalog: ParquetCatalog,
    instrument: str,
    table: str,
    batch_size: int = 1_000_000,
    source_table: str | None = None,
    dry_run: bool = False,
) -> MigrationStats:
    """Paged migration out of a DuckDB file via keyset cursors.

    The reference pages with LIMIT/OFFSET (:212-224); keyset pagination on
    the ordered timestamp keeps every page an index range scan. Timestamps
    are converted to UTC in the source query exactly like the reference
    (``timezone('UTC', Timestamp)``, :211-218).
    """
    import duckdb

    src_table = source_table or table
    con = duckdb.connect(str(source), read_only=True)
    # Pin the cursor arithmetic to UTC (review find, reproduced): with a
    # TIMESTAMPTZ source on a non-UTC host, a cursor string rendered in
    # UTC would re-parse in local time inside `Timestamp > TIMESTAMP
    # '...'`, silently skipping hours of rows between pages — the same
    # footgun differential.register_oracle_views pins against.
    con.execute("SET TimeZone='UTC'")
    try:
        total = con.execute(f"SELECT count(*) FROM {src_table}").fetchone()[0]
        stats = MigrationStats(total_rows=total)
        if dry_run:
            n_batches = -(-total // batch_size) if total else 0
            print(
                f"[dry-run] would migrate {total:,} rows from {src_table} "
                f"in {n_batches} batches of {batch_size:,}"
            )
            return stats
        # Keyset cursor is exclusive (ts > cursor): rows sharing the page's
        # last timestamp are skipped on the next page — equivalent to the
        # catalog's write-side dedup on (instrument, timestamp), which
        # would collapse them anyway (ReplacingMergeTree semantics, D8).
        cursor = None
        while True:
            where = f"WHERE Timestamp > TIMESTAMP '{cursor}'" if cursor else ""
            page = con.execute(
                f"""
                SELECT timezone('UTC', Timestamp) AS timestamp,
                       Bid AS bid, Ask AS ask
                FROM {src_table} {where}
                ORDER BY Timestamp
                LIMIT {batch_size}
                """
            ).fetch_arrow_table()
            if page.num_rows == 0:
                break
            pdf = page.to_pandas()
            batch = normalize(spark.createDataFrame(pdf), instrument)
            catalog.write_ticks(batch, table)
            stats.rows_migrated += page.num_rows
            stats.batches_processed += 1
            cursor = str(pdf["timestamp"].max())
            print(
                f"  batch {stats.batches_processed}: "
                f"{stats.rows_migrated:,}/{total:,} rows "
                f"({stats.rows_per_second():,.0f} rows/s)"
            )
        return stats
    finally:
        con.close()


def migrate(
    spark: SparkSession,
    source: str | Path,
    base: str | Path,
    instrument: str,
    table: str = "raw_spread_ticks",
    batch_size: int = 1_000_000,
    source_table: str | None = None,
    dry_run: bool = False,
) -> MigrationStats:
    inst = validate_pair(instrument)
    validate_variant(table.removesuffix("_ticks"))
    source = Path(source)
    catalog = ParquetCatalog(base)
    catalog.ensure_schema()
    if source.suffix == ".duckdb":
        return migrate_duckdb_source(
            spark, source, catalog, inst, table, batch_size, source_table, dry_run
        )
    return migrate_file_source(spark, source, catalog, inst, table, dry_run)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help=".duckdb file, parquet, or csv")
    ap.add_argument("--base", required=True, help="catalog root directory")
    ap.add_argument("--instrument", required=True)
    ap.add_argument("--table", default="raw_spread_ticks",
                    choices=["raw_spread_ticks", "standard_ticks"])
    ap.add_argument("--source-table", default=None)
    ap.add_argument("--batch-size", type=int, default=1_000_000)
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    from exness_data_preprocess_spark.session import get_spark

    spark = get_spark("migrate-store")
    stats = migrate(
        spark,
        args.source,
        args.base,
        args.instrument,
        args.table,
        args.batch_size,
        args.source_table,
        args.dry_run,
    )
    print(
        f"done: {stats.rows_migrated:,}/{stats.total_rows:,} rows in "
        f"{stats.batches_processed} batches"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
