"""Sources and sinks: CSV/ZIP tick ingestion, partitioned parquet layout,
HTTP archive download (driver-side)."""
