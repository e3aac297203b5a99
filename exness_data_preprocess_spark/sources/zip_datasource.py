"""Spark 4 Python DataSource for monthly tick ZIP archives.

The ``binaryFile`` + ``mapInPandas`` path (ingest.py:47-82) materializes
each archive as a blob *row* — the whole ZIP travels through the plan as
column data before decoding. Fine at 5-50 MB per month; a hazard if an
archive is ever large. This source is the Spark-4-idiomatic alternative
(pyspark.sql.datasource, added in Spark 4.0): planning assigns one
partition per archive *path*, and each executor task opens its file
lazily and streams decoded Arrow batches — no blob ever becomes plan
data, and per-archive parallelism (the reference's per-month download
granularity, downloader.py:40-82) falls out of the partitioning.

Usage::

    register_zip_source(spark)   # also enables Python-source pushdown
    df = (spark.read.format("exness_zip")
          .option("glob", "/data/ticks/EURUSD/*.zip").load())

``glob`` expands driver-side at planning via :mod:`glob`, so it is
scoped to LOCALLY-MOUNTED filesystems (local disk, NFS, FUSE mounts) —
object-store URIs (``s3://…``) are not resolvable here; route those
through a mounted gateway or the ``binaryFile`` ingest path, which uses
Hadoop's FS layer. Paths must be reachable from executors. Output schema
is the raw CSV surface plus a filename-derived ``Instrument`` column
(``Timestamp timestamp, Bid double, Ask double, Instrument string``);
normalization to the tick schema stays in
:func:`ingest.load_ticks_zip`-style callers.

Partition pruning (the Spark analog of the reference's per-month file
layout, models.py:104-110): archive names encode instrument and month
(``Exness_{PAIR}[_Raw_Spread]_{YYYY}_{MM}.zip`` upstream,
``{PAIR}_{variant}_{YYYY}_{MM}.zip`` in the landing dir), so

- an ``Instrument`` equality/IN filter, and
- ``Timestamp`` range bounds (each archive covers one calendar month)

are consumed by ``pushFilters`` and applied at *planning*: archives whose
name proves they cannot match are never opened, never scheduled, never
read. Unparsable names are conservatively kept (they may still match).
All filters are also returned as unsupported so Spark re-applies them
row-level — pruning is pure partition elimination, never a correctness
dependency. ``.option("instrument", "EURUSD")`` prunes the same way for
sessions where ``spark.sql.python.filterPushdown.enabled`` is off.
"""

from __future__ import annotations

import datetime as dt
import re
from typing import Iterable, Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

__all__ = ["ExnessZipDataSource", "register_zip_source"]

_SCHEMA_DDL = (
    "Timestamp timestamp, Bid double, Ask double, Instrument string"
)

#: both the upstream and the landing-dir naming shapes (downloader.py:20-41)
_NAME_RE = re.compile(
    r"^(?:Exness_)?(?P<pair>[A-Za-z0-9]+?)"
    r"(?:_Raw_Spread|_raw_spread|_standard)?"
    r"_(?P<y>\d{4})_(?P<m>\d{2})\.zip$",
    re.IGNORECASE,
)


def _parse_name(path: str):
    """``(instrument, month_start, next_month_start)`` from an archive
    basename, or ``(None, None, None)`` when the name doesn't follow the
    monthly convention (such archives are never pruned)."""
    base = path.replace("\\", "/").rsplit("/", 1)[-1]
    m = _NAME_RE.match(base)
    if not m:
        return None, None, None
    y, mo = int(m.group("y")), int(m.group("m"))
    if not 1 <= mo <= 12:
        return None, None, None
    start = dt.datetime(y, mo, 1)
    nxt = dt.datetime(y + (mo == 12), mo % 12 + 1, 1)
    return m.group("pair").upper(), start, nxt


def _as_naive_dt(v):
    """Filter literals for a timestamp column arrive as datetime (or str
    in defensive cases); normalize to naive UTC-wall datetime, else None."""
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None) if v.tzinfo else v
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day)
    if isinstance(v, str):
        try:
            return dt.datetime.fromisoformat(v)
        except ValueError:
            return None
    return None


def _prune_paths(
    paths: List[str],
    instruments: set | None,
    ts_bounds: List[tuple],
) -> List[str]:
    """Drop archives whose NAME proves they cannot satisfy the filters.

    ``instruments``: allowed instrument set (None = no constraint).
    ``ts_bounds``: list of ``(op, datetime)`` with op in
    ``{">", ">=", "<", "<=", "="}`` — each must be satisfiable by some
    instant inside the archive's [month_start, next_month) interval.
    Pure function so the pruning contract is unit-testable without a
    Spark session.
    """
    kept = []
    for p in paths:
        inst, start, nxt = _parse_name(p)
        if inst is None:
            kept.append(p)  # unknown shape: cannot prove non-match
            continue
        if instruments is not None and inst not in instruments:
            continue
        ok = True
        for op, v in ts_bounds:
            if op in (">", ">="):
                # some instant in [start, nxt) exceeds v ⇔ interval top > v
                ok = nxt > v
            elif op == "<":
                ok = start < v
            elif op == "<=":
                ok = start <= v
            elif op == "=":
                ok = start <= v < nxt
            if not ok:
                break
        if ok:
            kept.append(p)
    return kept


class _ZipPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _ZipReader(DataSourceReader):
    def __init__(self, options: dict):
        glob_pat = options.get("glob") or options.get("path")
        if not glob_pat:
            raise ValueError(
                "exness_zip requires .option('glob', <pattern>) or a load path"
            )
        self.glob_pat = glob_pat
        # option-level pruning works even without filter pushdown enabled
        opt_inst = options.get("instrument")
        # kept for read(): archives with unparsable names fall back to
        # the caller-declared instrument
        self.opt_instrument: str | None = opt_inst.upper() if opt_inst else None
        self.instruments: set | None = (
            {opt_inst.upper()} if opt_inst else None
        )
        self.ts_bounds: List[tuple] = []

    # -- planning-time pruning (SURVEY A1/A2 pushdown) ---------------------
    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        """Consume Instrument/Timestamp constraints for partition-level
        archive pruning; EVERY filter is handed back to Spark for
        row-level application, so pruning can only skip work, never
        change results."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0].lower() if attr and len(attr) == 1 else None
            if col == "instrument":
                if isinstance(f, EqualTo) and isinstance(f.value, str):
                    allowed = {f.value.upper()}
                    self.instruments = (
                        allowed
                        if self.instruments is None
                        else self.instruments & allowed
                    )
                elif isinstance(f, In):
                    allowed = {
                        v.upper() for v in f.value if isinstance(v, str)
                    }
                    self.instruments = (
                        allowed
                        if self.instruments is None
                        else self.instruments & allowed
                    )
            elif col == "timestamp":
                v = _as_naive_dt(getattr(f, "value", None))
                if v is None:
                    continue
                if isinstance(f, GreaterThan):
                    self.ts_bounds.append((">", v))
                elif isinstance(f, GreaterThanOrEqual):
                    self.ts_bounds.append((">=", v))
                elif isinstance(f, LessThan):
                    self.ts_bounds.append(("<", v))
                elif isinstance(f, LessThanOrEqual):
                    self.ts_bounds.append(("<=", v))
                elif isinstance(f, EqualTo):
                    self.ts_bounds.append(("=", v))
            elif isinstance(f, IsNotNull):
                pass  # never prunes an archive
        return filters  # Spark re-applies everything row-level

    def partitions(self):  # planning: one partition per surviving archive
        import glob as globmod

        paths = sorted(globmod.glob(self.glob_pat))
        if not paths:
            raise FileNotFoundError(
                f"exness_zip: no archives match {self.glob_pat!r}"
            )
        kept = _prune_paths(paths, self.instruments, self.ts_bounds)
        # every archive pruned is a valid (empty) scan, not an error
        return [_ZipPartition(p) for p in kept]

    def read(self, partition: _ZipPartition) -> Iterator:
        # an all-archives-pruned plan has no partitions; Spark then calls
        # read(None) once — that is an empty scan, not an error
        if partition is None:
            return
        # executor-side: stream Arrow batches straight from the file —
        # the archive bytes never enter the query plan
        import zipfile

        import pandas as pd
        import pyarrow as pa

        inst, _, _ = _parse_name(partition.path)
        if inst is None:
            # unparsable archive name (kept at pruning: "may still
            # match"): fall back to the caller-declared instrument, else
            # fail loudly — emitting NULL Instrument made a pushed-down
            # instrument filter silently drop every row of such archives
            # while unfiltered consumers got null keys (review find)
            inst = self.opt_instrument
            if inst is None:
                raise ValueError(
                    f"exness_zip: cannot derive instrument from archive "
                    f"name {partition.path!r}; pass "
                    f".option('instrument', <PAIR>) for non-standard names"
                )
        # pandas parses to ns precision; Spark's Arrow bridge takes µs
        schema = pa.schema(
            [
                ("Timestamp", pa.timestamp("us")),
                ("Bid", pa.float64()),
                ("Ask", pa.float64()),
                ("Instrument", pa.string()),
            ]
        )
        with zipfile.ZipFile(partition.path) as zf:
            for name in zf.namelist():
                if not name.lower().endswith(".csv"):
                    continue
                with zf.open(name) as fh:
                    for chunk in pd.read_csv(
                        fh,
                        usecols=["Timestamp", "Bid", "Ask"],
                        parse_dates=["Timestamp"],
                        chunksize=500_000,
                    ):
                        ts = pa.Array.from_pandas(
                            chunk["Timestamp"].dt.tz_localize(None)
                        ).cast(pa.timestamp("us"))
                        n = len(chunk)
                        yield pa.RecordBatch.from_arrays(
                            [
                                ts,
                                pa.array(chunk["Bid"], pa.float64()),
                                pa.array(chunk["Ask"], pa.float64()),
                                pa.array([inst] * n, pa.string()),
                            ],
                            schema=schema,
                        )


class ExnessZipDataSource(DataSource):
    """``spark.read.format("exness_zip")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "exness_zip"

    def schema(self) -> str | StructType:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _ZipReader(self.options)


def register_zip_source(spark) -> None:
    """Idempotent registration helper.

    Also enables ``spark.sql.python.filterPushdown.enabled`` — Spark 4.1
    *raises* on a Python source that implements ``pushFilters`` when the
    flag is off, rather than silently skipping pushdown."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ExnessZipDataSource)
