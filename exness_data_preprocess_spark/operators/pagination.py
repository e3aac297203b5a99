"""Keyset (cursor) pagination and batch iteration (SURVEY F3/F4).

Reference (clickhouse_query_engine.py:390-534): fetch ``page_size + 1``
rows with ``timestamp > cursor ORDER BY timestamp``, trim, emit
``next_cursor`` = last timestamp and ``has_more``; the batch iterator loops
pages. Keyset pagination beats OFFSET because each page is an indexed range
scan — in Spark the analog is a **pushed-down range predicate** on the sort
column (visible as ``PushedFilters: [GreaterThan(timestamp, ...)]``), so
each page reads only the rowgroups past the cursor instead of
scanning-and-skipping.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exness_data_preprocess_spark.models import CursorResult


def paginate_keyset(
    df: DataFrame,
    cursor: str | None,
    page_size: int,
    order_col: str = "timestamp",
) -> CursorResult:
    """One page: rows strictly after ``cursor``, ordered, page_size-capped.

    Completeness contract (review find, made explicit): a single-column
    strict-``>`` cursor loses rows that SHARE the boundary value when a
    page cut lands inside the tie group. This operator therefore
    requires ``order_col`` to be unique within the paged frame — true
    for every catalog tick table, where write-time dedup enforces one
    row per (instrument, timestamp) (ReplacingMergeTree parity,
    sources/catalog.py) and queries are per-instrument, exactly the
    reference's contract (clickhouse_query_engine.py:390-534 pages the
    same deduped ordering). For a frame with duplicate order values,
    page on a composite unique key instead.
    """
    page = df
    if cursor is not None:
        # cast the cursor to the ORDER column's own type (review find: a
        # hard-coded timestamp cast broke pagination on any non-timestamp
        # sort column under ANSI mode)
        page = page.filter(
            F.col(order_col)
            > F.lit(cursor).cast(df.schema[order_col].dataType)
        )
    rows = (
        page.orderBy(order_col)
        .limit(page_size + 1)
        .toPandas()
    )
    has_more = len(rows) > page_size
    if has_more:
        rows = rows.iloc[:page_size]
    next_cursor = None
    if has_more and len(rows) > 0:
        next_cursor = str(rows.iloc[-1][order_col])
    return CursorResult(
        data=rows, next_cursor=next_cursor, has_more=has_more, page_size=page_size
    )


def iter_batches(
    df: DataFrame,
    batch_size: int = 100_000,
    order_col: str = "timestamp",
    max_batches: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Generator over fixed-size pages (clickhouse_query_engine.py:474-534).

    For Spark-native consumers prefer the DataFrame itself (or
    ``toLocalIterator``); this exists for API parity with the reference's
    memory-bounded client iteration.
    """
    cursor: str | None = None
    count = 0
    while True:
        result = paginate_keyset(df, cursor, batch_size, order_col)
        if len(result.data) == 0:
            break
        yield result.data
        count += 1
        if max_batches is not None and count >= max_batches:
            break
        if not result.has_more:
            break
        cursor = result.next_cursor
