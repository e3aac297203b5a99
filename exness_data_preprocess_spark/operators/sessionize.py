"""Batch sessionization: split each key's event stream into sessions at
inactivity gaps.

The batch twin of ``streaming/stateful.py::stateful_gap_sessions`` (same
gap rule, executed as one keyed window pass instead of a state store):
``is_new = gap_to_previous > threshold``, ``session_seq = running sum of
is_new``.  One hash exchange on the key, sort within partitions — the
canonical Spark sessionization plan; no global window, state bounded by
the per-key event count.

Determinism: the window orders by (event time, tiebreaker), a total order,
so lag/sum are reproducible row-for-row in any engine — required by the
value-hash differential and by re-runs at 100 TB (a partial re-run must
assign identical session ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize"]


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Append ``session_seq`` (1-based per key) and ``is_session_start``.

    A new session starts when the gap to the key's previous event exceeds
    ``gap_seconds`` (strictly greater — an exactly-gap-long pause stays in
    the session, matching the streaming operator's rule).
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us, F.col(tiebreak_col))
    prev = F.lag(us).over(w)
    is_new = (
        prev.isNull() | (us - prev > gap_seconds * 1_000_000)
    ).cast("int")
    return df.withColumn("is_session_start", is_new).withColumn(
        "session_seq",
        F.sum("is_session_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
