"""Streaming CDC snapshot maintenance: apply a change stream to a keyed
snapshot, micro-batch by micro-batch.

The streaming rendering of :func:`~exness_data_preprocess_spark.operators.
cdc.apply_cdc` — the production shape for "keep a MERGE'd table current
from a change feed" (Spark's ``foreachBatch`` pattern; on Delta/Iceberg
the body would be a ``MERGE INTO``, here it is the same pure-DataFrame
apply against plain parquet/in-memory state). The reference's analog is
ReplacingMergeTree resolving upserts at merge time (clickhouse_manager
.py:139-176); this makes the application explicit and incremental.

Correctness contract: micro-batches must be **STRICTLY seq-monotone per
key** (a change for key k in batch i+1 carries a seq > every seq for k
in batch i). Strict, not ≥ (review find): a seq TIE straddling a batch
boundary breaks composition — ``apply_cdc``'s global tie rule picks
max(struct(seq, op, payload)) across BOTH rows, but the later batch
never sees the earlier row and its change supersedes unconditionally
(e.g. (5,'U') in batch i then (5,'D') in batch i+1: streaming deletes k,
global apply keeps the 'U' because 'U' > 'D'). Strict monotonicity is
the natural property of a CDC feed consumed in order — LSN/offset-
ordered feeds never re-issue a sequence number; under it, per-batch
application composes to the same result as one global ``apply_cdc``.
For unordered bulk backfills, use the batch operator on the whole
change set instead.

Scale shape: each micro-batch pays one max-struct combine over its own
rows plus one co-partitioned anti-join against the snapshot; snapshot
state is truncated per batch (``localCheckpoint`` here; a versioned
parquet/table write in a durable deployment) so lineage never grows
with stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from exness_data_preprocess_spark.operators.cdc import apply_cdc

__all__ = ["run_cdc_snapshot_available_now"]


def run_cdc_snapshot_available_now(
    changes_stream: DataFrame,
    base: DataFrame,
    key_cols: tuple[str, ...],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
    query_name: str = "cdc_snapshot",
    timeout_seconds: float = 300.0,
) -> DataFrame:
    """Drain the available change backlog through per-batch
    ``apply_cdc`` and return the final snapshot (batch DataFrame).

    ``availableNow`` processes the backlog in bounded micro-batches then
    stops — the catch-up/backfill mode of the long-running job. The
    snapshot advances through driver-held *plan* state: each batch's
    result is localCheckpointed (materialized on executors, lineage
    truncated) and becomes the base for the next batch.
    """
    state = {"snap": base.localCheckpoint()}

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        state["snap"] = apply_cdc(
            state["snap"],
            batch_df,
            key_cols,
            seq_col=seq_col,
            op_col=op_col,
            delete_op=delete_op,
        ).localCheckpoint()

    q = (
        changes_stream.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        drained = q.awaitTermination(timeout_seconds)
    finally:
        if q.isActive:  # pragma: no cover - only on timeout
            q.stop()
    if not drained:  # pragma: no cover - only on timeout
        # returning a snapshot missing the backlog tail would persist
        # silently stale data downstream (review find)
        raise TimeoutError(
            f"availableNow CDC drain {query_name!r} did not finish within "
            f"{timeout_seconds}s; partial snapshot discarded"
        )
    return state["snap"]
