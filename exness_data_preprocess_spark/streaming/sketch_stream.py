"""Streaming cardinality sketches (KMV and HLL): bounded-state distinct
tracking over a document stream, micro-batch by micro-batch.

The mergeability the batch operator documents (union-then-keep-k-smallest,
tests/test_sketches.py::test_kmv_merge_property) is exactly what makes a
KMV sketch a *streaming* aggregate: each micro-batch reduces to its own
k-smallest distinct hashes per group, merges into the carried state, and
re-prunes — state is <= k rows per group FOREVER, no matter how much
stream has flowed. This is the production steady-state for "how many
distinct tokens/users/keys have we seen per partition" where an exact
distinct would hold the whole key universe in the state store. The HLL
twin (run_hll_available_now) is simpler still: registers combine by
register-wise MAX — no prune, no distinct — with state <= m rows/group.

The drained estimate is bit-identical to the batch sketch over the same
rows (merge property is exact, not approximate-in-composition), which is
what the registry oracle checks.

Scale shape per batch: one distinct + one salted bounded top-k over the
BATCH only (operators/skew.py), then a merge over <= 2k rows per group.
State advances through driver-held plan state (localCheckpoint, previous
round released by exact RDD id — the operators/graph.py idiom) exactly
like streaming/cdc_stream.py; a durable deployment would write the state
table to parquet/Delta per batch instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exness_data_preprocess_spark.cache import (
    checkpoint_rdd_id,
    release_checkpoints,
)
from exness_data_preprocess_spark.operators.sketches import (
    KMV_K,
    kmv_estimate_from_state,
    kmv_value_hashes,
)
from exness_data_preprocess_spark.operators.skew import topk_per_group_bounded

__all__ = ["run_kmv_available_now", "run_hll_available_now"]


def run_kmv_available_now(
    stream_df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = KMV_K,
    query_name: str = "kmv_sketch",
    timeout_seconds: float = 300.0,
) -> DataFrame:
    """Drain the available backlog through per-batch KMV merge and return
    the final per-group estimate (batch DataFrame:
    ``group_col, kth_h60, est_distinct``)."""
    state: dict = {"sk": None, "ckpt": None}

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        bs = topk_per_group_bounded(
            kmv_value_hashes(batch_df, group_col, value_col),
            (group_col,),
            ("h",),
            k,
        )
        if state["sk"] is not None:
            # distinct: the same hash can sit in both the carried state
            # and the new batch's sketch — double rows would let a dup
            # crowd a genuine k-th value out of the prune below
            bs = state["sk"].unionByName(bs).distinct()
        merged = topk_per_group_bounded(
            bs, (group_col,), ("h",), k
        ).localCheckpoint()
        prev = state["ckpt"]
        state["sk"], state["ckpt"] = merged, checkpoint_rdd_id(merged)
        if prev is not None:
            release_checkpoints(merged.sparkSession, {prev})

    q = (
        stream_df.writeStream.foreachBatch(_merge)
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
        raise TimeoutError(
            f"availableNow KMV drain {query_name!r} did not finish within "
            f"{timeout_seconds}s; partial sketch discarded"
        )
    if state["sk"] is None:
        # clean drain with ZERO micro-batches (empty landing dir): the
        # correct answer is an empty estimate, not a timeout complaint
        spark = stream_df.sparkSession
        empty = spark.createDataFrame(
            [], stream_df.select(group_col).schema
        ).withColumn("h", F.lit(None).cast("bigint"))
        return kmv_estimate_from_state(empty, group_col, k)
    return kmv_estimate_from_state(state["sk"], group_col, k)


def run_hll_available_now(
    stream_df: DataFrame,
    group_col: str,
    value_col: str,
    query_name: str = "hll_sketch",
    timeout_seconds: float = 300.0,
) -> DataFrame:
    """Drain the available backlog through per-batch HLL register merge
    and return the final per-group estimate (batch DataFrame:
    ``group_col, n_registers, est_hll``).

    Even simpler than the KMV merge: registers combine by register-wise
    MAX (no prune step, no distinct), so state is <= m rows per group
    forever and the drained estimate is bit-identical to the one-pass
    batch sketch.
    """
    from exness_data_preprocess_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )

    state: dict = {"regs": None, "ckpt": None}

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        br = hll_registers(
            batch_df.filter(F.col(value_col).isNotNull()),
            group_col,
            value_col,
        )
        if state["regs"] is not None:
            br = (
                state["regs"]
                .unionByName(br)
                .groupBy(group_col, "bucket")
                .agg(F.max("r").alias("r"))
            )
        merged = br.localCheckpoint()
        prev = state["ckpt"]
        state["regs"], state["ckpt"] = merged, checkpoint_rdd_id(merged)
        if prev is not None:
            release_checkpoints(merged.sparkSession, {prev})

    q = (
        stream_df.writeStream.foreachBatch(_merge)
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
        raise TimeoutError(
            f"availableNow HLL drain {query_name!r} did not finish within "
            f"{timeout_seconds}s; partial sketch discarded"
        )
    if state["regs"] is None:
        spark = stream_df.sparkSession
        empty = (
            spark.createDataFrame([], stream_df.select(group_col).schema)
            .withColumn("bucket", F.lit(None).cast("bigint"))
            .withColumn("r", F.lit(None).cast("int"))
        )
        return hll_estimate_from_registers(empty, group_col)
    return hll_estimate_from_registers(state["regs"], group_col)
