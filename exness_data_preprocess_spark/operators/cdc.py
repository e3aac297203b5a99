"""CDC / MERGE application: apply a keyed change batch to a snapshot.

The reference's mutation surface is ReplacingMergeTree upsert-at-insert
plus explicit DELETEs (clickhouse_manager.py:139-176, SURVEY §2.M) —
dedup semantics resolved by the storage engine at merge time. This
operator is the explicit, engine-independent rendering of the same
contract: given a snapshot (one row per key) and a change batch of
inserts/updates/deletes with a sequence column, produce the next
snapshot. That is ANSI ``MERGE`` / Delta's ``MERGE INTO`` semantics as a
pure DataFrame plan, so it runs on plain parquet tables.

Scale shape: the change batch collapses to one row per key with a
partial-aggregable ``max(struct(seq, …))`` (no per-key window sort), and
the snapshot is touched by exactly one co-partitioned anti-join on the
key — both shuffles are on the uniform key hash. At 100 TB the snapshot
side can additionally be bucketed on the key (sources/bucketed.py) to
remove its exchange entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_cdc"]


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: tuple[str, ...],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Next snapshot = ``base`` with ``changes`` applied, highest
    ``seq_col`` per key winning.

    ``base`` holds one row per key; ``changes`` carries the key columns,
    ``seq_col``, ``op_col`` and the same payload columns as ``base``.
    Any op other than ``delete_op`` is an upsert (insert-or-update — a
    key never seen in ``base`` is simply inserted, the ReplacingMergeTree
    posture); ``delete_op`` is a tombstone that removes the key.

    Deterministic under seq ties: the winning change is the lexicographic
    max of ``(seq, op, payload…)``, a total order — replays and partial
    re-shuffles cannot flip the outcome.
    """
    payload = [c for c in base.columns if c not in key_cols]
    keys = [F.col(k) for k in key_cols]
    pick = F.max(
        F.struct(
            F.col(seq_col), F.col(op_col), *[F.col(c) for c in payload]
        )
    ).alias("_m")
    latest = changes.groupBy(*keys).agg(pick).select(
        *key_cols,
        F.col(f"_m.{op_col}").alias("_op"),
        *[F.col(f"_m.{c}").alias(c) for c in payload],
    )
    unchanged = base.join(
        latest.select(*key_cols), list(key_cols), "left_anti"
    )
    # null-safe inequality (review find): a NULL op made `!=` evaluate
    # NULL, dropping the row from upserts while the anti-join still
    # removed its key from base — a silent delete, contradicting the
    # "any op other than delete_op is an upsert" contract
    upserts = latest.filter(
        ~F.col("_op").eqNullSafe(F.lit(delete_op))
    ).drop("_op")
    return unchanged.unionByName(upserts)
