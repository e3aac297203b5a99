"""Distributed connected components over a duplicate-pair edge list.

Near-dup detection (MinHash/LSH, SimHash, n-gram Jaccard — operators/dedup.py)
emits *pairs*; a dedup pipeline then needs *clusters* so it can keep one
canonical document per group and drop the rest. That grouping is connected
components on the pair graph.

Algorithm: iterative min-label propagation with pointer jumping.  Each round
every vertex takes the minimum label over

  - its own label,
  - its neighbors' labels (one hash join edges ⋈ labels),
  - its label's label (one self-join — "pointer jumping").

Plain neighbor propagation needs O(diameter) rounds; the pointer-jumping
join contracts label chains by half each round, giving O(log n) rounds on
path-shaped worst cases while near-dup graphs (dense cliques with tiny
diameter) converge in 2-3.  Every round is two shuffles on uniformly-hashed
ids — no single-task stage, no driver-side graph state, so the same loop
runs on 10^9 edges across 1000 executors.  This is the DataFrame rendering
of the alternating-star family (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) with the simpler contraction rule.

Reference parity: the reference has no graph operator (its dedup is the
ReplacingMergeTree exact-key engine, src/exness_data_preprocess/
clickhouse_manager.py:139-176); this extends the same dedup surface to the
near-dup clusters a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "canonical_docs", "best_docs_per_cluster"]


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    id_col: str = "doc_id",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every vertex with the smallest vertex id reachable from it.

    ``edges`` is an undirected pair list (each pair once, either order);
    ``vertices`` supplies the full id universe so singletons (docs with no
    near-dup) come out labeled with themselves.

    Returns ``(id_col, component)`` with ``component`` = min id of the
    connected component.  Deterministic — safe under the value-hash oracle.
    """
    # Symmetrize once; only ids travel through the loop. Partitioned on
    # the per-round JOIN key (review find: a repartition on 'src' never
    # satisfied the neighbor join, which keys on 'dst' — the cached
    # layout was useless and every round re-shuffled the full edge list).
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.repartition("dst").persist()

    labels = vertices.select(
        F.col(id_col).cast("long").alias("id"), F.col(id_col).cast("long").alias("comp")
    )
    # min-label propagation needs NUMERIC ids. Under ANSI mode a
    # non-numeric id would eventually fail the main cast mid-loop with a
    # raw CAST_INVALID_INPUT; under non-ANSI configs it would cast to
    # NULL silently, the Σcomp probe would return NULL, and None == None
    # would "converge" on round 1 with all-NULL components —
    # canonical_docs then drops EVERY document (review find). One
    # bounded try_cast probe raises the contract violation up front in
    # both configurations.
    bad = vertices.filter(
        F.col(id_col).isNotNull()
        & F.col(id_col).try_cast("long").isNull()
    ).limit(1).count()
    if bad:
        raise ValueError(
            f"connected_components requires numeric ids; {id_col!r} has "
            "values that do not cast to long (map string ids to dense "
            "longs first)"
        )

    # Convergence probe: every per-row label is the least() of candidates
    # that include the row's own label, so labels are monotonically
    # non-increasing — Σcomp strictly decreases iff any row changed. One
    # single-stage reduce over the checkpointed frame per round, instead of
    # a labels⋈labels diff join.
    from exness_data_preprocess_spark.cache import (
        checkpoint_rdd_id,
        release_checkpoints,
    )

    spark = edges.sparkSession
    prev_sum: int | None = None
    prev_round_ckpt: int | None = None
    for _ in range(max_iterations):
        # min over neighbors' labels
        nb = (
            sym.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("comp").alias("nb_comp"))
        )
        stepped = (
            labels.join(nb, "id", "left")
            .select("id", F.least("comp", "nb_comp").alias("comp"))
        )
        # pointer jumping: comp := label(comp)  (labels only shrink, so
        # least() is the correct merge)
        jump = labels.select(
            F.col("id").alias("comp"), F.col("comp").alias("jump_comp")
        )
        labels = (
            stepped.join(jump, "comp", "left")
            .select("id", F.least("comp", "jump_comp").alias("comp"))
            .localCheckpoint()  # truncate the per-round lineage
        )
        # The new checkpoint is materialized (eager) and, being
        # truncated, references nothing from earlier rounds — release
        # the superseded round's checkpoint NOW instead of waiting for
        # driver GC, bounding resident state to ONE round's labels
        # regardless of convergence depth (at 100 TB, O(log n) rounds
        # of full label sets would otherwise stack up in executor
        # storage). DataFrame.unpersist can't reach checkpoint storage;
        # the id comes from THIS frame's LogicalRDD (exact ownership —
        # a global persistent-map diff could claim a concurrent job's
        # checkpoint, review find).
        this_ckpt = checkpoint_rdd_id(labels)
        if prev_round_ckpt is not None:
            release_checkpoints(spark, {prev_round_ckpt})
        prev_round_ckpt = this_ckpt
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    sym.unpersist()
    return labels.select(F.col("id").alias(id_col), F.col("comp").alias("component"))


def canonical_docs(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep exactly one doc per component: the component representative
    (min id).  The join is on the id — a broadcast when the component map
    is small, a co-partitioned hash join otherwise."""
    keep = components.filter(F.col(id_col) == F.col("component")).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def best_docs_per_cluster(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Dedup resolution: per near-dup cluster, the single doc a pipeline
    keeps — the highest-``quality_col`` member, ties broken by lowest id.

    :func:`canonical_docs` keeps the min-id representative; real corpus
    curation keeps the *best* member of each duplicate family (longest /
    highest-scored — the Dolma/FineWeb rule), which needs the quality
    column, not just the component map.

    One hash join on the id (co-partitioned, or broadcast when the
    component map is small) and one partial-aggregable ``groupBy`` on the
    component key — ``max_by`` over a ``(quality, -id)`` struct does the
    argmax with the tie-break inside the aggregate, so there is no
    per-cluster window sort and map-side combine applies. Cluster keys
    are near-dup families (tiny groups), so no skew.

    Returns one row per multi-member cluster: ``component,
    cluster_size, kept_<id>, kept_<quality>, dropped_<quality>`` (the
    payload volume the dedup pass removes).
    """
    joined = docs.select(
        F.col(id_col).cast("long").alias("_id"),
        # keep the quality column's native type: a long cast would
        # silently truncate fractional scores, collapsing every cluster
        # into an id tie-break (review find)
        F.col(quality_col).alias("_q"),
    ).join(
        components.select(
            F.col(id_col).cast("long").alias("_id"), "component"
        ),
        "_id",
    )
    pick = F.struct(F.col("_q"), (-F.col("_id")).alias("_neg"))
    return (
        joined.groupBy("component")
        .agg(
            F.count("*").alias("cluster_size"),
            F.sum("_q").alias("_total"),
            F.max_by(F.col("_id"), pick).alias(f"kept_{id_col}"),
            F.max("_q").alias(f"kept_{quality_col}"),
        )
        .filter(F.col("cluster_size") >= 2)
        .select(
            "component",
            "cluster_size",
            f"kept_{id_col}",
            f"kept_{quality_col}",
            (F.col("_total") - F.col(f"kept_{quality_col}")).alias(
                f"dropped_{quality_col}"
            ),
        )
    )
