"""Mergeable distinct-count sketches — the approximate layer every
OLAP engine ships for COUNT(DISTINCT) at scale.

Two families, by contract:

- **KMV (k-minimum-values)** — Bar-Yossef et al. (RANDOM'02), Beyer et
  al. (SIGMOD'07): keep the k smallest hash values of the distinct
  set; estimate ``(k-1) * H / u_(k)`` where ``u_(k)`` is the k-th
  smallest hash and ``H`` the hash-space size. Implemented here over
  the engine's md5-uniform idiom in PURE integer arithmetic
  (48-bit hash space, bigint multiply + integer divide), so the
  estimate is bit-identical in any engine that can run the same SQL —
  this is the ORACLE-CHECKABLE sketch. Relative error ≈ 1/sqrt(k-2).
- **HLL (DataSketches)** — Spark's ``hll_sketch_agg`` /
  ``hll_union_agg`` built-ins: the production path. Sketches are
  opaque binaries but MERGEABLE, which is the 100 TB story: aggregate
  once per partition/day/source, persist the sketches, and answer any
  rollup later by unioning them — no re-scan of raw data. Constant
  memory per group (≈ 2^lgk bytes), one map-side-combined agg shuffle.

KMV at scale: the distinct pass and the per-group rank-k both shuffle
on the group key once; rank-k is a window row_number bounded to k rows
kept per group. HLL replaces the window with a constant-size
accumulator — prefer it when the oracle-parity contract isn't needed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_HASH_BITS = 48  # (k-1) * 2^48 fits a bigint for any k < 2^15


def _h48(col: Column) -> Column:
    """md5-uniform hash into [0, 2^48) — the engine's cross-engine
    deterministic uniform, truncated so the KMV numerator stays in
    bigint range."""
    return F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, 12), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    salt_partitions: int = 32,
) -> DataFrame:
    """Per-group distinct-count estimate via the k-minimum-values
    sketch. Returns ``group_cols + (n_seen, est_distinct)`` where
    ``n_seen`` is the number of distinct hashes retained (≤ k) and
    ``est_distinct`` the KMV estimate — EXACT (= true distinct count
    of hashes) whenever the group has fewer than k distinct values.

    Deterministic and engine-portable: estimate = (k-1) << 48 div u_k,
    all bigint ops over md5 hashes — no floats anywhere.

    Skew: a naive per-group rank-k window sorts a hot group's ENTIRE
    distinct-hash set inside one task (a billion-distinct group = a
    one-task sort). The k smallest of a group are always among the
    union of the k smallest of each hash-salt class, so a local
    rank-k per (group, salt) first shrinks every group to
    ≤ ``salt_partitions``·k rows before the global rank-k window —
    bounded work per task at any group cardinality, identical output
    (pass ``salt_partitions=1`` to disable)."""
    if k < 3:
        raise ValueError(f"k must be >= 3 (error ~ 1/sqrt(k-2)), got {k}")
    g = list(group_cols)
    # NULL values don't count toward COUNT(DISTINCT) — and Spark sorts
    # nulls first while DuckDB sorts them last, so letting a null hash
    # into the rank-k window would also break oracle parity
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*g, _h48(F.col(value_col)).alias("h"))
        .distinct()
    )
    if salt_partitions > 1:
        w1 = W.partitionBy(*g, F.pmod(F.col("h"), F.lit(salt_partitions))).orderBy("h")
        d = (
            d.withColumn("__rn1", F.row_number().over(w1))
            .filter(F.col("__rn1") <= k)
            .drop("__rn1")
        )
    w = W.partitionBy(*g).orderBy("h")
    ranked = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = ranked.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n_seen"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
    )
    # nullif guards kth = 0 (probability ~k/2^48, but ANSI div would
    # abort the job); n_seen is the honest fallback either way
    est = F.coalesce(
        F.expr(f"{(k - 1) << _HASH_BITS}L div nullif(kth, 0)"), F.col("n_seen")
    )
    return agg.select(*g, "n_seen", est.cast("long").alias("est_distinct"))


def kmv_oracle_sql(table: str, group_cols: Sequence[str], value_col: str, k: int = 64) -> str:
    """The DuckDB twin of :func:`kmv_distinct` — same hashes, same
    integer arithmetic, bit-identical estimates."""
    g = ", ".join(group_cols)
    return f"""
WITH d AS (
  SELECT DISTINCT {g},
         CAST(('0x' || substring(md5(CAST({value_col} AS VARCHAR)), 1, 12)) AS BIGINT) AS h
  FROM {table} WHERE {value_col} IS NOT NULL),
ranked AS (
  SELECT {g}, h, ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY h) AS rn
  FROM d),
agg AS (
  SELECT {g}, CAST(COUNT(*) AS BIGINT) AS n_seen,
         MAX(CASE WHEN rn = {k} THEN h END) AS kth
  FROM ranked WHERE rn <= {k} GROUP BY {g})
SELECT {g}, n_seen,
       CAST(COALESCE({(k - 1) << _HASH_BITS} // NULLIF(kth, 0), n_seen)
            AS BIGINT) AS est_distinct
FROM agg
"""


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group DataSketches HLL: returns ``group_cols + (sketch,
    est_distinct)``. Keep the ``sketch`` column when persisting
    pre-aggregates — it is what makes later rollups free."""
    g = list(group_cols)
    sk = F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    out = df.groupBy(*g).agg(sk)
    return out.select(
        *g, "sketch", F.hll_sketch_estimate("sketch").cast("long").alias("est_distinct")
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Merge persisted per-partition HLL sketches up to a coarser
    grouping — the mergeability contract: estimating over unioned
    sketches equals estimating over the union of the raw data, with
    NO access to the raw data. This is how a 100 TB store answers
    'distinct users per month' from per-day pre-aggregates."""
    g = list(group_cols)
    merged = sketches.groupBy(*g).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )
    return merged.select(
        *g,
        sketch_col,
        F.hll_sketch_estimate(sketch_col).cast("long").alias("est_distinct"),
    )
