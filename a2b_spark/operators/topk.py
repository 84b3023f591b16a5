"""Skew-bounded top-k per group.

``row_number() OVER (PARTITION BY g ORDER BY ...) <= k`` sorts each
group inside ONE task — the canonical straggler when a group is hot
(one nation with half the customers, one domain with half the crawl).
AQE's skew machinery splits joins, not window partitions, so the fix
is structural: a LOCAL rank-k per (group, salt) first — each group's
true top-k rows necessarily rank ≤ k inside their own salt class — so
the global window then sees at most ``salts``·k rows per group, a
bounded sort at any group cardinality. Output is identical to the
naive window, including the rank values.

The same pattern is inlined in the KMV sketch (operators/sketch.py,
ascending-hash variant); this module is the general helper for
arbitrary orderings.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rk",
    salts: int = 32,
) -> DataFrame:
    """All input columns + ``rank_col`` (1-based, int) for the top-k
    rows of each group under ``order_by`` (pass explicit asc/desc
    Columns; include a unique tiebreak for determinism). ``salts=1``
    disables the pre-pass (plain window)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    g = list(group_cols)
    staged = df
    if salts > 1:
        # ANY row partition preserves correctness (a group's top-k is
        # always inside the union of per-class top-k), so the salt is
        # simply the physical partition id: byte-identical hot rows
        # spread across classes (they live in many input partitions),
        # no column is hashed (a row hash would fail analysis on
        # MapType columns and collapse identical rows into one class),
        # and each class is at most a task's worth of rows by
        # construction. The partition id is layout-dependent, but the
        # FINAL window re-ranks the surviving ≤ salts·k rows, so
        # output rows and ranks are identical for any salting.
        salt = F.pmod(F.spark_partition_id(), F.lit(salts))
        w1 = W.partitionBy(*g, salt).orderBy(*order_by)
        staged = (
            df.withColumn("__rn1", F.row_number().over(w1))
            .filter(F.col("__rn1") <= k)
            .drop("__rn1")
        )
    w = W.partitionBy(*g).orderBy(*order_by)
    return (
        staged.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
        .withColumn(rank_col, F.col(rank_col).cast("int"))
    )
