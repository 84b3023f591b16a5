"""Skew-aware join helpers.

AQE's skew-join splitting (on by default in the session) handles most
runtime skew in sort-merge joins. Salting is the explicit, planner-
independent fallback for pathological keys — e.g. a mapping-table join
where 1% of keys carry 50% of rows — and the classic pattern for
skewed aggregations.

No counterpart in the reference (single-threaded, skew-free by
construction); this is the engine's 100 TB surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the hot-key shuffle spread over ``salt`` buckets:
    the (large, skewed) left side gets a random salt per row; the
    (smaller) right side is replicated ``salt`` times via a range
    explode. Shuffle keys become (key..., __salt) so one hot key lands
    on ``salt`` reducers instead of one.

    Use when one side is big AND skewed and the other is too large to
    broadcast but small enough to replicate ``salt``×.

    Only join types that never EMIT unmatched right rows are allowed:
    the right side is replicated ``salt`` times, so right/full outer
    joins would surface each unmatched right row ``salt`` times."""
    if how not in {"inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"}:
        raise ValueError(
            f"salted_join cannot preserve unmatched right rows (how={how!r}): "
            "the replicated right side would duplicate them salt times"
        )
    lk = list(keys)
    l_salted = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_salted.join(r_salted, on=lk + ["__salt"], how=how)
    return out.drop("__salt")


def salted_agg_count(df: DataFrame, keys: Sequence[str], salt: int = 16) -> DataFrame:
    """Two-phase skewed COUNT: pre-aggregate on (keys, salt), then
    combine — the hot key's rows hit ``salt`` partial aggregators.
    (Spark's hash aggregate already does map-side partials; explicit
    salting matters when the *reduce* side itself is the bottleneck,
    e.g. exact distinct counts per hot key.)"""
    lk = list(keys)
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(*lk, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*lk).agg(F.sum("__partial").cast("long").alias("n"))
