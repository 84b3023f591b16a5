"""Deterministic global shuffle + shard assignment for training-data
export — the step between curation and the trainer: examples must be
(a) shuffled so consecutive records are decorrelated, (b) split into
a fixed number of shards, and (c) REPRODUCIBLE — the same corpus,
salt, and shard count must yield byte-identical shards on any
cluster size, any engine, any partitioning (re-running an export
after a node loss cannot silently reorder training data).

The assignment is pure hashing, never `rand()`/`df.sample` (both
partitioning-dependent): shard = top-60-bits-of-md5(salt, key) mod
n_shards — the engine's oracle-parity hash idiom shared with the
sampling operators — and the position WITHIN a shard orders by the
same hash (key tiebreak). Scale shape: one shuffle keyed by shard and
a per-shard local sort (`row_number` over the shard partition); there
is NO global sort — at 100 TB pick n_shards large enough that a shard
fits an executor's sort buffer (the usual 2-8 GiB shard convention),
which also makes the output directly consumable as training files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from a2b_spark.operators.rangejoin import _hash60


def shuffle_shards(
    df: DataFrame, key_col: str, n_shards: int, salt: str = ""
) -> DataFrame:
    """Add (shard, pos) to ``df``: shard ∈ [0, n_shards) by salted
    md5 of ``key_col``, pos = 1-based rank inside the shard by the
    same hash (ties — only possible on key collisions — break by the
    key's string form). Deterministic across engines/runs/cluster
    layouts; distinct keys required for a meaningful order."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    clash = {"shard", "pos"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with the reserved "
            "shard/pos output columns; rename them first"
        )
    import uuid

    # uuid-suffixed temp name (the repo's compact() convention): a
    # fixed "__h60" would silently destroy a user column of that name
    hcol = f"__h60_{uuid.uuid4().hex[:8]}"
    # A NULL key would hash to NULL → shard NULL/undefined pos, and a
    # partitioned write would silently drop the row into
    # __HIVE_DEFAULT_PARTITION__ — breaking the byte-identical-shard
    # contract. Fail loudly AT EXECUTION (no extra validation scan:
    # the check rides the same expression as the hash).
    h = F.when(
        F.col(key_col).isNotNull(), _hash60(key_col, salt)
    ).otherwise(
        F.raise_error(
            F.lit(
                f"shuffle_shards: NULL value in key column {key_col!r} — "
                "shard assignment is undefined for NULL keys; filter or "
                "fill them first"
            )
        )
    )
    with_shard = df.withColumn(hcol, h).withColumn(
        "shard", (F.col(hcol) % n_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(
        F.col(hcol), F.col(key_col).cast("string")
    )
    return (
        with_shard.withColumn("pos", F.row_number().over(w).cast("long"))
        .drop(hcol)
    )
