"""Distributed prefix sum (running total over a global order) and the
sequence-packing operator built on it.

A naive ``SUM() OVER (ORDER BY k)`` with no PARTITION BY collapses the
whole table into ONE window partition — a single task, the canonical
100 TB scale-killer. The distributed formulation is the classic
two-phase parallel scan:

    1. range-partition rows by the order key (Spark's
       ``repartitionByRange`` samples the key distribution, so chunks
       are balanced even under skewed keys);
    2. local pass: per-partition running totals via a window
       partitioned by ``spark_partition_id()`` (parallel, in-memory
       sort per chunk — no shuffle beyond the range partition itself);
    3. per-partition totals (one tiny row per partition) come back to
       the driver, an exclusive scan over ≤ a few thousand scalars
       computes each chunk's global offset;
    4. map-side: running = local running + offset[pid] via a literal
       ``MAP`` lookup (no join, no broadcast variable needed).

The driver-side collect in step 3 is O(#partitions) scalars — bounded
and independent of row count, the legitimate kind of driver action.

Sequence packing (``pack_sequences``) assigns documents to fixed
token-budget training sequences in deterministic key order:
``pack_id = floor((running - tokens) / budget)`` — i.e. a document
starts in the bin its predecessor stream ends in. Bins can overrun by
at most one document (documents are not split here; the downstream
tokenizer truncates or wraps), which is the standard streaming-pack
discipline for LLM pre-training batches and — unlike first-fit bin
packing — is expressible as a pure scan, both here and in the SQL
oracle.
"""

from __future__ import annotations

from itertools import accumulate

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = SUM(value) over rows ordered by ``order_col``
    (inclusive of the current row), computed with the two-phase
    parallel scan above — never a single global window partition.

    ``order_col`` must be unique (it defines the global order); the
    value expression is evaluated once into a column before the scan.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    staged = df.withColumn("__v", value.cast("long"))
    if num_partitions:
        staged = staged.repartitionByRange(num_partitions, order_col)
    else:
        staged = staged.repartitionByRange(order_col)
    staged = staged.withColumn("__pid", F.spark_partition_id())

    local = W.partitionBy("__pid").orderBy(order_col)
    # persisted: the totals pass below and the final output both read
    # this sorted intermediate — without it the upstream scan + range
    # shuffle + window sort would run twice. Spillable storage level;
    # caller (or bench's clearCache) releases it.
    from pyspark import StorageLevel

    staged = staged.withColumn(out_col, F.sum("__v").over(local)).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # one row per partition: (pid, partition total) — bounded driver
    # pull. The total is SUM of the raw values, NOT max of the running
    # column: with negative values (a running balance) the cumulative
    # maximum is not the partition's final sum.
    totals = (
        staged.groupBy("__pid")
        .agg(F.sum("__v").alias("t"))
        .orderBy("__pid")
        .collect()
    )
    pids = [r["__pid"] for r in totals]
    # exclusive scan: offset of pid i = sum of totals of pids < i.
    # repartitionByRange orders pids by key range, but empty ranges can
    # drop ids — accumulate over the pids actually present, in order.
    # An all-null partition sums to NULL; it contributes 0 to offsets.
    offsets = [0] + list(accumulate((r["t"] or 0) for r in totals))[:-1]
    if not pids:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    mapping = F.create_map(
        *[F.lit(x) for pair in zip(pids, offsets) for x in pair]
    )
    return (
        staged.withColumn(out_col, F.col(out_col) + mapping[F.col("__pid")])
        .drop("__pid", "__v")
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    budget: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign each document a training-sequence ``pack_id`` under a
    token ``budget``, streaming in ``id_col`` order (deterministic and
    engine-portable). Adds ``tokens`` (the evaluated token count),
    ``running`` (inclusive prefix sum) and ``pack_id``.

    Contract: consecutive documents share a pack until the budget
    would already be exhausted BEFORE the document starts; a document
    larger than the budget occupies its own pack(s) boundary. Packs
    can overrun by one document — the tokenizer-side truncate/wrap
    handles the tail, as in standard LLM batch packing.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    staged = docs.withColumn("tokens", tokens.cast("long"))
    out = running_total(staged, id_col, F.col("tokens"), out_col="running")
    return out.withColumn(
        pack_col,
        F.floor((F.col("running") - F.col("tokens")) / F.lit(budget)).cast("long"),
    )
