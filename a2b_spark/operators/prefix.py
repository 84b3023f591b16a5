"""Distributed prefix sum (running total over a global order) and the
sequence-packing operator built on it.

A naive ``SUM() OVER (ORDER BY k)`` with no PARTITION BY collapses the
whole table into ONE window partition — a single task, the canonical
100 TB scale-killer. The distributed formulation is the classic
two-phase parallel scan:

    1. range-partition rows by the order key (Spark's
       ``repartitionByRange`` samples the key distribution, so chunks
       are balanced even under skewed keys);
    2. eagerly materialize the chunked frame with
       ``localCheckpoint`` — this PINS the sampled range boundaries
       and the ``spark_partition_id`` of every row. Range
       partitioning's sample seed derives from the RDD id, so two
       separate evaluations of the same plan can draw DIFFERENT
       boundaries; truncating the lineage makes a second evaluation
       impossible (a lost block fails loudly instead of silently
       recomputing under a new partitioning). This is the eager
       ``_materialize`` discipline from ``operators/dedup.py``,
       hardened: checkpoint removes even the recompute path;
    3. local pass: per-partition running totals via a window
       partitioned by ``spark_partition_id()`` (parallel, in-memory
       sort per chunk — no shuffle beyond the range partition itself);
    4. per-partition offsets are computed IN-PLAN: the per-pid totals
       (one tiny row per partition) get an exclusive running sum via
       a global window over that ≤few-thousand-row frame — the
       single-partition window over a tiny aggregate is the repo's
       standard scalar-fanout idiom — and join back broadcast on
       ``__pid``. No driver collect, no literal map, and therefore no
       cross-action consistency requirement at all.

Sequence packing (``pack_sequences``) assigns documents to fixed
token-budget training sequences in deterministic key order:
``pack_id = floor((running - tokens) / budget)`` — i.e. a document
starts in the bin its predecessor stream ends in. Bins can overrun by
at most one document (documents are not split here; the downstream
tokenizer truncates or wraps), which is the standard streaming-pack
discipline for LLM pre-training batches and — unlike first-fit bin
packing — is expressible as a pure scan, both here and in the SQL
oracle.

Storage lifecycle: the checkpointed blocks live in the executors'
block manager and are released when the returned DataFrame's RDD is
garbage-collected on the driver — unlike ``persist``, nothing is
registered in the session's cache manager, so repeated registry
invocations do not accumulate entries in ``spark.catalog``
(round-4 advice item).
"""

from __future__ import annotations

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
    The result is deterministic across runs and Spark configs: the
    range chunking is pinned by an eager localCheckpoint before any
    consumer, and the chunk offsets are computed inside the same plan
    (window over per-chunk totals + broadcast join), so there is no
    second action that could observe a different partitioning.

    The value must be INTEGRAL (or an exact DECIMAL cast by the
    caller): the scan accumulates in long for cross-run/engine
    determinism, and silently truncating a float column (a running
    balance of ±0.5s collapsing to zeros) is exactly the wrong
    failure mode — fractional inputs raise instead.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    dt = df.select(value.alias("__probe")).schema["__probe"].dataType.simpleString()
    if dt in ("float", "double") or dt.startswith("decimal"):
        raise ValueError(
            f"running_total value expression has type {dt}: the scan "
            "sums in long and would silently truncate; cast to an "
            "integral type (or scale to integer units) first"
        )
    staged = df.withColumn("__v", value.cast("long"))
    if num_partitions:
        staged = staged.repartitionByRange(num_partitions, order_col)
    else:
        staged = staged.repartitionByRange(order_col)
    # Pin boundaries + pids: eager materialization, lineage truncated.
    staged = staged.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )

    # One row per chunk: (pid, chunk total). The total is SUM of the
    # raw values, NOT max of the running column: with negative values
    # (a running balance) the cumulative maximum is not the chunk sum.
    # Exclusive scan in-plan: offset of pid i = sum of totals with
    # pid < i. The frame is ≤ #partitions rows, so the global
    # (single-partition) window is trivially cheap. An all-null chunk
    # sums to NULL and must contribute 0 (sum_zero) to later offsets.
    totals = staged.groupBy("__pid").agg(
        F.coalesce(F.sum("__v"), F.lit(0)).alias("__t")
    )
    excl = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__t").over(excl), F.lit(0)).alias("__off")
    )

    local = W.partitionBy("__pid").orderBy(order_col)
    return (
        staged.withColumn(out_col, F.sum("__v").over(local))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col(out_col) + F.col("__off"))
        .drop("__pid", "__v", "__off")
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
