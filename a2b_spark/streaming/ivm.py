"""Continuous incremental aggregate maintenance — the STREAMING twin
of storage/ivm.py's batch ``refresh_rollup``: keep a GROUP BY rollup
of a REWRITING keyed table current by folding each micro-batch of its
``a2b_table_changes`` stream (pre-image CDF change rows, delivered as
pure file reads) with exactly-once semantics.

Where streaming/rollup.py maintains an aggregate over an APPEND
stream (rows only arrive), this handles the general case: the source
is merged into, deleted from, updated — the signed fold
Σ(+insert/update, −update_preimage/delete) per group is the same
delta algebra the batch refresh uses, so the two surfaces are
batch-twin equivalent by construction (pinned in pytest).

Exactly-once is the streaming rollup's design verbatim: an additive
fold is not idempotent, so the ``_LAST_BATCH`` marker rides the
rollup's own commit via ``extra_files`` (atomic with the data) and a
redelivered batch id is a no-op.

Scale shape: each micro-batch costs one churn-sized signed
aggregation + one O(rollup) additive fold; the changes stream plans
per commit from the staged change files (no diff at read time). The
rollup's cardinality is the group count — orders below the source —
so the fold's full-outer join stays small no matter how large the
source grows.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from a2b_spark.storage.ivm import rollup_delta
from a2b_spark.storage.table import VersionedParquetTable
from a2b_spark.streaming.rollup import _LAST_BATCH, _additive_merge, _read_last_batch


def run_incremental_rollup_stream(
    spark: SparkSession,
    source: VersionedParquetTable,
    rollup: VersionedParquetTable,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    checkpoint_dir: str,
    count_alias: str = "n_rows",
    sum_type: str = "decimal(28,6)",
    starting_version: int = 0,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Maintain ``rollup`` = SELECT group_cols, COUNT(*), SUM(c)…
    GROUP BY group_cols over ``source`` continuously, from its changes
    stream. The source must be ``enable_cdf(preimages=True)`` (checked
    up front — without pre-images the deltas cannot decrement);
    ``rollup.key_cols`` must equal ``group_cols``."""
    if not source.cdf_preimages():
        raise ValueError(
            f"run_incremental_rollup_stream requires "
            f"enable_cdf(preimages=True) on {source.path}"
        )
    if tuple(rollup.key_cols) != tuple(group_cols):
        raise ValueError(
            f"rollup key_cols {rollup.key_cols} must equal group_cols "
            f"{tuple(group_cols)}"
        )
    cur = rollup.current_version()
    if cur is not None:
        import os

        from a2b_spark.storage.ivm import _IVM_APPLIED

        if os.path.exists(os.path.join(rollup.path, cur, _IVM_APPLIED)):
            raise ValueError(
                f"rollup {rollup.path} is BATCH-maintained "
                "(storage.ivm.refresh_rollup marker present); the two "
                "maintenance surfaces track different progress markers "
                "and mixing them double-counts — pick one"
            )
    from a2b_spark.storage.cdf import TableChangesDataSource

    spark.dataSource.register(TableChangesDataSource)
    changes = (
        spark.readStream.format("a2b_table_changes")
        .option("path", source.path)
        .option("startingVersion", str(starting_version))
        .load()
    )
    names = list(group_cols)
    add_cols = [count_alias] + list(sum_cols)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _read_last_batch(rollup):
            return  # redelivered batch: already folded in
        delta = rollup_delta(
            batch_df.drop("_commit_version"), names, sum_cols, count_alias
        ).select(
            *names,
            F.col(f"{count_alias}__delta").alias(count_alias),
            *[F.col(f"{c}__delta").cast(sum_type).alias(c) for c in sum_cols],
        )
        # pin: the emptiness probe, the fold, and the commit's write
        # all consult the delta (the streaming rollup's discipline)
        delta = delta.localCheckpoint(eager=True)
        if not delta.head(1):
            return
        base = rollup.current_version()
        current = rollup.read(spark, version=base) if base else None
        folded = _additive_merge(current, delta, names, add_cols).filter(
            F.col(count_alias) > 0
        )
        rollup.overwrite(
            folded,
            op="ivm_refresh",
            base=base,
            extra_files={_LAST_BATCH: str(batch_id)},
        )

    writer = changes.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
