"""Incremental (streaming) migration: the batch merge dataflow applied
per micro-batch via ``foreachBatch``.

The reference has no streaming; its closest notion is re-running a
migration, which updates previously-migrated rows through the mapping
table. Structured Streaming gives the same invariant continuously:
each micro-batch runs the same prepare→transform→merge pipeline, so
re-delivered source rows (at-least-once sources) UPDATE instead of
duplicate — the mapping table makes the sink effectively idempotent,
which is exactly Spark's recommended foreachBatch upsert pattern.

Orphan detection is meaningless mid-stream (the "full source" never
exists at any instant) — it stays a batch-mode operation.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from a2b_spark.core.migration import Migration
from a2b_spark.exec.executor import run_migration
from a2b_spark.mapping.store import MappingStore
from a2b_spark.sources.base import DataFrameSource


def run_incremental(
    spark: SparkSession,
    m: Migration,
    mapper: MappingStore,
    stream_df: DataFrame,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Run migration ``m`` continuously over ``stream_df`` (a streaming
    DataFrame). Each micro-batch flows through the full batch dataflow
    (id cast → mapping join → existing-entity join → transform → merge
    dest + mapping), so the destination converges to exactly one row
    per source key regardless of redelivery.

    ``trigger_available_now=True`` drains what's available then stops —
    the incremental-batch pattern; False runs continuously."""
    if not stream_df.isStreaming:
        raise ValueError("stream_df must be a streaming DataFrame (spark.readStream)")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        batch_m = Migration(
            name=m.name,
            source=DataFrameSource(batch_df),
            destination=m.destination,
            source_ids=m.source_ids,
            destination_ids=m.destination_ids,
            transform=m.transform,
            depends=m.depends,
            group=m.group,
            extends=m.extends,
        )
        # orphan policy is forced to keep: a micro-batch is never "the
        # whole source", so anti-diff semantics don't apply mid-stream
        run_migration(spark, batch_m, mapper, orphan_policy="keep", collect_stats=False)

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def wait(query: StreamingQuery, timeout: Optional[float] = None) -> bool:
    return query.awaitTermination(timeout)
