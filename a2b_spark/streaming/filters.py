"""Streaming ingest filters: stateless per-batch curation stages.

The batch curation operators (quality scoring, decontamination) apply
unchanged inside ``foreachBatch`` — this module wires the Bloom
blocklist (operators/bloom.py) into a streaming ingest pipeline:
arriving documents are probed against a STATIC broadcast bitset and
survivors append to a versioned table with idempotent keys.

Why this shape scales: the Bloom probe is stateless per batch (the
blocklist broadcasts once per stream, not per batch — the Broadcast
object lives in the closure), so micro-batch cost is O(batch grams)
with no state store, no watermark, and no shuffle against the
blocklist; the only shuffle is the per-doc hit aggregate inside the
probe. Sink cost: give the output table a partition scheme (e.g. an
epoch or time bucket) and the keyed append rewrites only the batch's
partitions, hard-linking the rest — an UNPARTITIONED table pays a
full rewrite per commit (VersionedParquetTable.append), fine for
small outputs only; the dedupe anti-join is a thin key scan of
history either way. Contrast streaming/neardup.py, which must consult mutable
accepted-history state — membership against a FIXED contamination
set is the cheap half of streaming curation, and splitting the two
keeps each at its natural cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from a2b_spark.operators.bloom import (
    NgramBloom,
    bloom_flag_contaminated,
    broadcast_bloom,
)
from a2b_spark.storage.table import VersionedParquetTable


def run_bloom_decontaminate_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    bloom: NgramBloom,
    text_col: str,
    id_col: str,
    table: VersionedParquetTable,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Append arriving docs to ``table``, dropping any doc the Bloom
    blocklist flags (≥1 shared n-gram, superset of exact membership —
    the safe error side for decontamination). Idempotent under
    redelivery: the append dedupes on the table's key columns, so a
    replayed batch inserts nothing new."""
    if not stream_df.isStreaming:
        raise ValueError("stream_df must be a streaming DataFrame (spark.readStream)")
    # ship the bitset ONCE for the stream's lifetime; per-batch calls
    # reuse the handle instead of re-serializing the whole filter
    bc = broadcast_bloom(spark, bloom)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        flagged = bloom_flag_contaminated(batch_df, bc, text_col, id_col).select(
            id_col
        )
        clean = batch_df.join(flagged, id_col, "left_anti")
        table.append(clean, dedupe_keys=list(table.key_cols))

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_embedding_decontaminate_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    ref_df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    table: VersionedParquetTable,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    max_ref_rows: int = 100_000,
) -> StreamingQuery:
    """Streaming twin of q137's embedding-space decontamination:
    arriving vectors (documents with an embedding column) are scored
    against a STATIC benchmark/eval reference set and dropped when
    their nearest reference cosine reaches ``threshold``; survivors
    append to a versioned table with idempotent keys.

    Same cost model as the Bloom stream above, with the broadcast
    being a dense matrix instead of a bitset: the reference set is
    collected and broadcast ONCE per stream (bounded by
    ``max_ref_rows`` — the knn_bruteforce contract), each micro-batch
    pays one Arrow-batched mapInPandas pass (O(batch·refs·dim) flops,
    stateless, no shuffle against the reference), and the keyed
    append keeps redelivery idempotent. Rows with a NULL embedding
    pass through unscored (they cannot leak a benchmark), matching
    the batch operator, which drops them from the SCORING frame only.
    """
    from a2b_spark.operators.similarity import (
        broadcast_reference_set,
        nearest_with_broadcast,
    )

    if not stream_df.isStreaming:
        raise ValueError("stream_df must be a streaming DataFrame (spark.readStream)")
    # ship the reference matrix ONCE for the stream's lifetime
    br = broadcast_reference_set(ref_df, vec_col, id_col, max_ref_rows)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        from pyspark.sql import functions as SF

        scored = nearest_with_broadcast(batch_df, br, vec_col, id_col)
        hot = scored.filter(SF.col("cos") >= threshold).select(id_col)
        clean = batch_df.join(hot, id_col, "left_anti")
        table.append(clean, dedupe_keys=list(table.key_cols))

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_line_cleanup_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    boilerplate_df: DataFrame,
    text_col: str,
    id_col: str,
    table: VersionedParquetTable,
    checkpoint_dir: str,
    sep: str = "\n",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of the batch linedup stage: arriving documents
    have every line matching the STATIC ``boilerplate_df`` stripped
    (exact string match via digest anti join — operators/lines.py's
    shared strip_lines kernel), then append with idempotent keys.

    Same cost model as the decontamination streams above: the
    boilerplate set is fixed for the stream's lifetime (derive it
    once from a reference corpus with boilerplate_lines; at
    web-corpus scale the set is the tiny head of the line-frequency
    distribution, so the per-batch anti join broadcasts), each
    micro-batch pays one posexplode + rebuild bounded by its own
    documents, and redelivery inserts nothing new. A REWRITE filter:
    documents are cleaned, never dropped — compose with a quality
    stage downstream for emptied docs."""
    from a2b_spark.operators.lines import strip_lines

    if not stream_df.isStreaming:
        raise ValueError("stream_df must be a streaming DataFrame (spark.readStream)")
    bp = boilerplate_df.select("line").localCheckpoint(eager=True)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        # "force": the set is frozen and caller-vetted small — skip the
        # auto mode's per-micro-batch gating count
        cleaned = strip_lines(
            batch_df, text_col, id_col, bp, sep=sep, broadcast="force"
        )
        table.append(cleaned, dedupe_keys=list(table.key_cols))

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
