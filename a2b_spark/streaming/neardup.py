"""Streaming NEAR-duplicate filtering: minhash-LSH dedup of an
unbounded document stream against everything already accepted.

Nothing in the reference approaches this (row-at-a-time batch ETL);
it is the streaming face of the batch dedup chain: a training-data
pipeline ingesting documents continuously must suppress near-copies
of PREVIOUSLY accepted documents, not just within-batch twins —
exact-key state (`streaming_dedup_first_seen`) cannot do that, since
near-dups share no key.

Design (per micro-batch via ``foreachBatch``):

1. One k-gram hash pass over the batch (the same JVM codegen pass the
   batch operators share) → signatures → LSH band hashes.
2. Batch-vs-HISTORY candidates: band-join the batch's band hashes
   against the persistent signature store (a versioned parquet table
   of (id, band, bh) rows — 16 longs per accepted doc); verify
   candidates with exact jaccard against the stored k-gram sets.
   Batch docs within ``threshold`` of any accepted doc are dropped.
3. Batch-vs-BATCH: the remaining docs run the batch dedup chain
   (band self-join → exact-jaccard verify → connected components →
   keep cluster min) over the SAME signatures as step 2, so in-batch
   and cross-batch decisions use one consistent config.
4. Survivors merge into the output table; their band hashes and
   k-gram sets merge into the two history stores. All three writes
   are keyed MVCC merges, so at-least-once redelivery is idempotent
   (a redelivered doc is either its own exact dup — dropped by
   verify — or re-merges onto its own key).

Scale: history grows by O(survivors) — 16 band longs + one k-gram
hash array per ACCEPTED doc (duplicates never enter the store). The
band join touches only colliding buckets; the jaccard verify touches
only candidates.

History WRITES are O(batch), not O(history): survivors are provably
NEW rows (step 1 drops anything near an accepted doc — including an
exactly-redelivered doc, which is jaccard-1 to its stored self), so
the three stores take insert-only appends into a fresh ``__epoch``
partition per commit; every prior epoch's files hard-link into the
new version untouched. A keyed MERGE into an unpartitioned store —
the pre-round-5 design — re-read and fully rewrote the entire
accepted history every micro-batch. History READS (the band join and
the dedupe guard) remain scans of thin columns, which is the
irreducible part of comparing a batch against all history without an
index service. Epoch partitions accumulate small files; the store
tables support ``compact()`` as offline maintenance.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from a2b_spark.storage.table import VersionedParquetTable


class StreamingNearDupFilter:
    """State + dataflow for continuous near-dup filtering; usable
    directly on batch DataFrames (``process_batch``) or wired to a
    stream (``start``)."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        text_col: str,
        id_col: str,
        threshold: float = 0.8,
        shingle_k: int = 3,
        num_hashes: int = 64,
        bands: int = 16,
    ):
        self.spark = spark
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.shingle_k = shingle_k
        self.num_hashes = num_hashes
        self.bands = bands
        # epoch-partitioned: each commit writes ONE new partition and
        # hard-links the rest (see module docstring)
        self.out = VersionedParquetTable(
            f"{base_dir}/accepted", key_cols=(id_col,), partition_by=("__epoch",)
        )
        self.band_store = VersionedParquetTable(
            f"{base_dir}/bands", key_cols=(id_col, "band"), partition_by=("__epoch",)
        )
        self.khs_store = VersionedParquetTable(
            f"{base_dir}/khs", key_cols=(id_col,), partition_by=("__epoch",)
        )

    # ---------------------------------------------------------- batch
    def process_batch(self, batch_df: DataFrame) -> None:
        from a2b_spark.operators.dedup import (
            _minhash_sigs,
            banded_signatures,
            jaccard,
            kgram_hash_docs,
        )
        from a2b_spark.operators.graph import connected_components

        idc, txt = self.id_col, self.text_col
        if not batch_df.head(1):
            return
        batch = batch_df.select(idc, txt)

        # ONE k-gram/signature pass for the whole batch; every later
        # consumer (history join, in-batch pairs, store merges) reads
        # the checkpointed frames — nothing replays the pipeline
        sh = kgram_hash_docs(batch, txt, idc, self.shingle_k).localCheckpoint()
        sigs = _minhash_sigs(sh, idc, self.num_hashes)
        rows = self.num_hashes // self.bands
        bands_b = banded_signatures(sigs, idc, self.bands, rows).localCheckpoint()

        def drop(ids: DataFrame, *frames: DataFrame):
            return tuple(f.join(ids, idc, "left_anti") for f in frames)

        # 1) batch-vs-HISTORY first: a doc near an accepted doc is
        # dropped unconditionally. Order matters — running in-batch
        # dedup first could elect a history-dup as a cluster's
        # survivor and then lose the whole cluster, including members
        # that are NOT near any accepted doc.
        hist_bands = self.band_store.read(self.spark)
        hist_khs = self.khs_store.read(self.spark)
        if hist_bands is not None and hist_khs is not None:
            cand = (
                bands_b.join(
                    hist_bands.select(F.col(idc).alias("__hid"), "band", "bh"),
                    ["band", "bh"],
                )
                .select(idc, "__hid")
                .distinct()
            )
            dup_ids = (
                cand.join(sh.select(F.col(idc), F.col("khs").alias("__k_b")), idc)
                .join(
                    hist_khs.select(
                        F.col(idc).alias("__hid"), F.col("khs").alias("__k_h")
                    ),
                    "__hid",
                )
                .filter(jaccard(F.col("__k_b"), F.col("__k_h")) >= self.threshold)
                .select(idc)
                .distinct()
            )
            batch, sh, bands_b = drop(dup_ids, batch, sh, bands_b)

        # 2) in-batch near-dup collapse on the remainder, using the
        # SAME shingle/signature config as the history comparison (a
        # generic dedup_apply call would silently use its own
        # defaults): band self-join → exact-jaccard verify → connected
        # components → keep each cluster's min id.
        a, b = bands_b.alias("a"), bands_b.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col(f"a.{idc}") < F.col(f"b.{idc}")),
            )
            .select(F.col(f"a.{idc}").alias("id_a"), F.col(f"b.{idc}").alias("id_b"))
            .distinct()
            .join(
                sh.select(F.col(idc).alias("id_a"), F.col("khs").alias("__ka")), "id_a"
            )
            .join(
                sh.select(F.col(idc).alias("id_b"), F.col("khs").alias("__kb")), "id_b"
            )
            .filter(jaccard(F.col("__ka"), F.col("__kb")) >= self.threshold)
            .select("id_a", "id_b")
        )
        cc = connected_components(pairs, "id_a", "id_b")
        dtype = batch.schema[idc].dataType
        in_batch_drops = cc.filter(F.col("node") != F.col("component")).select(
            F.col("node").cast(dtype).alias(idc)
        )
        batch, sh, bands_b = drop(in_batch_drops, batch, sh, bands_b)

        survivors = batch.localCheckpoint()
        if not survivors.head(1):
            return
        # insert-only append into a fresh epoch partition: O(batch)
        # writes. dedupe_keys is belt-and-braces idempotence (the
        # history drop already filters redelivered docs).
        #
        # The epoch label must be MONOTONE across batches — derived
        # from the committed version NUMBER, not len(versions()):
        # _commit vacuums to the retention window (default 3), so the
        # retained-version count plateaus after ~4 batches and every
        # later batch would land in (and fully rewrite) one
        # ever-growing partition, reverting appends to O(accumulated).
        cur = self.out.current_version_number()
        epoch = F.lit(str(0 if cur is None else cur + 1)).alias("__epoch")
        self.out.append(survivors.select("*", epoch), dedupe_keys=[idc])
        self.band_store.append(
            bands_b.select("*", epoch), dedupe_keys=[idc, "band"]
        )
        self.khs_store.append(sh.select("*", epoch), dedupe_keys=[idc])

    # --------------------------------------------------------- stream
    def start(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        trigger_available_now: bool = True,
    ) -> StreamingQuery:
        if not stream_df.isStreaming:
            raise ValueError("stream_df must be a streaming DataFrame")

        def fe(batch_df: DataFrame, batch_id: int) -> None:
            self.process_batch(batch_df)

        writer = stream_df.writeStream.foreachBatch(fe).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def accepted(self) -> Optional[DataFrame]:
        df = self.out.read(self.spark)
        return None if df is None else df.drop("__epoch")
