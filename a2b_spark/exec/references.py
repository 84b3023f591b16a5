"""Cross-migration reference resolution + stub generation.

Reference store (C8): the reference's ``referenceStore->get(Migration,
sourceIds)`` (MigrationReferenceStore.php:65-120) is a *random-access
point lookup from inside user transform code* — the pattern that forces
row-at-a-time execution in the reference. Here it is hoisted out of the
UDF into a pre-join (SURVEY §3.3): the referenced migration's output is
resolved as one two-hop join (ref source ids → ref mapping table → ref
destination snapshot) and attached to the pipeline DataFrame as a
struct column before the transform runs. Memoization (reference
:71,112-114) becomes plan/broadcast reuse; the "clone the destination
driver" dance (:75-84) disappears — snapshots are immutable versions.

Stubber (C9): the reference creates placeholder entities for
forward/self references (Stubber.php:34-48), maps them with
STATUS_STUB, and force-flushes so they are queryable
(DataMigrationExecutor.php:194-209); a later run of the owning
migration finds the stub mapping and *updates* it. Here stubs are a
set-oriented pre-pass: dangling reference keys are diffed against the
mapping table (one anti-join), written as deterministic placeholder
rows (reference uses mt_rand — useless for a re-runnable distributed
engine), and mapped with STATUS_STUB; the owning migration's next
`run_migration` merges real entities over them by key.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.core.ids import deterministic_dest_id
from a2b_spark.core.migration import Migration, MigrationRegistry
from a2b_spark.mapping.store import (
    MappingStore,
    STATUS_STUB,
    dest_col,
    src_col,
)


class ReferenceStore:
    """Set-oriented analogue of MigrationReferenceStore: resolves
    "the destination entity another migration produced for source key
    K" as a join, for every row at once."""

    def __init__(self, spark: SparkSession, registry: MigrationRegistry, mapper: MappingStore):
        self.spark = spark
        self.registry = registry
        self.mapper = mapper

    def lookup_table(self, ref_name: str) -> DataFrame:
        """The referenced migration's resolved output keyed by ITS
        source ids: columns ``<ref source id>...`` + ``entity`` struct
        (+ ``status`` so callers can tell stubs from real rows).

        Two-hop join, both sides keyed — shuffles on the id columns or
        broadcasts when small (AQE decides)."""
        m = self.registry.get(ref_name)
        map_df = self.mapper.load(m.mapping_key(), m.source_ids, m.destination_ids)
        snap = m.destination.read_snapshot(self.spark)
        dest_names = [f.name for f in m.destination_ids]
        if snap is None:
            raise ValueError(f"referenced migration {ref_name!r} has no destination output yet")
        snap_keyed = snap.select(
            *[F.col(n).alias(f"__k_{n}") for n in dest_names],
            F.struct(*[F.col(c) for c in snap.columns]).alias("entity"),
        )
        cond = None
        for f in m.destination_ids:
            c = map_df[dest_col(f)].eqNullSafe(snap_keyed[f"__k_{f.name}"])
            cond = c if cond is None else (cond & c)
        two_hop = map_df.join(snap_keyed, on=cond, how="inner")
        return two_hop.select(
            *[F.col(src_col(f)).alias(f.name) for f in m.source_ids],
            "entity",
            "status",
        )

    def resolve(
        self,
        df: DataFrame,
        ref_name: str,
        on: Mapping[str, str],
        out: Optional[str] = None,
        broadcast: bool = False,
    ) -> DataFrame:
        """Attach the referenced migration's destination entity to every
        row of ``df`` as struct column ``out`` (default
        ``__ref_<name>``); null where the reference doesn't resolve —
        the NoMappingForIds/missing-entity analogue.

        ``on`` maps df columns → the referenced migration's source-id
        field names. ``broadcast=True`` force-broadcasts the reference
        table (the memoized-dict analogue for small dimensions)."""
        out = out or f"__ref_{ref_name}"
        ref = self.lookup_table(ref_name)
        ref = ref.select(
            *[F.col(f).alias(f"__r_{f}") for f in on.values()],
            F.col("entity").alias(out),
        )
        if broadcast:
            ref = F.broadcast(ref)
        cond = None
        for df_col, ref_field in on.items():
            c = df[df_col].eqNullSafe(ref[f"__r_{ref_field}"])
            cond = c if cond is None else (cond & c)
        return df.join(ref, on=cond, how="left").drop(
            *[f"__r_{f}" for f in on.values()]
        )


def ensure_stubs(
    spark: SparkSession,
    ref_m: Migration,
    mapper: MappingStore,
    needed_keys: DataFrame,
) -> int:
    """Stub pre-pass (C9): make every source-key tuple in
    ``needed_keys`` resolvable against ``ref_m``'s output, creating
    deterministic placeholder entities + STATUS_STUB mappings for the
    keys that have no mapping yet. Returns the number of stubs created.

    ``needed_keys`` columns must be named after ``ref_m.source_ids``.
    One anti-join + two merges — no per-key driver round trips."""
    src_names = [f.name for f in ref_m.source_ids]
    keys = needed_keys.select(*src_names).distinct()
    existing = mapper.load(ref_m.mapping_key(), ref_m.source_ids, ref_m.destination_ids).select(
        *[F.col(src_col(f)).alias(f.name) for f in ref_m.source_ids]
    )
    missing = keys.join(existing, on=src_names, how="left_anti")

    missing = missing.withColumn("__src__", F.struct(*[F.col(n) for n in src_names]))
    for f in ref_m.destination_ids:
        if f.type == "int":
            fresh = deterministic_dest_id(src_names, ref_m.mapping_key())
        else:
            # "~" separator — SAME minting rule as prepare()'s, and for
            # the same reasons: "/" nests paths in file-layout sinks and
            # breaks id stability across the stub/re-migrate lifecycle
            fresh = F.concat_ws(
                "~", F.lit(ref_m.mapping_key()), *[F.col(n).cast("string") for n in src_names]
            )
        missing = missing.withColumn(f.name, fresh)

    missing = missing.persist()
    try:
        n = missing.count()
        if n == 0:
            return 0
        dest_names = [f.name for f in ref_m.destination_ids]
        snap = ref_m.destination.read_snapshot(spark)
        if snap is not None:
            # placeholder carries the live schema: ids + nulls elsewhere
            stub_entity = missing.select(
                *[
                    F.col(c).alias(c)
                    if c in dest_names
                    else F.lit(None).cast(snap.schema[c].dataType).alias(c)
                    for c in snap.columns
                ]
            )
        else:
            stub_entity = missing.select(*dest_names)
        ref_m.destination.merge(stub_entity)

        from a2b_spark.mapping.store import mapping_batch

        mb = mapping_batch(
            missing.select("__src__", *dest_names), ref_m.source_ids, ref_m.destination_ids
        )
        mapper.merge(
            ref_m.mapping_key(), mb, ref_m.source_ids, ref_m.destination_ids, STATUS_STUB
        )
        return n
    finally:
        missing.unpersist()
