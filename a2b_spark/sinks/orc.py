"""Keyed ORC destination — the columnar alternative for deployments
standardized on ORC (Hive-lineage warehouses). Same versioned-table
machinery as the parquet sink: atomic version-flip commits,
snapshot-isolated reads, keyed merge/delete, schema sidecar. The
parquet-only extras (deletion vectors, _STATS file pruning) fall back
to the generic rewrite paths — documented in storage/table.py."""

from __future__ import annotations

from typing import Sequence

from a2b_spark.sinks.base import VersionedTableDestination


class OrcDestination(VersionedTableDestination):
    fmt = "orc"

    def __init__(self, path: str, key_cols: Sequence[str]):
        super().__init__(path, key_cols)
