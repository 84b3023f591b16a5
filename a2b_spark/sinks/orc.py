"""Keyed ORC destination — the columnar alternative for deployments
standardized on ORC (Hive-lineage warehouses). Same versioned-table
machinery as the parquet sink: atomic version-flip commits,
snapshot-isolated reads, keyed merge/delete, schema sidecar, _STATS
file pruning (pruned reads, stats-scoped merge/delete) and deletion
vectors. ORC's one cost difference: pyarrow exposes no ORC footer
statistics, so a commit's NEW files pay one distributed stats
aggregation instead of driver-side footer reads
(storage/stats.py:collect_file_stats_spark); hardlinked files still
reuse the base sidecar by inode."""

from __future__ import annotations

from typing import Sequence

from a2b_spark.sinks.base import VersionedTableDestination


class OrcDestination(VersionedTableDestination):
    fmt = "orc"

    def __init__(
        self,
        path: str,
        key_cols: Sequence[str],
        deletion_vectors: bool = False,
    ):
        super().__init__(path, key_cols, deletion_vectors=deletion_vectors)
