"""Destination protocol — the readable, keyed sink.

Reference: DestinationDriverInterface (src/Drivers/DestinationDriverInterface.php:26-81)
— ``read(ids)``, ``readMultiple(idSet)``, ``write(entity) → ids``,
``getExistingIds()``, ``flush()``. Point reads/writes become set
operations here: one snapshot read, one keyed merge, one anti-join.
"""

from __future__ import annotations

from typing import Optional, Protocol, Sequence, runtime_checkable

from pyspark.sql import DataFrame, SparkSession


@runtime_checkable
class Destination(Protocol):
    key_cols: tuple[str, ...]

    def read_snapshot(self, spark: SparkSession) -> Optional[DataFrame]:
        """Current destination contents, or None if it doesn't exist yet
        (getExistingIds/read/readMultiple collapse into joins on this)."""
        ...

    def merge(self, batch: DataFrame) -> None:
        """Keyed upsert of the batch (write + update-on-rerun, C5)."""
        ...

    def delete_keys(self, keys_df: DataFrame) -> None:
        """Remove rows matching the key tuples (orphan prune, C7)."""
        ...

    def read_multiple(self, spark: SparkSession, keys_df: DataFrame) -> DataFrame:
        """Bulk point-read: semi-join the snapshot on key tuples (C14)."""
        ...
