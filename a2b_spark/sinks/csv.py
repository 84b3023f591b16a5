"""Keyed, readable CSV destination.

Reference: CsvDestinationDriver (src/Drivers/Destination/
CsvDestinationDriver.php:61-203) — buffers rows to a temp file, then
atomically copies over the destination on flush (:198-203); readable
back via read/readMultiple predicates (:156-175); getExistingIds
projects the id columns (:177-190).

Spark design: same versioned-table machinery as the Parquet sink with
``fmt="csv"`` — every commit IS the reference's atomic tempfile+copy
(whole new version dir, `_CURRENT` flip), and readback is a DataFrame
scan instead of per-row predicate evaluation. The schema persists in
``_SCHEMA`` so typed ids survive the CSV round trip (the reference
re-casts via IdTypeConversionTrait; we re-apply the written schema).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from a2b_spark.storage.table import VersionedParquetTable


class CsvDestination:
    def __init__(self, path: str, key_cols: Sequence[str]):
        self.table = VersionedParquetTable(path, key_cols, fmt="csv")
        self.key_cols = tuple(key_cols)

    @property
    def path(self) -> str:
        return self.table.path

    def read_snapshot(self, spark: SparkSession) -> Optional[DataFrame]:
        return self.table.read(spark)

    def merge(self, batch: DataFrame) -> None:
        self.table.merge(batch)

    def delete_keys(self, keys_df: DataFrame) -> None:
        self.table.delete_keys(keys_df)

    def read_multiple(self, spark: SparkSession, keys_df: DataFrame) -> DataFrame:
        """Bulk point-read (reference readMultiple, C14): semi-join
        instead of an OR-of-ANDs predicate string."""
        snap = self.read_snapshot(spark)
        if snap is None:
            return keys_df.limit(0)
        return snap.join(
            keys_df.select(*self.key_cols).distinct(), on=list(self.key_cols), how="left_semi"
        )

    def existing_ids(self, spark: SparkSession) -> Optional[DataFrame]:
        snap = self.read_snapshot(spark)
        return None if snap is None else snap.select(*self.key_cols).distinct()
