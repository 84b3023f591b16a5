"""Keyed Parquet destination — the workhorse sink.

The reference's Doctrine/ORM destination (DoctrineDestinationDriver.php:65-214)
maps here: an updatable keyed table. Batching knobs (flush-per-100) are
obsolete — commits are atomic per version flip, snapshots stay readable
during a merge (see a2b_spark.storage.table), and partitioned tables
rewrite only touched partitions.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from a2b_spark.storage.table import VersionedParquetTable


class ParquetDestination:
    def __init__(
        self,
        path: str,
        key_cols: Sequence[str],
        partition_by: Sequence[str] | None = None,
    ):
        self.table = VersionedParquetTable(path, key_cols, partition_by)
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

    def compact(self, spark: SparkSession, **kwargs) -> dict:
        """Maintenance: bin-pack small files accumulated by incremental
        merges (see VersionedParquetTable.compact)."""
        return self.table.compact(spark, **kwargs)

    def read_multiple(self, spark: SparkSession, keys_df: DataFrame) -> DataFrame:
        snap = self.read_snapshot(spark)
        if snap is None:
            return keys_df.limit(0)
        return snap.join(
            keys_df.select(*self.key_cols).distinct(), on=list(self.key_cols), how="left_semi"
        )
