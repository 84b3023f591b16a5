"""Keyed JSONL (line-delimited JSON) destination — the interchange
format of LLM training-data pipelines (one JSON document per line;
Spark's native ``json`` format IS JSONL).

Same versioned-table machinery as the CSV sink (atomic version-flip
commits, snapshot-isolated reads, keyed merge/delete); schema persists
in ``_SCHEMA`` so typed columns survive the text round trip without
inference drift. Reference parity: the flush-atomicity contract of
CsvDestinationDriver (src/Drivers/Destination/
CsvDestinationDriver.php:198-203) applied to the format a training
pipeline actually exports.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from a2b_spark.storage.table import VersionedParquetTable


class JsonlDestination:
    def __init__(self, path: str, key_cols: Sequence[str]):
        self.table = VersionedParquetTable(path, key_cols, fmt="json")
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
            keys_df.select(*self.key_cols).distinct(),
            on=list(self.key_cols),
            how="left_semi",
        )

    def existing_ids(self, spark: SparkSession) -> Optional[DataFrame]:
        snap = self.read_snapshot(spark)
        return None if snap is None else snap.select(*self.key_cols).distinct()
