"""Keyed Parquet destination — the workhorse sink.

The reference's Doctrine/ORM destination (DoctrineDestinationDriver.php:65-214)
maps here: an updatable keyed table. Batching knobs (flush-per-100) are
obsolete — commits are atomic per version flip, snapshots stay readable
during a merge (see a2b_spark.storage.table), and partitioned tables
rewrite only touched partitions.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from a2b_spark.sinks.base import VersionedTableDestination


class ParquetDestination(VersionedTableDestination):
    fmt = "parquet"

    def compact(self, spark: SparkSession, **kwargs) -> dict:
        """Maintenance: bin-pack small files accumulated by incremental
        merges (see VersionedParquetTable.compact)."""
        return self.table.compact(spark, **kwargs)
