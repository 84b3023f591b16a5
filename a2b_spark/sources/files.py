"""File-based sources.

- CsvSource: reference S1 (CsvSourceDriver.php:39-72) — header row,
  streamed records; an empty or header-only file is an invalid source.
- ParquetSource: the native columnar path (what the 100 TB deployment
  actually reads); predicate/column pushdown are free via Catalyst.
- JsonSource: line-delimited JSON, beyond-reference convenience.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class InvalidSourceError(ValueError):
    pass


class CsvSource:
    def __init__(self, path: str, schema=None, **options):
        self.path = path
        self.schema = schema
        self.options = {"header": "true", **options}

    def load(self, spark: SparkSession) -> DataFrame:
        # Reference rejects missing/empty files (CsvSourceDriver.php:50-54).
        if os.path.isfile(self.path) and os.path.getsize(self.path) == 0:
            raise InvalidSourceError(f"empty CSV source: {self.path}")
        reader = spark.read.options(**self.options)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        df = reader.csv(self.path)
        if not df.columns:
            raise InvalidSourceError(f"CSV source has no header: {self.path}")
        # header-only is invalid too (CsvSourceDriver.php:50-54): a
        # truncated export must fail loudly, not migrate zero rows (and
        # with orphan_policy='prune', mark every destination row an
        # orphan). One head(1) probe — loads happen once per migration.
        if not df.head(1):
            raise InvalidSourceError(f"header-only CSV source: {self.path}")
        return df


class ParquetSource:
    def __init__(self, path: str):
        self.path = path

    def load(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


class JsonSource:
    def __init__(self, path: str, schema=None, **options):
        self.path = path
        self.schema = schema
        self.options = options

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.options(**self.options)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.json(self.path)


class OrcSource:
    """Columnar alternative to ParquetSource (Spark-native ORC reader;
    predicate/column pushdown via Catalyst, same as parquet)."""

    def __init__(self, path: str):
        self.path = path

    def load(self, spark: SparkSession) -> DataFrame:
        return spark.read.orc(self.path)
