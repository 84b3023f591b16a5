"""Source protocol: a countable stream of rows = a DataFrame.

Reference: SourceDriverInterface (src/Drivers/SourceDriverInterface.php:18-37)
— IteratorAggregate + Countable. ``count()`` is just ``df.count()``.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession


@runtime_checkable
class Source(Protocol):
    def load(self, spark: SparkSession) -> DataFrame: ...


class DataFrameSource:
    """Wrap an already-built DataFrame (or a builder fn) as a source —
    the composition point for the relational layer: any
    filter/join/agg pipeline can feed a migration."""

    def __init__(self, df_or_fn):
        self._df_or_fn = df_or_fn

    def load(self, spark: SparkSession) -> DataFrame:
        if callable(self._df_or_fn):
            return self._df_or_fn(spark)
        return self._df_or_fn
