from a2b_spark.sources.base import Source, DataFrameSource
from a2b_spark.sources.files import CsvSource, ParquetSource, JsonSource
from a2b_spark.sources.sql import SqlSource

__all__ = ["Source", "DataFrameSource", "CsvSource", "ParquetSource", "JsonSource", "SqlSource"]
