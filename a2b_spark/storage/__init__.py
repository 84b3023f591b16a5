from a2b_spark.storage.table import VersionedParquetTable

__all__ = ["VersionedParquetTable"]
