from a2b_spark.sinks.base import Destination
from a2b_spark.sinks.parquet import ParquetDestination
from a2b_spark.sinks.console import ConsoleDestination

__all__ = ["Destination", "ParquetDestination", "ConsoleDestination"]
