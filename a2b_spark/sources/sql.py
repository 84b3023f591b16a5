"""SQL source (reference S2, DbalSourceDriver.php:67-139).

The reference lets users embed arbitrary SQL — joins, filters, aliases
— in the source (doc/drivers/source/dbal.rst:29-48) because it has no
relational operators of its own. Here the same surface is native:

- ``SqlSource("SELECT ...", views={...})`` runs the statement through
  Spark SQL over registered temp views → Catalyst plans it (join
  reordering, pushdown, AQE), so the "source SQL" IS the logical plan.
- ``JdbcSource`` pushes the query down to an external RDBMS, the
  direct analogue of DBAL; partitioned reads parallelize the ingest.

The reference's separate count statement (setCountStatement) is
unnecessary: ``df.count()`` on the same plan.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, SparkSession


class SqlSource:
    def __init__(self, sql: str, views: Mapping[str, object] | None = None):
        self.sql = sql
        self.views = dict(views or {})

    def load(self, spark: SparkSession) -> DataFrame:
        for name, v in self.views.items():
            df = v if isinstance(v, DataFrame) else spark.read.parquet(str(v))
            df.createOrReplaceTempView(name)
        return spark.sql(self.sql)


class JdbcSource:
    def __init__(
        self,
        url: str,
        query: str,
        partition_column: str | None = None,
        lower_bound=None,
        upper_bound=None,
        num_partitions: int | None = None,
        **options,
    ):
        self.url = url
        self.query = query
        self.partition_opts = {}
        if partition_column is not None:
            # Parallel JDBC ingest: split the source relation into
            # numPartitions range scans instead of one serial cursor.
            self.partition_opts = {
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions or 8),
            }
        self.options = options

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("jdbc").option("url", self.url)
        if self.partition_opts:
            # JDBC forbids `query` together with partitionColumn — wrap
            # the statement as a derived table instead.
            reader = reader.option("dbtable", f"({self.query}) a2b_src")
        else:
            reader = reader.option("query", self.query)
        return reader.options(**self.partition_opts).options(**self.options).load()
