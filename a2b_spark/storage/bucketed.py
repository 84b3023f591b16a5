"""Bucketed tables: co-located, shuffle-free joins.

At 100 TB the dominant cost of the executor dataflow is the shuffle of
source ⋈ mapping-table ⋈ destination-snapshot on the key columns.
Bucketing all three on the same key count removes it: each side's
files are already hash-partitioned by key, so SortMergeJoin reads
matching buckets directly — `.explain` shows NO Exchange on either
side ("bucket pruning" + "avoid shuffle" are Spark's documented
bucketing wins).

Plain `DataFrameWriter.bucketBy` requires a metastore table
(`saveAsTable`); this helper wraps that and the matching read. On a
real cluster the same tables live in the warehouse/catalog; locally
they live under spark.sql.warehouse.dir.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets lets SortMergeJoin skip its sort."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, keys: Sequence[str]
) -> bool:
    """Introspection helper (used by tests/benchmarks): True when the
    join of the two bucketed tables plans with no Exchange."""
    l, r = spark.table(left_table), spark.table(right_table)
    # PySpark DataFrames expose the Catalyst plan only via the Java df
    plan = l.join(r, on=list(keys))._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
