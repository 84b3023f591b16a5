"""Runnable lakehouse tour: versioned table -> constraints -> CDF ->
streaming CDC -> schema evolution -> quality gate -> time travel.

    python examples/lakehouse_cdc.py

Reads the driver testdata at sf0.001; writes under /tmp/a2b_lakehouse.
Every feature shown here is oracle- or pytest-gated elsewhere; this
file is the end-to-end "switching from the reference" walkthrough.
"""

import os
import shutil

from pyspark.sql import functions as F

from a2b_spark import get_spark
from a2b_spark.operators.expectations import ExpectationSuite
from a2b_spark.storage.cdf import TableChangesDataSource, table_changes
from a2b_spark.storage.table import VersionedParquetTable

SF_DIR = "/root/testdata/sf0.001"
OUT = "/tmp/a2b_lakehouse"


def main() -> None:
    spark = get_spark()
    shutil.rmtree(OUT, ignore_errors=True)

    customers = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )

    # 1. a versioned keyed table with a CHECK constraint and CDF on
    # retention must cover the CDC consumer's lag (see
    # earliest_streamable_version's contract) — the default 3 would
    # vacuum the initial commits before the stream reads them. When
    # the lag is statable as TIME rather than commit count, set the
    # count retention high and run t.vacuum(older_than=
    # timedelta(hours=...)) on a schedule instead — commits inside the
    # window then survive any burst of writes.
    t = VersionedParquetTable(
        f"{OUT}/customers", key_cols=("c_custkey",), retention=20
    )
    t.overwrite(customers)
    t.add_constraint(spark, "key_nonneg", "c_custkey >= 0")
    t.enable_cdf()

    # 2. keyed upsert + delete — change files stage at commit time
    t.merge(
        customers.filter(F.col("c_custkey") % 10 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 100.0
        )
    )
    t.delete_keys(customers.filter(F.col("c_custkey") % 37 == 0)
                  .select("c_custkey"))

    # 3. stream the CDC with checkpoint semantics (pure file read)
    spark.dataSource.register(TableChangesDataSource)
    (
        spark.readStream.format("a2b_table_changes")
        .option("path", t.path)
        .load()
        .writeStream.format("memory")
        .queryName("cdc")
        .option("checkpointLocation", f"{OUT}/_ck")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    print("-- streamed CDC fold --")
    spark.table("cdc").groupBy("_commit_version", "change").count() \
        .orderBy("_commit_version", "change").show()

    # 4. schema evolution, all metadata-only
    t.merge(  # ADD COLUMN: a widened batch
        spark.createDataFrame([(1, "vip")], "c_custkey long, tier string")
    )
    t.widen_column(spark, "c_custkey", "bigint")  # (already long: no-op)
    t.drop_columns(spark, "tier")                 # DROP: zero rewrites

    # 5. dataset-level quality gate (one aggregation pass)
    print("-- expectations --")
    (
        ExpectationSuite()
        .completeness("c_name")
        .uniqueness("c_custkey")
        .min_value("c_acctbal", -1000.0)
        .size_between(100)
        .run(t.read(spark))
        .show(truncate=False)
    )

    # 6. time travel + batch change walk + operational introspection
    v1 = t.versions()[0]
    print("v1 rows:", t.read(spark, version=v1).count(),
          "| live rows:", t.read(spark).count())
    print("earliest streamable offset:", t.earliest_streamable_version())
    print("-- batch table_changes (last commit) --")
    table_changes(t, spark, from_version=t.versions()[-2]).show(5)

    # 7. undo everything since v1 (hardlinked RESTORE; CDF-enabled
    # restores derive the inverse diff, hence the spark handle)
    t.restore(v1) if not t.cdf_enabled() else t.restore(v1, spark)
    print("after restore:", t.read(spark).count(), "rows at",
          t.current_version())


if __name__ == "__main__":
    main()
