"""Round-13 queries: oracle certificates for the ORC fast paths
(_STATS file skipping + deletion vectors under ``fmt="orc"``, the
round-12 verdict item 6 delivery in storage/stats.py +
storage/table.py).

Reference parity: the reference's destination drivers
(src/Drivers/Destination/CsvDestinationDriver.php,
DoctrineDestinationDriver.php) define the WRITE contract this layer
generalizes; ORC is a columnar body for the same versioned-table
semantics, so the certificate replays the OPERATIONS in DuckDB over
the raw parquet source rather than reading ORC (which DuckDB cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.queries.relational import _t

QUERIES: dict = {}
ORACLES: dict = {}


# --------------------------------------------------------------- Q177
def q177_orc_pruned_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC fast paths end-to-end: orders land key-clustered in an ORC
    versioned table (8 disjoint ``o_orderkey`` range files, so the
    sidecar bands are prunable), every 89th key is deleted via the
    DELETION-VECTOR path — the in-query checks raise unless the
    commit hardlinked every data file (zero rewritten) and staged a
    ``_dv/`` vector — then the rollup reads through ``read_pruned``
    with a bottom-quartile key band, and another check raises unless
    file skipping genuinely engaged (kept < total). The ORC sidecar
    comes from the DISTRIBUTED stats harvest
    (stats.collect_file_stats_spark — pyarrow reads no ORC footers),
    so a harvest error, a wrong skip, or an unapplied vector each
    diverge the hash."""
    import os
    import shutil

    from a2b_spark.queries.round7 import _scratch_path
    from a2b_spark.queries.round10 import _data_files
    from a2b_spark.storage.table import DV_DIR, VersionedParquetTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = _scratch_path(sf_dir, "q177")
    try:
        t = VersionedParquetTable(
            path, key_cols=["o_orderkey"], retention=5,
            fmt="orc", deletion_vectors=True,
        )
        t.overwrite(o.repartitionByRange(8, "o_orderkey"))
        vdir_pre = os.path.join(path, t.current_version())
        pre = [os.path.relpath(p, vdir_pre) for p in _data_files(vdir_pre)]
        t.delete_keys(
            o.filter(F.col("o_orderkey") % 89 == 0).select("o_orderkey")
        )
        vdir = os.path.join(path, t.current_version())
        post_abs = _data_files(vdir)
        post = [os.path.relpath(p, vdir) for p in post_abs]
        if pre != post:
            raise RuntimeError("q177: the DV delete rewrote or added files")
        if not all(os.stat(p).st_nlink > 1 for p in post_abs):
            raise RuntimeError("q177: an ORC data file is not hardlinked")
        if not os.path.isdir(os.path.join(vdir, DV_DIR)):
            raise RuntimeError("q177: no tombstone vector staged")
        lo, mx = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
        hi = lo + (mx - lo) // 4  # bottom quartile of the key space
        kept, total = t.prune_files([("o_orderkey", "between", (lo, hi))])
        if not (0 < len(kept) < total):
            raise RuntimeError(
                f"q177: ORC stats skipped nothing ({len(kept)}/{total})"
            )
        return (
            t.read_pruned(spark, [("o_orderkey", "between", (lo, hi))])
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_price"),
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)  # pin before the scratch sweep
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


O_Q177 = """
WITH b AS (
  SELECT MIN(o_orderkey) AS lo,
         MIN(o_orderkey) + (MAX(o_orderkey) - MIN(o_orderkey)) // 4 AS hi
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders, b
WHERE o_orderkey % 89 <> 0
  AND o_orderkey BETWEEN b.lo AND b.hi
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

QUERIES["q177_orc_pruned_dv_read"] = q177_orc_pruned_dv_read
ORACLES["q177_orc_pruned_dv_read"] = O_Q177


# --------------------------------------------------------------- Q178
def q178_orc_appends_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q145's ORC twin: the a2b_table_appends streaming source over an
    ORC table streams the table's own ``.orc`` data files (stripe-wise
    pyarrow.orc RecordBatches — the round-13 format dispatch in
    storage/cdf.py), with partition values still resolved from dir
    names and the commit tag synthesized per file. Orders lands in an
    epoch-partitioned insert-only ORC table over four append commits
    (epoch = o_orderkey % 4), the source drains availableNow into a
    memory sink, and the per-epoch rollup of the STREAMED rows must
    equal the oracle's recomputation from the source table."""
    import os

    from a2b_spark.queries.relational import dsum
    from a2b_spark.queries.round7 import _scratch_path
    from a2b_spark.storage.cdf import VersionAppendsDataSource
    from a2b_spark.storage.table import VersionedParquetTable

    if VersionAppendsDataSource is None:
        raise RuntimeError(
            "a2b_table_appends needs pyspark >= 4 (python data source API)"
        )
    path = _scratch_path(sf_dir, "q178")
    tag = path.rsplit("_", 1)[1]
    spark.dataSource.register(VersionAppendsDataSource)
    t = VersionedParquetTable(
        path,
        key_cols=["o_orderkey"],
        partition_by=("epoch",),
        partitions_derived_from_keys=True,
        retention=6,
        fmt="orc",
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_orderkey") % 4).cast("int").alias("epoch"),
    )
    for e in (0, 1, 2, 3):  # one FRESH partition per commit
        t.append(o.filter(F.col("epoch") == e))
    sink = f"q178_sink_{tag}"
    finished = (
        spark.readStream.format("a2b_table_appends")
        .option("path", t.path)
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", os.path.join(path, "_ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    if not finished:
        raise TimeoutError("a2b_table_appends availableNow stream exceeded 300s")
    return (
        spark.table(sink)
        .groupBy("epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("o_totalprice", "total_price", 2),
            F.min("_commit_version").alias("commit_version"),
        )
        .orderBy("epoch")
    )


O_Q178 = """
SELECT CAST(o_orderkey % 4 AS INTEGER) AS epoch,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(o_orderkey % 4 + 1 AS INTEGER) AS commit_version
FROM orders
GROUP BY 1, 4 ORDER BY 1
"""

QUERIES["q178_orc_appends_stream_rollup"] = q178_orc_appends_stream_rollup
ORACLES["q178_orc_appends_stream_rollup"] = O_Q178
