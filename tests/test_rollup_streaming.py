"""Streaming continuous aggregate (streaming/rollup.py): additive
folds converge to the batch-mode aggregate across micro-batches, and
the atomic last-batch marker makes redelivered batches no-ops."""

import os

from pyspark.sql import functions as F

from a2b_spark.storage.table import VersionedParquetTable
from a2b_spark.streaming.rollup import _LAST_BATCH, run_continuous_rollup


def _expected(spark, src_dir):
    raw = spark.read.parquet(src_dir)
    return {
        (r["h"], r["t"]): (r["n"], float(r["s"]))
        for r in raw.select(
            F.expr("v div 10").cast("long").alias("h"),
            F.col("t"),
            F.col("v"),
        )
        .groupBy("h", "t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("v").cast("decimal(18,3)")).alias("s"),
        )
        .collect()
    }


def _snapshot(spark, table):
    return {
        (r["h"], r["t"]): (r["n"], float(r["sum_value"]))
        for r in table.read(spark).collect()
    }


def test_continuous_rollup_converges_and_dedups_batches(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    table = VersionedParquetTable(str(tmp_path / "agg"), key_cols=("h", "t"))

    def fold():
        stream = spark.readStream.schema("v long, t string").parquet(src_dir)
        q = run_continuous_rollup(
            spark,
            stream,
            table,
            {"h": F.expr("v div 10").cast("long"), "t": F.col("t")},
            "v",
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)

    rows1 = [(i, "a" if i % 3 else "b") for i in range(50)]
    spark.createDataFrame(rows1, "v long, t string").write.mode("append").parquet(src_dir)
    fold()
    assert _snapshot(spark, table) == _expected(spark, src_dir)

    # second delivery touches existing buckets AND new ones — additive
    rows2 = [(i, "a") for i in range(40, 80)]
    spark.createDataFrame(rows2, "v long, t string").write.mode("append").parquet(src_dir)
    fold()
    assert _snapshot(spark, table) == _expected(spark, src_dir)

    # redelivery guard: marker committed with the data, and folding the
    # same batch id again is a no-op
    cur = table.current_version()
    marker = os.path.join(table.path, cur, _LAST_BATCH)
    assert os.path.exists(marker)
    before = _snapshot(spark, table)
    from a2b_spark.streaming.rollup import _read_last_batch

    assert _read_last_batch(table) >= 0
    # replay ALL source files under a FRESH checkpoint: batch ids
    # restart at 0 <= marker, so every redelivered batch must be
    # skipped and the table stays exactly as it was — the non-
    # idempotent additive fold protected by the atomic marker
    stream = spark.readStream.schema("v long, t string").parquet(src_dir)
    q = run_continuous_rollup(
        spark,
        stream,
        table,
        {"h": F.expr("v div 10").cast("long"), "t": F.col("t")},
        "v",
        str(tmp_path / "ckpt_replay"),
    )
    q.awaitTermination(120)
    assert _snapshot(spark, table) == before
