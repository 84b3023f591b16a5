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


def test_marker_survives_unrelated_commits(spark, tmp_path):
    """Round-4 advice: a maintenance commit (merge, compact, retract)
    used to create a version WITHOUT the _LAST_BATCH marker, so a
    restarted stream re-folded already-applied batches. Metadata files
    now carry forward on every commit."""
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    table = VersionedParquetTable(str(tmp_path / "agg"), key_cols=("h", "t"))
    spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(50)], "v long, t string"
    ).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema("v long, t string").parquet(src_dir)
    run_continuous_rollup(
        spark,
        stream,
        table,
        {"h": F.expr("v div 10").cast("long"), "t": F.col("t")},
        "v",
        str(tmp_path / "ckpt"),
    ).awaitTermination(120)
    from a2b_spark.streaming.rollup import _read_last_batch

    marked = _read_last_batch(table)
    assert marked >= 0

    # unrelated maintenance commits on the rollup table
    table.merge(
        spark.createDataFrame([(99, "z", 1, 1.0)], "h long, t string, n long, sum_value double")
        .withColumn("sum_value", F.col("sum_value").cast("decimal(18,3)"))
    )
    table.compact(spark)
    assert _read_last_batch(table) == marked, "marker lost by maintenance commit"

    # replay under a fresh checkpoint: still a no-op
    before = _snapshot(spark, table)
    stream = spark.readStream.schema("v long, t string").parquet(src_dir)
    run_continuous_rollup(
        spark,
        stream,
        table,
        {"h": F.expr("v div 10").cast("long"), "t": F.col("t")},
        "v",
        str(tmp_path / "ckpt2"),
    ).awaitTermination(120)
    assert _snapshot(spark, table) == before


def test_partitioned_rollup_folds_only_touched_buckets(spark, tmp_path):
    """With the table partitioned by the coarse bucket, a micro-batch
    touching one bucket must hard-link every other bucket's files
    (O(touched) fold) and still converge to the batch aggregate."""
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    table = VersionedParquetTable(
        str(tmp_path / "agg"), key_cols=("h", "t"), partition_by=("h",)
    )

    def fold(ckpt):
        stream = spark.readStream.schema("v long, t string").parquet(src_dir)
        run_continuous_rollup(
            spark,
            stream,
            table,
            {"h": F.expr("v div 10").cast("long"), "t": F.col("t")},
            "v",
            str(tmp_path / ckpt),
        ).awaitTermination(120)

    spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(50)], "v long, t string"
    ).write.mode("append").parquet(src_dir)
    fold("c1")
    assert _snapshot(spark, table) == _expected(spark, src_dir)

    def _inodes(vdir):
        out = {}
        for root, _, files in os.walk(vdir):
            for fn in files:
                if not fn.startswith(("_", ".")):
                    p = os.path.join(root, fn)
                    out[os.path.relpath(p, vdir)] = os.stat(p).st_ino
        return out

    ino_before = _inodes(os.path.join(table.path, table.current_version()))
    # second delivery touches ONLY bucket h=0 (v in 0..9)
    spark.createDataFrame(
        [(i % 10, "a") for i in range(20)], "v long, t string"
    ).write.mode("append").parquet(src_dir)
    fold("c1")  # same checkpoint: only the new file arrives
    assert _snapshot(spark, table) == _expected(spark, src_dir)
    ino_after = _inodes(os.path.join(table.path, table.current_version()))
    untouched_after = {f: i for f, i in ino_after.items() if not f.startswith("h=0")}
    assert untouched_after, "expected untouched bucket files"
    for f, ino in untouched_after.items():
        assert ino_before.get(f) == ino, f"untouched bucket file {f} rewritten"


def test_partitioned_rollup_requires_bucket_subset(spark, tmp_path):
    import pytest

    table = VersionedParquetTable(
        str(tmp_path / "agg"), key_cols=("h", "t"), partition_by=("other",)
    )
    stream = spark.readStream.schema("v long, t string").parquet(str(tmp_path))
    with pytest.raises(ValueError, match="subset of the bucket names"):
        run_continuous_rollup(
            spark,
            stream,
            table,
            {"h": F.expr("v div 10").cast("long"), "t": F.col("t")},
            "v",
            str(tmp_path / "ck"),
        )
