"""ADD-COLUMN schema evolution for VersionedParquetTable — the
reference's first-row-defines-columns CSV contract
(src/Drivers/Destination/CsvDestinationDriver.php:80,109-113) makes
column drift normal user behavior, so the lakehouse layer must absorb
it: merge/append with a widened batch commits the widened schema, each
retained version reads under ITS OWN sidecar schema (old hardlinked
files null-fill the new column), and CDF spans the boundary."""

import os

import pytest
from pyspark.sql import functions as F

from a2b_spark.storage.cdf import table_changes
from a2b_spark.storage.table import VersionedParquetTable


def _rows(df):
    return sorted(map(tuple, df.select(*sorted(df.columns)).collect()))


def test_merge_adds_column_unpartitioned(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "m"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    # widened batch: new column w
    t.merge(
        spark.createDataFrame(
            [(1, "A", 10.0), (3, "c", 30.0)], "k long, v string, w double"
        )
    )
    cur = t.read(spark)
    assert set(cur.columns) == {"k", "v", "w"}
    got = {(r.k, r.v, r.w) for r in cur.collect()}
    assert got == {(1, "A", 10.0), (2, "b", None), (3, "c", 30.0)}
    # time travel: v1 still reads its OWN (narrow) schema
    v1 = t.read(spark, version=t.versions()[0])
    assert set(v1.columns) == {"k", "v"}
    # and a later merge INTO the widened schema keeps w for untouched keys
    t.merge(spark.createDataFrame([(2, "B")], "k long, v string"))
    got2 = {(r.k, r.v, r.w) for r in t.read(spark).collect()}
    assert got2 == {(1, "A", 10.0), (2, "B", None), (3, "c", 30.0)}


def test_append_adds_column_partitioned_hardlinks_old_files(spark, tmp_path):
    t = VersionedParquetTable(
        str(tmp_path / "p"),
        key_cols=("k",),
        partition_by=("epoch",),
        partitions_derived_from_keys=True,
        retention=10,
    )
    t.append(
        spark.createDataFrame(
            [(1, 0, 10.0), (2, 0, 20.0)], "k long, epoch int, x double"
        )
    )
    # widened append into a FRESH partition: old partition hard-links
    t.append(
        spark.createDataFrame(
            [(3, 1, 30.0, "tag")], "k long, epoch int, x double, y string"
        )
    )
    cur = t.read(spark)
    assert set(cur.columns) == {"k", "epoch", "x", "y"}
    got = {(r.k, r.epoch, r.x, r.y) for r in cur.collect()}
    assert got == {(1, 0, 10.0, None), (2, 0, 20.0, None), (3, 1, 30.0, "tag")}
    # the pre-evolution partition's files are hardlinked, not rewritten
    vdir = os.path.join(t.path, t.current_version(), "epoch=0")
    links = [
        os.stat(os.path.join(vdir, f)).st_nlink
        for f in os.listdir(vdir)
        if not f.startswith(("_", "."))
    ]
    assert links and all(n > 1 for n in links)
    # predicate on the evolved column: old files' rows null-fill
    assert cur.filter(F.col("y").isNull()).count() == 2


def test_table_changes_across_schema_boundary(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "c"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.merge(spark.createDataFrame([(2, "b", 9.0)], "k long, v string, w double"))
    ch = table_changes(t, spark, with_rows=True)
    rows = {(r.k, r.change, r.v, r.w) for r in ch.collect()}
    assert rows == {(2, "insert", "b", 9.0)}
    # delete after evolution still diffs cleanly
    t.delete_keys(spark.createDataFrame([(1,)], "k long"))
    ch2 = {
        (r.k, r.change, r._commit_version)
        for r in table_changes(t, spark).collect()
    }
    assert ch2 == {(2, "insert", 2), (1, "delete", 3)}


def test_appends_stream_null_fills_pre_evolution_commits(spark, tmp_path):
    """A stream started AFTER evolution projects every commit to the
    current (widened) schema: pre-evolution files null-fill the new
    column instead of mis-projecting."""
    import pyarrow as pa

    from a2b_spark.storage.cdf import _AppendsStreamReader

    t = VersionedParquetTable(
        str(tmp_path / "s"),
        key_cols=("k",),
        partition_by=("epoch",),
        partitions_derived_from_keys=True,
        retention=10,
    )
    t.append(spark.createDataFrame([(1, 0, 1.0)], "k long, epoch int, x double"))
    t.append(
        spark.createDataFrame(
            [(2, 1, 2.0, "new")], "k long, epoch int, x double, y string"
        )
    )
    r = _AppendsStreamReader({"path": t.path})
    rows = []
    for p in r.partitions({"version": 0}, {"version": 2}):
        for b in r.read(p):
            assert isinstance(b, pa.RecordBatch)
            rows.extend(b.to_pylist())
    got = {
        (d["k"], d["epoch"], d["x"], d["y"], d["_commit_version"]) for d in rows
    }
    assert got == {(1, 0, 1.0, None, 1), (2, 1, 2.0, "new", 2)}
