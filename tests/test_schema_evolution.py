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


# --------------------------------------------------------- DROP COLUMN


def test_drop_column_metadata_only_unpartitioned(spark, tmp_path):
    """drop_columns is a metadata-only commit: every data file of the
    new version hardlinks the old one (zero bytes rewritten — the
    100 TB shape), reads project the survivors, time travel to the
    pre-drop version still sees the column, and restore brings it
    back with its values."""
    t = VersionedParquetTable(str(tmp_path / "d"), key_cols=("k",), retention=10)
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "k long, v string, w double"
        )
    )
    pre = t.current_version()
    t.drop_columns(spark, "w")
    assert t.history()[-1]["op"] == "drop_columns"
    cur = t.read(spark)
    assert set(cur.columns) == {"k", "v"}
    assert {(r.k, r.v) for r in cur.collect()} == {(1, "a"), (2, "b")}
    # zero data rewritten: every data file of the new version is a
    # hardlink of the pre-drop version's
    vdir = os.path.join(t.path, t.current_version())
    links = [
        os.stat(os.path.join(vdir, f)).st_nlink
        for f in os.listdir(vdir)
        if not f.startswith(("_", "."))
    ]
    assert links and all(n > 1 for n in links)
    # time travel: the pre-drop version reads under ITS OWN schema
    old = t.read(spark, version=pre)
    assert set(old.columns) == {"k", "v", "w"}
    # restore: the column and its values come back
    t.restore(pre)
    back = t.read(spark)
    assert {(r.k, r.w) for r in back.collect()} == {(1, 10.0), (2, 20.0)}


def test_drop_column_guards(spark, tmp_path):
    t = VersionedParquetTable(
        str(tmp_path / "g"),
        key_cols=("k",),
        partition_by=("p",),
        retention=10,
    )
    with pytest.raises(ValueError, match="commit data first"):
        t.drop_columns(spark, "x")
    t.overwrite(spark.createDataFrame([(1, 0, 1.0)], "k long, p int, x double"))
    with pytest.raises(ValueError, match="no such column"):
        t.drop_columns(spark, "nope")
    with pytest.raises(ValueError, match="key/partition"):
        t.drop_columns(spark, "k")
    with pytest.raises(ValueError, match="key/partition"):
        t.drop_columns(spark, "p")
    with pytest.raises(ValueError, match="no columns given"):
        t.drop_columns(spark)
    # a CHECK constraint still referencing the column blocks the drop
    t.add_constraint(spark, "x_pos", "x > 0")
    with pytest.raises(ValueError, match="drop the constraint first"):
        t.drop_columns(spark, "x")
    t.drop_constraint("x_pos")
    t.drop_columns(spark, "x")
    assert set(t.read(spark).columns) == {"k", "p"}
    # dropping every remaining payload column leaves key+partition: a
    # further drop of nothing-left raises via the guards above; also
    # cannot drop ALL columns on an unpartitioned keyless-ish table
    t2 = VersionedParquetTable(str(tmp_path / "g2"), key_cols=(), retention=10)
    t2.overwrite(spark.createDataFrame([(1,)], "a long"))
    with pytest.raises(ValueError, match="every column"):
        t2.drop_columns(spark, "a")


def test_drop_column_partitioned_and_readd_full_rewrite(spark, tmp_path):
    """Partitioned drop is metadata-only; RE-INTRODUCING the dropped
    name via merge escalates to a full rewrite so hardlinked old
    partitions cannot resurface the pre-drop physical values, and the
    tombstone clears (later merges take the touched-partition path
    again)."""
    t = VersionedParquetTable(
        str(tmp_path / "r"),
        key_cols=("k",),
        partition_by=("p",),
        retention=10,
    )
    t.overwrite(
        spark.createDataFrame(
            [(1, 0, 10.0), (2, 1, 20.0)], "k long, p int, x double"
        )
    )
    t.drop_columns(spark, "x")
    assert set(t.read(spark).columns) == {"k", "p"}
    assert t._dropped_tombstones(t.current_version()) == {"x"}

    # re-add x: old rows must read NULL (not the stale 10.0/20.0)
    t.merge(spark.createDataFrame([(3, 0, 30.0)], "k long, p int, x double"))
    got = {(r.k, r.p, r.x) for r in t.read(spark).collect()}
    assert got == {(1, 0, None), (2, 1, None), (3, 0, 30.0)}
    assert t._dropped_tombstones(t.current_version()) == set()
    # tombstone cleared -> partitioned merge takes the hardlink path
    t.merge(spark.createDataFrame([(4, 1, 40.0)], "k long, p int, x double"))
    vdir = os.path.join(t.path, t.current_version(), "p=0")
    links = [
        os.stat(os.path.join(vdir, f)).st_nlink
        for f in os.listdir(vdir)
        if not f.startswith(("_", "."))
    ]
    assert links and all(n > 1 for n in links)  # p=0 untouched, linked
    got2 = {(r.k, r.x) for r in t.read(spark).collect()}
    assert got2 == {(1, None), (2, None), (3, 30.0), (4, 40.0)}


def test_drop_column_readd_via_append_partitioned(spark, tmp_path):
    t = VersionedParquetTable(
        str(tmp_path / "ap"),
        key_cols=("k",),
        partition_by=("epoch",),
        partitions_derived_from_keys=True,
        retention=10,
    )
    t.append(spark.createDataFrame([(1, 0, 1.0)], "k long, epoch int, x double"))
    t.drop_columns(spark, "x")
    t.append(spark.createDataFrame([(2, 1, 2.0)], "k long, epoch int, x double"))
    got = {(r.k, r.epoch, r.x) for r in t.read(spark).collect()}
    assert got == {(1, 0, None), (2, 1, 2.0)}


def test_cdf_across_drop_boundary(spark, tmp_path):
    """The drop commit itself is layout-only to CDF (no row changed);
    diffs before and after the boundary work, and with_rows spanning
    it null-fills the dropped column for pre-drop after-images."""
    from a2b_spark.storage.cdf import TableChangesStream

    t = VersionedParquetTable(str(tmp_path / "cd"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a", 1.0)], "k long, v string, w double"))
    t.merge(spark.createDataFrame([(2, "b", 2.0)], "k long, v string, w double"))
    t.drop_columns(spark, "w")
    t.merge(spark.createDataFrame([(3, "c")], "k long, v string"))

    d = table_changes(t, spark)  # full retained range
    got = {(r.k, r.change, r._commit_version) for r in d.collect()}
    assert got == {(2, "insert", 2), (3, "insert", 4)}  # commit 3 = drop, silent

    rows = {
        (r.k, r._commit_version): (r.v, r.w)
        for r in table_changes(t, spark, with_rows=True).collect()
    }
    assert rows[(2, 2)] == ("b", 2.0)  # pre-drop after-image keeps w
    assert rows[(3, 4)] == ("c", None)  # post-drop null-fills

    # streaming twin: drop commit advances the offset without a diff
    s = TableChangesStream(t, spark, str(tmp_path / "ck"))
    seen = {}
    delivered = s.process_available(
        lambda df, v: seen.__setitem__(v, {r.k for r in df.collect()})
    )
    assert delivered == [1, 2, 4]
    assert seen[4] == {3}


def test_appends_stream_skips_drop_commit(spark, tmp_path):
    from a2b_spark.storage.cdf import _AppendsStreamReader

    t = VersionedParquetTable(
        str(tmp_path / "as"),
        key_cols=("k",),
        partition_by=("epoch",),
        partitions_derived_from_keys=True,
        retention=10,
    )
    t.append(spark.createDataFrame([(1, 0, 1.0)], "k long, epoch int, x double"))
    t.drop_columns(spark, "x")
    t.append(spark.createDataFrame([(2, 1, 9.9)], "k long, epoch int, x double") \
        .select("k", "epoch"))
    r = _AppendsStreamReader({"path": t.path})
    rows = []
    for p in r.partitions({"version": 0}, {"version": 3}):
        for b in r.read(p):
            rows.extend(b.to_pylist())
    # post-drop schema: commit 1's file physically holds x but the
    # stream projects the current (dropped) schema
    assert {tuple(sorted(d)) for d in rows} == {("_commit_version", "epoch", "k")}
    got = {(d["k"], d["_commit_version"]) for d in rows}
    assert got == {(1, 1), (2, 3)}


# -------------------------------------------------------- TYPE WIDENING


def test_widen_column_metadata_only(spark, tmp_path):
    """widen_column is metadata-only: every data file hardlinks, reads
    upcast the old int32 pages under the bigint schema, time travel
    keeps the narrow type, and unsafe pairs raise."""
    t = VersionedParquetTable(str(tmp_path / "w"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, 10, 1.5), (2, 20, 2.5)],
                                      "k long, n int, f float"))
    pre = t.current_version()
    t.widen_column(spark, "n", "bigint")
    t.widen_column(spark, "f", "double")
    assert t.history()[-1]["op"] == "widen_column"
    vdir = os.path.join(t.path, t.current_version())
    links = [
        os.stat(os.path.join(vdir, fn)).st_nlink
        for fn in os.listdir(vdir)
        if not fn.startswith(("_", "."))
    ]
    assert links and all(n > 1 for n in links)  # zero files rewritten
    cur = t.read(spark)
    assert dict(cur.dtypes)["n"] == "bigint"
    assert dict(cur.dtypes)["f"] == "double"
    assert {(r.k, r.n, r.f) for r in cur.collect()} == {(1, 10, 1.5), (2, 20, 2.5)}
    # time travel: pre-widen version keeps ITS OWN narrow types
    old = t.read(spark, version=pre)
    assert dict(old.dtypes)["n"] == "int"
    # guards
    with pytest.raises(ValueError, match="no such column"):
        t.widen_column(spark, "nope", "bigint")
    with pytest.raises(ValueError, match="only the safe"):
        t.widen_column(spark, "n", "int")  # bigint -> int narrows
    with pytest.raises(ValueError, match="only the safe"):
        t.widen_column(spark, "k", "string")
    t.widen_column(spark, "n", "bigint")  # same type: silent no-op


def test_widen_then_merge_and_cdf_across_boundary(spark, tmp_path):
    """After a widen, merges keep hardlinking old narrow files
    (partitioned touched path), pruned reads bind long predicates
    against the old int stats, and table_changes crosses the boundary
    (narrow before-frame upcast by align_to_after)."""
    from a2b_spark.storage.cdf import table_changes

    t = VersionedParquetTable(
        str(tmp_path / "wm"),
        key_cols=("k",),
        partition_by=("p",),
        retention=10,
    )
    t.overwrite(spark.createDataFrame([(1, 0, 10), (2, 1, 20)],
                                      "k long, p int, n int"))
    t.widen_column(spark, "n", "bigint")
    t.merge(spark.createDataFrame([(3, 0, 2_000_000_000_000)],
                                  "k long, p int, n bigint"))
    got = {(r.k, r.n) for r in t.read(spark).collect()}
    assert got == {(1, 10), (2, 20), (3, 2_000_000_000_000)}
    # p=1 untouched by the merge: still hardlinked narrow files
    vdir = os.path.join(t.path, t.current_version(), "p=1")
    links = [
        os.stat(os.path.join(vdir, fn)).st_nlink
        for fn in os.listdir(vdir)
        if not fn.startswith(("_", "."))
    ]
    assert links and all(n > 1 for n in links)
    # version_diff across the widen boundary (narrow vs wide frames)
    d = {(r.k, r.change, r._commit_version)
         for r in table_changes(t, spark).collect()}
    assert d == {(3, "insert", 3)}  # widen commit itself is silent
