"""Change data feed over VersionedParquetTable: batch table_changes
(per-commit keyed diffs across a version range) and the Spark 4 Python
streaming data source that streams each commit's appended files."""

import os

import pytest
from pyspark.sql import functions as F

from a2b_spark.storage.cdf import VersionAppendsDataSource, table_changes
from a2b_spark.storage.table import VersionedParquetTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def history_table(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "h"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    # v2: update k=1, insert k=3
    t.merge(spark.createDataFrame([(1, "A"), (3, "c")], "k long, v string"))
    # v3: delete k=2
    t.delete_keys(spark.createDataFrame([(2,)], "k long"))
    return t


def test_table_changes_across_range(spark, history_table):
    t = history_table
    got = {
        (r.k, r.change, r._commit_version)
        for r in table_changes(t, spark).collect()
    }
    assert got == {
        (1, "update", 2),
        (3, "insert", 2),
        (2, "delete", 3),
    }
    # sub-range: only the last commit
    vs = t.versions()
    sub = {(r.k, r.change) for r in
           table_changes(t, spark, from_version=vs[1]).collect()}
    assert sub == {(2, "delete")}
    # after-images: inserts/updates carry payload, deletes NULL
    rows = {
        (r.k, r.change): r.v
        for r in table_changes(t, spark, with_rows=True).collect()
    }
    assert rows[(1, "update")] == "A"
    assert rows[(3, "insert")] == "c"
    assert rows[(2, "delete")] is None
    with pytest.raises(ValueError, match="not retained"):
        table_changes(t, spark, from_version="v_0000000099")
    with pytest.raises(ValueError, match="empty version range"):
        table_changes(t, spark, from_version=t.current_version())


def test_appends_stream_reads_per_commit(spark, tmp_path):
    # the documented contract: epoch-partitioned insert-only appends
    # (each batch lands in a FRESH partition; untouched ones hardlink)
    t = VersionedParquetTable(
        str(tmp_path / "a"),
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
    t.append(spark.createDataFrame([(3, 1, 30.0)], "k long, epoch int, x double"))
    # layout-only commit: must stream NOTHING
    t.compact(spark, target_file_bytes=1 << 30, min_files=1)
    t.append(spark.createDataFrame([(4, 2, 40.0)], "k long, epoch int, x double"))

    spark.dataSource.register(VersionAppendsDataSource)
    out_dir = str(tmp_path / "out")
    (
        spark.readStream.format("a2b_table_appends")
        .option("path", t.path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    # epoch is a PARTITION column — its values live only in dir names,
    # so asserting it here is what catches a reader that streams
    # partition columns as NULL (round-8 advice fix)
    got = {
        (r.k, r.epoch, r.x, r._commit_version)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        (1, 0, 10.0, 1),
        (2, 0, 20.0, 1),
        (3, 1, 30.0, 2),
        (4, 2, 40.0, 4),  # commit 3 was the compact — nothing streamed
    }

    # restart on the same checkpoint: only NEW commits stream
    t.append(spark.createDataFrame([(5, 3, 50.0)], "k long, epoch int, x double"))
    (
        spark.readStream.format("a2b_table_appends")
        .option("path", t.path)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got2 = {
        (r.k, r._commit_version) for r in spark.read.parquet(out_dir).collect()
    }
    assert got2 == {(1, 1), (2, 1), (3, 2), (4, 4), (5, 5)}


def test_table_changes_null_key_after_image(spark, tmp_path):
    """The storage layer's key semantics allow a NULL key tuple; its
    after-image must survive the with_rows join (null-safe match, like
    snapshot_diff — a plain on=keys join would drop it)."""
    t = VersionedParquetTable(str(tmp_path / "nk"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(None, "a"), (1, "b")], "k long, v string"))
    t.merge(spark.createDataFrame([(None, "A"), (2, "c")], "k long, v string"))
    rows = {
        (r.k, r.change): r.v
        for r in table_changes(t, spark, with_rows=True).collect()
    }
    assert rows == {(None, "update"): "A", (2, "insert"): "c"}


def _epoch_table(spark, tmp_path, name, epochs, retention=10):
    t = VersionedParquetTable(
        str(tmp_path / name),
        key_cols=("k",),
        partition_by=("epoch",),
        partitions_derived_from_keys=True,
        retention=retention,
    )
    for k, ep, x in epochs:
        t.append(
            spark.createDataFrame([(k, ep, x)], "k long, epoch int, x double")
        )
    return t


def test_appends_reader_yields_arrow_batches_with_partition_values(
    spark, tmp_path
):
    """Direct reader contract: read() yields pyarrow.RecordBatches (the
    vectorized path — never per-row tuples) with partition-column
    values filled from the hive-style dir names."""
    import pyarrow as pa

    from a2b_spark.storage.cdf import _AppendsStreamReader

    t = VersionedParquetTable(
        str(tmp_path / "pv"),
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
    t.append(spark.createDataFrame([(3, 1, 30.0)], "k long, epoch int, x double"))
    r = _AppendsStreamReader({"path": t.path})
    rows = []
    for p in r.partitions({"version": 0}, {"version": 2}):
        for b in r.read(p):
            assert isinstance(b, pa.RecordBatch)
            assert b.schema.names == ["k", "x", "epoch", "_commit_version"]
            rows.extend(b.to_pylist())
    got = {(d["k"], d["epoch"], d["x"], d["_commit_version"]) for d in rows}
    assert got == {(1, 0, 10.0, 1), (2, 0, 20.0, 1), (3, 1, 30.0, 2)}


def test_appends_stream_vacuumed_predecessor_raises(spark, tmp_path):
    """startingversion=k where commit k itself was vacuumed: the reader
    cannot tell k+1's new files from hardlinked history, so it must
    raise — not silently replay the full k+1 snapshot."""
    from a2b_spark.storage.cdf import _AppendsStreamReader

    t = _epoch_table(
        spark,
        tmp_path,
        "vac",
        [(1, 0, 1.0), (2, 1, 2.0), (3, 2, 3.0), (4, 3, 4.0)],
        retention=2,
    )
    assert len(t.versions()) == 2  # v3, v4 retained; v1, v2 vacuumed
    r = _AppendsStreamReader({"path": t.path, "startingversion": "2"})
    with pytest.raises(ValueError, match="vacuumed"):
        r.partitions({"version": 2}, {"version": 4})


def test_appends_stream_rejects_non_append_history(spark, tmp_path):
    spark.dataSource.register(VersionAppendsDataSource)
    t = VersionedParquetTable(str(tmp_path / "m"), key_cols=("k",), retention=10)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.merge(spark.createDataFrame([(1, "B")], "k long, v string"))
    # and the FRESH-partition contract: an unpartitioned second append
    # rewrites old rows into new files and must be rejected too
    t2 = VersionedParquetTable(str(tmp_path / "u"), key_cols=("k",), retention=10)
    t2.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t2.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    q2 = (
        spark.readStream.format("a2b_table_appends")
        .option("path", t2.path)
        .load()
        .writeStream.format("memory")
        .queryName("cdf_reject_unpart")
        .option("checkpointLocation", str(tmp_path / "cku"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="FRESH partitions"):
        q2.awaitTermination(120)
    q = (
        spark.readStream.format("a2b_table_appends")
        .option("path", t.path)
        .load()
        .writeStream.format("memory")
        .queryName("cdf_reject")
        .option("checkpointLocation", str(tmp_path / "ckm"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="append-only"):
        q.awaitTermination(120)


def test_changes_stream_matches_batch_and_restarts(spark, tmp_path):
    """Streaming twin contract: per-commit diffs delivered in order ==
    batch table_changes (plus the initial commit as pure inserts);
    restart resumes from the stored offset; a failing handler replays
    the same commit; compaction advances the offset without a diff."""
    from a2b_spark.storage.cdf import TableChangesStream

    t = VersionedParquetTable(str(tmp_path / "cs"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.merge(spark.createDataFrame([(1, "A"), (3, "c")], "k long, v string"))
    t.delete_keys(spark.createDataFrame([(2,)], "k long"))

    ck = str(tmp_path / "cs_ck")
    s = TableChangesStream(t, spark, ck, with_rows=True)
    got = {}
    delivered = s.process_available(
        lambda df, v: got.__setitem__(v, {(r.k, r.change, r.v) for r in df.collect()})
    )
    assert delivered == [1, 2, 3]
    # initial load streams as pure inserts with after-images
    assert got[1] == {(1, "insert", "a"), (2, "insert", "b")}
    # commits 2..N match batch table_changes exactly
    batch = {
        (r._commit_version, r.k, r.change, r.v)
        for r in table_changes(t, spark, with_rows=True).collect()
    }
    streamed = {
        (v, k, c, p) for v, rows in got.items() if v > 1 for (k, c, p) in rows
    }
    assert streamed == batch

    # restart on the same checkpoint: nothing new
    s2 = TableChangesStream(t, spark, ck, with_rows=True)
    assert s2.process_available(lambda df, v: None) == []

    # failing handler leaves the offset so the commit replays
    t.merge(spark.createDataFrame([(4, "d")], "k long, v string"))

    def boom(df, v):
        raise RuntimeError("sink down")

    with pytest.raises(RuntimeError):
        s2.process_available(boom)
    assert s2.last_processed() == 3
    redo = {}
    assert s2.process_available(
        lambda df, v: redo.__setitem__(v, {(r.k, r.change) for r in df.collect()})
    ) == [4]
    assert redo[4] == {(4, "insert")}

    # layout-only commit: offset advances, no diff delivered
    # (cluster_by forces a rewrite even for an already-compact layout)
    t.compact(spark, target_file_bytes=1 << 30, min_files=1, cluster_by=["k"])
    assert s2.process_available(lambda df, v: None) == []
    assert s2.last_processed() == 5


def test_changes_stream_vacuumed_gap_raises(spark, tmp_path):
    from a2b_spark.storage.cdf import TableChangesStream

    t = VersionedParquetTable(str(tmp_path / "cv"), key_cols=("k",), retention=2)
    for i in range(4):
        t.merge(spark.createDataFrame([(i, str(i))], "k long, v string"))
    s = TableChangesStream(t, spark, str(tmp_path / "cv_ck"))
    with pytest.raises(ValueError, match="vacuumed"):
        s.process_available(lambda df, v: None)


def test_table_changes_sees_evolved_column_only_update(spark, tmp_path):
    """Round-8 review regression: a merge that only POPULATES a column
    added by schema evolution must surface as an update with its
    after-image — snapshot_diff over the SHARED columns alone reported
    no change at all."""
    from a2b_spark.storage.cdf import TableChangesStream

    t = VersionedParquetTable(str(tmp_path / "ev"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    # v unchanged for key 1; only the NEW column w carries data
    t.merge(
        spark.createDataFrame([(1, "a", 5.0)], "k long, v string, w double")
    )
    rows = {
        (r.k, r.change): (r.v, r.w)
        for r in table_changes(t, spark, with_rows=True).collect()
    }
    assert rows == {(1, "update"): ("a", 5.0)}
    # and the streaming twin agrees
    got = []
    TableChangesStream(
        t, spark, str(tmp_path / "ev_ck"), with_rows=True
    ).process_available(
        lambda df, ver: got.append(
            {(r.k, r.change): r.w for r in df.collect()} if ver == 2 else None
        )
    )
    assert got[1] == {(1, "update"): 5.0}


def test_changes_stream_corrupt_offset_raises(spark, tmp_path):
    """Only a MISSING offset file means a fresh stream; corrupt or
    unreadable content must raise, not silently rewind to the start
    and re-deliver the whole history."""
    from a2b_spark.storage.cdf import TableChangesStream

    t = VersionedParquetTable(str(tmp_path / "co"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    ck = tmp_path / "co_ck"
    s = TableChangesStream(t, spark, str(ck))
    s.process_available(lambda df, v: None)
    assert s.last_processed() == 1
    (ck / "a2b_changes_offset.json").write_text("{not json")
    with pytest.raises(ValueError):
        s.last_processed()


def test_appends_reader_timestamp_partition_column(spark, tmp_path):
    """tz-aware timestamp partition values: the hive dir string can't
    cast straight to arrow's timestamp[us, UTC] — the reader must
    parse naive then stamp the zone (round-8 review crash repro)."""
    import datetime as dt

    import pyarrow as pa

    from a2b_spark.storage.cdf import _AppendsStreamReader

    t = VersionedParquetTable(
        str(tmp_path / "tsp"),
        key_cols=("k",),
        partition_by=("ts",),
        partitions_derived_from_keys=True,
        retention=10,
    )
    t.append(
        spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 0, 0, 0), 1.0)],
            "k long, ts timestamp, x double",
        )
    )
    r = _AppendsStreamReader({"path": t.path})
    rows = []
    for p in r.partitions({"version": 0}, {"version": 1}):
        for b in r.read(p):
            assert isinstance(b, pa.RecordBatch)
            rows.extend(b.to_pylist())
    assert len(rows) == 1
    got = rows[0]["ts"]
    assert got is not None
    # the stored instant round-trips (compare in UTC, tz-normalized)
    want = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    assert got.astimezone(dt.timezone.utc) == want


def test_table_changes_with_rows_spans_evolution_range(spark, tmp_path):
    """Second review pass: a with_rows range spanning an add-column
    evolution must union per-commit after-images with DIFFERENT column
    sets (null-fill), not raise NUM_COLUMNS_MISMATCH."""
    t = VersionedParquetTable(str(tmp_path / "sp"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.merge(spark.createDataFrame([(2, "b")], "k long, v string"))
    t.merge(spark.createDataFrame([(3, "c", 7.0)], "k long, v string, w double"))
    rows = {
        (r._commit_version, r.k, r.change): (r.v, r.w)
        for r in table_changes(t, spark, with_rows=True).collect()
    }
    assert rows == {
        (2, 2, "insert"): ("b", None),
        (3, 3, "insert"): ("c", 7.0),
    }


def test_appends_reader_timezone_option_shifts_instants(spark, tmp_path):
    """The writer-session timezone is a reader OPTION (dir names are
    rendered in it); a non-UTC value shifts the reconstructed
    instants by exactly the offset."""
    import datetime as dt

    from a2b_spark.storage.cdf import _AppendsStreamReader

    t = VersionedParquetTable(
        str(tmp_path / "tz"),
        key_cols=("k",),
        partition_by=("ts",),
        partitions_derived_from_keys=True,
        retention=10,
    )
    t.append(
        spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 1.0)], "k long, ts timestamp, x double"
        )
    )

    def instant(opts):
        r = _AppendsStreamReader(opts)
        vals = []
        for p in r.partitions({"version": 0}, {"version": 1}):
            for b in r.read(p):
                vals.extend(d["ts"].astimezone(dt.timezone.utc) for d in b.to_pylist())
        return vals[0]

    utc = instant({"path": t.path})
    shifted = instant({"path": t.path, "timezone": "Asia/Kolkata"})  # +05:30
    assert utc - shifted == dt.timedelta(hours=5, minutes=30)


def test_appends_reader_escaped_partition_column_name(spark, tmp_path):
    """A partition COLUMN NAME with hive-escaped characters must still
    match the schema field (the key is unescaped too, not just the
    value)."""
    from a2b_spark.storage.cdf import _AppendsStreamReader

    t = VersionedParquetTable(
        str(tmp_path / "esc"),
        key_cols=("k",),
        partition_by=("p:c",),
        partitions_derived_from_keys=True,
        retention=10,
    )
    t.append(
        spark.createDataFrame([(1, 0, 1.0)], ["k", "p:c", "x"])
    )
    r = _AppendsStreamReader({"path": t.path})
    rows = []
    for p in r.partitions({"version": 0}, {"version": 1}):
        for b in r.read(p):
            rows.extend(b.to_pylist())
    assert rows and rows[0]["p:c"] == 0


def test_with_rows_rejects_reserved_column_collision(spark, tmp_path):
    """A data column named `change` or `_commit_version` would collide
    with the reserved CDF output columns under with_rows=True — the
    attach must raise loudly instead of emitting ambiguous duplicates
    (round-8 advice)."""
    t = VersionedParquetTable(str(tmp_path / "rc"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "x")], "k long, change string"))
    t.merge(spark.createDataFrame([(1, "y")], "k long, change string"))
    v1, v2 = t.versions()[0], t.current_version()
    with pytest.raises(ValueError, match="reserved CDF output columns"):
        table_changes(t, spark, from_version=v1, to_version=v2, with_rows=True)
    # without after-images the reserved names never join in: still fine
    d = table_changes(t, spark, from_version=v1, to_version=v2)
    assert {r.change for r in d.collect()} == {"update"}


def test_appends_stream_empty_table_raises_clearly(spark, tmp_path):
    """Constructing the appends streamReader against a path with no
    committed versions must raise the same clear ValueError as
    DataSource.schema(), not an opaque TypeError from os.path.join
    (round-8 advice)."""
    p = str(tmp_path / "empty")
    VersionedParquetTable(p, key_cols=("k",))  # never written
    spark.dataSource.register(VersionAppendsDataSource)
    with pytest.raises(Exception) as ei:
        spark.readStream.format("a2b_table_appends").option("path", p).load()
    assert "no committed versions" in str(ei.value)


def test_earliest_streamable_version_contract(spark, tmp_path):
    """earliest_streamable_version() answers 'where can a NEW stream
    start?': 0 while full history is retained; after vacuum trims the
    prefix, the oldest retained commit (whose successor's diff can
    still be derived). Both consumers accept that offset and raise
    one notch earlier — the API and the raise must agree exactly."""
    from a2b_spark.storage.cdf import TableChangesStream

    t = VersionedParquetTable(str(tmp_path / "es"), key_cols=("k",), retention=3)
    assert t.earliest_streamable_version() == 0  # fresh table

    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    assert t.earliest_streamable_version() == 0  # full history retained
    for i in range(2, 7):  # commits 2..6; retention=3 keeps 4,5,6
        t.merge(spark.createDataFrame([(i, "x")], "k long, v string"))
    nums = sorted(int(v[2:]) for v in t.versions())
    assert nums == [4, 5, 6]
    es = t.earliest_streamable_version()
    assert es == 4

    # TableChangesStream: starting at es works, one earlier raises
    ok = TableChangesStream(t, spark, str(tmp_path / "ck_ok"), start_version=es)
    delivered = ok.process_available(lambda df, v: df.count())
    assert delivered == [5, 6]
    bad = TableChangesStream(t, spark, str(tmp_path / "ck_bad"), start_version=es - 1)
    with pytest.raises(ValueError, match="vacuumed"):
        bad.process_available(lambda df, v: df.count())


def test_appends_stream_rejects_non_initial_overwrite(spark, tmp_path):
    """Round-9 review finding: a LATER overwrite replaces the table;
    its files can all land in fresh partitions (passing the
    stale-partition check) while silently deleting every previously
    streamed row — the reader must raise, accepting 'overwrite' only
    as the initial load."""
    from a2b_spark.storage.cdf import _AppendsStreamReader

    t = VersionedParquetTable(
        str(tmp_path / "ow"),
        key_cols=("k",),
        partition_by=("epoch",),
        partitions_derived_from_keys=True,
        retention=10,
    )
    t.overwrite(spark.createDataFrame([(1, 0, 1.0)], "k long, epoch int, x double"))
    t.append(spark.createDataFrame([(2, 1, 2.0)], "k long, epoch int, x double"))
    # the replacement: only epoch=99 survives — rows 1/2 are GONE
    t.overwrite(spark.createDataFrame([(9, 99, 9.0)], "k long, epoch int, x double"))
    r = _AppendsStreamReader({"path": t.path})
    with pytest.raises(ValueError, match="overwrite"):
        r.partitions({"version": 0}, {"version": 3})
    # the initial-load overwrite (commit 1) stays legal
    rows = []
    for p in r.partitions({"version": 0}, {"version": 2}):
        for b in r.read(p):
            rows.extend(b.to_pylist())
    assert {(d["k"], d["_commit_version"]) for d in rows} == {(1, 1), (2, 2)}


def test_table_changes_layout_only_range_returns_empty_frame(spark, tmp_path):
    """A range holding only layout-only commits (constraints, schema
    metadata) yields an EMPTY frame with the contract schema — never
    None (callers chain .filter()/.count())."""
    t = VersionedParquetTable(str(tmp_path / "lo"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, 1.0)], "k long, x double"))
    t.add_constraint(spark, "x_pos", "x > 0")
    t.drop_constraint("x_pos")
    d = table_changes(t, spark)  # commits 2..3 are all layout-only
    assert d is not None
    assert d.count() == 0
    assert set(d.columns) == {"k", "change", "_commit_version"}
    dw = table_changes(t, spark, with_rows=True)
    assert dw.count() == 0 and "x" in dw.columns


def test_restore_across_cdf_disable_boundary_writes_changes(spark, tmp_path):
    """REGRESSION (round-10 advice): restoring TO a pre-enablement
    version FROM a CDF-enabled base is a CONTENT commit a running
    changes stream will cross — unlike a disable_cdf commit (layout
    -only, skipped), so it must carry the inverse-diff change files
    (gate on EITHER side's flag) rather than arrive bare and wedge the
    stream with 'no change files'."""
    from a2b_spark.storage import cdf as cdf_mod
    from a2b_spark.storage.table import CDF_DIR

    t = VersionedParquetTable(str(tmp_path / "t"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    v1 = t.current_version()
    t.enable_cdf()
    t.merge(spark.createDataFrame([(1, "A"), (3, "c")], "k long, v string"))
    # crossing the flag boundary still needs spark for the inverse diff
    with pytest.raises(ValueError, match="needs the"):
        t.restore(v1)
    t.restore(v1, spark)
    assert not t.cdf_enabled()  # flag rolled back with the metadata
    cdf_dir = os.path.join(t.path, t.current_version(), CDF_DIR)
    assert os.path.isdir(cdf_dir)
    inverse = {
        (r.k, r.change) for r in spark.read.parquet(cdf_dir).collect()
    }
    assert inverse == {(1, "update"), (3, "delete")}
    # a stream planner crossing the whole history must not raise
    r = cdf_mod._ChangesStreamReader({"path": t.path})
    hi = int(r.latestOffset()["version"])
    parts = r.partitions({"version": 0}, {"version": hi})
    assert any(p.path.startswith(cdf_dir) for p in parts)


def test_cdf_append_duplicate_key_raises_without_dedupe(spark, tmp_path):
    """REGRESSION (round-10 advice): with CDF on, append stamps every
    change row 'insert' — a batch key that already exists would make
    the change files contradict the keyed diff (which reports
    'update'), so it must fail loudly unless dedupe_keys skips it."""
    from a2b_spark.storage.table import CDF_DIR

    t = VersionedParquetTable(str(tmp_path / "t"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.enable_cdf()
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))  # fresh: fine
    with pytest.raises(ValueError, match="already exists"):
        t.append(spark.createDataFrame([(2, "B")], "k long, v string"))
    # dedupe_keys skips the clash; only the genuinely-fresh row is
    # committed AND recorded
    t.append(
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
        dedupe_keys=("k",),
    )
    assert {(r.k, r.v) for r in t.read(spark).collect()} == {
        (1, "a"), (2, "b"), (3, "c")
    }
    cdf_dir = os.path.join(t.path, t.current_version(), CDF_DIR)
    got = {(r.k, r.change) for r in spark.read.parquet(cdf_dir).collect()}
    assert got == {(3, "insert")}


def test_appends_planner_added_sidecar_and_fallback_agree(spark, tmp_path):
    """Round-10 planner: commits record their freshly-written files in
    an _ADDED sidecar so a C-commit drain is O(total new files), not
    O(C²) sidecar entries. Pre-round-10 histories lack the sidecar —
    the planner must fall back to the full-map diff per commit and
    produce the SAME partitions, including MIXED histories (some
    commits with _ADDED, some without) and the stale-partition check
    across the fallback/fast-path seam."""
    from a2b_spark.storage.cdf import _AppendsStreamReader
    from a2b_spark.storage.table import ADDED

    t = VersionedParquetTable(
        str(tmp_path / "a"),
        key_cols=("k",),
        partition_by=("epoch",),
        partitions_derived_from_keys=True,
        retention=20,
    )
    for e in range(6):
        t.append(
            spark.createDataFrame(
                [(10 * e + i, e, float(i)) for i in range(4)],
                "k long, epoch int, x double",
            )
        )
    # every content commit carries its own _ADDED record
    for v in t.versions():
        assert os.path.exists(os.path.join(t.path, v, ADDED))

    def _drain():
        r = _AppendsStreamReader({"path": t.path})
        rows = []
        for p in r.partitions({"version": 0}, {"version": 6}):
            for b in r.read(p):
                rows.extend(
                    (d["k"], d["epoch"], d["_commit_version"])
                    for d in b.to_pylist()
                )
        return sorted(rows)

    fast = _drain()
    assert len(fast) == 24
    # strip a MIDDLE commit's sidecar: fallback for it, fast around it
    os.remove(os.path.join(t.path, t.versions()[3], ADDED))
    assert _drain() == fast
    # strip all: the pre-round-10 history shape
    for v in t.versions():
        p = os.path.join(t.path, v, ADDED)
        if os.path.exists(p):
            os.remove(p)
    assert _drain() == fast
    # the stale-partition contract survives the fast path: an append
    # into an EXISTING epoch must still raise
    t.append(
        spark.createDataFrame([(999, 2, 9.9)], "k long, epoch int, x double")
    )
    r = _AppendsStreamReader({"path": t.path})
    with pytest.raises(ValueError, match="FRESH partitions"):
        r.partitions({"version": 0}, {"version": 7})
