"""Change-data-feed WRITE path (enable_cdf -> per-commit _cdf files)
and the a2b_table_changes streaming DataSource — Delta CDF's design:
changes are derived once at commit time (batch-sized joins), streams
read files and never re-derive diffs.

The correctness oracle throughout is batch ``table_changes`` (itself
driver-oracle-checked via q141): the stream must deliver exactly what
the batch walk derives from the snapshots."""

import os

import pytest
from pyspark.sql import functions as F

from a2b_spark.storage.cdf import TableChangesDataSource, table_changes
from a2b_spark.storage.diff import keyed_changes, merge_changes
from a2b_spark.storage.table import CDF_DIR, VersionedParquetTable


def _history(spark, tmp_path, name="t", partition_by=None):
    t = VersionedParquetTable(
        str(tmp_path / name),
        key_cols=("k",),
        partition_by=partition_by,
        retention=10,
    )
    if partition_by:
        mk = lambda rows: spark.createDataFrame(rows, "k long, p int, v string")
        t.overwrite(mk([(1, 0, "a"), (2, 1, "b")]))
        t.enable_cdf()
        t.merge(mk([(1, 0, "A"), (3, 0, "c")]))          # update + insert
        t.delete_keys(spark.createDataFrame([(2,)], "k long"))
        t.merge(mk([(4, 1, "d")]))                        # insert
    else:
        mk = lambda rows: spark.createDataFrame(rows, "k long, v string")
        t.overwrite(mk([(1, "a"), (2, "b")]))
        t.enable_cdf()
        t.merge(mk([(1, "A"), (3, "c")]))
        t.delete_keys(spark.createDataFrame([(2,)], "k long"))
        t.merge(mk([(4, "d")]))
    return t


def _batch_oracle(t, spark):
    """What the stream must deliver: inserts of v1 plus the batch CDF
    of every later commit (layout-only commits contribute nothing)."""
    first = t.versions()[0]
    v1 = t.read(spark, version=first).withColumn("change", F.lit("insert"))
    later = table_changes(t, spark, with_rows=True)
    rows = {
        (r.k, r.change, r.v, r._commit_version)
        for r in later.collect()
    }
    rows |= {(r.k, "insert", r.v, 1) for r in v1.collect()}
    return rows


def _drain(spark, t, ck, out):
    spark.dataSource.register(TableChangesDataSource)
    finished = (
        spark.readStream.format("a2b_table_changes")
        .option("path", t.path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    if not finished:
        raise TimeoutError("a2b_table_changes availableNow stream exceeded 300s")
    return {
        (r.k, r.change, r.v, r._commit_version)
        for r in spark.read.parquet(out).collect()
    }


def test_changes_source_matches_batch_and_restarts(spark, tmp_path):
    t = _history(spark, tmp_path)
    got = _drain(spark, t, str(tmp_path / "ck"), str(tmp_path / "out"))
    assert got == _batch_oracle(t, spark)
    # delete payload is NULL; enable_cdf commit streamed nothing
    assert (2, "delete", None, 4) in got
    assert not any(v == 2 for (_, _, _, v) in got)  # v2 = enable_cdf

    # restart on the same checkpoint: only NEW commits stream
    t.merge(spark.createDataFrame([(5, "e")], "k long, v string"))
    got2 = _drain(spark, t, str(tmp_path / "ck"), str(tmp_path / "out"))
    assert got2 == _batch_oracle(t, spark)
    assert (5, "insert", "e", 6) in got2


def test_changes_source_partitioned_touched_commits(spark, tmp_path):
    """Partitioned tables stage change files from the touched-partition
    merge path; partition columns are payload in the change files."""
    t = _history(spark, tmp_path, name="p", partition_by=("p",))
    spark.dataSource.register(TableChangesDataSource)
    out = str(tmp_path / "outp")
    finished = (
        spark.readStream.format("a2b_table_changes")
        .option("path", t.path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckp"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    if not finished:
        raise TimeoutError("stream exceeded 300s")
    got = {
        (r.k, r.p, r.change, r.v, r._commit_version)
        for r in spark.read.parquet(out).collect()
    }
    assert (1, 0, "insert", "a", 1) in got
    assert (1, 0, "update", "A", 3) in got
    assert (3, 0, "insert", "c", 3) in got
    assert (2, None, "delete", None, 4) in got  # delete payload NULL
    assert (4, 1, "insert", "d", 5) in got
    ks = {(r[0], r[2], r[4]) for r in got}
    batch = {
        (r.k, r.change, r._commit_version)
        for r in table_changes(t, spark).collect()
    } | {(1, "insert", 1), (2, "insert", 1)}
    assert ks == batch


def test_changes_source_restore_streams_inverse_diff(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "r"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.enable_cdf()
    good = t.current_version()
    t.merge(spark.createDataFrame([(1, "BAD"), (9, "x")], "k long, v string"))
    # CDF-enabled restore requires the session (derives the inverse diff)
    with pytest.raises(ValueError, match="needs the"):
        t.restore(good)
    t.restore(good, spark)
    got = _drain(spark, t, str(tmp_path / "ckr"), str(tmp_path / "outr"))
    # the restore commit undoes the bad merge: update back + delete
    assert (1, "update", "a", 4) in got
    assert (9, "delete", None, 4) in got
    assert got == _batch_oracle(t, spark)


def test_changes_source_raises_without_cdf_and_on_vacuum_gap(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "n"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.merge(spark.createDataFrame([(2, "b")], "k long, v string"))  # no CDF
    spark.dataSource.register(TableChangesDataSource)
    q = (
        spark.readStream.format("a2b_table_changes")
        .option("path", t.path)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "outn"))
        .option("checkpointLocation", str(tmp_path / "ckn"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="no change files"):
        q.awaitTermination(120)

    # vacuumed gap: start offset below the retained window raises
    t2 = VersionedParquetTable(str(tmp_path / "v"), key_cols=("k",), retention=2)
    t2.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    t2.enable_cdf()
    for i in range(2, 6):
        t2.merge(spark.createDataFrame([(i, "x")], "k long, v string"))
    q2 = (
        spark.readStream.format("a2b_table_changes")
        .option("path", t2.path)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "outv"))
        .option("checkpointLocation", str(tmp_path / "ckv"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="vacuumed"):
        q2.awaitTermination(120)


def test_merge_changes_equals_generic_diff(spark):
    """merge_changes (batch-sized join) must emit exactly what
    keyed_changes derives from the merged output — including NULL
    keys, explicit NULL updates, batch-added columns, and
    existing-only column pass-through."""
    from a2b_spark.storage.merge import merge_dataframes

    existing = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (None, "n", 0.0), (4, None, 40.0)],
        "k long, v string, w double",
    )
    batch = spark.createDataFrame(
        [
            (1, "a", "same-payload-in-v-but-x-new"),  # update via new col
            (2, "b", None),                            # new col NULL: unchanged
            (None, "N", "z"),                          # NULL key update
            (5, "e", "ins"),                           # insert
            (4, None, None),                           # identical: unchanged
        ],
        "k long, v string, x string",
    )
    merged = merge_dataframes(existing, batch, ["k"])
    want = {
        tuple(r)
        for r in keyed_changes(existing, merged, ["k"])
        .select("k", "v", "w", "x", "change")
        .collect()
    }
    got = {
        tuple(r)
        for r in merge_changes(existing, batch, ["k"])
        .select("k", "v", "w", "x", "change")
        .collect()
    }
    assert got == want
    assert ("update" in {r[-1] for r in got})
    assert (5, "e", None, "ins", "insert") in got
    ks = {r[0] for r in got}
    assert 2 not in ks and 4 not in ks  # unchanged rows dropped


def test_cdf_files_invisible_to_reads_stats_and_metadata_commits(spark, tmp_path):
    """_cdf dirs must be invisible everywhere else: version reads,
    stats harvesting, hardlink metadata commits, appends-stream inode
    scans, and compaction file math."""
    t = VersionedParquetTable(str(tmp_path / "i"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, 5.0)], "k long, x double"))
    t.enable_cdf()
    t.merge(spark.createDataFrame([(2, 7.0)], "k long, x double"))
    vdir = os.path.join(t.path, t.current_version())
    assert os.path.isdir(os.path.join(vdir, CDF_DIR))
    # reads see only logical rows
    assert {r.k for r in t.read(spark).collect()} == {1, 2}
    # stats sidecar covers only data files (no _cdf/part entries)
    from a2b_spark.storage.stats import load_stats

    st = load_stats(vdir)
    assert all(not rel.startswith(CDF_DIR) for rel in st["files"])
    # a metadata commit (constraint) must not inherit the _cdf dir
    t.add_constraint(spark, "x_pos", "x > 0")
    v_meta = os.path.join(t.path, t.current_version())
    assert not os.path.exists(os.path.join(v_meta, CDF_DIR))
    # and the batch walk still works across everything
    got = {(r.k, r.change) for r in table_changes(t, spark).collect()}
    assert got == {(2, "insert")}


def test_underscore_partition_dirs_survive_walker_pruning(spark, tmp_path):
    """The _cdf pruning rule must never swallow PARTITION dirs whose
    column name starts with '_' (the streaming near-dup history table
    partitions by __epoch): reads, stats, appends-inode scans and
    hardlink metadata commits all walk these trees."""
    t = VersionedParquetTable(
        str(tmp_path / "u"),
        key_cols=("k",),
        partition_by=("__epoch",),
        partitions_derived_from_keys=True,
        retention=10,
    )
    t.append(spark.createDataFrame([(1, 0, 1.0)], "k long, __epoch int, x double"))
    t.enable_cdf()
    t.append(spark.createDataFrame([(2, 1, 2.0)], "k long, __epoch int, x double"))
    assert {(r["k"], r["__epoch"]) for r in t.read(spark).collect()} == {
        (1, 0),
        (2, 1),
    }
    from a2b_spark.storage.stats import load_stats

    st = load_stats(os.path.join(t.path, t.current_version()))
    assert any("__epoch=" in rel for rel in st["files"])
    # metadata commit keeps the partition data reachable
    t.add_constraint(spark, "x_pos", "x > 0")
    assert {r.k for r in t.read(spark).collect()} == {1, 2}
    # and the changes stream delivers both commits' rows
    got = _drain_cols(
        spark, t, str(tmp_path / "cku"), str(tmp_path / "outu"),
        ["k", "__epoch", "change", "_commit_version"],
    )
    assert got == {(1, 0, "insert", 1), (2, 1, "insert", 3)}


def _drain_cols(spark, t, ck, out, cols):
    spark.dataSource.register(TableChangesDataSource)
    finished = (
        spark.readStream.format("a2b_table_changes")
        .option("path", t.path)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    if not finished:
        raise TimeoutError("a2b_table_changes availableNow stream exceeded 300s")
    return {tuple(r[c] for c in cols) for r in spark.read.parquet(out).collect()}


def test_restore_cdf_gate_follows_restored_versions_flag(spark, tmp_path):
    """Round-9 review finding: the restore commit inherits the
    RESTORED version's _CDF_ENABLED sidecar, so the change-file gate
    must follow THAT flag, not the base's — otherwise a CDF-enabled
    restore commit ships no change files and wedges every stream
    crossing it."""
    t = VersionedParquetTable(str(tmp_path / "rg"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))  # v1
    t.enable_cdf()                                                      # v2
    t.merge(spark.createDataFrame([(2, "b")], "k long, v string"))      # v3
    t.disable_cdf()                                                     # v4
    t.merge(spark.createDataFrame([(3, "c")], "k long, v string"))      # v5
    enabled_v = t.versions()[2]  # v3: flag ON
    # restoring to a CDF-ON version: change rows required -> needs spark
    with pytest.raises(ValueError, match="needs the"):
        t.restore(enabled_v)
    t.restore(enabled_v, spark)                                         # v6
    assert t.cdf_enabled()
    vdir = os.path.join(t.path, t.current_version())
    assert os.path.isdir(os.path.join(vdir, CDF_DIR))  # inverse diff staged
    # restoring to a CDF-OFF version FROM a CDF-ON base still crosses
    # any running stream with a CONTENT commit (unlike the layout-only
    # disable_cdf): the inverse diff ships (round-10 advice) and the
    # flag rolls back with the metadata
    with pytest.raises(ValueError, match="needs the"):
        t.restore(t.versions()[0])
    t.restore(t.versions()[0], spark)                                   # v7
    assert not t.cdf_enabled()
    vdir = os.path.join(t.path, t.current_version())
    assert os.path.isdir(os.path.join(vdir, CDF_DIR))
    # both sides OFF: no session needed, nothing staged
    t.restore(t.versions()[4])                                          # v8
    vdir = os.path.join(t.path, t.current_version())
    assert not os.path.isdir(os.path.join(vdir, CDF_DIR))


def test_max_commits_per_trigger_rate_limits(spark, tmp_path):
    """maxCommitsPerTrigger=2, driven through the engine's exact call
    sequence (latestOffset FIRST, then initialOffset, then
    partitions): the first batch of a run is unbounded (the argless
    latestOffset cannot know a restored checkpoint — capping it would
    stall restarts), every later batch advances at most 2 commits,
    and commit() also moves the cursor so a progressing stream never
    re-caps below its own position."""
    from a2b_spark.storage.cdf import _ChangesStreamReader

    t = VersionedParquetTable(str(tmp_path / "rl"), key_cols=("k",), retention=20)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))  # v1
    t.enable_cdf()                                                      # v2
    for i in range(2, 6):                                               # v3..v6
        t.merge(spark.createDataFrame([(i, "x")], "k long, v string"))

    r = _ChangesStreamReader({"path": t.path, "maxcommitspertrigger": "2"})
    first = r.latestOffset()           # engine asks latest FIRST
    assert first == {"version": 6}     # run-opening batch: unbounded
    assert r.initialOffset() == {"version": 0}
    parts = r.partitions({"version": 0}, first)
    assert parts  # v1 inserts + 4 merge diffs planned

    for i in range(6, 12):                                              # v7..v12
        t.merge(spark.createDataFrame([(i, "x")], "k long, v string"))
    nxt = r.latestOffset()
    assert nxt == {"version": 8}       # capped: 6 + 2
    r.partitions(first, nxt)
    assert r.latestOffset() == {"version": 10}
    r.commit({"version": 10})          # engine commits without planning
    assert r.latestOffset() == {"version": 12}
    # uncapped reader drains everything at once
    r2 = _ChangesStreamReader({"path": t.path})
    r2.initialOffset()
    assert r2.latestOffset() == {"version": 12}


def test_delete_cdc_is_key_level_on_duplicate_rows(spark, tmp_path):
    """append() without dedupe can stack duplicate-keyed rows (while
    CDF is off — with it on, the round-10 clash guard rejects exactly
    this); a later delete's change files must still carry ONE row per
    key (the keyed diff contract batch table_changes reports), not one
    per physical row — pinned by reading the staged _cdf files
    directly."""
    t = VersionedParquetTable(str(tmp_path / "dup"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(spark.createDataFrame([(1, "b"), (2, "c")], "k long, v string"))
    assert t.read(spark).filter("k = 1").count() == 2  # duplicate key
    t.enable_cdf()
    t.delete_keys(spark.createDataFrame([(1,)], "k long"))
    vdir = os.path.join(t.path, t.current_version())
    rows = spark.read.parquet(os.path.join(vdir, CDF_DIR)).collect()
    assert [(r.k, r.change, r.v) for r in rows] == [(1, "delete", None)]
    assert t.read(spark).count() == 1  # both physical k=1 rows gone
