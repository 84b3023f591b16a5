"""CDF pre-images + incremental aggregate maintenance (storage/ivm.py):
the signed fold over change rows must reproduce the full GROUP BY
recompute after any mix of inserts, updates, and deletes."""

import os

import pytest
from pyspark.sql import functions as F

from a2b_spark.storage.ivm import change_rows, refresh_rollup, rollup_delta
from a2b_spark.storage.table import CDF_DIR, VersionedParquetTable


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_preimage_change_files_shape(spark, tmp_path):
    """enable_cdf(preimages=True): updates emit an extra
    update_preimage row with the OLD values; deletes carry their full
    old payload; inserts are unchanged."""
    t = VersionedParquetTable(str(tmp_path / "t"), key_cols=("k",), retention=10)
    t.overwrite(
        spark.createDataFrame(
            [(1, "g1", 10.0), (2, "g1", 20.0), (3, "g2", 30.0)],
            "k long, g string, x double",
        )
    )
    t.enable_cdf(preimages=True)
    t.merge(
        spark.createDataFrame(
            [(1, "g1", 15.0), (4, "g2", 40.0)], "k long, g string, x double"
        )
    )
    cdf = spark.read.parquet(
        os.path.join(t.path, t.current_version(), CDF_DIR)
    )
    got = {(r.k, r.change, r.x) for r in cdf.collect()}
    assert got == {
        (1, "update", 15.0),
        (1, "update_preimage", 10.0),
        (4, "insert", 40.0),
    }
    t.delete_keys(spark.createDataFrame([(2,)], "k long"))
    cdf = spark.read.parquet(
        os.path.join(t.path, t.current_version(), CDF_DIR)
    )
    assert {(r.k, r.change, r.g, r.x) for r in cdf.collect()} == {
        (2, "delete", "g1", 20.0)  # full pre-image payload, not NULL
    }
    # mixing shapes is rejected: preimages on an already-plain table
    t2 = VersionedParquetTable(str(tmp_path / "t2"), key_cols=("k",), retention=10)
    t2.overwrite(spark.createDataFrame([(1, 1.0)], "k long, x double"))
    t2.enable_cdf()
    with pytest.raises(ValueError, match="WITHOUT preimages"):
        t2.enable_cdf(preimages=True)


def test_merge_changes_preimages_match_keyed_changes(spark):
    """merge_changes(preimages=True) ≡ keyed_changes(existing, merged,
    preimages=True) — the one-join fast path and the generic diff must
    agree on the pre-image rows too."""
    from a2b_spark.storage.diff import keyed_changes, merge_changes
    from a2b_spark.storage.merge import merge_dataframes

    existing = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 3.0)],
        "k long, s string, x double",
    )
    batch = spark.createDataFrame(
        [(1, "a", 9.0), (2, "b", 2.0), (5, "e", 5.0)],
        "k long, s string, x double",
    )
    fast = merge_changes(existing, batch, ["k"], preimages=True)
    merged = merge_dataframes(existing, batch, ["k"])
    generic = keyed_changes(existing, merged, ["k"], preimages=True)
    cols = ("k", "s", "x", "change")
    assert _rows(fast, *cols) == _rows(generic, *cols)
    # the unchanged key (2) emits nothing; the update emits a pair
    changes = {(r.k, r.change) for r in fast.collect()}
    assert changes == {(1, "update"), (1, "update_preimage"), (5, "insert")}


def test_refresh_rollup_tracks_full_recompute(spark, tmp_path):
    """The incremental rollup must equal the full GROUP BY recompute
    after every refresh, across initial build, updates that MOVE a row
    between groups, inserts, deletes, and a group emptying out."""
    src = VersionedParquetTable(str(tmp_path / "src"), key_cols=("k",), retention=20)
    src.overwrite(
        spark.createDataFrame(
            [(i, f"g{i % 3}", float(i)) for i in range(12)],
            "k long, g string, x double",
        )
    )
    src.enable_cdf(preimages=True)
    roll = VersionedParquetTable(
        str(tmp_path / "roll"), key_cols=("g",), retention=20
    )

    def check():
        got = sorted(
            (r.g, r.n_rows, float(r.x)) for r in roll.read(spark).collect()
        )
        want = sorted(
            (r.g, r.n_rows, float(r.x))
            for r in src.read(spark)
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("x").cast("decimal(28,6)")).alias("x"),
            )
            .collect()
        )
        assert got == want, (got, want)

    r1 = refresh_rollup(roll, src, spark, ["g"], ["x"])
    assert r1["groups_touched"] == 3
    check()
    # idempotent: nothing new
    r2 = refresh_rollup(roll, src, spark, ["g"], ["x"])
    assert r2["groups_touched"] == 0 and r2["to_version"] == r1["to_version"]
    # update that MOVES a row g0 -> g1, plus an insert
    src.merge(
        spark.createDataFrame(
            [(0, "g1", 100.0), (50, "g0", 7.5)], "k long, g string, x double"
        )
    )
    # a delete
    src.delete_keys(spark.createDataFrame([(4,)], "k long"))
    refresh_rollup(roll, src, spark, ["g"], ["x"])
    check()
    # empty a whole group: its rollup row must DISAPPEAR
    g2_keys = [(i,) for i in range(12) if i % 3 == 2]
    src.delete_keys(spark.createDataFrame(g2_keys, "k long"))
    refresh_rollup(roll, src, spark, ["g"], ["x"])
    check()
    assert "g2" not in {r.g for r in roll.read(spark).collect()}


def test_refresh_requires_preimages(spark, tmp_path):
    src = VersionedParquetTable(str(tmp_path / "s"), key_cols=("k",), retention=10)
    src.overwrite(spark.createDataFrame([(1, "g", 1.0)], "k long, g string, x double"))
    src.enable_cdf()  # plain CDF: after-images only
    roll = VersionedParquetTable(str(tmp_path / "r"), key_cols=("g",), retention=10)
    with pytest.raises(ValueError, match="preimages"):
        refresh_rollup(roll, src, spark, ["g"], ["x"])


def test_change_rows_gap_and_pre_enablement_raise(spark, tmp_path):
    src = VersionedParquetTable(str(tmp_path / "s"), key_cols=("k",), retention=20)
    src.overwrite(spark.createDataFrame([(1, 1.0)], "k long, x double"))
    src.merge(spark.createDataFrame([(2, 2.0)], "k long, x double"))  # no CDF
    src.enable_cdf(preimages=True)
    src.merge(spark.createDataFrame([(3, 3.0)], "k long, x double"))
    with pytest.raises(ValueError, match="no change files"):
        change_rows(src, spark, 1)  # crosses the pre-enablement merge
    df, to = change_rows(src, spark, 3)  # post-enablement only
    assert {(r.k, r.change) for r in df.collect()} == {(3, "insert")}
    # vacuumed gap
    import shutil

    shutil.rmtree(os.path.join(src.path, src.versions()[1]))
    with pytest.raises(ValueError, match="vacuumed"):
        change_rows(src, spark, 1)


def test_rollup_delta_rejects_unknown_change(spark):
    df = spark.createDataFrame(
        [("g", 1.0, "mystery")], "g string, x double, change string"
    )
    with pytest.raises(Exception, match="unknown change type"):
        rollup_delta(df, ["g"], ["x"]).collect()


def test_streaming_ivm_matches_batch_twin_and_replays(spark, tmp_path):
    """The continuous fold over the changes stream must land the SAME
    rollup as the batch refresh / full recompute, and a restarted
    stream (same checkpoint) must not double-count."""
    from a2b_spark.streaming.ivm import run_incremental_rollup_stream

    src = VersionedParquetTable(str(tmp_path / "src"), key_cols=("k",), retention=20)
    src.overwrite(
        spark.createDataFrame(
            [(i, f"g{i % 3}", float(i)) for i in range(12)],
            "k long, g string, x double",
        )
    )
    src.enable_cdf(preimages=True)
    src.merge(
        spark.createDataFrame(
            [(0, "g1", 100.0), (50, "g0", 7.5)], "k long, g string, x double"
        )
    )
    src.delete_keys(spark.createDataFrame([(4,)], "k long"))
    roll = VersionedParquetTable(str(tmp_path / "roll"), key_cols=("g",), retention=20)
    ck = str(tmp_path / "ck")

    def run():
        q = run_incremental_rollup_stream(
            spark, src, roll, ["g"], ["x"], ck, trigger_available_now=True
        )
        q.awaitTermination(120)

    run()
    want = sorted(
        (r.g, r.n_rows, float(r.x))
        for r in src.read(spark)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("x").cast("decimal(28,6)")).alias("x"),
        )
        .collect()
    )
    got = sorted((r.g, r.n_rows, float(r.x)) for r in roll.read(spark).collect())
    assert got == want
    # replay: same checkpoint, no new commits -> unchanged
    run()
    got2 = sorted((r.g, r.n_rows, float(r.x)) for r in roll.read(spark).collect())
    assert got2 == want
    # new commits drain incrementally on the next trigger
    src.delete_keys(spark.createDataFrame([(i,) for i in range(12) if i % 3 == 2], "k long"))
    run()
    want3 = sorted(
        (r.g, r.n_rows, float(r.x))
        for r in src.read(spark)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("x").cast("decimal(28,6)")).alias("x"),
        )
        .collect()
    )
    got3 = sorted((r.g, r.n_rows, float(r.x)) for r in roll.read(spark).collect())
    assert got3 == want3
    assert "g2" not in {g for g, _, _ in got3}  # emptied group removed
    # the batch surface refuses a stream-maintained rollup
    with pytest.raises(ValueError, match="STREAM-maintained"):
        refresh_rollup(roll, src, spark, ["g"], ["x"])


def test_streaming_ivm_rejects_batch_maintained_rollup(spark, tmp_path):
    from a2b_spark.streaming.ivm import run_incremental_rollup_stream

    src = VersionedParquetTable(str(tmp_path / "s"), key_cols=("k",), retention=10)
    src.overwrite(
        spark.createDataFrame([(1, "g", 1.0)], "k long, g string, x double")
    )
    src.enable_cdf(preimages=True)
    roll = VersionedParquetTable(str(tmp_path / "r"), key_cols=("g",), retention=10)
    refresh_rollup(roll, src, spark, ["g"], ["x"])
    with pytest.raises(ValueError, match="BATCH-maintained"):
        run_incremental_rollup_stream(
            spark, src, roll, ["g"], ["x"], str(tmp_path / "ck")
        )
