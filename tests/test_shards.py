"""Deterministic shuffle-shard export — operators/shards.py."""

import hashlib

import pytest

from a2b_spark.operators.shards import shuffle_shards


def _h60(salt, key):
    return int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(i, f"doc{i}") for i in range(97)], "id int, payload string"
    )


def test_matches_reference_assignment(spark, df):
    out = shuffle_shards(df, "id", 8, salt="s").collect()
    # reference: bucket + order by (h60, str(key))
    ref = {}
    by_shard = {}
    for i in range(97):
        h = _h60("s", i)
        by_shard.setdefault(h % 8, []).append((h, str(i), i))
    for sh, rows in by_shard.items():
        for pos, (_, _, i) in enumerate(sorted(rows), start=1):
            ref[i] = (sh, pos)
    got = {r.id: (r.shard, r.pos) for r in out}
    assert got == ref


def test_partitioning_invariant(spark, df):
    a = {(r.id, r.shard, r.pos) for r in shuffle_shards(df, "id", 8).collect()}
    b = {
        (r.id, r.shard, r.pos)
        for r in shuffle_shards(df.repartition(7, "payload"), "id", 8).collect()
    }
    assert a == b


def test_positions_contiguous(spark, df):
    out = shuffle_shards(df, "id", 4, salt="x").collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    assert sum(len(v) for v in by_shard.values()) == 97


def test_salt_changes_assignment(spark, df):
    a = {r.id: r.shard for r in shuffle_shards(df, "id", 8, salt="a").collect()}
    b = {r.id: r.shard for r in shuffle_shards(df, "id", 8, salt="b").collect()}
    assert a != b


def test_single_shard_total_order(spark, df):
    out = shuffle_shards(df, "id", 1).collect()
    assert {r.shard for r in out} == {0}
    assert sorted(r.pos for r in out) == list(range(1, 98))


def test_rejects_bad_n_shards(df):
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(df, "id", 0)


def test_reserved_column_collision_raises(spark):
    df = spark.createDataFrame([(1, 2)], "id int, shard int")
    with pytest.raises(ValueError, match="reserved"):
        shuffle_shards(df, "id", 4)


def test_user_h60_column_survives(spark):
    df = spark.createDataFrame([(1, "keep")], "id int, __h60 string")
    out = shuffle_shards(df, "id", 2).collect()[0]
    assert out["__h60"] == "keep"


def test_null_key_fails_loudly(spark):
    # NULL key → NULL hash → NULL shard → silent row drop into
    # __HIVE_DEFAULT_PARTITION__ on a partitioned write (ADVICE r10).
    # The guard rides the hash expression and raises at execution.
    df = spark.createDataFrame(
        [(1, "a"), (None, "b")], "id int, payload string"
    )
    with pytest.raises(Exception, match="NULL value in key column"):
        shuffle_shards(df, "id", 4).collect()
