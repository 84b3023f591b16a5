"""Distributed prefix sum + sequence packing (operators/prefix.py).

The contract under test: running_total equals a single-threaded
cumulative sum over the global key order REGARDLESS of the input's
partitioning, and pack_sequences' bins never start past their budget
boundary (overflow is bounded by one document)."""

import pytest
from pyspark.sql import functions as F

from a2b_spark.operators.prefix import pack_sequences, running_total


def _expected_running(rows):
    run, out = 0, {}
    for k, v in sorted(rows):
        run += v
        out[k] = run
    return out


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_running_total_matches_sequential_cumsum(spark, n_parts):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 500)) for i in range(997)]
    shuffled = rows[:]
    rng.shuffle(shuffled)  # input order must not matter
    df = spark.createDataFrame(shuffled, "k long, v long").repartition(n_parts)
    got = {
        r["k"]: r["running"]
        for r in running_total(df, "k", "v", num_partitions=5).collect()
    }
    assert got == _expected_running(rows)


def test_running_total_empty(spark):
    df = spark.createDataFrame([], "k long, v long")
    assert running_total(df, "k", "v").count() == 0


def test_pack_sequences_budget_contract(spark):
    import random

    rng = random.Random(11)
    rows = [(i, "x " * rng.randrange(1, 120)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    out = (
        pack_sequences(df, "doc_id", toks, budget=256)
        .orderBy("doc_id")
        .collect()
    )
    # pack ids are assigned in stream order and never skip backwards
    packs = [r["pack_id"] for r in out]
    assert packs == sorted(packs)
    assert packs[0] == 0
    # a document's pack is the bin its predecessor stream ends in:
    # the tokens BEFORE each doc fully determine its pack
    for r in out:
        assert r["pack_id"] == (r["running"] - r["tokens"]) // 256
    # overflow bound: tokens in a pack < budget + its largest doc
    by_pack = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append(r["tokens"])
    for toks_in_pack in by_pack.values():
        assert sum(toks_in_pack) < 256 + max(toks_in_pack)


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n long")
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n", budget=0)


def test_running_total_negative_values(spark):
    """Partition totals must be the SUM of raw values, not the cumsum
    max — negative values (a running balance) expose the difference."""
    rows = [(0, 10), (1, -4), (2, 7), (3, -20), (4, 5), (5, 3)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(3)
    got = {
        r["k"]: r["running"]
        for r in running_total(df, "k", "v", num_partitions=3).collect()
    }
    assert got == _expected_running(rows)


def test_pack_sequences_deterministic_across_configs(spark):
    """Round-4 driver failure mode: the same pack_sequences call must
    produce bit-identical output under DIFFERENT shuffle-partition
    configs (the driver runs its own Spark config). The fix pins the
    sampled range chunking with an eager localCheckpoint and computes
    chunk offsets in-plan, so no second action can observe a different
    partitioning; the global cumsum is config-independent math."""
    rows = [(i, "w " * ((i * 37) % 200 + 1)) for i in range(1500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))

    def run():
        out = pack_sequences(df, "doc_id", toks, budget=512).collect()
        return sorted((r["doc_id"], r["running"], r["pack_id"]) for r in out)

    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        first = run()
        second = run()  # same config, repeated — r4 failure repro shape
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        third = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert first == second == third
    # the values themselves must be the sequential cumsum
    expected = _expected_running(
        [(i, (i * 37) % 200 + 1) for i in range(1500)]
    )
    assert {k: r for k, r, _ in first} == expected


def test_running_total_leaves_no_catalog_cache(spark):
    """Round-4 advice: registry invocations must not accumulate
    cached plans. localCheckpoint pins data in the block manager
    (freed on GC) without registering in the session cache manager."""
    df = spark.createDataFrame([(i, i) for i in range(100)], "k long, v long")
    running_total(df, "k", "v").count()
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty()


def test_running_total_drops_helper_columns(spark):
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    out = running_total(df, "k", "v")
    assert set(out.columns) == {"k", "v", "running"}
