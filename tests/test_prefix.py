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


def test_running_total_drops_helper_columns(spark):
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    out = running_total(df, "k", "v")
    assert set(out.columns) == {"k", "v", "running"}
