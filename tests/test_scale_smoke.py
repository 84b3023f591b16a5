"""Scale smoke: the dedup chain on a corpus 8× the test fixture with
every document duplicated across shards — the shape that breaks
naive pair generation (each doc is an 8-clique: ~28 pairs per doc,
>100k true pairs corpus-wide) and O(diameter) clustering.

This is a budget-bounded regression guard for the 100 TB design
claims: candidate generation must stay banded (no all-pairs), the
pair volume must match the combinatorial expectation exactly, and
connected components must collapse the cliques without blowing up
the driver. Wall-clock is deliberately NOT asserted (CI boxes swing
3-5×); structure is.
"""

import pytest
from pyspark.sql import functions as F

N_SHARDS = 8
SHIFT = 1_000_000


@pytest.fixture(scope="module")
def sharded_docs(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    shards = [
        base.select((F.col("doc_id") + SHIFT * i).alias("doc_id"), "text")
        for i in range(N_SHARDS)
    ]
    out = shards[0]
    for s in shards[1:]:
        out = out.unionByName(s)
    return out


def test_minhash_dedup_chain_at_8x_with_full_duplication(spark, sharded_docs):
    from a2b_spark.operators.dedup import minhash_near_dup_pairs
    from a2b_spark.operators.graph import connected_components

    n_base = sharded_docs.count() // N_SHARDS
    pairs = minhash_near_dup_pairs(sharded_docs, "text", "doc_id", threshold=0.99)
    # keep only cross-shard pairs of the SAME base doc (exact copies);
    # planted near-dups within the fixture add more pairs on top
    same_doc = pairs.filter(
        (F.col("id_a") % SHIFT) == (F.col("id_b") % SHIFT)
    ).count()
    expect_same = n_base * (N_SHARDS * (N_SHARDS - 1) // 2)
    # identical text => jaccard 1.0 => banding recall is exact; every
    # cross-shard copy pair MUST be found
    assert same_doc == expect_same, (same_doc, expect_same)

    cc = connected_components(pairs, "id_a", "id_b")
    clusters = cc.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
    # every base doc's 8 copies share one component; docs also near-dup
    # with OTHER docs merge further, so cluster count <= n_base and
    # every cluster size is a multiple of N_SHARDS
    n_clusters = clusters.count()
    assert 0 < n_clusters <= n_base
    bad = clusters.filter(F.col("sz") % N_SHARDS != 0).count()
    assert bad == 0
