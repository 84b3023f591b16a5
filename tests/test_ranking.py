"""Ranking-operator unit tests: TF-IDF salience and BM25 ordering on
tiny corpora with hand-checkable statistics, plus the dedup keep/drop
closure (q49's operator chain) on planted duplicates."""

import math

import pytest
from pyspark.sql import functions as F

from a2b_spark.operators.ranking import bm25_scores, tfidf_top_terms


@pytest.fixture()
def corpus(spark):
    # 4 docs; "rare" appears only in doc 1, "common" in all docs
    return spark.createDataFrame(
        [
            (1, "common rare alpha beta"),
            (2, "common alpha alpha gamma"),
            (3, "common beta gamma gamma"),
            (4, "common delta delta delta"),
        ],
        "doc_id bigint, text string",
    )


def test_tfidf_rare_term_wins(spark, corpus):
    top = {
        r.doc_id: (r.term, r.score)
        for r in tfidf_top_terms(corpus, "text", "doc_id", top_k=1).collect()
    }
    # doc 1's most salient term is its hapax "rare": tf=1, idf=ln(4/1)
    assert top[1][0] == "rare"
    assert top[1][1] == pytest.approx(round(math.log(4.0), 6))
    # doc 4: "delta" tf=3 idf=ln(4) dominates
    assert top[4][0] == "delta"
    assert top[4][1] == pytest.approx(round(3 * math.log(4.0), 6))


def test_bm25_empty_and_all_null_corpus(spark):
    """Empty corpus / all-null texts have no avgdl — must return an
    empty top-k frame, not crash on float(None)."""
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    out = bm25_scores(empty, "text", "doc_id", ["alpha"]).collect()
    assert out == []
    nulls = spark.createDataFrame([(1, None), (2, None)], "doc_id bigint, text string")
    out = bm25_scores(nulls, "text", "doc_id", ["alpha"])
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["doc_id", "score", "rank"]


def test_tfidf_idf_zero_for_universal_terms(spark, corpus):
    out = tfidf_top_terms(corpus, "text", "doc_id", top_k=4).collect()
    # "common" appears in every doc -> idf = ln(1) = 0 -> score 0
    common = [r for r in out if r.term == "common"]
    assert common and all(r.score == 0.0 for r in common)


def test_tfidf_rank_determinism(spark, corpus):
    out = tfidf_top_terms(corpus, "text", "doc_id", top_k=3)
    a = [(r.doc_id, r.term, r.rank) for r in out.collect()]
    b = [(r.doc_id, r.term, r.rank) for r in out.collect()]
    assert a == b
    for doc in {1, 2, 3, 4}:
        ranks = sorted(r for (d, _, r) in a if d == doc)
        assert ranks == list(range(1, len(ranks) + 1))


def test_bm25_orders_by_term_density(spark, corpus):
    # query "delta": only doc 4 contains it
    out = bm25_scores(corpus, "text", "doc_id", ["delta"], top_k=10).collect()
    assert [r.doc_id for r in out] == [4]
    # multi-term query: doc 2 (alpha x2) should outrank docs with one hit
    out = bm25_scores(corpus, "text", "doc_id", ["alpha"], top_k=10).collect()
    assert out[0].doc_id == 2
    assert out[0].rank == 1 and out[0].score > out[1].score


def test_bm25_duplicate_query_terms_collapse(spark, corpus):
    once = bm25_scores(corpus, "text", "doc_id", ["alpha"], top_k=10).collect()
    twice = bm25_scores(corpus, "text", "doc_id", ["alpha", "alpha"], top_k=10).collect()
    assert [(r.doc_id, r.score) for r in once] == [(r.doc_id, r.score) for r in twice]


def test_dedup_apply_keeps_cluster_minimum(spark):
    from a2b_spark.operators.dedup import dedup_apply

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (10, base),
            (11, base),  # exact dup of 10
            (12, base + " extra"),  # near dup of 10/11
            (20, "completely different words describing unrelated things entirely here now"),
        ],
        "doc_id bigint, text string",
    )
    kept = sorted(
        r.doc_id
        for r in dedup_apply(docs, "text", "doc_id", threshold=0.6).select("doc_id").collect()
    )
    assert kept == [10, 20]


def test_knn_pq_matches_bruteforce(spark, sf_dir):
    from a2b_spark.operators.similarity import knn_bruteforce, knn_pq

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    pq = {
        (r.query_id, r.corpus_id, r.cos, r.rk)
        for r in knn_pq(q, e, "embedding", "vec_id", k=5, m=16, ks=32, shortlist=256).collect()
    }
    bf = {
        (r.query_id, r.corpus_id, r.cos, r.rk)
        for r in knn_bruteforce(q, e, "embedding", "vec_id", k=5).collect()
    }
    assert pq == bf


def test_unigram_surprisal_uniform_corpus(spark):
    from a2b_spark.operators.ranking import unigram_surprisal

    df = spark.createDataFrame(
        [(1, "a a b b"), (2, "a b")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in unigram_surprisal(df, "text", "doc_id").collect()}
    # p(a) = p(b) = 1/2 -> every token's surprisal is ln 2; the mean in
    # 1e-7 nats is round(ln 2, 7) * 1e7 for both docs
    expected = 6931472
    assert out[1].n_tokens == 4 and out[2].n_tokens == 2
    assert out[1].surprisal_e7 == expected
    assert out[2].surprisal_e7 == expected


def test_unigram_surprisal_rare_token_scores_higher(spark):
    from a2b_spark.operators.ranking import unigram_surprisal

    df = spark.createDataFrame(
        [(1, "common common common common"), (2, "common rare")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.surprisal_e7 for r in unigram_surprisal(df, "text", "doc_id").collect()}
    assert out[2] > out[1]


def test_knn_ivf_pq_matches_bruteforce(spark, sf_dir):
    """IVFADC with full probe + covering shortlist must equal exact
    KNN (the q64 oracle contract); with pruned probes it must still
    recover most neighbors on this hard near-uniform corpus."""
    from a2b_spark.operators.similarity import knn_bruteforce, knn_ivf_pq

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter("vec_id < 10")
    exact = {
        (r.query_id, r.corpus_id, r.cos, r.rk)
        for r in knn_bruteforce(q, e, "embedding", "vec_id", k=5).collect()
    }
    full = {
        (r.query_id, r.corpus_id, r.cos, r.rk)
        for r in knn_ivf_pq(
            q, e, "embedding", "vec_id", k=5,
            n_cells=8, n_probe=8, m=16, ks=32, shortlist=600,
        ).collect()
    }
    assert full == exact
    pruned = {
        (r.query_id, r.corpus_id)
        for r in knn_ivf_pq(
            q, e, "embedding", "vec_id", k=5,
            n_cells=8, n_probe=4, m=16, ks=32, shortlist=600,
        ).collect()
    }
    exact_pairs = {(a, b) for a, b, _, _ in exact}
    assert len(exact_pairs & pruned) / len(exact_pairs) >= 0.5


def test_doc_term_freqs_matches_explode_groupby(spark):
    """The map-side run-length tf (sorted-array HOFs, zero shuffle)
    must emit exactly the rows of the classic explode + groupBy
    word count, including the empty-string token from '' and
    adjacent-space splits; null text yields no rows."""
    from pyspark.sql import functions as F

    from a2b_spark.operators.ranking import doc_term_freqs

    rows = [
        (1, "a b a c a b"),
        (2, ""),
        (3, "x"),
        (4, "a  b"),  # double space -> empty token
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.token): r.tf
        for r in doc_term_freqs(df, "text", "doc_id").collect()
    }
    exp = {
        (r.doc_id, r.token): r.tf
        for r in (
            df.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        ).collect()
    }
    assert got == exp
    assert got[(1, "a")] == 3 and got[(4, "")] == 1 and (5, None) not in got


def test_doc_term_freqs_drops_null_text_like_explode(spark):
    """NULL text must drop the doc entirely — matching the exploded
    tokenizer (explode of a null array yields no rows) — in BOTH
    legacy-sizeOfNull and ANSI sessions; without the guard, legacy
    size(null) == -1 fabricates a phantom (id, NULL, -1) row."""
    from a2b_spark.operators.ranking import doc_term_freqs

    df = spark.createDataFrame(
        [(1, "a b a"), (2, None)], "doc_id bigint, text string"
    )
    got = {
        (r.doc_id, r.token, r.tf)
        for r in doc_term_freqs(df, "text", "doc_id").collect()
    }
    assert got == {(1, "a", 2), (1, "b", 1)}
