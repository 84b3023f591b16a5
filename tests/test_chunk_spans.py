"""Chunking, duplicated-span detection, quality-aware survivor
selection, and weighted sampling — the round-4 training-pipeline
additions (operators/chunk.py, operators/spans.py, dedup_keep_best,
weighted_hash_sample)."""

import pytest
from pyspark.sql import functions as F

from a2b_spark.operators import dedup as D
from a2b_spark.operators.chunk import chunk_documents
from a2b_spark.operators.rangejoin import weighted_hash_sample
from a2b_spark.operators.spans import duplicate_ngram_spans


# ------------------------------------------------------------- chunking
def test_chunk_boundaries(spark):
    df = spark.createDataFrame(
        [
            (1, "a" * 10),  # shorter than size -> exactly one chunk
            (2, ""),  # empty -> no chunks
            (3, None),  # null -> no chunks
            (4, "x" * 25),  # 2 full-ish chunks at size=20, stride=15
            (5, "y" * 16),  # trailing start would be pure suffix -> dropped
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "text", "doc_id", size=20, overlap=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc and 3 not in by_doc
    assert [c.chunk_text for c in by_doc[1]] == ["a" * 10]
    # doc 4: starts 0 and 15; chunk at 15 has chars 16..25 (new content)
    c4 = sorted(by_doc[4], key=lambda r: r.chunk_start)
    assert [(c.chunk_start, c.chunk_chars) for c in c4] == [(0, 20), (15, 10)]
    assert c4[0].chunk_id == 0 and c4[1].chunk_id == 1
    # doc 5 (16 chars): start 15 would add only chars 16..16 which lie
    # inside start-0's window [0, 20) -> suffix-only chunk dropped
    assert [(c.chunk_start, c.chunk_chars) for c in by_doc[5]] == [(0, 16)]


def test_chunk_reassembly_covers_text(spark, sf_dir):
    """Every character of every doc is covered and adjacent chunks
    agree on their overlap."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    out = chunk_documents(docs, "text", "doc_id", size=100, overlap=20)
    joined = out.join(docs, "doc_id")
    # each chunk is the exact substring at its offset
    mismatch = joined.filter(
        F.col("chunk_text")
        != F.col("text").substr(F.col("chunk_start").cast("int") + 1, F.lit(100))
    )
    assert mismatch.count() == 0
    # coverage: max(chunk_start + chunk_chars) == len(text)
    cov = (
        out.groupBy("doc_id")
        .agg(F.max(F.col("chunk_start") + F.col("chunk_chars")).alias("covered"))
        .join(docs.select("doc_id", F.length("text").alias("ln")), "doc_id")
        .filter(F.col("covered") != F.col("ln"))
    )
    assert cov.count() == 0


def test_chunk_param_validation(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "text", "doc_id", size=10, overlap=10)


# ------------------------------------------------------- duplicated spans
def test_duplicate_spans_maximal_merge(spark):
    shared = "one two three four five six"  # 6 words, n=3 -> 4 shared grams
    df = spark.createDataFrame(
        [
            (1, f"aa bb {shared} cc dd"),
            (2, f"zz {shared} yy xx ww vv"),
            (3, "totally different words here entirely now"),
        ],
        "doc_id long, text string",
    )
    out = duplicate_ngram_spans(df, "text", "doc_id", n=3, min_docs=2).collect()
    spans = {r.doc_id: (r.span_start, r.span_end, r.span_words) for r in out}
    # doc 1: shared occupies words 3..8 (1-based); doc 2: words 2..7
    assert spans[1] == (3, 8, 6)
    assert spans[2] == (2, 7, 6)
    assert 3 not in spans


def test_duplicate_spans_within_doc_not_flagged(spark):
    """min_docs counts DISTINCT documents: a doc repeating its own
    phrase is repetition (q58's domain), not cross-doc duplication."""
    df = spark.createDataFrame(
        [
            (1, "p q r s p q r s"),
            (2, "unrelated text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    assert duplicate_ngram_spans(df, "text", "doc_id", n=4, min_docs=2).count() == 0


def test_duplicate_spans_short_docs_skipped(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    # both docs are shorter than n -> no grams, no spans
    assert duplicate_ngram_spans(df, "text", "doc_id", n=3).count() == 0


# --------------------------------------------------------- keep-best dedup
def test_dedup_keep_best_prefers_score(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    df = spark.createDataFrame(
        [
            (10, base + "tail one", 60),
            (11, base + "tail one more", 95),  # same cluster, higher score
            (12, "completely different content with nothing shared", 5),
        ],
        "doc_id long, text string, score long",
    )
    out = D.dedup_keep_best(df, "text", "doc_id", "score", threshold=0.7)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {11, 12}
    assert rows[11].cluster == 10  # cluster id stays the component min
    assert rows[12].cluster == 12  # singleton is its own cluster
    assert set(out.columns) == {"doc_id", "text", "score", "cluster"}


def test_dedup_keep_best_tie_breaks_min_id(spark):
    txt = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    df = spark.createDataFrame(
        [(2, txt, 7), (1, txt, 7)], "doc_id long, text string, score long"
    )
    out = D.dedup_keep_best(df, "text", "doc_id", "score", threshold=0.9).collect()
    assert [r.doc_id for r in out] == [1]


# --------------------------------------------------------- weighted sample
def test_weighted_sample_extremes_and_monotone(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    assert weighted_hash_sample(docs, "doc_id", F.lit(1.0)).count() == n
    assert weighted_hash_sample(docs, "doc_id", F.lit(0.0)).count() == 0
    # null weights drop the row
    assert weighted_hash_sample(docs, "doc_id", F.lit(None).cast("double")).count() == 0
    lo = {
        r.doc_id
        for r in weighted_hash_sample(docs, "doc_id", F.lit(0.2)).select("doc_id").collect()
    }
    hi = {
        r.doc_id
        for r in weighted_hash_sample(docs, "doc_id", F.lit(0.6)).select("doc_id").collect()
    }
    assert lo <= hi  # monotone: raising the weight only adds rows
    # rate lands near the target probability
    assert abs(len(hi) / n - 0.6) < 0.1


def test_weighted_sample_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(i, 2.0 if i % 2 else -1.0) for i in range(100)], "id long, w double"
    )
    kept = weighted_hash_sample(df, "id", "w").collect()
    assert {r.id % 2 for r in kept} == {1}  # w=2 clamps to 1 (all), w=-1 to 0 (none)
    assert len(kept) == 50


def test_remove_duplicate_spans_keeps_one_copy(spark):
    from a2b_spark.operators.spans import remove_duplicate_spans

    shared = "one two three four"  # n=4 -> exactly one shared gram
    df = spark.createDataFrame(
        [
            (1, f"{shared} aa bb"),   # keeper (min doc_id)
            (2, f"xx {shared} yy"),   # loses the span
            (3, "totally different words here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(df, "text", "doc_id", n=4).collect()}
    assert out[1].clean_text == f"{shared} aa bb" and out[1].n_removed_words == 0
    assert out[2].clean_text == "xx yy" and out[2].n_removed_words == 4
    assert out[3].clean_text == "totally different words here"
    assert out[2].n_words == 2


def test_remove_duplicate_spans_whole_doc_removed(spark):
    from a2b_spark.operators.spans import remove_duplicate_spans

    txt = "a b c d e"
    df = spark.createDataFrame(
        [(1, txt), (2, txt)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(df, "text", "doc_id", n=5).collect()}
    assert out[1].clean_text == txt
    assert out[2].clean_text == "" and out[2].n_words == 0 and out[2].n_removed_words == 5


def test_remove_spans_null_text_matches_oracle_shape(spark):
    """NULL-text docs must come back as ('', 0, NULL) — matching
    O_Q70's COALESCE shape — not config-dependent size(-1/NULL)
    arithmetic (round-5 review finding)."""
    from a2b_spark.operators.spans import remove_duplicate_spans

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d e f g h a b c d e f g h"),
         (4, "x a b c d e f g h y")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.clean_text, r.n_words, r.n_removed_words)
           for r in remove_duplicate_spans(df, "text", "doc_id", n=8).collect()}
    assert out[1] == ("", 0, None)
    assert out[2] == ("", 1, 0)  # split('') -> [''], one empty token
    assert len(out) == 4
