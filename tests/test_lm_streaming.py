"""Streaming twin of stupid-backoff LM scoring.

Scoring is STATELESS given a trained model — the cascade of per-order
model joins works unchanged under Structured Streaming as
stream-static joins, so a live firehose can be perplexity-filtered
against a frozen reference LM with no custom stateful operator. The
contract pinned here: micro-batched streaming scores ≡ the batch
scores, regardless of how documents split across batches."""

import os

import pytest

from a2b_spark.operators.lm import ngram_lm_train, stupid_backoff_logp

TRAIN = [
    (100, "a b a b c"),
    (101, "a b c a b"),
    (102, "c c a b"),
]
STREAM_B1 = [(1, "a b c"), (2, "c a b")]
STREAM_B2 = [(3, "b a q"), (4, "a b a b")]


@pytest.fixture(scope="module")
def model(spark):
    df = spark.createDataFrame(TRAIN, "doc_id int, text string")
    return ngram_lm_train(df, "text", order=3)


def test_stream_scores_equal_batch(spark, model, tmp_path):
    src = str(tmp_path / "docs_in")
    os.makedirs(src)
    spark.createDataFrame(STREAM_B1, "doc_id int, text string").coalesce(
        1
    ).write.parquet(f"{src}/b1")
    spark.createDataFrame(STREAM_B2, "doc_id int, text string").coalesce(
        1
    ).write.parquet(f"{src}/b2")

    sdf = (
        spark.readStream.schema("doc_id int, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    scored = stupid_backoff_logp(
        sdf, model, "doc_id", "text", order=3, broadcast_model=True
    )
    q = (
        scored.writeStream.format("memory")
        .queryName("lm_scores")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.doc_id: (r.n_tok, r.n_oov, r.hits_full, r.sum_logp10, r.avg_logp10)
        for r in spark.sql("SELECT * FROM lm_scores").collect()
    }

    batch_df = spark.createDataFrame(
        STREAM_B1 + STREAM_B2, "doc_id int, text string"
    )
    want = {
        r.doc_id: (r.n_tok, r.n_oov, r.hits_full, r.sum_logp10, r.avg_logp10)
        for r in stupid_backoff_logp(
            batch_df, model, "doc_id", "text", order=3, broadcast_model=True
        ).collect()
    }
    assert got == want
    assert got[3][1] == 1  # 'q' is OOV vs the frozen reference model
