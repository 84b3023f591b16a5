"""Runnable example: the full TEXT curation pass a pretraining corpus
goes through, end-to-end on the driver testdata.

    python examples/text_curation_pipeline.py [sf_dir]

The canonical pipeline order (CCNet / Gopher / LLaMA-style), every
stage an operator this engine oracle-checks in isolation:

1.  NFC canonicalization (functions/unicode.py) — composed/decomposed
    forms must agree before ANY hashing.
2.  Quality gates: heuristic features + Gopher-style rules
    (functions/text.py).
3.  Perplexity filter: train a stupid-backoff trigram LM on the
    corpus, drop documents whose per-token log10 prob is far below
    the corpus mean (operators/lm.py) — the CCNet move.
4.  Classifier filter: a frozen bag-of-words linear model keeps
    docs scoring above threshold (operators/classifier.py) — the
    fastText/WebText move.
5.  Exact + near dedup: fingerprint dedup, then MinHash-LSH pair
    detection and survivor election (operators/dedup.py).
6.  Deterministic shuffle-shard export (operators/shards.py):
    reproducible training shards, no global sort.

At 100 TB each stage is scans + hash shuffles (LSH bands for the only
pair search); the single driver pulls are the LM gradient row and the
trained-model broadcast. Run-to-run, cluster-size-to-cluster-size, the
surviving doc set and the shard order are IDENTICAL — everything
derives from salted md5 and exact-decimal arithmetic, never rand().
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from a2b_spark import get_spark  # noqa: E402
from a2b_spark.functions.text import quality_features, fingerprint  # noqa: E402
from a2b_spark.functions.unicode import nfc  # noqa: E402
from a2b_spark.operators.classifier import bow_linear_score  # noqa: E402
from a2b_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_near_dup_pairs,
)
from a2b_spark.operators.lm import (  # noqa: E402
    ngram_lm_train,
    stupid_backoff_logp,
)
from a2b_spark.operators.shards import shuffle_shards  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("text_curation_pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. canonicalize BEFORE any hashing
    docs = docs.withColumn("text", nfc("text"))

    # 2. heuristic quality gates (token count + stopword ratio)
    qf = quality_features(F.col("text"))
    docs = docs.withColumn("n_tok", qf["n_words"]).filter(
        F.col("n_tok") >= 5
    )
    n_quality = docs.count()

    # 3. perplexity filter: corpus-trained trigram LM, drop the tail
    model = ngram_lm_train(docs, "text", order=3)
    scored = stupid_backoff_logp(
        docs.select("doc_id", "text"),
        model,
        "doc_id",
        "text",
        order=3,
        broadcast_model=True,
    )
    mean_lp = scored.agg(F.avg("avg_logp10")).first()[0]
    # NULL-scored (zero-token) docs were never judged by this
    # criterion — the isNull escape keeps the operator's never-drop
    # contract (matches run_curation's perplexity stage)
    keep_ids = scored.filter(
        (F.col("avg_logp10") >= F.lit(mean_lp) - 0.6)
        | F.col("avg_logp10").isNull()
    ).select("doc_id")
    docs = docs.join(keep_ids, "doc_id", "left_semi")
    n_ppl = docs.count()

    # 4. frozen classifier filter (z > -2 keeps most; demo threshold)
    clf = bow_linear_score(
        docs.select("doc_id", "text"),
        "text",
        ["table", "stream", "merge", "window"],
        ["0.75", "-0.5", "0.25", "-0.125"],
        "-0.5",
    )
    docs = docs.join(
        clf.filter(F.col("z") > -2).select("doc_id"), "doc_id", "left_semi"
    )
    n_clf = docs.count()

    # 5a. exact dedup by normalized fingerprint (keep min doc_id)
    docs = docs.withColumn("fp", fingerprint(F.col("text")))
    docs = exact_dedup(docs, ["fp"], order_by=["doc_id"])
    n_exact = docs.count()

    # 5b. near-dup pairs via MinHash-LSH; drop the higher id of a pair
    pairs = minhash_near_dup_pairs(
        docs, "text", "doc_id", num_hashes=32, bands=8, threshold=0.8
    )
    dup_ids = pairs.select(
        F.greatest("id_a", "id_b").alias("doc_id")
    ).distinct()
    docs = docs.join(dup_ids, "doc_id", "left_anti")
    n_near = docs.count()

    # 6. deterministic shuffle-shard export
    shards = shuffle_shards(
        docs.select("doc_id", "text", "lang", "source"),
        "doc_id",
        n_shards=8,
        salt="export-v1",
    )
    out = "/tmp/curated_shards"
    shards.write.mode("overwrite").partitionBy("shard").parquet(out)
    per_shard = (
        spark.read.parquet(out)
        .groupBy("shard")
        .count()
        .orderBy("shard")
        .collect()
    )

    print(f"ingest            : {n0}")
    print(f"quality gate      : {n_quality}")
    print(f"perplexity filter : {n_ppl}")
    print(f"classifier filter : {n_clf}")
    print(f"exact dedup       : {n_exact}")
    print(f"near dedup        : {n_near}")
    print("shards            :", {r['shard']: r['count'] for r in per_shard})
    assert n0 >= n_quality >= n_ppl >= n_clf >= n_exact >= n_near > 0
    print("PIPELINE OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
