"""Round-11 tranche.

- q168: APPROXIMATE edit-distance join beyond the PassJoin window
  (operators/editjoin.py:edit_distance_pairs_approx) — q-gram
  minhash-LSH blocking with thresholded verify, on a fuzzy-id corpus
  where blocking is genuinely selective. Output is deterministic
  (seed-fixed hashing), so the brute-force all-pairs oracle certifies
  EXACT equality at the driver SF: the blocking loses no qualifying
  pair and the verify admits no extra.

  Data note (why not the q153 catalog keys): part names draw five
  words from a ~90-word vocabulary, so EVERY key pair shares most
  q-grams and any gram-similarity blocking degenerates to the full
  cross product — gram overlap simply does not separate permuted
  word soup by edit distance. That is a property of the data, not
  the operator; the honest demonstration corpus is id-like keys
  (hex digests) with rule-derived typo variants, where gram overlap
  and edit distance correlate and candidates stay O(n).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.queries.relational import _t

QUERIES: dict = {}
ORACLES: dict = {}


def q168_fuzzy_key_pairs_approx_k4(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fuzzy id matching at distance ≤ 4 — past the exact PassJoin
    window (k ≤ 3), where segment candidate windows grow
    quadratically. Corpus: each document contributes its md5-hex id
    key plus a typo variant with a CONTIGUOUS run of 1+(doc_id mod 6)
    positions overwritten by 'z' — so true distances are exactly
    1..6 and only the ≤4 variants qualify, while unrelated 32-char
    hex keys sit at distance ~25 (no accidental pairs at any SF).

    Plan shape: char-4-gram xxhash sets (65k-gram universe keeps
    random-pair overlap ~0.02%), 64-slot minhash, 32 bands × 2 rows —
    a random pair collides in a band with p≈j², so candidates are
    O(n), while a contiguous-typo pair keeps gram jaccard ≥ 0.6 and
    misses all 32 bands with p < 1e-8. Verify = thresholded codegen
    levenshtein. One gram pass, one signature shuffle, one band
    shuffle, one melt-join fetch — nothing quadratic anywhere."""
    from a2b_spark.operators.editjoin import edit_distance_pairs_approx

    keys = _fuzzy_key_corpus(spark, sf_dir)
    return edit_distance_pairs_approx(
        keys, "key", "kid", max_dist=4, qgram=4, num_hashes=64, bands=32
    )


O_Q168 = """
WITH k AS (
  SELECT doc_id * 2 AS kid, md5(CAST(doc_id AS VARCHAR)) AS key
  FROM documents
  UNION ALL
  SELECT doc_id * 2 + 1 AS kid,
         substring(md5(CAST(doc_id AS VARCHAR)), 1,
                   CAST(doc_id % (33 - (doc_id % 6 + 1)) AS INTEGER))
         || repeat('z', CAST(doc_id % 6 + 1 AS INTEGER))
         || substring(md5(CAST(doc_id AS VARCHAR)),
                      CAST(doc_id % (33 - (doc_id % 6 + 1)) AS INTEGER)
                      + CAST(doc_id % 6 + 1 AS INTEGER) + 1, 32) AS key
  FROM documents)
SELECT a.kid AS id_a, b.kid AS id_b,
       CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
FROM k a JOIN k b ON a.kid < b.kid
WHERE levenshtein(a.key, b.key) <= 4
"""

Q169_CAP = 2000

QUERIES["q168_fuzzy_key_pairs_approx_k4"] = q168_fuzzy_key_pairs_approx_k4
ORACLES["q168_fuzzy_key_pairs_approx_k4"] = O_Q168


def _fuzzy_key_corpus(
    spark: SparkSession, sf_dir: str, cap: int | None = None
) -> DataFrame:
    """The q168 corpus (md5 id keys + contiguous-typo variants) as a
    shared builder so the approx query and its exact twin certify the
    SAME input (the check_recall.py pairing contract). ``cap`` bounds
    the corpus to doc_id < cap — the exact twin's fixed-cost window."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    if cap is not None:
        d = d.filter(F.col("doc_id") < cap)
    L = (F.col("doc_id") % 6 + 1).cast("int")
    p = (F.col("doc_id") % (F.lit(33) - L)).cast("int")
    h = F.md5(F.col("doc_id").cast("string"))
    variant = F.concat(
        F.substring(h, F.lit(1), p),
        F.repeat(F.lit("z"), L),
        F.substring(h, p + L + 1, F.lit(32)),
    )
    return d.select(
        (F.col("doc_id") * 2).alias("kid"), h.alias("key")
    ).unionByName(
        d.select((F.col("doc_id") * 2 + 1).alias("kid"), variant.alias("key"))
    )


def q169_fuzzy_key_pairs_exact_k4(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT brute-force twin of q168 — the documented-quadratic
    oracle companion (the q29-to-q36 pattern): all ordered key pairs
    through the thresholded codegen levenshtein, no blocking. Exists
    so tools/check_recall.py can certify, distributed and at ANY
    scale factor, that q168's minhash blocking loses no pair; q168 is
    the linear scale path, this is its certification harness. The
    corpus is CAPPED at doc_id < 2000 (the fixed-cost certification
    window of q159/q163): the quadratic companion must stay constant-
    sized at every SF — check_recall compares q168's capped slice
    against it, which certifies pair-level recall (a pair's blocking
    fate depends only on its own two signatures, not corpus size).

    Join shape: a BLOCKED cross as a plain equi hash join, never a
    BroadcastNestedLoopJoin — each side hashes into B blocks and
    explodes B block-pair tags, so a left row in block i and a right
    row in block j meet exactly once under the (i, j) equi key; the
    B² buckets parallelize and the thresholded levenshtein fuses into
    the join's output stage (no n²-row shuffle)."""
    B = 8
    keys = _fuzzy_key_corpus(spark, sf_dir, cap=Q169_CAP)
    blk = F.pmod(F.xxhash64("kid"), F.lit(B)).cast("int")
    tags = F.explode(F.array(*[F.lit(t) for t in range(B)]))
    a = keys.select(
        F.col("kid").alias("id_a"), F.col("key").alias("__ka"),
        blk.alias("__bi"), tags.alias("__bj"),
    )
    b = keys.select(
        F.col("kid").alias("id_b"), F.col("key").alias("__kb"),
        tags.alias("__bi"), blk.alias("__bj"),
    )
    dist = F.expr("levenshtein(__ka, __kb, 4)").cast("int")
    # pin the join to B² explicit hash partitions: the shuffled INPUT
    # is ~1-2 MB, so AQE's byte-based coalescing would squash it to
    # 1-2 partitions — but the join OUTPUT explodes to |keys|²/B²
    # levenshtein calls per bucket, and that compute fuses into the
    # join stage. AQE cannot see the explosion; a user-specified
    # repartition is never coalesced, so all B² buckets verify in
    # parallel (measured 3.8s/2 tasks -> sub-second/64 tasks). The
    # corpus is capped (fixed-cost window), so B² is a constant.
    n_part = B * B
    return (
        a.repartition(n_part, "__bi", "__bj")
        .join(b.repartition(n_part, "__bi", "__bj"), ["__bi", "__bj"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", dist)
        .filter((F.col("dist") >= 0) & (F.col("dist") <= 4))
        .select("id_a", "id_b", "dist")
    )


O_Q169 = O_Q168.replace(
    "FROM documents", "FROM documents WHERE doc_id < 2000"
)

QUERIES["q169_fuzzy_key_pairs_exact_k4"] = q169_fuzzy_key_pairs_exact_k4
ORACLES["q169_fuzzy_key_pairs_exact_k4"] = O_Q169


# --------------------------------------------------------------- Q170
_Q170_SHARDS = 8
_Q170_SALT = "q170-v1"
_Q170_MIN_TOKENS = 30


def q170_curation_cli_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation CLI end-to-end as an oracle query: run_curation's
    SQL-expressible stage subset (nfc → quality → dedup → shard)
    executes FOR REAL — partitioned parquet written to scratch and
    read back — and the per-shard certification rollup (q164 shape:
    counts, an exact char sum over the carried-through text, and the
    shard heads by position) must match DuckDB replaying the same
    four stages from their definitions: nfc_normalize, the
    single-space token floor, min-doc_id survivor per normalized-text
    md5 fingerprint, and the salted top-60-bit md5 shard/pos. One
    divergence anywhere in the pipeline — a dropped doc, a wrong
    survivor, a swapped shard position — diverges the driver hash."""
    import shutil

    from a2b_spark.curate import run_curation
    from a2b_spark.queries.round7 import _scratch_path

    out = _scratch_path(sf_dir, "q170")
    try:
        run_curation(
            spark,
            os.path.join(sf_dir, "documents.parquet"),
            out,
            ("nfc", "quality", "dedup", "shard"),
            min_tokens=_Q170_MIN_TOKENS,
            n_shards=_Q170_SHARDS,
            salt=_Q170_SALT,
        )
        curated = spark.read.parquet(out)
        return (
            curated.groupBy("shard")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.length("text")).cast("long").alias("sum_chars"),
                F.max(F.when(F.col("pos") == 1, F.col("doc_id"))).alias("head1"),
                F.max(F.when(F.col("pos") == 2, F.col("doc_id"))).alias("head2"),
            )
            .orderBy("shard")
            .localCheckpoint(eager=True)  # pin before the scratch sweep
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


O_Q170 = f"""
WITH nfc AS (
  SELECT doc_id, nfc_normalize(text) AS text FROM documents
),
q AS (
  SELECT * FROM nfc
  WHERE len(string_split(text, ' ')) >= {_Q170_MIN_TOKENS}
),
d AS (
  SELECT MIN(doc_id) AS doc_id,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM q GROUP BY 2
),
s AS (
  SELECT q.doc_id, q.text,
         CAST(h.h60 % {_Q170_SHARDS} AS INT) AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY h.h60 % {_Q170_SHARDS}
           ORDER BY h.h60, CAST(q.doc_id AS VARCHAR)
         ) AS pos
  FROM d JOIN q USING (doc_id)
  JOIN (
    SELECT doc_id,
           CAST(('0x' || substring(md5('{_Q170_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
    FROM documents
  ) h USING (doc_id)
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(len(text)) AS BIGINT) AS sum_chars,
       MAX(CASE WHEN pos = 1 THEN doc_id END) AS head1,
       MAX(CASE WHEN pos = 2 THEN doc_id END) AS head2
FROM s
GROUP BY shard
ORDER BY shard
"""

QUERIES["q170_curation_cli_subset"] = q170_curation_cli_subset
ORACLES["q170_curation_cli_subset"] = O_Q170
