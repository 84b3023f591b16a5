"""LLM-data-pipeline operator coverage (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal plumbing —
each over the driver-provided ``documents``/``embeddings`` tables,
oracle-checked against DuckDB where SQL-expressible.

Approximate operators (minhash LSH, simhash, SRP-LSH) are paired with
*exact* oracles where their recall is provably ~1 at the configured
threshold, and left rows-only where genuinely non-SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.functions import text as TXT
from a2b_spark.operators import dedup as D
from a2b_spark.operators import similarity as S
from a2b_spark.queries.relational import _t, dsum


# --------------------------------------------------------------- Q20
def q20_dedup_exact_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact keyed dedup with deterministic survivor: first event per
    (user_id, event_type) by (ts, event_id)."""
    from a2b_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    return D.exact_dedup(e, ["user_id", "event_type"], ["ts_us", "event_id"]).select(
        "user_id", "event_type", "event_id", "value"
    )


O_Q20 = """
SELECT user_id, event_type, event_id, value FROM (
  SELECT user_id, event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn = 1
"""


# --------------------------------------------------------------- Q21
def q21_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup: md5 fingerprint of normalized text; keeps
    the smallest doc_id per fingerprint and counts the group."""
    d = _t(spark, sf_dir, "documents")
    fp = d.withColumn("fp", TXT.fingerprint(F.col("text")))
    return fp.groupBy("fp").agg(
        F.min("doc_id").cast("long").alias("keep_doc"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


O_Q21 = """
SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1
"""


# --------------------------------------------------------------- Q22
def q22_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: per-document char/word counts, punctuation and
    stopword ratios, mean word length."""
    d = _t(spark, sf_dir, "documents")
    feats = TXT.quality_features(F.col("text"))
    return d.select("doc_id", *[c.alias(n) for n, c in feats.items()])


_SW = "','".join(TXT.STOPWORDS)
O_Q22 = f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(ws) AS BIGINT) AS n_words,
  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
  CASE WHEN length(text) > 0
       THEN CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / length(text)
       WHEN length(text) = 0 THEN 0.0 END AS punct_ratio,
  CAST(len([w for w in ws if list_contains(['{_SW}'], w)]) AS DOUBLE) / len(ws) AS stopword_ratio,
  CAST(length(text) - (len(ws) - 1) AS DOUBLE) / len(ws) AS avg_word_len
FROM t
"""


# --------------------------------------------------------------- Q23
def q23_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per (lang, source): total tokens,
    distinct tokens (exploded — the distributed wordcount shape)."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("lang", "source", F.explode(TXT.word_tokens("text")).alias("tok"))
    return tok.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("tok").cast("long").alias("n_distinct"),
    )


O_Q23 = """
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct
FROM (SELECT lang, source, unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY lang, source
"""


# --------------------------------------------------------------- Q24
def q24_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (marker-word argmax + CJK detection),
    compared against the labeled lang column."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        TXT.lang_id(F.col("text")).alias("pred_lang"),
    )


def _lang_case() -> str:
    score = {
        lang: f"len([w for w in ws if list_contains([{', '.join(repr(m) for m in markers)}], w)])"
        for lang, markers in TXT.LANG_MARKERS.items()
    }
    # argmax with fixed en>es>fr>de priority (strict > comparisons in order)
    return f"""
      CASE WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
           WHEN {score['es']} > {score['en']}
                AND {score['es']} >= {score['fr']} AND {score['es']} >= {score['de']} THEN 'es'
           WHEN {score['fr']} > {score['en']} AND {score['fr']} > {score['es']}
                AND {score['fr']} >= {score['de']} THEN 'fr'
           WHEN {score['de']} > {score['en']} AND {score['de']} > {score['es']}
                AND {score['de']} > {score['fr']} THEN 'de'
           ELSE 'en' END
    """


O_Q24 = f"""
WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id, lang, {_lang_case()} AS pred_lang FROM t
"""


# --------------------------------------------------------------- Q25
def q25_near_dup_exact_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram jaccard near-dup pairs (threshold 0.8) — the
    ground-truth verifier for the LSH path."""
    d = _t(spark, sf_dir, "documents")
    return D.exact_jaccard_pairs(d, "text", "doc_id", threshold=0.8)


O_JACCARD = """
WITH t AS (
  SELECT doc_id,
         list_distinct([ws[i+1]||' '||ws[i+2]||' '||ws[i+3]
                        for i in range(0, greatest(len(ws)-2, 0))]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
"""


# --------------------------------------------------------------- Q26
def q26_near_dup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64)+LSH(16×4) near-dup pairs with exact-jaccard verify —
    the 100 TB dedup path. Oracle is the exact all-pairs join: recall
    at the planted ≥0.95 similarities is 1-1e-11, so outputs match."""
    d = _t(spark, sf_dir, "documents")
    return D.minhash_near_dup_pairs(d, "text", "doc_id", threshold=0.8)


# --------------------------------------------------------------- Q27
def q27_near_dup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded near-dup pairs (Hamming ≤ 3) in md5 token-hash
    mode: the 60-bit signature derives from md5's top 60 bits, so the
    DuckDB oracle recomputes the identical signature and the full
    operator output is hash-checked (banding recall is exact at ≤3 by
    pigeonhole, so band-candidates + verify == all-pairs Hamming)."""
    d = _t(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(d, "text", "doc_id", max_hamming=3, token_hash="md5")


O_Q27 = """
WITH t AS (
  SELECT doc_id,
         [CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) for w in string_split(text, ' ')] AS hs
  FROM documents),
sig AS (
  SELECT doc_id,
         CAST(list_sum([
           CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END for h in hs]) >= 0
                THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END
           for b in range(60)]) AS BIGINT) AS sig
  FROM t)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


# --------------------------------------------------------------- Q28
def q28_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for the first 10 vectors."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return S.knn_bruteforce(q, e, "embedding", "vec_id", k=5)


O_Q28 = """
WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vec FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         round(list_inner_product(q.vec, c.vec)
               / (sqrt(list_inner_product(q.vec, q.vec)) * sqrt(list_inner_product(c.vec, c.vec))), 6) AS cos
  FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id != c.vec_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC) AS rk
  FROM scored)
SELECT query_id, corpus_id, cos, CAST(rk AS INTEGER) AS rk FROM ranked WHERE rk <= 5
"""


# --------------------------------------------------------------- Q29
def q29_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: exact all-pairs cosine ≥ 0.45."""
    e = _t(spark, sf_dir, "embeddings")
    return D.embedding_dup_pairs_exact(e, "embedding", "vec_id", threshold=0.45)


O_Q29 = """
WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vec FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_inner_product(a.vec, b.vec)
             / (sqrt(list_inner_product(a.vec, a.vec)) * sqrt(list_inner_product(b.vec, b.vec))), 6) AS cos
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_inner_product(a.vec, b.vec)
            / (sqrt(list_inner_product(a.vec, a.vec)) * sqrt(list_inner_product(b.vec, b.vec))), 6) >= 0.45
"""


# --------------------------------------------------------------- Q30
def q30_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate KNN with exact re-rank — the scale path for
    similarity search (bucket shuffle carries only (id, table, bucket);
    vectors join back by id). Tuned to 2 bits × 32 tables: per-table
    collision p = (1-θ/π)², so even an orthogonal true neighbor is
    missed with (1-0.25)³² ≈ 1e-4 — recall is 1 on the test corpus and
    the oracle is the *exact* KNN SQL (same contract as q26: LSH output
    == exact at these parameters)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return S.knn_lsh(q, e, "embedding", "vec_id", k=5, n_bits=2, n_tables=32)


# --------------------------------------------------------------- Q31
def q31_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: treat text as an opaque binary payload with
    typed metadata (byte length, md5, magic prefix) — the schema and
    batch shape real image/audio columns use. Decode itself is stubbed
    (see a2b_spark.operators.multimodal)."""
    d = _t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.md5(F.col("text")).alias("digest"),
        F.substring(F.col("text"), 1, 8).alias("magic"),
        F.length(payload).cast("long").alias("payload_len"),
    )


O_Q31 = """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest, substring(text, 1, 8) AS magic,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len
FROM documents
"""


QUERIES = {
    "q20_dedup_exact_keys": q20_dedup_exact_keys,
    "q21_dedup_fingerprint": q21_dedup_fingerprint,
    "q22_text_quality": q22_text_quality,
    "q23_token_stats": q23_token_stats,
    "q24_lang_id": q24_lang_id,
    "q25_near_dup_exact_jaccard": q25_near_dup_exact_jaccard,
    "q26_near_dup_minhash_lsh": q26_near_dup_minhash_lsh,
    "q27_near_dup_simhash": q27_near_dup_simhash,
    "q28_knn_bruteforce": q28_knn_bruteforce,
    "q29_embedding_dups": q29_embedding_dups,
    "q30_knn_lsh": q30_knn_lsh,
    "q31_multimodal_meta": q31_multimodal_meta,
}

ORACLES = {
    "q20_dedup_exact_keys": O_Q20,
    "q21_dedup_fingerprint": O_Q21,
    "q22_text_quality": O_Q22,
    "q23_token_stats": O_Q23,
    "q24_lang_id": O_Q24,
    "q25_near_dup_exact_jaccard": O_JACCARD,
    "q26_near_dup_minhash_lsh": O_JACCARD,  # LSH output == exact pairs at this threshold
    "q27_near_dup_simhash": O_Q27,  # md5 token-hash mode: signature is SQL-expressible
    "q28_knn_bruteforce": O_Q28,
    "q29_embedding_dups": O_Q29,
    "q30_knn_lsh": O_Q28,  # recall == 1 at (2 bits × 32 tables) → output == exact KNN
    "q31_multimodal_meta": O_Q31,
}


# --------------------------------------------------------------- Q32
def q32_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window aggregation (streaming-identical
    expression; see a2b_spark.streaming.windows.tumbling_agg): hourly
    event count + exact value sum per event_type."""
    from a2b_spark.queries.relational import _events
    from a2b_spark.streaming.windows import tumbling_agg

    e = _events(spark, sf_dir).withColumn("ts2", F.timestamp_micros(F.col("ts_us")))
    out = tumbling_agg(
        e,
        "ts2",
        "1 hour",
        ["event_type"],
        {"n": F.count(F.lit(1)).cast("long"), "sum_v": dsum("value", "sum_v")},
    )
    return out.select(
        F.unix_micros("window_start").alias("ws_us"), "event_type", "n", "sum_v"
    )


O_Q32 = """
SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS ws_us, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------- Q33
def q33_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window: 2h windows hopping 1h — each event
    lands in exactly two windows."""
    from a2b_spark.queries.relational import _events
    from a2b_spark.streaming.windows import sliding_agg

    e = _events(spark, sf_dir).withColumn("ts2", F.timestamp_micros(F.col("ts_us")))
    out = sliding_agg(
        e, "ts2", "2 hours", "1 hour", ["event_type"], {"n": F.count(F.lit(1)).cast("long")}
    )
    return out.select(F.unix_micros("window_start").alias("ws_us"), "event_type", "n")


O_Q33 = """
WITH b AS (
  SELECT event_type,
         unnest([epoch_us(time_bucket(INTERVAL '1 hour', ts)),
                 epoch_us(time_bucket(INTERVAL '1 hour', ts)) - 3600000000]) AS ws_us
  FROM events)
SELECT ws_us, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 1, 2
"""


# --------------------------------------------------------------- Q57
def q57_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows via the native ``F.session_window``
    operator (a2b_spark.streaming.windows.session_agg — the same
    expression drives streaming with a watermark): sessions close after
    30 min of per-user silence; one row per (user, session) with event
    count and exact value sum. Oracle = gaps-and-islands SQL; Spark's
    session end is last-event-time + gap. Scale: one shuffle on
    user_id, session merging inside the aggregation — no window
    function over a global sort."""
    from a2b_spark.queries.relational import _events
    from a2b_spark.streaming.windows import session_agg

    e = _events(spark, sf_dir).withColumn("ts2", F.timestamp_micros(F.col("ts_us")))
    out = session_agg(
        e,
        "ts2",
        "30 minutes",
        ["user_id"],
        {"n": F.count(F.lit(1)).cast("long"), "sum_v": dsum("value", "sum_v")},
    )
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n",
        "sum_v",
    )


O_Q57 = """
WITH o AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, us, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o)
SELECT user_id,
       MIN(us) AS session_start_us,
       MAX(us) + 1800000000 AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
FROM s GROUP BY user_id, sid
"""


# --------------------------------------------------------------- Q34
def q34_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing over real Spark machinery: documents'
    text bytes as the opaque payload, metadata JVM-side, deterministic
    fake decode via Arrow mapInPandas (a2b_spark.operators.multimodal).
    Oracle mirrors the hash-derived fake decode in SQL (sha256)."""
    from a2b_spark.operators import multimodal as MM

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    dec = MM.decode_media(d, "payload", "media_id")
    return dec.select("media_id", "width", "height", "channels")


O_Q34 = """
WITH h AS (
  SELECT doc_id AS media_id, sha256(text) AS hx FROM documents)
SELECT media_id,
  CAST(16 + CAST(('0x' || substring(hx, 1, 2)) AS INTEGER) % 240 AS INTEGER) AS width,
  CAST(16 + CAST(('0x' || substring(hx, 3, 2)) AS INTEGER) % 240 AS INTEGER) AS height,
  CAST(1 + CAST(('0x' || substring(hx, 5, 2)) AS INTEGER) % 3 AS INTEGER) AS channels
FROM h
"""


# --------------------------------------------------------------- Q35
def q35_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video payload -> frame rows). Fake
    splitter (payload slices); per-frame byte accounting is oracled."""
    from a2b_spark.operators import multimodal as MM

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    frames = MM.sample_frames(d, "payload", "media_id", every_n=64, max_frames=4)
    return frames.select(
        "media_id", "frame_no", F.octet_length("frame").cast("long").alias("frame_bytes")
    )


O_Q35 = """
WITH d AS (SELECT doc_id AS media_id, octet_length(encode(text)) AS nb FROM documents),
f AS (
  SELECT media_id, nb, unnest(range(least(greatest(nb // 64, 1), 4))) AS frame_no
  FROM d)
SELECT media_id, CAST(frame_no AS INTEGER) AS frame_no,
       CAST(least(64, nb - frame_no * 64) AS BIGINT) AS frame_bytes
FROM f
"""


# --------------------------------------------------------------- Q65
def q65_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (functions.vectors
    .quantize_int8) — the 4x storage/memory cut an ANN corpus takes at
    100 TB — exploded to (vec_id, idx, qval, scale) rows so the full
    quantized content and per-vector scale are value-hashed against
    the oracle. Round-trip error bound is pytest-verified. Uses the
    STAGED DataFrame form — the single-expression quantize_int8
    re-evaluates the scale per element (no CSE in HOF lambdas),
    measured 11x slower at sf0.1."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    from a2b_spark.functions.vectors import quantize_embeddings

    qz = quantize_embeddings(e, "embedding", "vec_id")
    # posexplode_OUTER: plain explode's size-filter rewrite inlines the
    # quantization expression per generated row (the README's explode
    # pathology) — measured 1.9s -> 0.2s at sf0.1; null embeddings are
    # filtered above so outer adds no rows
    return qz.select(
        "vec_id",
        "scale",
        F.posexplode_outer("q").alias("idx", "qval"),
    ).select(
        "vec_id",
        F.col("idx").cast("int").alias("idx"),
        F.col("qval").cast("int").alias("qval"),
        "scale",
    )


O_Q65 = """
WITH e AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
  FROM embeddings),
s AS (
  SELECT vec_id, embedding,
         CASE WHEN mx IS NOT NULL AND mx > 0 THEN mx / 127.0 ELSE 1.0 END AS scale
  FROM e)
SELECT vec_id, CAST(u.i AS INTEGER) AS idx,
       CAST(round(CAST(u.x AS DOUBLE) / scale) AS INTEGER) AS qval,
       scale
FROM (SELECT vec_id, scale,
             unnest([{'i': i, 'x': embedding[i+1]} for i in range(len(embedding))]) AS u
      FROM s)
"""


# --------------------------------------------------------------- Q63
def q63_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction output path of decode_media, oracle-checked:
    the per-media feature vector (hash-derived in fake mode, model
    embeddings behind the real seam) exploded to (media_id, feat_idx,
    value) rows so the array contents themselves are value-hashed."""
    from a2b_spark.operators import multimodal as MM

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    dec = MM.decode_media(d, "payload", "media_id")
    # features are float32 in storage (the realistic embedding dtype);
    # widen to double for the compare — the oracle models the same
    # double -> float32 -> double round-trip
    return dec.select(
        "media_id", F.posexplode("features").alias("feat_idx", "value")
    ).select(
        "media_id",
        F.col("feat_idx").cast("int").alias("feat_idx"),
        F.col("value").cast("double").alias("value"),
    )


O_Q63 = """
WITH h AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents),
f AS (SELECT media_id, hx, unnest(range(8)) AS feat_idx FROM h)
SELECT media_id, CAST(feat_idx AS INTEGER) AS feat_idx,
       CAST(CAST(round(CAST(('0x' || substring(hx, 7 + 2 * feat_idx, 2)) AS INTEGER) / 255.0, 6)
                 AS REAL) AS DOUBLE) AS value
FROM f
"""


# --------------------------------------------------------------- Q62
def q62_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (image payload → target-dims payload) via
    Arrow-batched mapInPandas: target 64×64, channels and scale
    factors derived from the fake decode's sha-based dims, output byte
    count = 64·64·channels. Scales are single int divisions — exact
    doubles, no rounding boundary (multimodal.resize_media)."""
    from a2b_spark.operators import multimodal as MM

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("payload")
    )
    rs = MM.resize_media(d, "payload", "media_id", target_w=64, target_h=64)
    return rs.select(
        "media_id",
        "width",
        "height",
        "channels",
        "scale_x",
        "scale_y",
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )


O_Q62 = """
WITH h AS (
  SELECT doc_id AS media_id, sha256(text) AS hx FROM documents),
d AS (
  SELECT media_id,
    16 + CAST(('0x' || substring(hx, 1, 2)) AS INTEGER) % 240 AS in_w,
    16 + CAST(('0x' || substring(hx, 3, 2)) AS INTEGER) % 240 AS in_h,
    1 + CAST(('0x' || substring(hx, 5, 2)) AS INTEGER) % 3 AS ch
  FROM h)
SELECT media_id,
  CAST(64 AS INTEGER) AS width,
  CAST(64 AS INTEGER) AS height,
  CAST(ch AS INTEGER) AS channels,
  64.0 / in_w AS scale_x,
  64.0 / in_h AS scale_y,
  CAST(64 * 64 * ch AS BIGINT) AS n_bytes
FROM d
"""


# --------------------------------------------------------------- Q42
def q42_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join: clicks inside the 5 minutes before each
    purchase by the same user (attribution window — ALL matches, vs
    q37's latest-only ASOF). The bare BETWEEN predicate would plan as
    a nested loop; binning turns it into one hash join on
    (user_id, bin) + residual filter."""
    from a2b_spark.operators.rangejoin import range_join
    from a2b_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.col("ts_us") - 300_000_000).alias("w_start"),
        F.col("ts_us").alias("w_end"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts_us"
    )
    j = range_join(
        clicks,
        purchases,
        point_col="ts_us",
        start_col="w_start",
        end_col="w_end",
        equi_keys=["user_id"],
        bin_width=300_000_000,
    )
    return j.groupBy("purchase_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks"),
        F.min("click_id").alias("first_click"),
    )


O_Q42 = """
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
p AS (SELECT event_id AS purchase_id, user_id, ts_us - 300000000 AS w_start, ts_us AS w_end
      FROM e WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id, ts_us FROM e WHERE event_type = 'click')
SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_clicks, MIN(click_id) AS first_click
FROM p JOIN c ON p.user_id = c.user_id AND c.ts_us BETWEEN p.w_start AND p.w_end
GROUP BY purchase_id
"""


# --------------------------------------------------------------- Q43
def q43_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% hash sample of documents — reproducible across
    engines/runs/partitionings (the property df.sample lacks), verified
    exactly by the oracle computing the same md5 bucket cut."""
    from a2b_spark.operators.rangejoin import hash_sample

    d = _t(spark, sf_dir, "documents")
    return hash_sample(d, "doc_id", percent=10, salt="s1").select(
        "doc_id", "lang", "source", "n_chars"
    )


O_Q43 = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE CAST(('0x' || substring(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10
"""


# --------------------------------------------------------------- Q51
_STRATA = {"en": 25, "es": 100, "fr": 100}  # downsample dominant en, drop others


def q51_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified rebalancing sample: downsample the
    dominant language, keep the tails in full, drop unlisted strata —
    the corpus-rebalancing move, with hash_sample's reproducibility
    (stable across engines/runs/cluster sizes, per-key consistent
    across rates)."""
    from a2b_spark.operators.rangejoin import stratified_hash_sample

    d = _t(spark, sf_dir, "documents")
    return stratified_hash_sample(d, "doc_id", "lang", _STRATA, salt="s2").select(
        "doc_id", "lang", "source", "n_chars"
    )


_STRATA_CASE = " ".join(
    f"WHEN lang = '{s}' THEN {p}" for s, p in sorted(_STRATA.items())
)
O_Q51 = f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE CAST(('0x' || substring(md5('s2' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
      < (CASE {_STRATA_CASE} ELSE 0 END)
"""


# --------------------------------------------------------------- Q52
def q52_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship end-to-end curation pipeline — what a training-data
    run actually ships: per-document quality features + language ID,
    near-dup clustering with keep-minimum survivor selection, then one
    filter composing all of it (lang == labeled 'en', quality bounds,
    dup-drop anti-join). Every stage is an operator this engine already
    oracle-checks in isolation; this query proves the composition."""
    d = _t(spark, sf_dir, "documents")
    feats = TXT.quality_features(F.col("text"))
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        TXT.lang_id(F.col("text")).alias("pred_lang"),
        feats["n_words"].alias("n_words"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
    )
    return (
        scored.join(D.dedup_drop_ids(d, "text", "doc_id", threshold=0.8), "doc_id", "left_anti")
        .filter(
            (F.col("pred_lang") == "en")
            & (F.col("n_words") >= 20)
            & (F.col("stopword_ratio") >= 0.05)
        )
        .select("doc_id", "lang", "source", "n_words", "stopword_ratio")
    )


def _o_q52() -> str:
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id,
         list_distinct([ws[i+1]||' '||ws[i+2]||' '||ws[i+3]
                        for i in range(0, greatest(len(ws)-2, 0))]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
edges AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
sym AS (SELECT ia AS a, ib AS b FROM edges UNION SELECT ib, ia FROM edges),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
dropped AS (SELECT a FROM reach GROUP BY a HAVING MIN(b) != a),
scored AS (
  SELECT doc_id, lang, source,
         {_lang_case()} AS pred_lang,
         CAST(len(ws) AS BIGINT) AS n_words,
         ROUND(CAST(len([w for w in ws if list_contains(['{_SW}'], w)]) AS DOUBLE)
               / len(ws), 6) AS stopword_ratio
  FROM (SELECT doc_id, lang, source, text, string_split(text, ' ') AS ws FROM documents))
SELECT doc_id, lang, source, n_words, stopword_ratio FROM scored
WHERE doc_id NOT IN (SELECT a FROM dropped)
  AND pred_lang = 'en' AND n_words >= 20 AND stopword_ratio >= 0.05
"""


O_Q52 = _o_q52()


# --------------------------------------------------------------- Q40
def q40_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints (winnowing): one (doc_id, fp)
    row per selected k-gram window minimum. Pure Catalyst array
    algebra — runs at scan speed, no Python."""
    d = _t(spark, sf_dir, "documents")
    fps = TXT.winnow_fingerprints(d, "text", "doc_id", k=5, w=4)
    # explode_outer, deliberately: plain explode injects a
    # size(fps) > 0 Filter whose rewrite inlines the entire fingerprint
    # expression a second time below the projection boundary (~6x wall
    # clock); fps is never empty, so outer == inner here.
    return fps.select("doc_id", F.explode_outer("fps").alias("fp"))


O_Q40 = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
kg AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 5 THEN
      [CAST(('0x' || substring(md5(array_to_string(toks[i:i+4], ' ')), 1, 15)) AS BIGINT)
       for i in generate_series(1, len(toks) - 4)]
    ELSE [CAST(('0x' || substring(md5(array_to_string(toks, ' ')), 1, 15)) AS BIGINT)]
    END AS hs
  FROM t),
wins AS (
  SELECT doc_id,
    CASE WHEN len(hs) >= 4 THEN [list_min(hs[j:j+3]) for j in generate_series(1, len(hs) - 3)]
    ELSE [list_min(hs)] END AS mins
  FROM kg)
SELECT doc_id, CAST(unnest(list_distinct(mins)) AS BIGINT) AS fp FROM wins
"""


# --------------------------------------------------------------- Q50
def q50_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization KNN (the memory-bound ANN family beside
    SRP-LSH and IVF): m=16 4-dim subquantizers × 32 centroids, ADC
    inner-product scoring over 16-byte codes, deterministic
    corpus-scaled shortlist (max(256, n/25) — a FIXED shortlist's
    covered share shrinks as n grows; 7/50 top-k misses measured at a
    10x corpus with 256) + exact re-rank. At these settings recall is
    exactly 1 (pytest-checked against bruteforce at sf0.001,
    check_recall at sf0.1 and 10x), so the exact-KNN SQL is the
    oracle."""
    from a2b_spark.operators.similarity import knn_pq

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return knn_pq(q, e, "embedding", "vec_id", k=5, m=16, ks=32, shortlist="auto")


# --------------------------------------------------------------- Q64
def q64_knn_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (FAISS IVFADC) — the coarse-cells + residual-PQ
    composition production ANN indexes run at corpus scale: 16-byte
    residual codes scanned once with cell pruning inside the Arrow
    kernel. Full probe (n_probe = n_cells) + covering shortlist ⇒
    recall exactly 1 (pytest vs bruteforce), so the exact-KNN SQL is
    the oracle; the wired pruned-probe variant is the scale
    configuration (similarity.knn_ivf_pq)."""
    from a2b_spark.operators.similarity import knn_ivf_pq

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return knn_ivf_pq(
        q, e, "embedding", "vec_id", k=5,
        n_cells=8, n_probe=8, m=16, ks=32, shortlist=4096,
    )


# --------------------------------------------------------------- Q38
def q38_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer KNN (the FAISS-style scale path alongside
    q30's SRP-LSH): spherical k-means cells, single-cell corpus
    assignment, top-n_probe cell probing, exact cosine re-rank.
    n_probe = n_cells here because this synthetic corpus has
    near-uniform background similarity (cos ≈ 0.4 everywhere) — cells
    barely separate, so full probing is what makes recall exactly 1
    and lets the exact-KNN SQL (O_Q28) serve as the oracle; the
    operator's n_probe < n_cells speedup is exercised (and
    recall-checked against bruteforce) in pytest instead."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return S.knn_ivf(q, e, "embedding", "vec_id", k=5, n_cells=16, n_probe=16)


# --------------------------------------------------------------- Q37
def q37_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase event matched with the user's
    latest click at-or-before it (attribution shape). Exercises the
    union-and-window ASOF formulation (operators/asof.py) — one key
    shuffle + sort, no range-join blowup; DuckDB's native ASOF JOIN is
    the oracle."""
    from a2b_spark.operators.asof import asof_join
    from a2b_spark.queries.relational import _events

    e = _events(spark, sf_dir)
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    right = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts_us",
        F.col("event_id").alias("click_event_id"),
        F.col("ts_us").alias("click_ts_us"),
    )
    return asof_join(
        left,
        right,
        on=["user_id"],
        ts_col="ts_us",
        right_cols=["click_event_id", "click_ts_us"],
        right_tiebreak="click_event_id",
    )


O_Q37 = """
WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events
),
l AS (SELECT event_id, user_id, ts_us, value FROM e WHERE event_type = 'purchase'),
r AS (SELECT user_id, ts_us, event_id AS click_event_id, ts_us AS click_ts_us
      FROM e WHERE event_type = 'click')
SELECT l.event_id, l.user_id, l.ts_us, l.value, r.click_event_id, r.click_ts_us
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
"""


# --------------------------------------------------------------- Q36
def q36_embedding_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH bucketed embedding near-dup (the 100 TB scale path for
    what q29 computes exactly): candidates from 36 independent 3-bit
    sign-projection tables, exact cosine re-score. Miss probability for
    a cos=0.45 pair is ~1e-5, so the exact all-pairs oracle (O_Q29)
    hash-matches — same contract as q26/q30.

    Honest cost note: this synthetic corpus has near-uniform background
    similarity (random pairs cos ≈ 0.4 vs threshold 0.45), the
    adversarial regime for SRP — per-bit collision 0.61 vs 0.65 barely
    separates, so candidate volume stays near-quadratic and the exact
    blocked join (q29) is cheaper at bench SF. On real embedding
    corpora (dup threshold ≥ 0.8 against near-orthogonal background)
    the same operator's buckets collapse to ~nothing and it wins by
    orders of magnitude; parameters are per-call tunable."""
    e = _t(spark, sf_dir, "embeddings")
    return D.embedding_dup_pairs_lsh(e, "embedding", "vec_id", threshold=0.45)


# --------------------------------------------------------------- Q56
def q56_embedding_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cluster step on the EMBEDDING side: SRP-LSH near-dup pairs
    (q36's operator, recall ≈ 1 at these parameters) → connected
    components → (vec_id, cluster = min member). Same
    large-star/small-star contraction as the text side (q44) — the
    operator is modality-agnostic because it only ever sees the edge
    list. Oracle: exact all-pairs cosine edges + recursive-CTE
    transitive closure."""
    from a2b_spark.operators.graph import connected_components

    e = _t(spark, sf_dir, "embeddings")
    pairs = D.embedding_dup_pairs_lsh(e, "embedding", "vec_id", threshold=0.45)
    cc = connected_components(pairs, "id_a", "id_b")
    return cc.select(
        F.col("node").cast("long").alias("vec_id"),
        F.col("component").cast("long").alias("cluster"),
    )


O_Q56 = """
WITH RECURSIVE v AS (
  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vec FROM embeddings),
edges AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE round(list_inner_product(a.vec, b.vec)
              / (sqrt(list_inner_product(a.vec, a.vec)) * sqrt(list_inner_product(b.vec, b.vec))), 6) >= 0.45),
sym AS (SELECT ia AS a, ib AS b FROM edges UNION SELECT ib, ia FROM edges),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
SELECT a AS vec_id, CAST(MIN(b) AS BIGINT) AS cluster FROM reach GROUP BY a
"""


# --------------------------------------------------------------- Q44
def q44_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING — the step between pair generation and the
    keep/drop decision: minhash-LSH pairs (q26's operator) become
    connected components, one (doc_id, cluster) row per document that
    appears in any dup pair, cluster = min doc_id in its component.
    The components run alternating large-star/small-star contraction
    (operators/graph.py) — O(log n) rounds of edge-only shuffles, the
    100 TB answer where naive label propagation is O(diameter).
    Oracle: exact-jaccard edges + recursive-CTE transitive closure."""
    from a2b_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup_pairs(d, "text", "doc_id", threshold=0.8)
    cc = connected_components(pairs, "id_a", "id_b")
    return cc.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("cluster"),
    )


O_Q44 = """
WITH RECURSIVE t AS (
  SELECT doc_id,
         list_distinct([ws[i+1]||' '||ws[i+2]||' '||ws[i+3]
                        for i in range(0, greatest(len(ws)-2, 0))]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
edges AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
sym AS (SELECT ia AS a, ib AS b FROM edges UNION SELECT ib, ia FROM edges),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a)
SELECT a AS doc_id, CAST(MIN(b) AS BIGINT) AS cluster FROM reach GROUP BY a
"""


# --------------------------------------------------------------- Q46
def q46_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram statistics (LM-training accounting): top-20
    bigrams by count, ties broken lexicographically. The bigram list is
    built with zip_with over two array slices — pure Catalyst, scan
    speed; the count is one wordcount shuffle; top-k is a TakeOrdered,
    not a full sort."""
    d = _t(spark, sf_dir, "documents")
    toks = TXT.word_tokens("text")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


O_Q46 = """
WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
b AS (SELECT unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS bigram FROM t)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM b
GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20
"""


# --------------------------------------------------------------- Q47
def q47_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document salient terms: top-3 by TF-IDF (explode + two
    word-count aggregations + a window — all codegen; see
    operators/ranking.py for the scale notes)."""
    from a2b_spark.operators.ranking import tfidf_top_terms

    d = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(d, "text", "doc_id", top_k=3)


O_Q47 = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT doc_id, token AS term,
         ROUND(tf * ln(CAST(n.n AS DOUBLE) / df), 6) AS score
  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
r AS (SELECT doc_id, term, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
      FROM scored)
SELECT doc_id, term, score, CAST(rank AS INT) AS rank FROM r WHERE rank <= 3
"""


# --------------------------------------------------------------- Q48
_BM25_TERMS = ["spark", "merge", "window", "table"]


def q48_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword ranking: top-20 docs for a fixed 4-term query
    (k1=1.2, b=0.75). Exact-decimal per-term summation makes the score
    independent of either engine's float-add order."""
    from a2b_spark.operators.ranking import bm25_scores

    d = _t(spark, sf_dir, "documents")
    return bm25_scores(d, "text", "doc_id", _BM25_TERMS, top_k=20)


_BM25_IN = ",".join(f"'{t}'" for t in _BM25_TERMS)
O_Q48 = f"""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM documents),
avgdl AS (SELECT AVG(dl) AS avgdl FROM dl),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
       FROM tok WHERE token IN ({_BM25_IN}) GROUP BY doc_id, token),
dfreq AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY token),
per AS (
  SELECT doc_id,
         CAST(ROUND(
           ln(1 + (n.n - df + 0.5) / (df + 0.5))
           * (tf * (1.2 + 1.0))
           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl.avgdl)), 7) AS DECIMAL(20,7)) AS s
  FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN n CROSS JOIN avgdl),
sc AS (SELECT doc_id, ROUND(CAST(SUM(s) AS DOUBLE), 6) AS score FROM per GROUP BY doc_id),
r AS (SELECT doc_id, score, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank FROM sc)
SELECT doc_id, score, CAST(rank AS INT) AS rank FROM r WHERE rank <= 20
"""


# --------------------------------------------------------------- Q54
def q54_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (lowercase, whitespace collapse,
    control-char strip) with before/after length accounting — the
    standard cleaning step ahead of fingerprinting/dedup."""
    d = _t(spark, sf_dir, "documents")
    norm = TXT.normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("len_raw"),
        F.length(norm).cast("long").alias("len_norm"),
        F.substring(norm, 1, 40).alias("head"),
    )


O_Q54 = """
WITH n AS (
  SELECT doc_id, text,
         lower(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1f]', ' ', 'g'),
                                   '\\s+', ' ', 'g'))) AS norm
  FROM documents)
SELECT doc_id, CAST(length(text) AS BIGINT) AS len_raw,
       CAST(length(norm) AS BIGINT) AS len_norm,
       substring(norm, 1, 40) AS head
FROM n
"""


# --------------------------------------------------------------- Q55
def q55_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus 'datasheet' report: per (source, lang) doc counts,
    token totals, and decimal-exact mean quality signals — the
    aggregate view a curation run publishes alongside the data."""
    d = _t(spark, sf_dir, "documents")
    feats = TXT.quality_features(F.col("text"))
    per_doc = d.select(
        "source",
        "lang",
        feats["n_words"].alias("n_words"),
        feats["n_chars"].alias("n_chars"),
        # q53's fixed-point idiom: per-doc ratio rounded once to 1e-7,
        # scaled to an exact integer; the group mean is half-up integer
        # division — no decimal-division scale rules or double rounding
        # for the engines to disagree on
        (
            F.round(feats["stopword_ratio"], 7).cast("decimal(20,7)") * 10_000_000
        ).cast("long").alias("swr7"),
    )
    return per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.expr("(2 * sum(swr7) + count(1)) div (2 * count(1))")
        .cast("long")
        .alias("mean_stopword_ratio_e7"),
    )


O_Q55 = f"""
WITH per AS (
  SELECT source, lang,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(CAST(ROUND(CAST(len([w for w in ws if list_contains(['{_SW}'], w)]) AS DOUBLE)
                         / len(ws), 7) AS DECIMAL(20,7)) * 10000000 AS BIGINT) AS swr7
  FROM (SELECT source, lang, text, string_split(text, ' ') AS ws FROM documents))
SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST((2 * SUM(swr7) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS mean_stopword_ratio_e7
FROM per GROUP BY source, lang
"""


# --------------------------------------------------------------- Q53
def q53_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-quality signal: per-doc mean token surprisal under the
    corpus' own unigram model (the SQL-computable core of
    CCNet-style perplexity filtering)."""
    from a2b_spark.operators.ranking import unigram_surprisal

    d = _t(spark, sf_dir, "documents")
    return unigram_surprisal(d, "text", "doc_id")


O_Q53 = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
counts AS (SELECT token, SUM(tf) AS cnt FROM tf GROUP BY token),
total AS (SELECT SUM(cnt) AS total FROM counts),
i AS (
  SELECT token,
         CAST(CAST(ROUND(-ln(CAST(cnt AS DOUBLE) / total.total), 7) AS DECIMAL(20,7))
              * 10000000 AS BIGINT) AS i7
  FROM counts CROSS JOIN total),
per AS (
  SELECT doc_id, SUM(tf) AS n_tokens, SUM(tf * i7) AS s7
  FROM tf JOIN i USING (token) GROUP BY doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((2 * s7 + n_tokens) // (2 * n_tokens) AS BIGINT) AS surprisal_e7
FROM per
"""


# --------------------------------------------------------------- Q49
def q49_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KEEP/DROP step that closes the dedup loop: cluster near-dup
    pairs (q44's operator chain), keep each cluster's minimum doc_id as
    canonical, and anti-join the rest out of the corpus — the actual
    deduplicated training set, not just the pair/cluster report."""
    d = _t(spark, sf_dir, "documents")
    return D.dedup_apply(d, "text", "doc_id", threshold=0.8).select("doc_id", "source")


O_Q49 = """
WITH RECURSIVE t AS (
  SELECT doc_id,
         list_distinct([ws[i+1]||' '||ws[i+2]||' '||ws[i+3]
                        for i in range(0, greatest(len(ws)-2, 0))]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
edges AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
sym AS (SELECT ia AS a, ib AS b FROM edges UNION SELECT ib, ia FROM edges),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
dropped AS (SELECT a FROM reach GROUP BY a HAVING MIN(b) != a)
SELECT doc_id, source FROM documents WHERE doc_id NOT IN (SELECT a FROM dropped)
"""


# --------------------------------------------------------------- Q58
def q58_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/Dolma repetition quality filters: per-doc duplicate-word
    ratio and top-bigram character coverage (functions.text
    .repetition_stats) — the signals that catch boilerplate/spam docs
    a perplexity filter misses."""
    d = _t(spark, sf_dir, "documents")
    return TXT.repetition_stats(d, "text", "doc_id")


O_Q58 = """
WITH t AS (
  SELECT doc_id, length(text) AS nc, string_split(text, ' ') AS ws
  FROM documents),
bg AS (
  SELECT doc_id, unnest([ws[i+1]||' '||ws[i+2]
                         for i in range(0, greatest(len(ws)-1, 0))]) AS bg
  FROM t),
cnt AS (SELECT doc_id, bg, COUNT(*) AS n FROM bg GROUP BY 1, 2),
top AS (
  SELECT doc_id, bg, n FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, bg ASC) AS rn
    FROM cnt) WHERE rn = 1)
SELECT t.doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws) AS dup_word_ratio,
       COALESCE(top.bg, '') AS top_bigram,
       CASE WHEN nc > 0
            THEN CAST(COALESCE(top.n * length(top.bg), 0) AS DOUBLE) / nc
            ELSE 0.0 END AS top_bigram_char_ratio
FROM t LEFT JOIN top ON t.doc_id = top.doc_id
"""


# --------------------------------------------------------------- Q59
def q59_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (GPT-3 n-gram overlap rule): hold out
    a deterministic 20% hash sample as the 'benchmark', flag every
    remaining doc sharing a 5-gram with it (planted near-dups leak
    across the cut, so the overlap set is non-trivial at sf0.01 —
    larger n-grams find zero overlaps in this short-doc synthetic
    corpus; production would use the GPT-3 13-gram). Composes the
    engine's own sampling + decontamination operators."""
    from a2b_spark.operators.dedup import ngram_decontaminate
    from a2b_spark.operators.rangejoin import hash_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = hash_sample(d, "doc_id", percent=20, salt="decon")
    rest = d.join(bench.select("doc_id"), "doc_id", "left_anti")
    return ngram_decontaminate(rest, bench, "text", "doc_id", n=5)


O_Q59 = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         CAST(('0x' || substring(md5('decon' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 20 AS is_bench
  FROM documents),
g AS (
  SELECT doc_id, is_bench,
         unnest(list_distinct(CASE WHEN len(ws) >= 5
           THEN [list_aggregate(ws[i+1:i+5], 'string_agg', ' ') for i in range(0, len(ws)-4)]
           ELSE [list_aggregate(ws, 'string_agg', ' ')] END)) AS ng
  FROM d),
b AS (SELECT DISTINCT ng FROM g WHERE is_bench AND ng <> '')
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
FROM g JOIN b USING (ng)
WHERE NOT is_bench AND ng <> ''
GROUP BY doc_id
"""


# --------------------------------------------------------------- Q60
def q60_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (emails/IPv4/phones → typed placeholders) —
    functions.text.redact_pii, pure codegen. The synthetic corpus is
    PII-free so this verifies the pass-through side cross-engine;
    planted-PII behavior is pytest-verified (test_operators)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TXT.redact_pii(F.col("text")).alias("clean_text"))


O_Q60 = r"""
SELECT doc_id,
  regexp_replace(
    regexp_replace(
      regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
    '\b\+?\d[\d\-() ]{7,}\d\b', '[PHONE]', 'g') AS clean_text
FROM documents
"""


# --------------------------------------------------------------- Q61
def q61_bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget accounting under GPT-2-style regex pre-tokenization
    (functions.text.bpe_ish_tokens): per (lang, source), total
    pre-token count, docs, and mean pre-tokens/doc (half-up fixed-point
    — the engine's cross-engine mean idiom). The whitespace-token twin
    is q23; this is the 'what will tokenization cost' estimate a
    training-data pipeline budgets with."""
    d = _t(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang", "source", F.size(TXT.bpe_ish_tokens(F.col("text"))).cast("long").alias("nt")
    )
    return per_doc.groupBy("lang", "source").agg(
        F.sum("nt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr("CAST((2 * sum(nt) + count(1)) div (2 * count(1)) AS BIGINT)").alias(
            "mean_tokens_per_doc"
        ),
    )


O_Q61 = """
WITH t AS (
  SELECT lang, source,
         len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'
         )) AS nt
  FROM documents)
SELECT lang, source, CAST(SUM(nt) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST((2 * SUM(nt) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS mean_tokens_per_doc
FROM t GROUP BY lang, source
"""


QUERIES.update(
    {
        "q44_dup_clusters": q44_dup_clusters,
        "q47_tfidf_top_terms": q47_tfidf_top_terms,
        "q48_bm25": q48_bm25,
        "q49_dedup_apply": q49_dedup_apply,
        "q46_top_bigrams": q46_top_bigrams,
        "q36_embedding_dups_lsh": q36_embedding_dups_lsh,
        "q37_asof_join": q37_asof_join,
        "q38_knn_ivf": q38_knn_ivf,
        "q50_knn_pq": q50_knn_pq,
        "q51_stratified_sample": q51_stratified_sample,
        "q52_corpus_curation": q52_corpus_curation,
        "q53_unigram_surprisal": q53_unigram_surprisal,
        "q54_normalize_text": q54_normalize_text,
        "q55_corpus_datasheet": q55_corpus_datasheet,
        "q56_embedding_dup_clusters": q56_embedding_dup_clusters,
        "q40_winnow_fingerprints": q40_winnow_fingerprints,
        "q42_range_join": q42_range_join,
        "q43_hash_sample": q43_hash_sample,
        "q32_tumbling_window": q32_tumbling_window,
        "q33_sliding_window": q33_sliding_window,
        "q57_session_window": q57_session_window,
        "q58_repetition_stats": q58_repetition_stats,
        "q59_decontaminate": q59_decontaminate,
        "q60_pii_redact": q60_pii_redact,
        "q61_bpe_token_budget": q61_bpe_token_budget,
        "q62_media_resize": q62_media_resize,
        "q63_media_features": q63_media_features,
        "q64_knn_ivf_pq": q64_knn_ivf_pq,
        "q65_embedding_quantize": q65_embedding_quantize,
        "q34_media_decode": q34_media_decode,
        "q35_frame_sample": q35_frame_sample,
    }
)

ORACLES.update(
    {
        "q44_dup_clusters": O_Q44,
        "q47_tfidf_top_terms": O_Q47,
        "q48_bm25": O_Q48,
        "q49_dedup_apply": O_Q49,
        "q46_top_bigrams": O_Q46,
        "q36_embedding_dups_lsh": O_Q29,  # recall ~1 at 0.45 → output == exact all-pairs
        "q37_asof_join": O_Q37,
        "q38_knn_ivf": O_Q28,  # n_probe == n_cells → recall 1 → output == exact KNN
        "q50_knn_pq": O_Q28,  # shortlist covers true top-k → output == exact KNN
        "q51_stratified_sample": O_Q51,
        "q52_corpus_curation": O_Q52,
        "q53_unigram_surprisal": O_Q53,
        "q54_normalize_text": O_Q54,
        "q55_corpus_datasheet": O_Q55,
        "q56_embedding_dup_clusters": O_Q56,
        "q40_winnow_fingerprints": O_Q40,
        "q42_range_join": O_Q42,
        "q43_hash_sample": O_Q43,
        "q32_tumbling_window": O_Q32,
        "q33_sliding_window": O_Q33,
        "q57_session_window": O_Q57,
        "q58_repetition_stats": O_Q58,
        "q59_decontaminate": O_Q59,
        "q60_pii_redact": O_Q60,
        "q61_bpe_token_budget": O_Q61,
        "q62_media_resize": O_Q62,
        "q63_media_features": O_Q63,
        "q64_knn_ivf_pq": O_Q28,  # recall 1: full probe + covering shortlist
        "q65_embedding_quantize": O_Q65,
        "q34_media_decode": O_Q34,
        "q35_frame_sample": O_Q35,
    }
)


# --------------------------------------------------------------- Q66
def q66_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (operators/chunk.py): 200-char windows
    every 160 chars (40-char overlap) — the split step between curation
    and tokenization. Shuffle-free scan-speed explode; the boundary
    contract (no pure-suffix trailing chunk) is part of the oracle."""
    from a2b_spark.operators.chunk import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, "text", "doc_id", size=200, overlap=40)


O_Q66 = """
WITH t AS (SELECT doc_id, text, length(text) AS ln FROM documents WHERE length(text) > 0),
s AS (SELECT doc_id, text, ln, unnest(range(0, ln, 160)) AS st FROM t)
SELECT doc_id, CAST(st // 160 AS INT) AS chunk_id, CAST(st AS BIGINT) AS chunk_start,
       substr(text, CAST(st + 1 AS INT), 200) AS chunk_text,
       CAST(length(substr(text, CAST(st + 1 AS INT), 200)) AS BIGINT) AS chunk_chars
FROM s WHERE st = 0 OR st + 40 < ln
"""


# --------------------------------------------------------------- Q67
def q67_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup signal (operators/spans.py): maximal word
    spans whose every 8-gram appears in >= 2 documents — the
    position-indexed n-gram reduction of suffix-array ExactSubstr
    dedup (Lee et al. 2022). Shuffles carry (doc, pos, 64-bit gram
    hash), never the text."""
    from a2b_spark.operators.spans import duplicate_ngram_spans

    d = _t(spark, sf_dir, "documents")
    return duplicate_ngram_spans(d, "text", "doc_id", n=8, min_docs=2)


O_Q67 = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pos AS (SELECT doc_id, unnest(generate_series(1, len(ws) - 7)) AS p, ws
        FROM t WHERE len(ws) >= 8),
h AS (SELECT doc_id, p,
             CAST(('0x' || substring(md5(array_to_string(ws[p:p+7], ' ')), 1, 15)) AS BIGINT) AS gh
      FROM pos),
dup AS (SELECT gh FROM h GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT doc_id, p FROM h JOIN dup USING (gh)),
isl AS (SELECT doc_id, p,
               p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        FROM hits)
SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
       CAST(MAX(p) + 7 AS BIGINT) AS span_end,
       CAST(MAX(p) - MIN(p) + 8 AS BIGINT) AS span_words
FROM isl GROUP BY doc_id, grp
"""


# --------------------------------------------------------------- Q68
def q68_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup survivor selection (dedup_keep_best):
    clusters keep their LONGEST member (ties: min doc_id) instead of
    q49's blind minimum-id rule. Oracle: exact-jaccard closure + a
    per-cluster window."""
    d = _t(spark, sf_dir, "documents")
    return D.dedup_keep_best(d, "text", "doc_id", "n_chars", threshold=0.8).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        "source",
        "n_chars",
        F.col("cluster").cast("long").alias("cluster"),
    )


O_Q68 = """
WITH RECURSIVE t AS (
  SELECT doc_id,
         list_distinct([ws[i+1]||' '||ws[i+2]||' '||ws[i+3]
                        for i in range(0, greatest(len(ws)-2, 0))]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
edges AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
sym AS (SELECT ia AS a, ib AS b FROM edges UNION SELECT ib, ia FROM edges),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
cl AS (SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY a),
j AS (SELECT d.doc_id, d.lang, d.source, d.n_chars,
             COALESCE(cl.cluster, d.doc_id) AS cluster
      FROM documents d LEFT JOIN cl USING (doc_id)),
r AS (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY cluster ORDER BY n_chars DESC, doc_id ASC) AS rk FROM j)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source, n_chars,
       CAST(cluster AS BIGINT) AS cluster
FROM r WHERE rk = 1
"""


# --------------------------------------------------------------- Q69
def q69_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling (weighted_hash_sample): keep each document
    with probability proportional to a quality proxy (n_chars / 800,
    clamped to 1) — deterministic in doc_id, monotone in the weight,
    and engine-portable via the md5 idiom. One scan, no shuffle."""
    from a2b_spark.operators.rangejoin import weighted_hash_sample

    d = _t(spark, sf_dir, "documents")
    w = F.least(F.col("n_chars") / F.lit(800.0), F.lit(1.0))
    return weighted_hash_sample(d, "doc_id", w, salt="s3").select(
        "doc_id", "lang", "source", "n_chars"
    )


O_Q69 = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE CAST(('0x' || substring(md5('s3' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
      < least(greatest(CAST(n_chars AS DOUBLE) / 800.0, 0.0), 1.0) * 10000
"""


QUERIES.update(
    {
        "q66_chunk_documents": q66_chunk_documents,
        "q67_dup_ngram_spans": q67_dup_ngram_spans,
        "q68_dedup_keep_best": q68_dedup_keep_best,
        "q69_weighted_sample": q69_weighted_sample,
    }
)

ORACLES.update(
    {
        "q66_chunk_documents": O_Q66,
        "q67_dup_ngram_spans": O_Q67,
        "q68_dedup_keep_best": O_Q68,
        "q69_weighted_sample": O_Q69,
    }
)


# --------------------------------------------------------------- Q70
def q70_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style dedup APPLY (operators/spans.py): every word
    covered by a cross-doc duplicated 8-gram is cut from all docs but
    the gram's min-doc_id keeper, so one copy of each duplicated span
    survives the corpus. Linear in total tokens; no full-corpus
    window."""
    from a2b_spark.operators.spans import remove_duplicate_spans

    d = _t(spark, sf_dir, "documents")
    return remove_duplicate_spans(d, "text", "doc_id", n=8, min_docs=2)


O_Q70 = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pos AS (SELECT doc_id, unnest(generate_series(1, len(ws) - 7)) AS p, ws
        FROM t WHERE len(ws) >= 8),
h AS (SELECT doc_id, p,
             CAST(('0x' || substring(md5(array_to_string(ws[p:p+7], ' ')), 1, 15)) AS BIGINT) AS gh
      FROM pos),
dup AS (SELECT gh, MIN(doc_id) AS keeper FROM h
        GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
cut AS (SELECT DISTINCT doc_id, unnest(generate_series(p, p + 7)) AS w
        FROM h JOIN dup USING (gh) WHERE doc_id <> keeper),
aw AS (SELECT doc_id, wp, ws[wp] AS tok
       FROM (SELECT doc_id, unnest(generate_series(1, len(ws))) AS wp, ws FROM t)),
kept AS (SELECT a.doc_id, a.wp, a.tok
         FROM aw a LEFT JOIN cut c ON a.doc_id = c.doc_id AND a.wp = c.w
         WHERE c.w IS NULL),
re AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY wp) AS clean_text,
              COUNT(*) AS n_words
       FROM kept GROUP BY doc_id)
SELECT t.doc_id, COALESCE(re.clean_text, '') AS clean_text,
       CAST(COALESCE(re.n_words, 0) AS BIGINT) AS n_words,
       CAST(len(t.ws) - COALESCE(re.n_words, 0) AS BIGINT) AS n_removed_words
FROM t LEFT JOIN re USING (doc_id)
"""


QUERIES.update({"q70_remove_dup_spans": q70_remove_dup_spans})
ORACLES.update({"q70_remove_dup_spans": O_Q70})
