"""Round-10 third tranche: the curation operators a 100 TB training
run still lacked — a true n-gram LM (stupid backoff) for
CCNet-style perplexity filtering, deterministic shuffle-shard export,
and NFC text canonicalization.

Float discipline for the LM scores follows the registry convention:
per-token log10 values are rounded to 6 decimals, cast to
DECIMAL(18,6), summed exactly, and only the final mean converts to
DOUBLE — both engines then divide identical exact operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.operators.lm import LOG10_BACKOFF_04
from a2b_spark.queries.relational import _t

QUERIES: dict = {}
ORACLES: dict = {}


# --------------------------------------------------------------- Q163
_LM_TRAIN_CAP = 500  # constant reference slice: sf0.001's whole corpus


def q163_lm_perplexity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM in the exact CCNet configuration: a
    FIXED reference model (trained on the constant doc_id < 500
    slice — sf-invariant, like CCNet's Wikipedia LM) scores the whole
    corpus, so training cost is constant in SF, scoring is one
    SF-linear pass, and every cascade arm INCLUDING the OOV floor is
    exercised for real. Rolled up per (lang, source): documents,
    tokens, tokens that hit a full-order gram, and the mean per-token
    log10 probability (perplexity = 10**-avg_logp10).

    Plan shape: train = one bounded scan + one (k, gram) hash agg +
    one model-sized adjacent-order join (both checkpointed — train
    once, score forever); score = ONE corpus scan, a cascade of three
    broadcast joins, one rollup shuffle. No windows, no collect."""
    from a2b_spark.operators.lm import ngram_lm_train, stupid_backoff_logp

    d = _t(spark, sf_dir, "documents")
    model = ngram_lm_train(
        d.filter(F.col("doc_id") < _LM_TRAIN_CAP), "text", order=3
    )
    per_doc = stupid_backoff_logp(
        d,
        model,
        "doc_id",
        "text",
        order=3,
        broadcast_model=True,
        extra_cols=("lang", "source"),
    )
    # re-aggregate from the operator's EXACT decimal token sums —
    # avg-of-avgs would reintroduce float-order sensitivity. Zero-token
    # docs (n_tok = 0 contract rows) carry no scores: excluded so
    # n_docs means "documents scored", matching the oracle, whose
    # token-derived CTEs cannot see tokenless documents at all
    return (
        per_doc.filter(F.col("n_tok") > 0)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tok"),
            F.sum("hits_full").cast("long").alias("full_hits"),
            (F.sum("sum_logp10").cast("double") / F.sum("n_tok")).alias(
                "avg_logp10"
            ),
        )
        .orderBy("lang", "source")
    )


_L04 = repr(LOG10_BACKOFF_04)

O_Q163 = f"""
WITH tok0 AS (
  SELECT doc_id, lang, source,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos0
  FROM documents
),
tok AS (
  -- mirror the operator's tokenizer EXACTLY: '' entries (empty or
  -- multi-space text) are dropped and positions renumber over the
  -- surviving tokens — string_split alone would score phantom tokens
  -- and shift every lag() context on such a document
  SELECT doc_id, lang, source, w,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos0) AS pos
  FROM tok0 WHERE w <> ''
),
tok_train AS (SELECT * FROM tok WHERE doc_id < {_LM_TRAIN_CAP}),
n AS (SELECT COUNT(*) AS n FROM tok_train),
seq_t AS (
  SELECT pos, w,
         lag(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
         lag(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
  FROM tok_train
),
seq AS (
  SELECT doc_id, lang, source, pos, w,
         lag(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
         lag(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
  FROM tok
),
g1 AS (SELECT w AS gram, COUNT(*) AS c FROM tok_train GROUP BY 1),
g2 AS (SELECT p1 || ' ' || w AS gram, COUNT(*) AS c FROM seq_t
       WHERE p1 IS NOT NULL GROUP BY 1),
g3 AS (SELECT p2 || ' ' || p1 || ' ' || w AS gram, COUNT(*) AS c FROM seq_t
       WHERE p2 IS NOT NULL GROUP BY 1),
sc AS (
  SELECT s.doc_id, s.lang, s.source, LEAST(3, s.pos) AS kmax,
         t3.c AS c3, x3.c AS d3, t2.c AS c2, x2.c AS d2,
         t1.c AS c1, n.n AS d1
  FROM seq s
  CROSS JOIN n
  LEFT JOIN g3 t3 ON s.p2 IS NOT NULL
       AND t3.gram = s.p2 || ' ' || s.p1 || ' ' || s.w
  LEFT JOIN g2 x3 ON s.p2 IS NOT NULL AND x3.gram = s.p2 || ' ' || s.p1
  LEFT JOIN g2 t2 ON s.p1 IS NOT NULL AND t2.gram = s.p1 || ' ' || s.w
  LEFT JOIN g1 x2 ON s.p1 IS NOT NULL AND x2.gram = s.p1
  LEFT JOIN g1 t1 ON t1.gram = s.w
),
ts AS (
  SELECT doc_id, lang, source,
    CAST(ROUND(CASE
      WHEN c3 IS NOT NULL THEN log10(CAST(c3 AS DOUBLE) / d3)
      WHEN c2 IS NOT NULL THEN (kmax - 2) * ({_L04})
                               + log10(CAST(c2 AS DOUBLE) / d2)
      WHEN c1 IS NOT NULL THEN (kmax - 1) * ({_L04})
                               + log10(CAST(c1 AS DOUBLE) / d1)
      ELSE (kmax - 1) * ({_L04}) + log10(1.0 / CAST(d1 + 1 AS DOUBLE))
    END, 6) AS DECIMAL(18,6)) AS lp,
    CASE WHEN (kmax = 3 AND c3 IS NOT NULL)
           OR (kmax = 2 AND c2 IS NOT NULL)
           OR (kmax = 1 AND c1 IS NOT NULL) THEN 1 ELSE 0 END AS full_hit
  FROM sc
)
SELECT lang, source,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_tok,
       CAST(SUM(full_hit) AS BIGINT) AS full_hits,
       CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_logp10
FROM ts
GROUP BY lang, source
ORDER BY lang, source
"""

QUERIES["q163_lm_perplexity_rollup"] = q163_lm_perplexity_rollup
ORACLES["q163_lm_perplexity_rollup"] = O_Q163


# --------------------------------------------------------------- Q164
_N_SHARDS = 16
_SHARD_SALT = "sh1"


def q164_shuffle_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle-shard export plan over documents: 16
    shards by salted md5, per-shard positions by the same hash. The
    output certifies BOTH halves of the contract with one bounded row
    per shard — the bucket split (n_docs, exact char sum) and the
    intra-shard ORDER (the doc_ids at positions 1-3; a single swapped
    pair anywhere in a shard head diverges the hash). One shuffle
    keyed by shard + per-shard local sort; no global sort at any SF."""
    from a2b_spark.operators.shards import shuffle_shards

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s = shuffle_shards(d, "doc_id", _N_SHARDS, salt=_SHARD_SALT)
    return (
        s.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.max(F.when(F.col("pos") == 1, F.col("doc_id"))).alias("head1"),
            F.max(F.when(F.col("pos") == 2, F.col("doc_id"))).alias("head2"),
            F.max(F.when(F.col("pos") == 3, F.col("doc_id"))).alias("head3"),
        )
        .orderBy("shard")
    )


O_Q164 = f"""
WITH h AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substring(md5('{_SHARD_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
  FROM documents
),
s AS (
  SELECT doc_id, n_chars,
         CAST(h60 % {_N_SHARDS} AS INT) AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY h60 % {_N_SHARDS}
           ORDER BY h60, CAST(doc_id AS VARCHAR)
         ) AS pos
  FROM h
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MAX(CASE WHEN pos = 1 THEN doc_id END) AS head1,
       MAX(CASE WHEN pos = 2 THEN doc_id END) AS head2,
       MAX(CASE WHEN pos = 3 THEN doc_id END) AS head3
FROM s
GROUP BY shard
ORDER BY shard
"""

QUERIES["q164_shuffle_shard_export"] = q164_shuffle_shard_export
ORACLES["q164_shuffle_shard_export"] = O_Q164


# --------------------------------------------------------------- Q165
def q165_nfc_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization over adversarially decomposed
    text: every document contributes its first word suffixed with a
    decomposed 'é' (e + U+0301), a decomposed 'ü' (u + U+0308), and a
    composed 'é' — NFC must compose the first two and keep the third,
    shrinking each string by exactly 2 codepoints. Per-language
    rollup: docs, summed codepoint lengths before/after, changed
    count, and the lexicographic MIN of the normalized strings (a
    string value through the driver hash, so a single mis-normalized
    character anywhere diverges). Arrow-batched pandas UDF
    (`functions/unicode.py`) — the sanctioned Python boundary; the
    DuckDB twin is the built-in nfc_normalize."""
    from a2b_spark.functions.unicode import nfc

    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.split(F.col("text"), " ").getItem(0),
        F.lit("e\u0301u\u0308\u00e9"),
    )
    staged = d.select(
        "lang", raw.alias("raw"), nfc(raw).alias("norm")
    )
    return (
        staged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length("raw")).cast("long").alias("sum_len_raw"),
            F.sum(F.length("norm")).cast("long").alias("sum_len_nfc"),
            F.sum((F.col("raw") != F.col("norm")).cast("int"))
            .cast("long")
            .alias("n_changed"),
            F.min("norm").alias("min_nfc"),
        )
        .orderBy("lang")
    )


O_Q165 = """
WITH staged AS (
  SELECT lang,
         string_split(text, ' ')[1] || 'e' || chr(769) || 'u' || chr(776) || chr(233) AS raw
  FROM documents
),
n AS (SELECT lang, raw, nfc_normalize(raw) AS norm FROM staged)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(length(raw)) AS BIGINT) AS sum_len_raw,
       CAST(SUM(length(norm)) AS BIGINT) AS sum_len_nfc,
       CAST(SUM(CASE WHEN raw <> norm THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       MIN(norm) AS min_nfc
FROM n
GROUP BY lang
ORDER BY lang
"""

QUERIES["q165_nfc_canonicalize"] = q165_nfc_canonicalize
ORACLES["q165_nfc_canonicalize"] = O_Q165


# --------------------------------------------------------------- Q166
_CLF_VOCAB = ["table", "stream", "merge", "window"]
_CLF_W = ["0.75", "-0.5", "0.25", "-0.125"]
_CLF_B = "-0.5"


def q166_quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring (the fastText-filter shape:
    GPT-3's WebText classifier, LLaMA's quality filter) with a frozen
    model — z = w·counts + b over an explicit vocabulary, computed in
    EXACT decimal arithmetic (no transcendentals), so both engines
    produce identical scores; σ is monotone, so the keep-threshold
    compares z directly. Per-source rollup: docs, docs above
    threshold, exact mean score. TRAINING of the same model class is
    certified separately (tests/test_classifier.py pins distributed
    full-batch GD bit-for-bit against a numpy/Decimal reference —
    gradient sums are exact decimals, so the trained weights are
    partition-invariant). Featurization is pure codegen
    (size∘filter per term): zero shuffles before the rollup."""
    from a2b_spark.operators.classifier import bow_linear_score

    d = _t(spark, sf_dir, "documents").select("source", "text")
    scored = bow_linear_score(d, "text", _CLF_VOCAB, _CLF_W, _CLF_B)
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("z") > 0).cast("int")).cast("long").alias("n_keep"),
            (F.sum("z").cast("double") / F.count(F.lit(1))).alias("avg_z"),
        )
        .orderBy("source")
    )


_CLF_TERMS_SQL = " + ".join(
    f"(CAST({w} AS DECIMAL(24,8)) * length(list_filter(string_split(text, ' '), x -> x = '{t}')))"
    for w, t in zip(_CLF_W, _CLF_VOCAB)
)

O_Q166 = f"""
WITH scored AS (
  SELECT source,
         CAST(CAST({_CLF_B} AS DECIMAL(24,8)) + {_CLF_TERMS_SQL}
              AS DECIMAL(24,8)) AS z
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN z > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(z) AS DOUBLE) / COUNT(*) AS avg_z
FROM scored
GROUP BY source
ORDER BY source
"""

QUERIES["q166_quality_classifier_score"] = q166_quality_classifier_score
ORACLES["q166_quality_classifier_score"] = O_Q166


# --------------------------------------------------------------- Q167
def q167_partitioned_dv_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION VECTORS on a PARTITIONED table (the round-10 extension
    of q154's unpartitioned walk): orders land hive-partitioned by
    priority, every 97th key is deleted via the vector path — the
    in-query check raises unless the commit hardlinked EVERY data
    file ACROSS the partition subdirs (zero partitions rewritten) —
    then a merge RE-INTRODUCES the lowest deleted key into a
    DIFFERENT partition than its stale bytes occupy, the case where
    the filtered read cannot locate the stale row and the vector trim
    alone would resurrect it; exactly-once survival of that key IS
    the certificate the stale partition was force-rewritten. Final
    per-priority rollup hash-matches the oracle recomputation."""
    import os

    from a2b_spark.queries.round10 import _data_files
    from a2b_spark.storage.table import DV_DIR, VersionedParquetTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    from a2b_spark.queries.round7 import _scratch_path

    path = _scratch_path(sf_dir, "q167")
    t = VersionedParquetTable(
        path,
        key_cols=["o_orderkey"],
        partition_by=["o_orderpriority"],
        retention=5,
        deletion_vectors=True,
    )
    t.overwrite(o)
    vdir_pre = os.path.join(path, t.current_version())
    pre = _data_files(vdir_pre)
    t.delete_keys(o.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey"))
    vdir = os.path.join(path, t.current_version())
    post = _data_files(vdir)
    pre_rel = [os.path.relpath(p, vdir_pre) for p in pre]
    post_rel = [os.path.relpath(p, vdir) for p in post]
    if pre_rel != post_rel:
        raise RuntimeError("q167: the DV delete rewrote or added data files")
    if not all(os.stat(p).st_nlink > 1 for p in post):
        raise RuntimeError("q167: a partitioned data file is not hardlinked")
    if not os.path.isdir(os.path.join(vdir, DV_DIR)):
        raise RuntimeError("q167: no tombstone vector staged")
    reborn = (
        o.filter(F.col("o_orderkey") % 97 == 0)
        .agg(F.min("o_orderkey"))
        .first()[0]
    )
    # land the reborn key in a priority its stale bytes do NOT occupy
    t.merge(
        spark.createDataFrame(
            spark.sparkContext.parallelize([(reborn, "0-REBORN", 1234.56)], 1),
            "o_orderkey long, o_orderpriority string, o_totalprice double",
        )
    )
    final = t.read(spark)
    if final.filter(F.col("o_orderkey") == reborn).count() != 1:
        raise RuntimeError("q167: re-introduced key not exactly-once")
    return (
        final.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


O_Q167 = """
WITH eff AS (
  SELECT o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT '0-REBORN', 1234.56
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM eff
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

QUERIES["q167_partitioned_dv_walk"] = q167_partitioned_dv_walk
ORACLES["q167_partitioned_dv_walk"] = O_Q167
