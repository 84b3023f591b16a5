"""Round-6 curation-analytics queries (q93–q99): the reporting and
calibration layer a training-data pipeline runs AFTER the primitive
operators — two-stage retrieval rerank, quality-score calibration,
dedup cost accounting, batch-packing audits, boilerplate detection,
cluster profiling, and per-domain capping.

Reference parity: these extend the reference's analytics surface
(/root/reference/src/DataMigration — per-run stats and reporting) with
the corpus-curation reports a 100 TB LLM pipeline needs; every query
has a DuckDB oracle and follows the engine's cross-engine disciplines:

* floats only via single divisions or DECIMAL accumulation + final
  DOUBLE cast (bit-identical regardless of partial-agg order);
* bucket/bin indices from integer-valued double math identical on
  both engines (floor of an IEEE division of exact ints);
* deterministic hash order via the top-60-bits-of-md5 idiom
  (operators/rangejoin._bucket60);
* tokenization by single-space split only — NEVER a regex the two
  engines could version-skew on (the q76 rounds-4/5 postmortem,
  PORTING.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from a2b_spark.functions.vectors import as_double, dot
from a2b_spark.operators import dedup as D
from a2b_spark.operators import similarity as S
from a2b_spark.queries.relational import _t


# --------------------------------------------------------------- Q93
def q93_knn_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: a cheap cosine top-20 shortlist per query
    (stage 1 — at scale this is the IVF/LSH path), then a SECOND
    scoring function over only the shortlist (stage 2 — here the raw
    inner product standing in for a cross-encoder; the plumbing is the
    point: rescoring touches 20 rows per query, never the corpus).
    Deterministic final top-5 by (rerank score desc, corpus_id).

    Scale shape: the shortlist is |queries|·20 rows; vectors join back
    by id (broadcast query side, corpus vectors never shuffle beyond
    the id join); the rerank window partitions by query over ≤20 rows.
    """
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    shortlist = S.knn_bruteforce(q, e, "embedding", "vec_id", k=20)
    qv = q.select(F.col("vec_id").alias("query_id"), as_double("embedding").alias("__qv"))
    cv = e.select(F.col("vec_id").alias("corpus_id"), as_double("embedding").alias("__cv"))
    rescored = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(cv, "corpus_id")
        .withColumn("rerank_score", F.round(dot(F.col("__qv"), F.col("__cv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("rerank_score"), F.asc("corpus_id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "query_id", "corpus_id", "cos", "rerank_score",
            F.col("rk").cast("int").alias("rk"),
        )
    )


O_Q93 = """
WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vec FROM embeddings
           WHERE embedding IS NOT NULL),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         round(list_inner_product(q.vec, c.vec)
               / (sqrt(list_inner_product(q.vec, q.vec)) * sqrt(list_inner_product(c.vec, c.vec))), 6) AS cos,
         round(list_inner_product(q.vec, c.vec), 6) AS rerank_score
  FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id != c.vec_id),
short AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id) AS rk1
  FROM scored),
rr AS (
  SELECT query_id, corpus_id, cos, rerank_score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rerank_score DESC, corpus_id) AS rk
  FROM short WHERE rk1 <= 20)
SELECT query_id, corpus_id, cos, rerank_score, CAST(rk AS INTEGER) AS rk
FROM rr WHERE rk <= 5
"""


# --------------------------------------------------------------- Q94
def q94_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source calibration of a quality score against a proxy label
    (reliability-diagram bins + the monotone fit): score = type-token
    ratio (distinct/total words), label = doc length ≥ 300 chars.
    Scores bin into deciles; each (source, bin) reports its empirical
    label rate, and ``calibrated`` is the running MAXIMUM of the rate
    over bins — the pool-adjacent-violators shape of isotonic
    regression reduced to its SQL-checkable monotone-envelope core.

    Scale shape: one scan + one (source, bin) agg (map-side combined);
    the monotone window runs over ≤10 rows per source. The bin index
    is floor(nd·10/nw) on exact ints — identical IEEE ops on both
    engines, never a regex or order-dependent float."""
    d = _t(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    staged = d.select(
        "source",
        F.size(F.array_distinct(ws)).alias("__nd"),
        F.size(ws).alias("__nw"),
        (F.col("n_chars") >= 300).cast("int").alias("__label"),
    )
    binned = staged.withColumn(
        "bin",
        F.least(
            F.floor(F.col("__nd") * 10 / F.col("__nw")), F.lit(9)
        ).cast("int"),
    )
    per_bin = binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__label").cast("long").alias("pos"),
    )
    mono = (
        W.partitionBy("source").orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    )
    return per_bin.withColumn(
        "rate", F.col("pos") / F.col("n")
    ).withColumn("calibrated", F.max(F.col("pos") / F.col("n")).over(mono))


O_Q94 = """
WITH t AS (
  SELECT source,
         len(list_distinct(string_split(text, ' '))) AS nd,
         len(string_split(text, ' ')) AS nw,
         CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS label
  FROM documents),
b AS (
  SELECT source,
         CAST(LEAST(FLOOR(CAST(nd * 10 AS DOUBLE) / nw), 9) AS INTEGER) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(label) AS BIGINT) AS pos
  FROM t GROUP BY 1, 2)
SELECT source, bin, n, pos,
       CAST(pos AS DOUBLE) / n AS rate,
       MAX(CAST(pos AS DOUBLE) / n) OVER (
         PARTITION BY source ORDER BY bin ROWS UNBOUNDED PRECEDING) AS calibrated
FROM b
"""


# --------------------------------------------------------------- Q95
def _fp_dedup_marked(d: DataFrame, *extra_cols) -> DataFrame:
    """The exact content-fingerprint dedup spine shared by q95/q103:
    md5(text) fingerprint + min-doc_id survivor election as a
    map-side-combined agg joined back on the fingerprint (never a
    window over hot fingerprints). Returns (doc_id, source, __fp,
    *extra_cols, __keep_id); survivor-rule changes land in every
    dedup-accounting report at once."""
    staged = d.select("doc_id", "source", F.md5("text").alias("__fp"), *extra_cols)
    keep = staged.groupBy("__fp").agg(F.min("doc_id").alias("__keep_id"))
    return staged.join(keep, "__fp")


def q95_dedup_token_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level dedup cost accounting per source: under exact
    content-fingerprint dedup (md5(text), min-id survivor), how many
    documents AND how many tokens does each source lose? The report
    that turns "12% of docs are dups" into the number that matters for
    a token-budgeted training run.

    Scale shape: fingerprint + token count in one scan; survivor
    election is a fingerprint agg (map-side combined) joined back on
    the fingerprint — no window over hot fingerprints; final agg is
    per-source. Tokens = single-space split count (the engine's only
    cross-engine-safe tokenizer)."""
    d = _t(spark, sf_dir, "documents")
    marked = _fp_dedup_marked(
        d, F.size(F.split(F.col("text"), " ")).cast("long").alias("__toks")
    ).withColumn("__dup", (F.col("doc_id") != F.col("__keep_id")).cast("long"))
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__dup").cast("long").alias("n_dup_docs"),
            F.sum("__toks").cast("long").alias("n_tokens"),
            F.sum(F.col("__toks") * F.col("__dup")).cast("long").alias("dup_tokens"),
        )
        .withColumn("dup_token_rate", F.col("dup_tokens") / F.col("n_tokens"))
    )


O_Q95 = """
WITH t AS (
  SELECT doc_id, source, md5(text) AS fp,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents),
k AS (SELECT fp, MIN(doc_id) AS keep_id FROM t GROUP BY 1),
m AS (
  SELECT t.source, t.toks,
         CASE WHEN t.doc_id != k.keep_id THEN 1 ELSE 0 END AS dup
  FROM t JOIN k USING (fp))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dup) AS BIGINT) AS n_dup_docs,
       CAST(SUM(toks) AS BIGINT) AS n_tokens,
       CAST(SUM(toks * dup) AS BIGINT) AS dup_tokens,
       CAST(SUM(toks * dup) AS DOUBLE) / SUM(toks) AS dup_token_rate
FROM m GROUP BY 1
"""


# --------------------------------------------------------------- Q96
def q96_pack_fill_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram AFTER packing: how full are the
    training sequences q76 builds? Packs under the 8192-char budget
    bucket by fill decile (the one-doc overrun pack lands in bucket
    10); the histogram is the batch-efficiency audit — a long tail of
    underfull packs means wasted accelerator steps.

    Scale shape: pack_sequences is the two-phase distributed prefix
    sum (operators/prefix.py — never a single global window); the
    histogram is two tiny aggs on top."""
    from a2b_spark.operators.prefix import pack_sequences

    d = _t(spark, sf_dir, "documents")
    packed = pack_sequences(d, "doc_id", F.col("n_chars"), budget=8192)
    packs = packed.groupBy("pack_id").agg(
        F.sum("tokens").cast("long").alias("__fill")
    )
    return (
        packs.withColumn(
            "decile",
            F.least(F.floor(F.col("__fill") * 10 / 8192), F.lit(10)).cast("int"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.min("__fill").alias("min_fill"),
            F.max("__fill").alias("max_fill"),
        )
    )


O_Q96 = """
WITH run AS (
  SELECT doc_id, n_chars,
         SUM(n_chars) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS running
  FROM documents),
packs AS (
  SELECT (running - n_chars) // 8192 AS pack_id,
         CAST(SUM(n_chars) AS BIGINT) AS fill
  FROM run GROUP BY 1)
SELECT CAST(LEAST(FLOOR(CAST(fill * 10 AS DOUBLE) / 8192), 10) AS INTEGER) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_packs,
       MIN(fill) AS min_fill, MAX(fill) AS max_fill
FROM packs GROUP BY 1
"""


# --------------------------------------------------------------- Q97
def q97_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: word 5-grams appearing in ≥3 documents,
    with how many distinct sources carry them — high-df grams spanning
    sources are syndicated boilerplate (nav bars, licenses, templates)
    that span-removal (q70) should target first.

    Scale shape: distinct grams per doc via the shared
    doc_word_ngrams kernel (staged transform + explode_outer); one
    (gram) agg with map-side combine. The gram STRING rides this
    shuffle because it is the report's output; the membership-only
    operators (q59/q88) ship digests instead."""
    d = _t(spark, sf_dir, "documents")
    g = D.doc_word_ngrams(d, "text", "doc_id", "doc_id", 5, extra_cols=["source"])
    return (
        g.groupBy("gram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .filter(F.col("n_docs") >= 3)
    )


O_Q97 = """
WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, source,
         unnest(list_distinct(CASE WHEN len(ws) >= 5
           THEN [list_aggregate(ws[i+1:i+5], 'string_agg', ' ') for i in range(0, len(ws)-4)]
           ELSE [list_aggregate(ws, 'string_agg', ' ')] END)) AS gram
  FROM d)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM g WHERE gram <> ''
GROUP BY 1 HAVING COUNT(*) >= 3
"""


# --------------------------------------------------------------- Q98
def q98_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-cluster profiling over the k-means assignment (q89's
    operator): per-cluster population, mean/max squared distance
    (spread), and the minimum member id as a stable exemplar — the
    diversity report behind topic capping decisions.

    Float discipline: dist2 is already rounded to 6 decimals by the
    operator; the MEAN accumulates those exact values as
    DECIMAL(28,6) and divides once at the end — bit-identical across
    partial-agg orders and engines."""
    e = _t(spark, sf_dir, "embeddings")
    a = S.kmeans_assign(e, "embedding", "vec_id", k=8)
    return a.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(F.col("dist2").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_dist2"),
        F.max("dist2").alias("max_dist2"),
        F.min("vec_id").alias("exemplar_id"),
    )


O_Q98 = """
WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vec
           FROM embeddings WHERE embedding IS NOT NULL),
c AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, vec AS cvec
      FROM v ORDER BY vec_id LIMIT 8),
scored AS (
  SELECT v.vec_id, c.cid,
         round(list_sum([ (v.vec[i+1] - c.cvec[i+1]) * (v.vec[i+1] - c.cvec[i+1])
                          for i in range(0, len(v.vec))]), 6) AS d
  FROM v CROSS JOIN c),
assigned AS (
  SELECT vec_id, cid, d,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
  FROM scored)
SELECT cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(d AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mean_dist2,
       MAX(d) AS max_dist2, MIN(vec_id) AS exemplar_id
FROM assigned WHERE rk = 1 GROUP BY 1
"""


# --------------------------------------------------------------- Q99
def q99_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain capping: keep at most 50 documents per source, chosen
    by deterministic hash order (top-60-bits-of-md5, salted) — the
    standard move against a single crawl domain dominating the mix,
    reproducible across runs/engines/cluster sizes like every sampling
    operator here.

    Scale shape: the salted two-phase top_k_per_group (partition-id
    salt pre-pass), so a mega-source reduces per input partition
    instead of sorting inside one hot window task."""
    from a2b_spark.operators.topk import top_k_per_group

    d = _t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cap"), F.col("doc_id").cast("string")).cast("binary")),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    capped = top_k_per_group(
        d.select("doc_id", "source").withColumn("__h", h),
        ["source"],
        [F.asc("__h"), F.asc("doc_id")],
        k=50,
    )
    return capped.select("doc_id", "source", "rk")


O_Q99 = """
WITH t AS (
  SELECT doc_id, source,
         CAST(('0x' || substring(md5('cap' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM documents),
r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
  FROM t)
SELECT doc_id, source, CAST(rk AS INTEGER) AS rk FROM r WHERE rk <= 50
"""


QUERIES = {
    "q93_knn_rerank": q93_knn_rerank,
    "q94_quality_calibration": q94_quality_calibration,
    "q95_dedup_token_rates": q95_dedup_token_rates,
    "q96_pack_fill_histogram": q96_pack_fill_histogram,
    "q97_boilerplate_ngrams": q97_boilerplate_ngrams,
    "q98_cluster_profile": q98_cluster_profile,
    "q99_domain_cap": q99_domain_cap,
}

ORACLES = {
    "q93_knn_rerank": O_Q93,
    "q94_quality_calibration": O_Q94,
    "q95_dedup_token_rates": O_Q95,
    "q96_pack_fill_histogram": O_Q96,
    "q97_boilerplate_ngrams": O_Q97,
    "q98_cluster_profile": O_Q98,
    "q99_domain_cap": O_Q99,
}


# --------------------------------------------------------------- Q100
def q100_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster SIZE distribution — the shape report over q44's
    clustering output: how many 2-doc twins vs big boilerplate blobs?
    A heavy tail here means span-removal/boilerplate work (q70/q97)
    will recover more tokens than pairwise dedup.

    Scale shape: identical spine to q44 (minhash-LSH pairs →
    alternating-star CC); the histogram is two tiny aggs over the
    (node, component) frame. Oracle: exact-jaccard edges +
    recursive-CTE transitive closure (the q44 idiom)."""
    from a2b_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup_pairs(d, "text", "doc_id", threshold=0.8)
    cc = connected_components(pairs, "id_a", "id_b")
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )


O_Q100 = """
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
comp AS (SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY a),
sizes AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY 1)
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM sizes GROUP BY 1
"""


# --------------------------------------------------------------- Q101
def q101_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: the heuristic classifier (q24's
    lang_id) against the labeled lang column, with per-true-language
    rates — the quality report that decides whether the cheap n-gram
    classifier is good enough to route documents at scale.

    Scale shape: one scan + one (lang, pred) agg; the rate divides by
    a window sum over the TINY aggregate (≤ |langs|² rows)."""
    from a2b_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    cm = (
        d.select("lang", TXT.lang_id(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = W.partitionBy("lang")
    return cm.withColumn("rate", F.col("n") / F.sum("n").over(tot))


# oracle assembled below (needs pipeline._lang_case at import time)


# --------------------------------------------------------------- Q102
def q102_contamination_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination RATE per source: q59's GPT-3 5-gram rule
    (20% hash holdout as the benchmark) aggregated to the report a
    curation run acts on — which sources leak eval data and how badly.

    Scale shape: q59's digest-join spine (grams ride as md5 digests,
    benchmark side broadcast); the per-source rollup adds one tiny agg
    + one single-division rate."""
    from a2b_spark.operators.dedup import ngram_decontaminate
    from a2b_spark.operators.rangejoin import hash_sample

    d = _t(spark, sf_dir, "documents")
    dt = d.select("doc_id", "text", "source")
    bench = hash_sample(dt, "doc_id", percent=20, salt="decon")
    rest = dt.join(bench.select("doc_id"), "doc_id", "left_anti")
    cont = ngram_decontaminate(
        rest.select("doc_id", "text"), bench.select("doc_id", "text"),
        "text", "doc_id", n=5,
    )
    flagged = rest.join(cont, "doc_id", "left").select(
        "source", F.col("n_shared_ngrams").isNotNull().cast("long").alias("__c")
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__c").cast("long").alias("n_contaminated"),
        )
        .withColumn("contamination_rate", F.col("n_contaminated") / F.col("n_docs"))
    )


O_Q102 = """
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws,
         CAST(('0x' || substring(md5('decon' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 20 AS is_bench
  FROM documents),
g AS (
  SELECT doc_id, is_bench,
         unnest(list_distinct(CASE WHEN len(ws) >= 5
           THEN [list_aggregate(ws[i+1:i+5], 'string_agg', ' ') for i in range(0, len(ws)-4)]
           ELSE [list_aggregate(ws, 'string_agg', ' ')] END)) AS ng
  FROM d),
b AS (SELECT DISTINCT ng FROM g WHERE is_bench AND ng <> ''),
cont AS (
  SELECT DISTINCT g.doc_id FROM g JOIN b USING (ng)
  WHERE NOT is_bench AND ng <> ''),
rest AS (SELECT doc_id, source FROM d WHERE NOT is_bench)
SELECT r.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(c.doc_id) AS BIGINT) AS n_contaminated,
       CAST(COUNT(c.doc_id) AS DOUBLE) / COUNT(*) AS contamination_rate
FROM rest r LEFT JOIN cont c ON r.doc_id = c.doc_id
GROUP BY 1
"""


# --------------------------------------------------------------- Q103
def q103_survivor_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture drift under dedup: per-source corpus share BEFORE vs
    AFTER exact fingerprint dedup (min-id survivor). Dedup is never
    mixture-neutral — boilerplate-heavy sources shrink — and this is
    the report that quantifies the drift before a training run bakes
    it in.

    Float discipline: shares are single divisions of exact longs; the
    totals attach via window sums over the per-source aggregate
    (≤ |sources| rows)."""
    d = _t(spark, sf_dir, "documents")
    marked = _fp_dedup_marked(d).select(
        "source", (F.col("doc_id") == F.col("__keep_id")).cast("long").alias("__s")
    )
    per_src = marked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__s").cast("long").alias("n_survivors"),
    )
    g = W.partitionBy()
    return per_src.select(
        "source",
        "n_docs",
        "n_survivors",
        (F.col("n_docs") / F.sum("n_docs").over(g)).alias("before_share"),
        (F.col("n_survivors") / F.sum("n_survivors").over(g)).alias("after_share"),
    )


O_Q103 = """
WITH t AS (SELECT doc_id, source, md5(text) AS fp FROM documents),
k AS (SELECT fp, MIN(doc_id) AS keep_id FROM t GROUP BY 1),
m AS (
  SELECT t.source,
         CASE WHEN t.doc_id = k.keep_id THEN 1 ELSE 0 END AS s
  FROM t JOIN k USING (fp)),
a AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(s) AS BIGINT) AS n_survivors
  FROM m GROUP BY 1)
SELECT source, n_docs, n_survivors,
       CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS before_share,
       CAST(n_survivors AS DOUBLE) / SUM(n_survivors) OVER () AS after_share
FROM a
"""


# --------------------------------------------------------------- Q104
def q104_token_share_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted effect of mixture rebalancing: per-language token
    SHARE before vs after q77's self-tuning keep-filter. q77 balances
    document counts; this report shows what that does to the token
    mix (long-doc languages keep more tokens per kept doc) — the
    number the training-budget plan actually consumes.

    Scale shape: the kept set comes from q77's broadcast-rates filter
    (one scan); token counts join by doc id; shares divide by window
    sums over the per-language aggregate (≤ |langs| rows)."""
    from a2b_spark.queries.analytic import q77_mixture_rebalance

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("__toks"),
    )
    kept = q77_mixture_rebalance(spark, sf_dir).select("doc_id", F.lit(1).alias("__k"))
    marked = toks.join(kept, "doc_id", "left")
    agg = marked.groupBy("lang").agg(
        F.sum("__toks").cast("long").alias("before_tokens"),
        F.sum(F.when(F.col("__k").isNotNull(), F.col("__toks")).otherwise(F.lit(0)))
        .cast("long")
        .alias("after_tokens"),
    )
    g = W.partitionBy()
    return agg.select(
        "lang",
        "before_tokens",
        "after_tokens",
        (F.col("before_tokens") / F.sum("before_tokens").over(g)).alias("before_share"),
        (F.col("after_tokens") / F.sum("after_tokens").over(g)).alias("after_share"),
    )


O_Q104 = """
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents),
counts AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt FROM documents GROUP BY lang),
mm AS (SELECT MIN(cnt) AS m FROM counts),
kept AS (
  SELECT d.doc_id FROM documents d JOIN counts USING (lang) CROSS JOIN mm
  WHERE (CAST(('0x' || substring(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 10000) * cnt < m * 10000),
agg AS (
  SELECT t.lang,
         CAST(SUM(t.toks) AS BIGINT) AS before_tokens,
         CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN t.toks ELSE 0 END) AS BIGINT) AS after_tokens
  FROM t LEFT JOIN kept k ON t.doc_id = k.doc_id
  GROUP BY 1)
SELECT lang, before_tokens, after_tokens,
       CAST(before_tokens AS DOUBLE) / SUM(before_tokens) OVER () AS before_share,
       CAST(after_tokens AS DOUBLE) / SUM(after_tokens) OVER () AS after_share
FROM agg
"""


# --------------------------------------------------------------- Q105
def q105_norm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm histogram in quarter-unit bins — the sanity
    report before cosine-based dedup/ANN (a spike near zero means
    direction-less vectors; a wide spread means unnormalized inputs
    that silently re-weight dot-product retrieval).

    Float discipline: the norm is the sequential-fold dot + sqrt
    (KNN-oracle parity), rounded to 6; the bin multiplies by 4 — a
    power of two, EXACT in binary floating point — before floor, so
    both engines bin identically."""
    e = _t(spark, sf_dir, "embeddings")
    from a2b_spark.functions.vectors import norm

    n = F.round(norm(as_double("embedding")), 6)
    return (
        e.filter(F.col("embedding").isNotNull())
        .select(n.alias("__n"))
        .withColumn("bin_q", F.floor(F.col("__n") * 4).cast("int"))
        .groupBy("bin_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("__n").alias("min_norm"),
            F.max("__n").alias("max_norm"),
        )
    )


O_Q105 = """
WITH v AS (
  SELECT round(sqrt(list_inner_product(
           [CAST(x AS DOUBLE) for x in embedding],
           [CAST(x AS DOUBLE) for x in embedding])), 6) AS n
  FROM embeddings WHERE embedding IS NOT NULL)
SELECT CAST(FLOOR(n * 4) AS INTEGER) AS bin_q,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       MIN(n) AS min_norm, MAX(n) AS max_norm
FROM v GROUP BY 1
"""


# --------------------------------------------------------------- Q106
def q106_winnow_shared_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plagiarism-style candidate pairs from winnowing fingerprints
    (SIGMOD'03): documents sharing ≥3 selected window minima. The
    fingerprint index is the scale path — each doc posts O(len/w)
    fingerprints, the pair join runs per fingerprint bucket (LSH-bucket
    shape), never all-pairs.

    Oracle: the q40 fingerprint CTE + a bucket self-join."""
    from a2b_spark.functions import text as TXT

    d = _t(spark, sf_dir, "documents")
    fps = TXT.winnow_fingerprints(d, "text", "doc_id", k=5, w=4)
    flat = fps.select("doc_id", F.explode_outer("fps").alias("fp"))
    a = flat.select(F.col("doc_id").alias("id_a"), "fp")
    b = flat.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= 3)
    )


O_Q106 = """
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
  FROM kg),
fpp AS (SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM wins)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS shared
FROM fpp a JOIN fpp b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= 3
"""


def _o_q101() -> str:
    from a2b_spark.queries.pipeline import _lang_case

    return f"""
WITH t AS (SELECT lang, text, string_split(text, ' ') AS ws FROM documents),
cm AS (
  SELECT lang, {_lang_case()} AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM t GROUP BY 1, 2)
SELECT lang, pred_lang, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY lang) AS rate
FROM cm
"""


QUERIES.update(
    {
        "q100_cluster_size_histogram": q100_cluster_size_histogram,
        "q101_lang_confusion": q101_lang_confusion,
        "q102_contamination_by_source": q102_contamination_by_source,
        "q103_survivor_shift": q103_survivor_shift,
        "q104_token_share_rebalance": q104_token_share_rebalance,
        "q105_norm_histogram": q105_norm_histogram,
        "q106_winnow_shared_pairs": q106_winnow_shared_pairs,
    }
)

ORACLES.update(
    {
        "q100_cluster_size_histogram": O_Q100,
        "q101_lang_confusion": _o_q101(),
        "q102_contamination_by_source": O_Q102,
        "q103_survivor_shift": O_Q103,
        "q104_token_share_rebalance": O_Q104,
        "q105_norm_histogram": O_Q105,
        "q106_winnow_shared_pairs": O_Q106,
    }
)


# --------------------------------------------------------------- Q111
def q111_fuzzy_key_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy key matching over catalog keys (name + brand): distinct
    keys within levenshtein distance 1 — the typo-pair report behind
    entity resolution on dirty keys. Uses the PassJoin-style halves
    pigeonhole (operators/editjoin.py): every qualifying pair collides
    on an untouched half, so the candidate join is equi on
    (segment, text, length) — never an all-pairs cross join — and the
    survivors verify with the codegen levenshtein."""
    from a2b_spark.operators.editjoin import edit_distance_pairs

    p = _t(spark, sf_dir, "part")
    keys = (
        p.groupBy(
            F.concat(F.col("p_name"), F.lit(" "), F.col("p_brand")).alias("key")
        )
        .agg(F.min("p_partkey").alias("pk"))
    )
    return edit_distance_pairs(keys, "key", "pk", max_dist=1, same_length=True)


O_Q111 = """
WITH k AS (
  SELECT MIN(p_partkey) AS pk, p_name || ' ' || p_brand AS key
  FROM part GROUP BY 2)
SELECT a.pk AS id_a, b.pk AS id_b,
       CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
FROM k a JOIN k b
  ON a.pk < b.pk AND length(a.key) = length(b.key)
WHERE levenshtein(a.key, b.key) <= 1
"""


QUERIES["q111_fuzzy_key_pairs"] = q111_fuzzy_key_pairs
ORACLES["q111_fuzzy_key_pairs"] = O_Q111
