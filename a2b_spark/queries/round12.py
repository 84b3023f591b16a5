"""Round-12 tranche.

- q171: the curation CLI certified END-TO-END across all six
  SQL-expressible stages — nfc → quality → PERPLEXITY → CLASSIFIER →
  dedup → shard (q170 certified four; the round-11 verdict asked for
  the LM and classifier stages to join the chain). The CLI executes
  for real against scratch parquet; DuckDB independently replays every
  stage from its definition — including training the stupid-backoff
  trigram LM on the SAME quality-surviving corpus and recomputing the
  token-weighted perplexity threshold — and the per-shard rollup must
  hash-match. The perplexity decision is EXACT in both engines
  (multiply-through decimal predicate, see a2b_spark/curate.py), so no
  float boundary can flip a surviving doc between engines.

- q172: per-domain frequency capping (RefinedWeb/C4) via the new
  rangejoin.frequency_cap operator — salted-md5 draw, salted two-phase
  top-k execution (no hot-domain single-task sort).

- q173: the CLI's new decontam stage (GPT-3 n-gram overlap rule)
  certified end-to-end — a written-to-parquet benchmark sample, the
  real CLI chain nfc → quality → decontam → dedup → shard, and a
  DuckDB replay of the sample cut + gram join + tail stages.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.operators.lm import LOG10_BACKOFF_04

QUERIES: dict = {}
ORACLES: dict = {}

# frozen demo model: counts of 'merge' score up, 'slow' down — on the
# testdata word-soup corpus z straddles 0, so the stage genuinely gates
_Q171_VOCAB = ["merge", "slow"]
_Q171_W = ["0.5", "-0.5"]
_Q171_B = "0"
_Q171_THRESHOLD = "0"
_Q171_MIN_TOKENS = 30
_Q171_MARGIN = 0.05
_Q171_SHARDS = 8
_Q171_SALT = "q171-v1"


def q171_curation_cli_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """run_curation with every SQL-expressible stage enabled, executed
    for real (partitioned parquet to scratch, read back), certified by
    the q170-shape rollup: per-shard doc counts, exact char sum over
    the carried text, and the two shard heads by position. A wrong LM
    probability, a flipped perplexity survivor, a mis-scored
    classifier doc, a wrong dedup survivor, or a swapped shard slot
    all diverge the driver hash."""
    import shutil

    from a2b_spark.curate import run_curation
    from a2b_spark.queries.round7 import _scratch_path

    out = _scratch_path(sf_dir, "q171")
    try:
        run_curation(
            spark,
            os.path.join(sf_dir, "documents.parquet"),
            out,
            ("nfc", "quality", "perplexity", "classifier", "dedup", "shard"),
            min_tokens=_Q171_MIN_TOKENS,
            ppl_margin=_Q171_MARGIN,
            lm_order=3,
            n_shards=_Q171_SHARDS,
            salt=_Q171_SALT,
            clf_vocab=_Q171_VOCAB,
            clf_weights=_Q171_W,
            clf_bias=_Q171_B,
            clf_threshold=_Q171_THRESHOLD,
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


_L04 = repr(LOG10_BACKOFF_04)
_Q171_TERMS_SQL = " + ".join(
    f"(CAST({w} AS DECIMAL(24,8)) * "
    f"length(list_filter(string_split(text, ' '), x -> x = '{t}')))"
    for w, t in zip(_Q171_W, _Q171_VOCAB)
)

O_Q171 = f"""
WITH nfc AS (
  SELECT doc_id, nfc_normalize(text) AS text FROM documents
),
q AS (
  SELECT * FROM nfc
  WHERE len(string_split(text, ' ')) >= {_Q171_MIN_TOKENS}
),
tok0 AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos0
  FROM q
),
tok AS (
  -- the operator's tokenizer exactly: '' entries drop, positions
  -- renumber over survivors (O_Q163 discipline)
  SELECT doc_id, w,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos0) AS pos
  FROM tok0 WHERE w <> ''
),
n AS (SELECT COUNT(*) AS n FROM tok),
seq AS (
  SELECT doc_id, pos, w,
         lag(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
         lag(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
  FROM tok
),
g1 AS (SELECT w AS gram, COUNT(*) AS c FROM tok GROUP BY 1),
g2 AS (SELECT p1 || ' ' || w AS gram, COUNT(*) AS c FROM seq
       WHERE p1 IS NOT NULL GROUP BY 1),
g3 AS (SELECT p2 || ' ' || p1 || ' ' || w AS gram, COUNT(*) AS c FROM seq
       WHERE p2 IS NOT NULL GROUP BY 1),
sc AS (
  SELECT s.doc_id, LEAST(3, s.pos) AS kmax,
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
  SELECT doc_id,
    CAST(ROUND(CASE
      WHEN c3 IS NOT NULL THEN log10(CAST(c3 AS DOUBLE) / d3)
      WHEN c2 IS NOT NULL THEN (kmax - 2) * ({_L04})
                               + log10(CAST(c2 AS DOUBLE) / d2)
      WHEN c1 IS NOT NULL THEN (kmax - 1) * ({_L04})
                               + log10(CAST(c1 AS DOUBLE) / d1)
      ELSE (kmax - 1) * ({_L04}) + log10(1.0 / CAST(d1 + 1 AS DOUBLE))
    END, 6) AS DECIMAL(18,6)) AS lp
  FROM sc
),
pd AS (
  SELECT doc_id, CAST(SUM(lp) AS DECIMAL(20,6)) AS s,
         COUNT(*) AS n_tok
  FROM ts GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(s) AS DECIMAL(24,6)) AS s_tot,
         CAST(SUM(n_tok) AS BIGINT) AS n_tot
  FROM pd
),
ppl AS (
  -- exact multiply-through survivor test (curate.py round-12):
  -- s_i * n_tot >= (s_tot - margin * n_tot) * n_i; docs the LM never
  -- judged (no token rows) survive by the never-drop contract
  SELECT q.doc_id, q.text
  FROM q LEFT JOIN pd USING (doc_id) CROSS JOIN tot
  WHERE pd.doc_id IS NULL
     OR pd.s * CAST(tot.n_tot AS DECIMAL(14,0))
        >= CAST(tot.s_tot - CAST({_Q171_MARGIN!r} AS DECIMAL(10,6))
                * tot.n_tot AS DECIMAL(24,6))
           * CAST(pd.n_tok AS DECIMAL(12,0))
),
clf AS (
  SELECT doc_id, text FROM ppl
  WHERE CAST(CAST({_Q171_B} AS DECIMAL(24,8)) + {_Q171_TERMS_SQL}
             AS DECIMAL(24,8))
        >= CAST({_Q171_THRESHOLD} AS DECIMAL(24,8))
),
d AS (
  SELECT MIN(doc_id) AS doc_id,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM clf GROUP BY 2
),
s AS (
  SELECT c.doc_id, c.text,
         CAST(h.h60 % {_Q171_SHARDS} AS INT) AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY h.h60 % {_Q171_SHARDS}
           ORDER BY h.h60, CAST(c.doc_id AS VARCHAR)
         ) AS pos
  FROM d JOIN clf c USING (doc_id)
  JOIN (
    SELECT doc_id,
           CAST(('0x' || substring(md5('{_Q171_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
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

QUERIES["q171_curation_cli_full"] = q171_curation_cli_full
ORACLES["q171_curation_cli_full"] = O_Q171


# --------------------------------------------------------------- Q172
_Q172_CAP = 20
_Q172_SALT = "q172-v1"


def q172_domain_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency capping (RefinedWeb/C4: cap any one
    domain's contribution to the mix) as an oracle query: keep at most
    CAP docs per (lang, source) under the salted md5 draw, then roll
    up per domain — kept count, exact char sum, the rank-1 and
    rank-CAP doc ids (a wrong order, a missing doc, or an off-by-one
    cap all diverge the hash). Spark side runs the salted two-phase
    top-k (no hot-domain single-task sort); DuckDB replays with a
    plain ROW_NUMBER over the shared hash idiom."""
    from a2b_spark.operators.rangejoin import frequency_cap
    from a2b_spark.queries.relational import _t

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "text")
    kept = frequency_cap(
        d, ["lang", "source"], "doc_id", _Q172_CAP, salt=_Q172_SALT
    )
    return (
        kept.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum(F.length("text")).cast("long").alias("sum_chars"),
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("head1"),
            F.max(
                F.when(F.col("rk") == _Q172_CAP, F.col("doc_id"))
            ).alias("tail"),
        )
        .orderBy("lang", "source")
    )


O_Q172 = f"""
WITH h AS (
  SELECT doc_id, lang, source, text,
         CAST(('0x' || substring(md5('{_Q172_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
  FROM documents
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY lang, source ORDER BY h60, CAST(doc_id AS VARCHAR)
  ) AS rk
  FROM h
),
k AS (SELECT * FROM r WHERE rk <= {_Q172_CAP})
SELECT lang, source,
       COUNT(*) AS n_kept,
       CAST(SUM(len(text)) AS BIGINT) AS sum_chars,
       MAX(CASE WHEN rk = 1 THEN doc_id END) AS head1,
       MAX(CASE WHEN rk = {_Q172_CAP} THEN doc_id END) AS tail
FROM k
GROUP BY lang, source
ORDER BY lang, source
"""

QUERIES["q172_domain_frequency_cap"] = q172_domain_frequency_cap
ORACLES["q172_domain_frequency_cap"] = O_Q172


# --------------------------------------------------------------- Q173
_Q173_MIN_TOKENS = 30
_Q173_N = 5
_Q173_SHARDS = 8
_Q173_SALT = "q173-v1"
_Q173_BENCH_SALT = "q173-bench"


def q173_curation_cli_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLI's decontam stage certified end-to-end: a deterministic
    20% hash sample of the corpus is WRITTEN to scratch parquet as the
    'benchmark', then run_curation executes nfc → quality → decontam →
    dedup → shard against it for real — every doc sharing a word
    5-gram with the benchmark (trivially including the benchmark's own
    members, which live in the corpus too) must vanish before dedup.
    DuckDB replays the sample cut, the gram join, and the tail stages;
    the per-shard rollup hash-matches or the stage is wrong."""
    import shutil

    from a2b_spark.curate import run_curation
    from a2b_spark.operators.rangejoin import hash_sample
    from a2b_spark.queries.relational import _t
    from a2b_spark.queries.round7 import _scratch_path

    bench_path = _scratch_path(sf_dir, "q173b")
    out = _scratch_path(sf_dir, "q173")
    try:
        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        hash_sample(d, "doc_id", percent=20, salt=_Q173_BENCH_SALT).write.mode(
            "overwrite"
        ).parquet(bench_path)
        run_curation(
            spark,
            os.path.join(sf_dir, "documents.parquet"),
            out,
            ("nfc", "quality", "decontam", "dedup", "shard"),
            min_tokens=_Q173_MIN_TOKENS,
            n_shards=_Q173_SHARDS,
            salt=_Q173_SALT,
            decontam_benchmark=bench_path,
            decontam_n=_Q173_N,
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
        shutil.rmtree(bench_path, ignore_errors=True)


O_Q173 = f"""
WITH nfc0 AS (
  SELECT doc_id, nfc_normalize(text) AS text FROM documents
),
q AS (
  SELECT * FROM nfc0
  WHERE len(string_split(text, ' ')) >= {_Q173_MIN_TOKENS}
),
bench AS (
  SELECT doc_id, text FROM nfc0
  WHERE CAST(('0x' || substring(md5('{_Q173_BENCH_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 20
),
gq AS (
  SELECT doc_id,
         unnest(list_distinct(CASE WHEN len(ws) >= {_Q173_N}
           THEN [list_aggregate(ws[i+1:i+{_Q173_N}], 'string_agg', ' ')
                 for i in range(0, len(ws)-{_Q173_N - 1})]
           ELSE [list_aggregate(ws, 'string_agg', ' ')] END)) AS ng
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM q)
),
gb AS (
  SELECT DISTINCT unnest(list_distinct(CASE WHEN len(ws) >= {_Q173_N}
           THEN [list_aggregate(ws[i+1:i+{_Q173_N}], 'string_agg', ' ')
                 for i in range(0, len(ws)-{_Q173_N - 1})]
           ELSE [list_aggregate(ws, 'string_agg', ' ')] END)) AS ng
  FROM (SELECT string_split(text, ' ') AS ws FROM bench)
),
contaminated AS (
  SELECT DISTINCT doc_id FROM gq JOIN gb USING (ng) WHERE ng <> ''
),
surv AS (
  SELECT * FROM q WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
d AS (
  SELECT MIN(doc_id) AS doc_id,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM surv GROUP BY 2
),
s AS (
  SELECT c.doc_id, c.text,
         CAST(h.h60 % {_Q173_SHARDS} AS INT) AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY h.h60 % {_Q173_SHARDS}
           ORDER BY h.h60, CAST(c.doc_id AS VARCHAR)
         ) AS pos
  FROM d JOIN surv c USING (doc_id)
  JOIN (
    SELECT doc_id,
           CAST(('0x' || substring(md5('{_Q173_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
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

QUERIES["q173_curation_cli_decontam"] = q173_curation_cli_decontam
ORACLES["q173_curation_cli_decontam"] = O_Q173


# --------------------------------------------------------------- Q174
_Q174_MIN_DOCS = 3
_Q174_BP = "SHARED COOKIE BANNER LINE"


def q174_boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document line dedup (operators/lines.py): every
    third doc gets the SAME planted banner line, every 3k+1-th doc a
    line unique to it; boilerplate detection (distinct-doc count >=
    MIN_DOCS, exact string match) must strip exactly the banner — plus
    any full-text lines genuinely shared by >= MIN_DOCS corpus docs
    (the planted exact-dup families; both engines recompute the same
    set) — while unique lines, blank structure, and line order
    survive reassembly byte-for-byte. Rolled up per lang: docs, exact
    char sum of the cleaned text, docs changed."""
    from a2b_spark.operators.lines import remove_boilerplate_lines
    from a2b_spark.queries.relational import _t

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    staged_text = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(_Q174_BP + "\n"), F.col("text")),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.col("text"), F.lit("\nONLY-"), F.col("doc_id").cast("string")
            ),
        )
        .otherwise(F.col("text"))
    )
    staged = d.select(
        "doc_id", "lang", staged_text.alias("text")
    ).withColumn("orig", F.col("text"))
    cleaned = remove_boilerplate_lines(
        staged, "text", "doc_id", min_docs=_Q174_MIN_DOCS
    )
    return (
        cleaned.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("sum_chars"),
            F.sum((F.col("text") != F.col("orig")).cast("int"))
            .cast("long")
            .alias("n_changed"),
        )
        .orderBy("lang")
    )


O_Q174 = f"""
WITH staged AS (
  SELECT doc_id, lang,
    CASE WHEN doc_id % 3 = 0
           THEN '{_Q174_BP}' || chr(10) || text
         WHEN doc_id % 3 = 1
           THEN text || chr(10) || 'ONLY-' || CAST(doc_id AS VARCHAR)
         ELSE text END AS text
  FROM documents
),
l AS (
  SELECT doc_id, lang,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM staged
),
bp AS (
  SELECT line FROM (
    SELECT line, COUNT(DISTINCT doc_id) AS nd
    FROM l WHERE line <> '' GROUP BY 1
  ) WHERE nd >= {_Q174_MIN_DOCS}
),
kept AS (
  SELECT * FROM l WHERE line NOT IN (SELECT line FROM bp)
),
reb AS (
  SELECT doc_id, lang,
         string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY 1, 2
),
final AS (
  SELECT s.doc_id, s.lang, COALESCE(r.text, '') AS text,
         s.text AS orig
  FROM staged s LEFT JOIN reb r USING (doc_id, lang)
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(text)) AS BIGINT) AS sum_chars,
       CAST(SUM(CASE WHEN text <> orig THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed
FROM final
GROUP BY lang
ORDER BY lang
"""

QUERIES["q174_boilerplate_line_removal"] = q174_boilerplate_line_removal
ORACLES["q174_boilerplate_line_removal"] = O_Q174


# --------------------------------------------------------------- Q175
_Q175_MIN_TOKENS = 30
_Q175_MIN_DOCS = 3
_Q175_CAP = 15
_Q175_SHARDS = 8
_Q175_SALT = "q175-v2"
_Q175_BP = "SHARED BANNER"
_Q175_DUP_SHIFT = 1_000_000


def q175_curation_cli_linedup_domaincap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The CLI chain certified THROUGH the two round-12 stages: a
    staged corpus (every third doc carries the same banner line, and
    every fifth doc is DUPLICATED under a shifted id so capped sources
    contain fingerprint twins) runs nfc → linedup → quality → dedup →
    domaincap → shard — the execution order is ``curate.STAGE_ORDER``,
    dedup strictly BEFORE domaincap — and DuckDB replays all six in
    that same order. The banner must vanish from every doc (and ONLY
    the banner), the token floor applies to the CLEANED text, exact
    dedup drops the shifted twins before ranking so the per-source cap
    is filled from dedup SURVIVORS only (the planted twins make the
    gate diverge if the two stages are replayed in the other order),
    and the shard rollup hash-matches."""
    import shutil

    from a2b_spark.curate import run_curation
    from a2b_spark.queries.relational import _t
    from a2b_spark.queries.round7 import _scratch_path

    staged_path = _scratch_path(sf_dir, "q175s")
    out = _scratch_path(sf_dir, "q175")
    try:
        d = _t(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "text"
        )
        base = d.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(_Q175_BP + "\n"), F.col("text")),
            ).otherwise(F.col("text")),
        )
        base.unionByName(
            base.filter(F.col("doc_id") % 5 == 0).withColumn(
                "doc_id", F.col("doc_id") + F.lit(_Q175_DUP_SHIFT)
            )
        ).write.mode("overwrite").parquet(staged_path)
        run_curation(
            spark,
            staged_path,
            out,
            ("nfc", "linedup", "quality", "dedup", "domaincap", "shard"),
            min_tokens=_Q175_MIN_TOKENS,
            line_min_docs=_Q175_MIN_DOCS,
            domain_col="source",
            domain_cap=_Q175_CAP,
            n_shards=_Q175_SHARDS,
            salt=_Q175_SALT,
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
        shutil.rmtree(staged_path, ignore_errors=True)


O_Q175 = f"""
WITH base AS (
  SELECT doc_id, lang, source,
         CASE WHEN doc_id % 3 = 0
              THEN '{_Q175_BP}' || chr(10) || nfc_normalize(text)
              ELSE nfc_normalize(text) END AS text
  FROM documents
),
staged AS (
  SELECT * FROM base
  UNION ALL
  SELECT doc_id + {_Q175_DUP_SHIFT}, lang, source, text
  FROM base WHERE doc_id % 5 = 0
),
l AS (
  SELECT doc_id, source,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM staged
),
bp AS (
  SELECT line FROM (
    SELECT line, COUNT(DISTINCT doc_id) AS nd
    FROM l WHERE line <> '' GROUP BY 1
  ) WHERE nd >= {_Q175_MIN_DOCS}
),
reb AS (
  SELECT doc_id,
         COALESCE(string_agg(line, chr(10) ORDER BY pos), '') AS text
  FROM l WHERE line NOT IN (SELECT line FROM bp)
  GROUP BY 1
),
ld AS (
  SELECT s.doc_id, s.lang, s.source, COALESCE(r.text, '') AS text
  FROM staged s LEFT JOIN reb r USING (doc_id)
),
q AS (
  SELECT * FROM ld
  WHERE len(string_split(text, ' ')) >= {_Q175_MIN_TOKENS}
),
d AS (
  SELECT MIN(doc_id) AS doc_id
  FROM q
  GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
),
qd AS (
  SELECT q.* FROM q JOIN d USING (doc_id)
),
dc AS (
  SELECT doc_id, lang, source, text FROM (
    SELECT qd.*,
           ROW_NUMBER() OVER (
             PARTITION BY source
             ORDER BY h.h60, CAST(doc_id AS VARCHAR)
           ) AS rk
    FROM qd JOIN (
      SELECT doc_id,
             CAST(('0x' || substring(md5('{_Q175_SALT}-domaincap' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
      FROM staged
    ) h USING (doc_id)
  ) WHERE rk <= {_Q175_CAP}
),
s AS (
  SELECT c.doc_id, c.text,
         CAST(h.h60 % {_Q175_SHARDS} AS INT) AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY h.h60 % {_Q175_SHARDS}
           ORDER BY h.h60, CAST(c.doc_id AS VARCHAR)
         ) AS pos
  FROM dc c
  JOIN (
    SELECT doc_id,
           CAST(('0x' || substring(md5('{_Q175_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h60
    FROM staged
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

QUERIES["q175_curation_cli_linedup_domaincap"] = (
    q175_curation_cli_linedup_domaincap
)
ORACLES["q175_curation_cli_linedup_domaincap"] = O_Q175


# --------------------------------------------------------------- Q176
def q176_orc_table_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned-table machinery under the ORC format: customers
    land in an OrcDestination, a keyed merge updates one slice and
    inserts synthetic rows, a delete removes another — then the live
    snapshot rolls up per segment (exact decimal balances). DuckDB
    recomputes the same effective state from the raw parquet source,
    so a wrong merge/delete/typed-readback anywhere in the ORC path
    diverges the hash. (DuckDB never reads ORC — the oracle replays
    the OPERATIONS, which is the point.)"""
    import shutil

    from a2b_spark.queries.relational import _t, dsum
    from a2b_spark.queries.round7 import _scratch_path
    from a2b_spark.sinks.orc import OrcDestination

    path = _scratch_path(sf_dir, "q176")
    try:
        c = _t(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment", "c_acctbal"
        )
        dest = OrcDestination(path, key_cols=("c_custkey",))
        dest.merge(c)
        # update every 7th key's balance to 0.01, insert a synthetic
        # 'NEW' segment row per 501-multiple
        upd = c.filter(F.col("c_custkey") % 7 == 0).withColumn(
            "c_acctbal", F.lit(0.01)
        )
        ins = c.filter(F.col("c_custkey") % 501 == 0).select(
            (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
            F.lit("NEW").alias("c_mktsegment"),
            F.lit(42.42).alias("c_acctbal"),
        )
        dest.merge(upd.unionByName(ins))
        dest.delete_keys(
            c.filter(F.col("c_custkey") % 13 == 0).select("c_custkey")
        )
        snap = dest.read_snapshot(spark)
        return (
            snap.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                dsum("c_acctbal", "bal_sum", 2),
            )
            .orderBy("c_mktsegment")
            .localCheckpoint(eager=True)  # pin before the scratch sweep
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


O_Q176 = """
WITH eff AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 7 = 0 THEN 0.01 ELSE c_acctbal END
           AS c_acctbal
  FROM customer
  WHERE c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey + 10000000, 'NEW', 42.42
  FROM customer WHERE c_custkey % 501 = 0
)
SELECT c_mktsegment,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE)
         AS bal_sum
FROM eff
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

QUERIES["q176_orc_table_walk"] = q176_orc_table_walk
ORACLES["q176_orc_table_walk"] = O_Q176
