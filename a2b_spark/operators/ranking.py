"""Corpus-statistics ranking operators: TF-IDF term extraction and
BM25 keyword scoring — the relevance/quality primitives a training-data
pipeline runs over a document corpus (salient-term profiling, query
filtering, boilerplate down-ranking).

Reference parity: the reference has no ranking surface at all (its
relational work is delegated to the source database, SURVEY §2.4);
these are beyond-reference operators in the BASELINE.json north-star
set (text analysis), built the same Spark-first way as functions/text:
100 % built-in expressions — explode + two aggregations + a window —
so the whole thing is whole-stage codegen with map-side partial aggs.

Scale notes:
- Term statistics shuffle once on the token (docfreq) and once on
  (doc, token) (termfreq); both are classic word-count shapes that
  partial-aggregate before the exchange, so shuffle volume is bounded
  by distinct keys, not corpus tokens.
- The doc-frequency side is a per-term scalar table (vocabulary-sized);
  Catalyst/AQE broadcasts it when small, shuffle-joins when a 100 TB
  corpus makes the vocabulary huge. No driver collection anywhere.
- Determinism contract with the DuckDB oracles: scores divide exact
  integer counts and pass through ln() once; results are rounded to 6
  decimals (the same boundary convention as the cosine operators) and
  ties break on the term string ascending.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token) rows under the single-space tokenization contract."""
    return df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    )


def doc_term_freqs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf) rows computed ENTIRELY map-side: sort each
    document's token array and emit run-lengths via array HOFs —
    O(L log L) per doc inside codegen, zero shuffle. The classic
    explode + groupBy(id, token) word-count shape pays a full
    (doc, token) exchange for the same result; a document's tokens
    are already colocated in its row, so the aggregation never needed
    to cross partitions. Single-space tokenization contract (empties
    preserved) — identical rows to the exploded variant."""
    # stage each array as a REAL column referenced multiple times
    # downstream — CollapseProject declines to inline multiply-used
    # non-cheap aliases, so the sort runs once per row, not once per
    # lambda element (and explode's filter rewrite can't re-inline it
    # either — the q91/q40 lesson)
    # NULL text must drop the doc entirely, matching the exploded
    # variant (explode of a null array yields no rows). Without this,
    # non-ANSI sessions see size(null) == -1, sequence(0, -2) yields
    # [0, -1, -2], and the run-length machinery emits a phantom
    # (id, NULL, -1) row that corrupts downstream TF counts.
    staged = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.array_sort(F.split(F.col(text_col), " ")).alias("__ts"),
        )
        .select(
            F.col(id_col),
            F.col("__ts"),
            F.filter(
                F.sequence(F.lit(0), F.size("__ts") - 1),
                lambda i: (i == F.lit(0))
                | (F.get("__ts", i) != F.get("__ts", i - 1)),
            ).alias("__starts"),
        )
        .select(
            F.col(id_col),
            F.col("__ts"),
            F.col("__starts"),
            F.concat(
                F.slice(
                    F.col("__starts"),
                    F.lit(2),
                    F.greatest(F.size("__starts") - 1, F.lit(0)),
                ),
                F.array(F.size("__ts")),
            ).alias("__ends"),
        )
    )
    pairs = staged.select(
        F.col(id_col),
        F.explode_outer(
            F.zip_with(
                "__starts",
                "__ends",
                lambda s, e: F.struct(
                    F.get("__ts", s).alias("term"),
                    (e - s).cast("long").alias("tf"),
                ),
            )
        ).alias("p"),
    ).filter(F.col("p").isNotNull())
    return pairs.select(id_col, F.col("p.term").alias("token"), F.col("p.tf").alias("tf"))


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, top_k: int = 3
) -> DataFrame:
    """Top ``top_k`` most-salient terms per document by TF-IDF.

    tf = occurrences of the term in the doc (raw count);
    idf = ln(N / df) with df = number of docs containing the term.
    Output: (id, term, score rounded to 6, rank 1..top_k), rank by
    score desc then term asc — fully deterministic.

    Shuffle budget (round-7 rewrite; was 3 exchanges of the tf frame
    + a small dfreq exchange): per-doc tf is map-side
    (``doc_term_freqs`` — run-lengths over the sorted token array, no
    (doc, token) exchange), then ONE explicit repartition on the term
    satisfies BOTH the doc-frequency aggregation and the tf⋈df join
    (Catalyst sees hashpartitioning(term) and plans neither with a
    new exchange), and the per-doc top-k window is the second and
    last exchange. Hot-token groups (stopwords appear in every doc)
    stay sort-merge-safe and AQE splits skewed partitions."""
    n_docs = df.count()  # one scalar action; footer-stats cheap on parquet
    tf = doc_term_freqs(df, text_col, id_col).repartition(F.col("token"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "token").select(
        F.col(id_col),
        F.col("token").alias("term"),
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
            6,
        ).alias("score"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "term", "score", F.col("rank").cast("int").alias("rank"))
    )


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 ranking of documents against a bag of query terms
    (Robertson/Sparck Jones probabilistic relevance, the Lucene-default
    scoring shape). idf uses the standard smoothed form
    ln(1 + (N - df + 0.5)/(df + 0.5)); length normalization uses the
    single-space token count.

    Returns the ``top_k`` docs: (id, score rounded to 6, rank), ties
    broken by id ascending. Everything is two word-count aggregations
    + one broadcast-sized join against the per-term idf table — the
    query side is a literal list, so the per-doc work is a scan.
    """
    toks = _doc_tokens(df, text_col, id_col)
    doclen = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).cast("double").alias("dl")
    )
    # ONE scalar action for both corpus constants (n_docs + avgdl) —
    # two separate jobs would each rescan the doc table
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).first()
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    if not n_docs or avgdl is None:
        # empty corpus / all-null texts: no length norm exists — empty
        # top-k frame rather than a float(None) crash
        from pyspark.sql import types as T

        return df.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(id_col, df.schema[id_col].dataType),
                    T.StructField("score", T.DoubleType()),
                    T.StructField("rank", T.IntegerType()),
                ]
            ),
        )
    qt = [t for t in dict.fromkeys(query_terms)]  # dedup, keep order
    tf = (
        toks.filter(F.col("token").isin(qt))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contribution = (
        idf
        * (F.col("tf") * (F.lit(k1) + 1.0))
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl))))
    )
    # Per-term contributions are rounded then summed as DECIMAL: float
    # addition is order-dependent and Spark's partial aggregation order
    # is not the oracle's — exact decimal accumulation makes the score
    # independent of both engines' summation order.
    per_term = (
        tf.join(dfreq, "token")
        .join(doclen, id_col)
        .select(
            F.col(id_col),
            F.round(contribution, 7).cast("decimal(20,7)").alias("s"),
        )
    )
    scored = per_term.groupBy(id_col).agg(
        F.round(F.sum("s").cast("double"), 6).alias("score")
    )
    w = W.orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "score", F.col("rank").cast("int").alias("rank"))
    )


def unigram_surprisal(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document mean token surprisal under the corpus' own unigram
    LM — the classic cheap LM-quality signal for training-data
    curation (gibberish and boilerplate both sit far from the corpus
    mean; cf. CCNet's LM-perplexity filtering, which this approximates
    with a unigram model computable as pure SQL).

    p(w) = corpus_count(w) / corpus_tokens;
    surprisal(doc) = Σ_w tf(doc,w) · (-ln p(w)) / len(doc).

    Two word-count aggregations + one join against the vocabulary-
    sized count table (broadcast when small, shuffle when a 100 TB
    corpus makes it huge) — identical shuffle shape to tf-idf.

    Cross-engine determinism: after the one ln() per vocabulary entry,
    EVERYTHING is exact integer fixed-point. The per-token surprisal
    becomes an integer in 1e-7 nats (decimal-scaled, never a float
    multiply), the doc total is an integer SUM, and the mean is
    half-up integer division ((2s+n) div 2n) — engines cannot disagree
    on any rounding boundary the way double ROUND(x, 6) does (Spark
    rounds the exact BigDecimal; DuckDB rounds via a float multiply —
    measured 1e-6 flips on terminating means). Output:
    (id, n_tokens, surprisal_e7 = mean surprisal in 1e-7 nats).

    Caching contract (same as the dedup operators' _materialize): the
    token-count intermediates are pinned with an eager
    ``localCheckpoint`` — spillable blocks, freed when the returned
    DataFrame is garbage-collected, with nothing registered in the
    session cache manager, so repeated library calls in one session
    leak nothing (round-4 advice replaced the old persist +
    caller-must-clearCache contract)."""
    toks = _doc_tokens(df, text_col, id_col)
    # tf fans out (vocabulary counts + the per-doc aggregate) and the
    # scalar `total` is a separate eager action — without pinning,
    # the whole explode+count pipeline would run twice (exchange reuse
    # does not span actions). Same _materialize discipline as dedup.
    tf = (
        toks.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    counts = (
        tf.groupBy("token")
        .agg(F.sum("tf").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("cnt")).first()[0]
    if not total:
        # empty corpus / all-null texts: no LM exists — empty frame
        # rather than float(None) below (same guard as bm25_scores)
        from pyspark.sql import types as T

        return df.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(id_col, df.schema[id_col].dataType),
                    T.StructField("n_tokens", T.LongType()),
                    T.StructField("surprisal_e7", T.LongType()),
                ]
            ),
        )
    i7 = (
        F.round(-F.log(F.col("cnt").cast("double") / F.lit(float(total))), 7)
        .cast("decimal(20,7)")
        * 10_000_000
    ).cast("long")
    per_doc = (
        tf.join(counts, "token")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("tf")).cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * i7).cast("long").alias("s7"),
        )
    )
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        F.expr("(2 * s7 + n_tokens) div (2 * n_tokens)").cast("long").alias("surprisal_e7"),
    )
