"""Cross-document duplicated-span detection — the substring-level
companion to whole-document near-dup (operators/dedup.py): find the
maximal word spans that appear verbatim in multiple documents, the
signal behind suffix-array training-data dedup (Lee et al., 2022,
"Deduplicating Training Data Makes Language Models Better" — their
ExactSubstr dedup removes repeated spans rather than whole documents).

Spark-first reduction: a distributed suffix array over 100 TB of text
is not the idiomatic plan; the equivalent signal is position-indexed
word ``n``-grams. A span of ``L >= n`` shared words produces ``L-n+1``
consecutive shared n-grams, so

    1. posexplode each doc's n-gram hash sequence   (O(total words))
    2. keep hashes seen in >= min_docs documents    (one groupBy)
    3. merge consecutive surviving positions        (one window)

recovers exactly the maximal shared-span structure (any shared span of
at least ``n`` words is found; spans shorter than ``n`` are below the
dedup threshold by definition — the same guarantee ExactSubstr gives
at its minimum match length).

Scale notes: the only shuffles are the n-gram-key groupBy and the
per-doc window; the n-gram STRING never rides either — positions carry
a codegen 64-bit xxhash64 (collision odds ~ #grams² / 2^64; the hash
is internal, so the oracle's own hashing need not match it).
The gram array is staged behind a projection boundary (the engine's
explode-inlining discipline), so gram construction is O(words), not
O(words²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def duplicate_ngram_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal word spans duplicated across >= ``min_docs`` documents.

    Returns one row per (document, maximal span):
    (``id_col``, span_start, span_end, span_words) with 1-based
    inclusive word positions (span_words = span_end - span_start + 1,
    always >= ``n``). Every word inside the span belongs to at least
    one n-gram that occurs in ``min_docs`` distinct documents.

    Tokenization is the corpus convention (single-space split) shared
    by the n-gram/decontamination operators, so span positions line up
    with their token indices.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = F.col("__toks")
    sz = F.size(toks)
    # 64-bit n-gram hash: shuffles carry 8 bytes, not strings. The
    # hash is INTERNAL (output exposes only positions), so the cheap
    # codegen xxhash64 is sound — the DuckDB oracle groups by its own
    # md5-based hash and the resulting spans are identical absent a
    # collision inside one corpus (~#grams²/2⁶⁴).
    gram64 = lambda i: F.xxhash64(  # noqa: E731
        F.concat_ws(" ", F.slice(toks, i, n))
    )
    from a2b_spark.operators.dedup import spread

    # spread before the per-row gram transform: heavy HOF work over a
    # one-split local scan would serialize on one core (no-op at real
    # scan widths — the kgram_hash_docs discipline)
    staged = (
        spread(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("__toks"))
        .filter(sz >= n)
        .select(
            id_col,
            F.transform(F.sequence(F.lit(1), sz - (n - 1)), gram64).alias("__gs"),
        )
    )
    # posexplode_OUTER + null filter: plain explode's size-filter
    # rewrite inlines the gram-transform per generated row (the
    # engine's explode pathology — see functions/vectors.py). Arrays
    # here are non-empty by the sz >= n filter, so outer adds no rows.
    pos = staged.select(
        id_col, F.posexplode_outer("__gs").alias("__p", "__g")
    ).filter(
        F.col("__g").isNotNull()
    )  # __p is the 0-based position of the gram's first word
    dup = (
        pos.groupBy("__g")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__g")
    )
    hits = pos.join(dup, "__g").select(id_col, "__p")
    # gaps-and-islands: consecutive duplicated gram positions chain
    # into one maximal span (overlapping n-grams share n-1 words)
    w = W.partitionBy(id_col).orderBy("__p")
    isl = (F.col("__p") - F.row_number().over(w)).alias("__isl")
    return (
        hits.select(id_col, "__p", isl)
        .groupBy(id_col, "__isl")
        .agg(
            (F.min("__p") + 1).cast("long").alias("span_start"),
            (F.max("__p") + n).cast("long").alias("span_end"),
            (F.max("__p") - F.min("__p") + n).cast("long").alias("span_words"),
        )
        .drop("__isl")
        .select(id_col, "span_start", "span_end", "span_words")
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """ExactSubstr-style span REMOVAL (the apply step over
    :func:`duplicate_ngram_spans`'s detection): every word covered by a
    duplicated n-gram is cut from all documents except the gram's
    KEEPER (the minimum ``id_col`` containing it), so exactly one copy
    of each duplicated span survives the corpus — Lee et al. 2022's
    dedup semantic, not whole-document dropping.

    Returns every document re-assembled:
    (``id_col``, clean_text, n_words, n_removed_words). Documents
    without removals pass through with n_removed_words = 0; ALL docs
    take the same tokenize→filter→reassemble path, so output text is
    single-space normalized (the corpus tokenization convention) and
    engine-portable.

    Scale shape: everything is linear in total tokens — position rows
    carry (doc, pos, hash64); removal positions explode ×n (gram →
    its n covered words) and aggregate straight into ONE cut-position
    set per affected document. The apply step is then a join of the
    docs frame against that (affected-docs-only) set plus in-row array
    algebra: kept positions = ``array_except(sequence(0, sz-1), cuts)``
    (hash-set membership, O(tokens) per doc, order-preserving), tokens
    re-assembled with a transform + concat_ws — no full-corpus word
    explode, no anti-join shuffle, no sort-based reassembly groupBy
    (the pre-round-5 formulation had all three). At sf0.1 the wall
    time barely moves (~2.4s → ~2.1s: gram construction dominates
    there), but the shuffle volume drops from O(total tokens) rows to
    gram hashes + per-doc cut sets — the part that matters at 100 TB.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = F.col("__toks")
    sz = F.size(toks)
    gram64 = lambda i: F.xxhash64(  # noqa: E731
        F.concat_ws(" ", F.slice(toks, i, n))
    )  # internal hash — see duplicate_ngram_spans
    from a2b_spark.operators.dedup import spread

    # spread before the gram transform and reassembly passes (both
    # heavy per row; one-split local scans otherwise serialize them)
    words = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    )
    staged = words.filter(sz >= n).select(
        id_col,
        F.transform(F.sequence(F.lit(1), sz - (n - 1)), gram64).alias("__gs"),
    )
    pos = staged.select(
        id_col, F.posexplode_outer("__gs").alias("__p", "__g")
    ).filter(F.col("__g").isNotNull())
    # duplicated grams and their keeper doc (min id holding the gram)
    dup = (
        pos.groupBy("__g")
        .agg(
            F.count_distinct(F.col(id_col)).alias("__nd"),
            F.min(F.col(id_col)).alias("__keeper"),
        )
        .filter(F.col("__nd") >= min_docs)
        .select("__g", "__keeper")
    )
    # positions to cut: non-keeper occurrences, expanded to the n words
    # each gram covers (0-based word positions p .. p+n-1), aggregated
    # into one deduped position set per affected doc — rows = affected
    # docs, not total cut words
    cuts_doc = (
        pos.join(dup, "__g")
        .filter(F.col(id_col) != F.col("__keeper"))
        .select(
            id_col,
            F.explode(F.sequence(F.col("__p"), F.col("__p") + (n - 1))).alias("__w"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__w").alias("__cuts"))
    )
    # apply in-row: array_except builds a hash set of the cut positions
    # and streams the (already-sorted) position sequence through it —
    # order-preserving, O(tokens + cuts) per doc
    keep_pos = F.array_except(
        F.sequence(F.lit(0), sz - 1),
        F.coalesce(F.col("__cuts"), F.array().cast("array<int>")),
    )
    # NULL-text docs: __toks is NULL, so keep_pos is NULL and size()
    # would be config-dependent (-1 legacy, NULL ANSI). Match the
    # oracle explicitly: clean_text '', n_words 0, n_removed NULL
    # (token count of a NULL text is undefined on both engines).
    n_kept = F.when(keep_pos.isNull(), F.lit(0)).otherwise(F.size(keep_pos))
    return words.join(cuts_doc, id_col, "left").select(
        F.col(id_col),
        F.concat_ws(
            " ", F.transform(keep_pos, lambda i: F.element_at(toks, i + 1))
        ).alias("clean_text"),
        n_kept.cast("long").alias("n_words"),
        F.when(toks.isNull(), F.lit(None))
        .otherwise(sz - n_kept)
        .cast("long")
        .alias("n_removed_words"),
    )
