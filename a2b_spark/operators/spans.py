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
a 64-bit md5 prefix (engine-portable, collision odds ~ #grams² / 2^60).
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
    # 64-bit md5 prefix of the n-gram — the engine's oracle-parity hash
    # idiom (rangejoin._bucket60): shuffles carry 8 bytes, not strings.
    gram64 = lambda i: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i, n))), 1, 15), 16, 10
    ).cast("long")
    staged = (
        df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__toks"))
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
    its n covered words, deduped per doc); the reassembly is one
    groupBy per doc with a sorted struct collect (array_sort +
    concat_ws, codegen). No window over the full corpus, no driver
    collects.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = F.col("__toks")
    sz = F.size(toks)
    gram64 = lambda i: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat_ws(" ", F.slice(toks, i, n))), 1, 15), 16, 10
    ).cast("long")
    words = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__toks"))
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
    # each gram covers (0-based word positions p .. p+n-1)
    cut = (
        pos.join(dup, "__g")
        .filter(F.col(id_col) != F.col("__keeper"))
        .select(id_col, F.explode(F.sequence(F.col("__p"), F.col("__p") + (n - 1))).alias("__w"))
        .distinct()
    )
    # every word of every doc, 0-based position
    allw = words.select(
        id_col, F.posexplode_outer("__toks").alias("__w", "__tok")
    ).filter(F.col("__tok").isNotNull())
    kept = allw.join(cut, [id_col, "__w"], "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("__w"), F.col("__tok")))),
                lambda s: s["__tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    )
    totals = words.select(id_col, sz.cast("long").alias("__total"))
    return (
        totals.join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_words", F.lit(0).cast("long")).alias("n_words"),
            (F.col("__total") - F.coalesce("n_words", F.lit(0).cast("long")))
            .cast("long")
            .alias("n_removed_words"),
        )
    )
