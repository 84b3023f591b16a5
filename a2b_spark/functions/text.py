"""Text-analysis column expressions — all Catalyst built-ins (JVM,
whole-stage codegen); no Python UDFs anywhere on this path, so these
run at full scan speed over 100 TB of documents.

Cross-engine parity notes (the DuckDB oracles mirror these exactly):
- tokenization = split on a single space (matches string_split);
- word n-gram shingles are distinct, space-joined;
- ratios are double divisions of exact integer counts → bit-identical
  across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword/marker profiles for the heuristic
# language-ID (n-gram/marker approach; deterministic, SQL-mirrorable).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "les", "des", "est"],
    "de": ["der", "die", "und", "ist"],
}

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def word_tokens(col) -> Column:
    """Single-space tokenization (parity with DuckDB string_split)."""
    return F.split(col if isinstance(col, Column) else F.col(col), " ")


def token_count(col) -> Column:
    return F.size(word_tokens(col)).cast("long")


def punct_count(col) -> Column:
    return F.regexp_count(col if isinstance(col, Column) else F.col(col), F.lit(r"[.,!?;:]")).cast("long")


def _word_match_re(words: list[str]) -> str:
    """Regex counting occurrences of any of ``words`` as a whole
    space-delimited token — exactly token-equality counting under
    single-space tokenization (the lookarounds consume no separator, so
    adjacent matches like 'of the' both count). One codegen'd regex
    pass over the raw string replaces an interpreted per-token
    higher-order-function filter (HOF lambdas sit outside whole-stage
    codegen; this was q24's 13s-at-sf0.1 hot spot)."""
    import re as _re

    alts = "|".join(_re.escape(w) for w in words)
    # \z, not $: Java's $ (without MULTILINE) also matches BEFORE a
    # trailing line terminator, so 'the\n' — a distinct token under
    # space-splitting — would count as 'the' and diverge from the
    # oracles' list_contains counting. \z is end-of-input only.
    return rf"(?<=^| )(?:{alts})(?= |\z)"


def stopword_count(col, stopwords: list[str] | None = None) -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    return F.regexp_count(c, F.lit(_word_match_re(stopwords or STOPWORDS))).cast("long")


def quality_features(col) -> dict[str, Column]:
    """Document quality signals: length, token stats, punctuation and
    stopword ratios, mean word length. All exact-integer-derived.
    Empty text defines punct_ratio as 0.0 (guarded — under ANSI mode
    the bare 0/0 division RAISES, it doesn't NULL); n_words is always
    ≥ 1 (split('') = ['']), so the other ratios cannot hit zero."""
    toks = word_tokens(col)
    n_words = F.size(toks).cast("long")
    n_chars = F.length(col).cast("long")
    punct_ratio = F.when(
        n_chars > 0, punct_count(col).cast("double") / n_chars.cast("double")
    ).otherwise(F.when(n_chars == 0, F.lit(0.0)))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_distinct_words": F.size(F.array_distinct(toks)).cast("long"),
        "punct_ratio": punct_ratio,
        "stopword_ratio": stopword_count(col).cast("double") / n_words.cast("double"),
        "avg_word_len": (n_chars - (n_words - 1)).cast("double") / n_words.cast("double"),
    }


def lang_id(col) -> Column:
    """Heuristic language ID: CJK character presence wins, else the
    marker-profile argmax (ties resolved in fixed en>es>fr>de order).

    Single-evaluation formulation: one (score, priority, lang) struct
    per language inside array_max — struct ordering compares score
    first, then priority, so the max element is the strict argmax with
    ties going to the earlier language. The previous chained-``when``
    version re-embedded the whole score struct at every comparison,
    blowing the codegen tree up (the 63s q24 outlier in BENCH_r02).
    Scores are one regexp_count pass per language (_word_match_re);
    CJK presence is ``rlike`` (first-match short-circuit)."""
    c = col if isinstance(col, Column) else F.col(col)
    langs = list(LANG_MARKERS)
    entries = []
    for prio, lang in enumerate(langs):
        score = F.regexp_count(c, F.lit(_word_match_re(LANG_MARKERS[lang])))
        entries.append(
            F.struct(
                score.alias("score"),
                F.lit(len(langs) - prio).alias("prio"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*entries))["lang"]
    return F.when(c.rlike(r"[一-鿿]"), F.lit("zh")).otherwise(best)


def normalize_text(col) -> Column:
    """Canonical text normalization for dedup/training prep: lowercase,
    collapse whitespace runs to one space, trim, strip control chars.
    Pure codegen (two regexp_replace + lower + trim) — scan speed; the
    same normalization fingerprint() applies before hashing, exposed
    as a standalone column for pipelines that materialize the cleaned
    text itself."""
    c = col if isinstance(col, Column) else F.col(col)
    c = F.regexp_replace(c, r"[\x00-\x1f]", " ")
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def fingerprint(col) -> Column:
    """Deterministic document fingerprint: md5 over the
    whitespace-normalized lowercase text (portable across engines)."""
    norm = F.lower(F.trim(F.regexp_replace(col if isinstance(col, Column) else F.col(col), r"\s+", " ")))
    return F.md5(norm)


# GPT-2-style pre-tokenization pattern (Radford et al. 2019; the
# regex BPE pipelines split on before merging): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, residual
# whitespace. Restricted to constructs with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): \p{L}/\p{N} classes,
# non-capturing groups, leftmost-first alternation.
BPE_SPLIT_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+"
    r"|\s+"
)


def bpe_ish_tokens(col) -> Column:
    """Array of GPT-2-style pre-tokens — the realistic proxy for 'how
    many BPE tokens will this doc cost' (each pre-token maps to >=1
    BPE merge-table tokens; pre-token count is the standard cheap
    budget estimate). One codegen regexp pass, scan speed."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), 0)


# PII patterns: kept to constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB) — character classes, bounded repeats,
# \b word boundaries; no backrefs or lookarounds.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    (r"\b\+?\d[\d\-() ]{7,}\d\b", "[PHONE]"),
]


def redact_pii(col) -> Column:
    """Rule-based PII redaction (emails → [EMAIL], IPv4 → [IP],
    phone-shaped digit runs → [PHONE]) — the standard pre-training
    scrub pass (cf. C4/Dolma pipeline rules). Pure codegen: three
    chained regexp_replace, scan speed at 100 TB; patterns are
    dialect-portable so the DuckDB oracle applies the identical rules.
    Order matters (emails before phones, so digits inside an address
    are already consumed); extend PII_PATTERNS for more rules."""
    c = col if isinstance(col, Column) else F.col(col)
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def repetition_stats(df, text_col: str, id_col: str):
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    the Dolma/RedPajama filter set): documents dominated by repeated
    fragments are low-quality training text.

    Returns (id, n_words, dup_word_ratio, top_bigram,
    top_bigram_char_ratio):
    - dup_word_ratio: fraction of word occurrences that are repeats
      (1 - distinct/total);
    - top_bigram_char_ratio: chars covered by ALL occurrences of the
      most frequent word bigram / total chars (ties: lexicographically
      first bigram — deterministic across engines).

    Scale shape: bigram counting is explode → groupBy(doc, bigram) →
    per-doc top-1 window — the word-count shape with map-side partial
    aggregation; the per-doc scalars ride a broadcast-or-shuffle join
    keyed by doc id. The token array is staged behind a projection
    boundary, and bigrams are built as zip_with of two shifted slices
    (two array copies per doc) — the indexed transform(sequence, i ->
    slice(toks, i, 2)) form re-slices per index and measured 3.3×
    slower at sf0.1 (same lesson as winnow_fingerprints)."""
    from pyspark.sql import Window as W

    toked = df.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("__toks"),
        F.length(F.col(text_col)).cast("long").alias("__nc"),
    )
    t = F.col("__toks")
    nw = F.size(t)
    base = toked.select(
        F.col(id_col),
        nw.cast("long").alias("n_words"),
        (
            (nw - F.size(F.array_distinct(t))).cast("double")
            / nw.cast("double")
        ).alias("dup_word_ratio"),
        F.col("__nc"),
        F.when(
            nw >= 2,
            F.zip_with(
                F.slice(t, 1, nw - 1),
                F.slice(t, 2, nw - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__bgs"),
    )
    # explode_OUTER + null filter: plain explode's size-filter rewrite
    # re-evaluates the zip_with bigram expression per generated row
    # (the explode pathology) — measured 2.2× slower at sf0.1
    counts = (
        base.select(F.col(id_col), F.explode_outer("__bgs").alias("bg"))
        .filter(F.col("bg").isNotNull())
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy(id_col).orderBy(F.desc("n"), F.asc("bg"))
    top = (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("bg").alias("top_bigram"), F.col("n").alias("__tn"))
    )
    return (
        base.join(top, id_col, "left")
        .select(
            F.col(id_col),
            "n_words",
            "dup_word_ratio",
            F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
            # zero-length text would be 0/0 — NULL in Spark, NaN in the
            # DuckDB oracle; define it as 0.0 in both
            F.when(
                F.col("__nc") > 0,
                F.coalesce(
                    F.col("__tn") * F.length("top_bigram"), F.lit(0)
                ).cast("double")
                / F.col("__nc").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("top_bigram_char_ratio"),
        )
    )


def winnow_fingerprints(df, text_col: str, id_col: str, k: int = 5, w: int = 4):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every word k-gram (rolling-window content hash),
    then keep the minimum hash of each window of ``w`` consecutive
    k-gram hashes. Guarantees any shared run of ≥ k+w-1 tokens between
    two documents shares a fingerprint — position-robust plagiarism /
    near-copy detection, O(tokens·w) per doc.

    Returns ``df`` reduced to (id_col, fps sorted distinct array<long>).

    Performance shape (measured at sf0.1, 32 cores):
    - the k-gram array is materialized behind a projection boundary;
      a single nested expression re-evaluates the whole k-gram
      transform per window index — O(n²) per doc, 100s vs 5s.
    - the sliding-window min is the elementwise least of ``w`` shifted
      slices (zip_with chain), not array_min over per-index slices —
      no per-window array copies, 103s → 2s.
    The k-gram hash is the top-60-bits-of-md5 idiom shared with
    simhash's md5 mode, keeping the operator ANSI-SQL-expressible for
    the oracle.

    Short docs: < k tokens → one whole-doc k-gram; < w k-grams the
    shifted slices degenerate to the global min (both standard
    winnowing edge conventions — and the zip_with chain yields them
    with no special-casing: least() skips the nulls that pad shorter
    shifted arrays).
    """
    def h(s: Column) -> Column:
        return F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

    from a2b_spark.operators.dedup import spread

    # __toks materialized first: the k-gram lambda is interpreted per
    # index with no CSE, so slicing split(text) directly would re-split
    # the whole document per k-gram — O(L²) per doc (same staging as
    # kgram_hash_docs). spread() first: the per-doc k-gram + w-window
    # min work is heavy per row and a small local scan is one split
    # (measured 1.5s single-task at sf0.1); no-op at real scan widths.
    toked = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)
    kgrams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: h(F.concat_ws(" ", F.slice(toks, i, k))),
        ),
    ).otherwise(F.array(h(F.concat_ws(" ", toks))))
    staged = toked.select(F.col(id_col), kgrams.alias("__kg"))
    m = F.size(F.col("__kg"))
    L = F.greatest(m - (w - 1), F.lit(1))
    mins = F.slice(F.col("__kg"), 1, L)
    for j in range(1, w):
        mins = F.zip_with(
            mins, F.slice(F.col("__kg"), j + 1, L), lambda a, b: F.least(a, b)
        )
    return staged.select(
        F.col(id_col), F.array_sort(F.array_distinct(mins)).alias("fps")
    )
