"""Byte-pair-encoding tokenizer: distributed training + apply.

The tokenizer is the LLM pipeline's most load-bearing text operator —
token counts gate packing, pricing, and mixture weights — and a
counting-based trainer is exactly the shape Spark does well
(reference scope: pure extension; the A2B reference has no tokenizer).

Training (classic Sennrich-style word-frequency BPE):

1. corpus → DISTINCT word frequencies (one shuffle; Zipf makes this
   table orders of magnitude smaller than the corpus — the 100 TB
   corpus is touched exactly once),
2. each word → symbol sequence (chars + ``</w>`` terminator),
3. per merge round: count adjacent symbol pairs weighted by word
   frequency (explode + groupBy-sum with map-side partials), pick the
   winner DETERMINISTICALLY (max count, then lexicographic pair — the
   tie-break makes training reproducible across partitionings), and
   apply the merge to the word table. Only the single winner row is
   ever collected; the word table stays distributed and is
   localCheckpoint-ed periodically so 500-merge lineages don't
   accumulate 500 stacked plans.

Cost model: ``n_merges`` rounds × (one aggregation over the distinct-
word table). At web scale the word table is ~10⁸ rows — each round is
seconds on a real cluster, and NOTHING rescans the corpus after step 1.

Apply (``bpe_encode``) is a pure Arrow-batched map with the merge
ranks broadcast in the closure: per word, repeatedly merge the
lowest-rank adjacent pair (the canonical greedy algorithm), memoized
per distinct word within a batch. No shuffle.

Training is not SQL-expressible (iterative argmax); its contract is
pinned in pytest against an independent single-process reference
implementation, merge-for-merge, on tie-heavy corpora. The apply path
IS oracle-checkable with a fixed merge table on rule-derived text
(q162)."""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


def _word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """corpus → (word, freq): the single full-corpus pass."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_pair_count: int = 2,
    checkpoint_every: int = 10,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merge rules from the corpus.
    Returns the ordered merge list (rank = position). Stops early when
    no pair reaches ``min_pair_count``. Deterministic: ties break on
    the lexicographically smallest (first, second) pair."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")

    words = _word_freqs(df, text_col).withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""),  # chars
            F.array(F.lit(_EOW)),
        ),
    )
    words = words.localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for r in range(n_merges):
        pairs = (
            words.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("n"))
        )
        top = (
            pairs.orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))

        merged = a + b

        @F.pandas_udf("array<string>")
        def apply_merge(syms_s):
            import pandas as pd

            out = []
            for syms in syms_s:
                syms = list(syms)
                i = 0
                res = []
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            return pd.Series(out)

        words = words.withColumn("syms", apply_merge("syms"))
        if (r + 1) % checkpoint_every == 0:
            # cut the stacked-plan lineage before it dominates runtime
            words = words.localCheckpoint(eager=True)
    return merges


def _encode_word(word: str, ranks: dict) -> list[str]:
    """Canonical greedy BPE: repeatedly merge the lowest-rank pair."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best = None
        best_rank = None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best, best_rank = i, rk
        if best is None:
            break
        # merge EVERY occurrence of that pair left-to-right
        a, b = syms[best], syms[best + 1]
        res = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    id_col: str,
    batch_rows: int = 1024,
) -> DataFrame:
    """Apply a merge list: (id, text) → (doc_id, tokens array<string>,
    n_tokens). Pure Arrow-batched map (ranks ride the closure; words
    memoize per batch — Zipf means most lookups hit the cache)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in it:
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s : s + batch_rows]
                rows = []
                for did, text in zip(chunk[id_col], chunk[text_col]):
                    toks: list[str] = []
                    for w in str(text).split(" "):
                        if not w:
                            continue
                        enc = cache.get(w)
                        if enc is None:
                            enc = _encode_word(w, ranks)
                            cache[w] = enc
                        toks.extend(enc)
                    rows.append((int(did), toks, len(toks)))
                yield pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tokens"])

    return (
        df.select(id_col, text_col)
        .filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
        .mapInPandas(
            batches, schema="doc_id long, tokens array<string>, n_tokens long"
        )
    )
