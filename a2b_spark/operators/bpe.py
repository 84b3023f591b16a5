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
3. per aggregation round: count adjacent symbol pairs weighted by
   word frequency (explode + groupBy-sum with map-side partials),
   rank DETERMINISTICALLY (max count, then lexicographic pair — the
   tie-break makes training reproducible across partitionings), and
   accept a BATCH of merges from the top of the ranking (below),
   applying them all in one pass over the word table. Only the top
   rows are ever collected; the word table stays distributed and is
   localCheckpoint-ed periodically so 50k-merge lineages don't
   accumulate 50k stacked plans.

Merge batching (the round-12 scale fix — a production tokenizer is
30k-50k merges, and one aggregation per merge is 30k-50k sequential
Spark jobs): each round accepts the maximal CONSECUTIVE prefix of the
ranking that is pairwise non-interacting, then trims it to candidates
whose count STRICTLY dominates every unaccepted pair (rank-1 is
always safe — it is the argmax regardless). "Interacting" means
sharing a symbol, or one pair's concatenation appearing as the
other's symbol — any channel by which applying one merge could
change the other's count. The strict-dominance trim handles the rest:
pairs that interact with an accepted merge can only DECREASE, and
pairs newly CREATED by an accepted merge are count-bounded by an
interacting parent, so a candidate strictly above all of them is
exactly what the per-merge recount would have picked. Batched
training is therefore merge-for-merge IDENTICAL to sequential
(pinned in pytest on tie-heavy corpora, where ties force k=1 rounds
— the guard degrades to the sequential algorithm, never past it).

Two-tier training (the round-13 completion of that fix): classic BPE
training consumes NOTHING but the (word, freq) table, so when the
corpus's DISTINCT word count fits ``local_word_cap`` the table is
collected once and trained EXACTLY on the driver with the standard
incremental-pair-count algorithm (inverted pair→words index + lazy
max-heap — each merge touches only the words containing it). A 100 TB
corpus still pays exactly ONE distributed pass (the word count);
30k–50k merges then run at in-memory speed instead of 30k–50k Spark
jobs. The local trainer is merge-for-merge identical to the
distributed loop (same counting: every adjacency, overlaps included,
freq-weighted; same leftmost non-overlapping apply; same
max-count-then-lexicographic tie-break) — pinned in pytest on
tie-heavy and random corpora against both the distributed path and
the independent reference. Only a corpus whose distinct-word table
exceeds the cap (hapax-heavy web crawls before normalization) takes
the distributed batched-round path below.

Cost model (distributed tier): ``ceil(n_merges / accepted-per-round)``
rounds × (one aggregation over the distinct-word table). On Zipf
corpora the distinct-count head batches merges per round (measured in
SCALE_TRAJECTORY ``bpe.batched_1000``); at web scale the word table
is ~10⁸ rows — each round is seconds on a real cluster, and NOTHING
rescans the corpus after step 1.

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

from typing import Iterator, Optional, Sequence

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


def _accept_merge_batch(
    rows, tail_bound: int, k_max: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """The sequential-exactness guard (module docstring): from the
    ranked (a, b, n) rows, accept the maximal consecutive
    non-interacting prefix, then trim to counts STRICTLY above every
    unaccepted pair's possible count (``tail_bound`` bounds the
    uncollected tail). Rank-1 survives unconditionally — it is the
    round's argmax no matter what the other merges do."""
    accepted: list[tuple[str, str, int]] = []
    syms: set[str] = set()
    made: set[str] = set()
    stop_count = 0
    for a, b, n in rows:
        if n < min_pair_count:
            # nothing below qualifies now, and interacting pairs down
            # here stay strictly under every accepted count
            break
        if len(accepted) == k_max:
            stop_count = n
            break
        if (
            a in syms or b in syms          # shares a symbol
            or a in made or b in made       # an accepted concat IS a symbol
            or (a + b) in syms              # this concat IS an accepted symbol
        ):
            stop_count = n                  # first interaction stops the batch
            break
        accepted.append((a, b, n))
        syms.update((a, b))
        made.add(a + b)
    if not accepted:
        return []
    bound = max(tail_bound, stop_count)
    head, rest = accepted[0], accepted[1:]
    return [(head[0], head[1])] + [
        (a, b) for a, b, n in rest if n > bound
    ]


def _word_adjacent_pairs(syms: list[str]) -> list[tuple[str, str]]:
    """Every adjacency of the symbol sequence, overlaps included —
    the exact multiset the distributed zip_with/explode counts."""
    return [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]


def _apply_merge_seq(syms: list[str], a: str, b: str) -> list[str]:
    """Leftmost non-overlapping merge of (a, b), the same pass the
    distributed apply_merges UDF makes."""
    merged = a + b
    res: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            res.append(merged)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return res


def _train_local(
    word_freqs: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Exact in-memory BPE on a collected (word, freq) table: inverted
    pair→word-ids index + lazy-invalidation max-heap, so each merge
    costs O(words containing the pair), not a corpus pass. Identical
    semantics to the distributed loop (module docstring)."""
    import heapq

    words: list[tuple[list[str], int]] = [
        (list(w) + [_EOW], f) for w, f in word_freqs
    ]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set] = {}
    for idx, (syms, f) in enumerate(words):
        for p in _word_adjacent_pairs(syms):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(idx)
    heap = [(-n, a, b) for (a, b), n in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negn, a, b = heapq.heappop(heap)
        live = pair_counts.get((a, b), 0)
        if -negn != live:
            if live > 0:
                heapq.heappush(heap, (-live, a, b))  # stale: reinsert live
            continue
        if live < min_pair_count:
            break  # heap max is the global max: nothing qualifies
        merges.append((a, b))
        touched: set = set()
        for idx in sorted(pair_words.get((a, b), ())):
            syms, f = words[idx]
            old = _word_adjacent_pairs(syms)
            for p in set(old):
                pair_words.get(p, set()).discard(idx)
            for p in old:
                pair_counts[p] = pair_counts.get(p, 0) - f
                touched.add(p)
            new_syms = _apply_merge_seq(syms, a, b)
            new = _word_adjacent_pairs(new_syms)
            for p in new:
                pair_counts[p] = pair_counts.get(p, 0) + f
                touched.add(p)
            for p in set(new):
                pair_words.setdefault(p, set()).add(idx)
            words[idx] = (new_syms, f)
        for p in touched:
            c = pair_counts.get(p, 0)
            if c <= 0:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
            else:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_pair_count: int = 2,
    checkpoint_every: int = 10,
    batch_merges: int = 64,
    stats_out: Optional[dict] = None,
    local_word_cap: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merge rules from the corpus.
    Returns the ordered merge list (rank = position). Stops early when
    no pair reaches ``min_pair_count``. Deterministic: ties break on
    the lexicographically smallest (first, second) pair.

    ``local_word_cap``: when the corpus's distinct-word table has at
    most this many rows it is collected (the result of the single
    corpus pass — a few tens of MB at the default) and trained EXACTLY
    on the driver (module docstring: the merge list is identical to
    the distributed loop's, and production-size merge counts run at
    in-memory speed). 0 disables the local tier.

    ``batch_merges`` caps how many merges one aggregation round of the
    DISTRIBUTED tier may accept (module docstring: the accepted batch
    is provably what per-merge recounting would have picked, so any
    value returns the IDENTICAL merge list — 1 forces the classic
    one-aggregation-per-merge loop). ``stats_out``, if given, receives
    ``{"rounds": ..., "merges": ..., "mode": "local"|"distributed"}``
    for cost instrumentation (the local tier reports rounds=0: it runs
    no per-round Spark jobs)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if batch_merges < 1:
        raise ValueError(f"batch_merges must be >= 1, got {batch_merges}")
    if local_word_cap < 0:
        raise ValueError(
            f"local_word_cap must be >= 0, got {local_word_cap}"
        )

    word_freqs = _word_freqs(df, text_col)
    if local_word_cap:
        # pin the word table so the cap probe and (on over-cap
        # fallthrough) the distributed tier share ONE corpus pass —
        # the module's "corpus touched exactly once" contract must
        # hold on the fallback path too
        word_freqs = word_freqs.localCheckpoint(eager=True)
        head = word_freqs.limit(local_word_cap + 1).collect()
        if len(head) <= local_word_cap:
            merges = _train_local(
                [(r["word"], int(r["freq"])) for r in head],
                n_merges,
                min_pair_count,
            )
            if stats_out is not None:
                stats_out["rounds"] = 0
                stats_out["merges"] = len(merges)
                stats_out["mode"] = "local"
            return merges
        # over the cap: fall through to the distributed tier

    words = word_freqs.withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""),  # chars
            F.array(F.lit(_EOW)),
        ),
    )
    words = words.localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    rounds = 0
    applied_since_checkpoint = 0
    while len(merges) < n_merges:
        rounds += 1
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
        k_max = min(batch_merges, n_merges - len(merges))
        # collect enough ranking to both fill the batch and bound the
        # tail (tail pairs can interact; accepted counts must strictly
        # beat them, so the M-th count is the conservative bound)
        m = k_max * 4 + 32
        top = (
            pairs.orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .limit(m)
            .collect()
        )
        rows = [(r["p"]["a"], r["p"]["b"], int(r["n"])) for r in top]
        tail_bound = rows[-1][2] if len(rows) == m else 0
        batch = _accept_merge_batch(rows, tail_bound, k_max, min_pair_count)
        if not batch:
            break
        merges.extend(batch)

        merge_seq = list(batch)  # bind for the closure

        @F.pandas_udf("array<string>")
        def apply_merges(syms_s, _seq=merge_seq):
            import pandas as pd

            out = []
            for syms in syms_s:
                syms = list(syms)
                for a, b in _seq:
                    merged = a + b
                    i = 0
                    res = []
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and syms[i] == a
                            and syms[i + 1] == b
                        ):
                            res.append(merged)
                            i += 2
                        else:
                            res.append(syms[i])
                            i += 1
                    syms = res
                out.append(syms)
            return pd.Series(out)

        words = words.withColumn("syms", apply_merges("syms"))
        applied_since_checkpoint += 1
        if applied_since_checkpoint >= checkpoint_every:
            # cut the stacked-plan lineage before it dominates runtime
            words = words.localCheckpoint(eager=True)
            applied_since_checkpoint = 0
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["merges"] = len(merges)
        stats_out["mode"] = "distributed"
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
