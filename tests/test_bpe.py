"""Distributed BPE (operators/bpe.py) against an INDEPENDENT single-
process reference implementation: merge-for-merge training equality on
tie-heavy corpora, partitioning invariance, early stop, and the encode
contract."""

import pytest
from pyspark.sql import functions as F

from a2b_spark.operators.bpe import _EOW, bpe_encode, bpe_train


# ---- reference implementation (dict-based, written independently of
# the Spark path: same SPEC — word-frequency BPE, overlap-counting
# pair stats, (count desc, pair lexicographic) winner, left-to-right
# merge application — different code)
def _ref_train(texts, n_merges, min_pair_count=2):
    from collections import Counter

    freqs = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: list(w) + [_EOW] for w in freqs}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        pair = min(stats, key=lambda p: (-stats[p], p))
        if stats[pair] < min_pair_count:
            break
        merges.append(pair)
        a, b = pair
        for w, syms in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = res
    return merges


def _ref_encode(word, merges):
    ranks = {m: i for i, m in enumerate(merges)}
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        cands = [
            (ranks[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not cands:
            break
        _, i = min(cands)
        a, b = syms[i], syms[i + 1]
        res, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                res.append(a + b)
                j += 2
            else:
                res.append(syms[j])
                j += 1
        syms = res
    return syms


_CORPUS = [
    "the cat sat on the mat",
    "the cats sat",
    "a hat on a mat",
    "ab ab cd cd",  # exact tie: (a,b) vs (c,d) — lexicographic break
    "banana bandana",
    "aaa aaaa aaaaa",  # overlap counting
    "the the the",
]


def test_training_matches_reference_merge_for_merge(spark):
    df = spark.createDataFrame([(t,) for t in _CORPUS], "text string")
    want = _ref_train(_CORPUS, 30)
    # BOTH tiers: the default (local — the word table fits the cap)
    # and the forced distributed loop must match the reference exactly
    local_stats: dict = {}
    got = bpe_train(df, "text", n_merges=30, stats_out=local_stats)
    assert got == want
    assert local_stats["mode"] == "local" and local_stats["rounds"] == 0
    dist_stats: dict = {}
    got_dist = bpe_train(
        df, "text", n_merges=30, local_word_cap=0, stats_out=dist_stats
    )
    assert got_dist == want
    assert dist_stats["mode"] == "distributed"
    assert len(got) > 10  # the corpus genuinely supports many merges
    # the tie case resolved lexicographically at its round
    assert ("a", "b") in got and ("c", "d") in got
    assert got.index(("a", "b")) < got.index(("c", "d"))


def test_training_is_partitioning_invariant(spark):
    # forced distributed tier: the local tier is trivially invariant
    df1 = spark.createDataFrame([(t,) for t in _CORPUS], "text string").coalesce(1)
    df8 = spark.createDataFrame(
        [(t,) for t in _CORPUS * 3], "text string"
    ).repartition(8)
    m1 = bpe_train(df1, "text", n_merges=12, local_word_cap=0)
    m8 = bpe_train(df8, "text", n_merges=12, local_word_cap=0)
    # tripling every document scales all counts uniformly → same merges
    assert m1 == m8


def test_early_stop_and_validation(spark):
    df = spark.createDataFrame([("x y z",)], "text string")
    # every pair occurs once < min_pair_count=2 → no merges, both tiers
    assert bpe_train(df, "text", n_merges=5) == []
    assert bpe_train(df, "text", n_merges=5, local_word_cap=0) == []
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, "text", n_merges=0)
    with pytest.raises(ValueError, match="batch_merges"):
        bpe_train(df, "text", n_merges=5, batch_merges=0)
    with pytest.raises(ValueError, match="local_word_cap"):
        bpe_train(df, "text", n_merges=5, local_word_cap=-1)


def test_local_cap_fallback_is_seamless(spark):
    """A distinct-word table over the cap silently takes the
    distributed tier and still returns the identical merge list."""
    df = spark.createDataFrame([(t,) for t in _CORPUS], "text string")
    over: dict = {}
    got = bpe_train(
        df, "text", n_merges=15, local_word_cap=3, stats_out=over
    )
    assert over["mode"] == "distributed"
    assert got == _ref_train(_CORPUS, 15)


def test_batched_training_identical_to_sequential(spark):
    """Merge batching is a COST optimization, never a semantic one:
    batch_merges=1 (the classic one-aggregation-per-merge loop) and
    batch_merges=64 must produce the identical merge list — on the
    tie-heavy fixture (ties force the strict-dominance guard down to
    k=1 rounds) AND on a seeded random corpus whose Zipf-ish head
    actually batches (fewer aggregation rounds than merges, which is
    the whole point)."""
    import random

    rng = random.Random(13)
    random_corpus = [
        " ".join(
            "".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 7)))
            for _ in range(rng.randint(3, 12))
        )
        for _ in range(300)
    ]

    for corpus, n in ((_CORPUS, 25), (random_corpus, 40)):
        df = spark.createDataFrame([(t,) for t in corpus], "text string")
        seq_stats: dict = {}
        bat_stats: dict = {}
        seq = bpe_train(
            df, "text", n_merges=n, batch_merges=1, stats_out=seq_stats,
            local_word_cap=0,
        )
        bat = bpe_train(
            df, "text", n_merges=n, batch_merges=64, stats_out=bat_stats,
            local_word_cap=0,
        )
        assert bat == seq == _ref_train(corpus, n)
        # and the LOCAL tier produces the same list again
        assert bpe_train(df, "text", n_merges=n) == seq
        # classic loop: 1 round per merge (+1 if the stop round found
        # nothing above min_pair_count)
        assert seq_stats["rounds"] in (len(seq), len(seq) + 1)
        assert bat_stats["rounds"] <= seq_stats["rounds"]
    # the random corpus must genuinely batch, not degrade to k=1
    assert bat_stats["rounds"] < len(bat)


def test_encode_matches_reference_and_counts(spark):
    merges = _ref_train(_CORPUS, 20)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bpe_encode(df, "text", merges, "doc_id").collect()}
    for i, t in enumerate(_CORPUS):
        want = [s for w in t.split(" ") if w for s in _ref_encode(w, merges)]
        assert out[i]["tokens"] == want
        assert out[i]["n_tokens"] == len(want)
    # untrained text still tokenizes (falls back toward chars)
    odd = spark.createDataFrame([(9, "zq")], "doc_id long, text string")
    r = bpe_encode(odd, "text", merges, "doc_id").collect()[0]
    assert r["tokens"] == ["z", "q", _EOW] or r["tokens"][-1].endswith(_EOW)


def test_bpe_export_import_roundtrip_identical_encode(spark, tmp_path):
    """Interop contract (round-11): train → export → import → the
    imported merges encode a fixture corpus IDENTICALLY, and the
    vocab covers every emitted token (the artifact an external
    trainer consumes is self-contained)."""
    from a2b_spark.operators.bpe import bpe_encode, bpe_train
    from a2b_spark.operators.bpe_io import (
        bpe_alphabet,
        bpe_export,
        bpe_import,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["low lower lowest", "new newer newest", "low new low",
             "wider wide widest", "low lowest newer"] * 3)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, "text", n_merges=25)
    assert merges
    alpha = bpe_alphabet(docs, "text")
    out = str(tmp_path / "tok")
    vocab = bpe_export(merges, out, alpha)
    merges2, vocab2 = bpe_import(out)
    assert merges2 == merges
    assert vocab2 == vocab
    enc1 = {r.doc_id: r.tokens
            for r in bpe_encode(docs, "text", merges, "doc_id").collect()}
    enc2 = {r.doc_id: r.tokens
            for r in bpe_encode(docs, "text", merges2, "doc_id").collect()}
    assert enc1 == enc2
    emitted = {t for toks in enc1.values() for t in toks}
    assert emitted <= set(vocab), emitted - set(vocab)
    # deterministic id layout: alphabet block then rank order
    assert vocab[sorted(set(alpha) | {"</w>"})[0]] == 0
    ids = [vocab[a + b] for a, b in merges if (a + b) in vocab]
    assert ids == sorted(ids)


def test_bpe_io_error_paths(tmp_path):
    import pytest as _pytest

    from a2b_spark.operators.bpe_io import bpe_export, bpe_import

    with _pytest.raises(ValueError, match="whitespace"):
        bpe_export([("a b", "c")], str(tmp_path / "x"), ["a", "b", "c"])
    d = str(tmp_path / "y")
    bpe_export([("a", "b")], d, ["a", "b"])
    # corrupt: merges references a symbol the vocab lacks
    import json as _json

    with open(f"{d}/vocab.json") as f:
        v = _json.load(f)
    v.pop("ab")
    with open(f"{d}/vocab.json", "w") as f:
        _json.dump(v, f)
    with _pytest.raises(ValueError, match="mismatched artifact"):
        bpe_import(d)
    # malformed merge line
    with open(f"{d}/merges.txt", "a") as f:
        f.write("one two three\n")
    with _pytest.raises(ValueError, match="expected"):
        bpe_import(d)


def test_bpe_encode_ids_matches_vocab(spark, tmp_path):
    from a2b_spark.operators.bpe import bpe_encode, bpe_train
    from a2b_spark.operators.bpe_io import (
        bpe_alphabet,
        bpe_encode_ids,
        bpe_export,
    )

    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "new newest"), (3, "low new")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, "text", n_merges=10)
    vocab = bpe_export(merges, str(tmp_path / "t"), bpe_alphabet(docs, "text"))
    toks = {r.doc_id: r.tokens
            for r in bpe_encode(docs, "text", merges, "doc_id").collect()}
    ids = {r.doc_id: r.token_ids
           for r in bpe_encode_ids(docs, "text", merges, vocab,
                                   "doc_id").collect()}
    for d in toks:
        assert ids[d] == [vocab[t] for t in toks[d]]
    # unknown token: loud without unk_id, mapped with it
    import pytest as _pytest

    bad = spark.createDataFrame([(9, "Zz")], "doc_id long, text string")
    with _pytest.raises(Exception, match="not in vocab"):
        bpe_encode_ids(bad, "text", merges, vocab, "doc_id").collect()
    got = bpe_encode_ids(bad, "text", merges, vocab, "doc_id",
                         unk_id=0).collect()[0]
    assert 0 in got.token_ids
