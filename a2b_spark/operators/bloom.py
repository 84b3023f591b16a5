"""Bloom-filter n-gram membership — the 100 TB decontamination path.

``ngram_decontaminate`` (operators/dedup.py) joins corpus gram digests
against the benchmark's distinct-gram set: the right plan while the
benchmark set fits a broadcast hash join (AQE does it automatically).
When the "benchmark" is itself huge — decontaminating against an
entire eval SUITE, or cross-corpus leakage checks with billions of
grams — the set side outgrows broadcast and the join becomes a full
shuffle of the corpus gram stream. The classical fix is a Bloom
filter: ~10 bits/gram at 1% false-positive rate (vs ≥16 BYTES/gram
for the set), so a billion-gram blocklist is ~1.2 GB of bits that
broadcasts once and is probed in-row — the corpus side never
shuffles at all.

Spark-first shape:
- BUILD is distributed end-to-end: gram → two 64-bit hashes
  (xxhash64 with different seeds, Kirsch–Mitzenmacher double
  hashing h1 + i·h2) → k bit positions → ``bit_or`` aggregate per
  64-bit word. Only the per-WORD rows come to the driver — O(m/64),
  bounded by the filter size itself, never by gram count.
- PROBE is an Arrow-batched pandas UDF over the broadcast bit array
  (numpy uint64 gather — vectorized). A bitset random-gather is the
  textbook case Catalyst cannot express efficiently (a join against
  the bit table would reintroduce the shuffle the Bloom exists to
  avoid), so this is the legitimate Python-UDF slot per SURVEY §3.2.

Spark itself uses the same trick internally (runtime bloom-pruned
joins), but does not expose ``bloom_filter_agg`` as a public SQL
function in this build — hence the explicit operator.

Semantics: deterministic superset of the exact membership join —
every truly-shared gram hits; a hash-unlucky gram may false-positive
at ~``fp_rate``. Decontamination is exactly the use case where a
one-sided error is acceptable (dropping a few extra docs is safe;
missing a contaminated one is not). ``tests/test_bloom.py`` pins the
superset contract and the FP bound.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from a2b_spark.operators.dedup import _doc_ngram_md5


class NgramBloom:
    """Immutable Bloom bitset over word n-grams. Ships to executors as
    a Spark broadcast variable (numpy uint64 array, ~m/8 bytes)."""

    def __init__(self, bits: np.ndarray, m: int, k: int, n: int, n_grams: int):
        self.bits = bits  # uint64[m/64]
        self.m = m
        self.k = k
        self.n = n  # gram width (words)
        self.n_grams = n_grams  # distinct grams inserted

    def contains_batch(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Vectorized probe: True where ALL k positions are set."""
        h1 = h1.astype(np.uint64)
        h2 = h2.astype(np.uint64)
        out = np.ones(len(h1), dtype=bool)
        m = np.uint64(self.m)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % m
            word = (pos >> np.uint64(6)).astype(np.int64)
            bit = np.uint64(1) << (pos & np.uint64(63))
            out &= (self.bits[word] & bit) != 0
        return out


def _gram_hashes(df: DataFrame, text_col: str, id_col: str, out: str, n: int) -> DataFrame:
    """(out, h1, h2): two independent 64-bit hashes per distinct doc
    gram — the double-hashing basis. Gram extraction (incl. the
    short-doc whole-text rule) is shared with ngram_decontaminate via
    _doc_ngram_md5, so Bloom results are supersets of the exact join's
    on identical gram semantics."""
    g = _doc_ngram_md5(df, text_col, id_col, out, n)
    # 31-bit masks keep h1 + i·h2 far from int64 overflow, which ANSI
    # mode (the driver's default) would RAISE on rather than wrap;
    # |1 keeps the stride nonzero so the k probes don't collapse.
    # 31 bits of randomness per hash bounds m at 2^31 bits (256 MB of
    # filter) — beyond that, widen the mask and switch to DECIMAL
    # arithmetic.
    return g.select(
        out,
        (F.xxhash64("gh").bitwiseAND(F.lit(0x7FFFFFFF))).alias("h1"),
        (
            F.xxhash64("gh", F.lit(1)).bitwiseAND(F.lit(0x7FFFFFFF))
        ).bitwiseOR(F.lit(1)).alias("h2"),
    )


def build_ngram_bloom(
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    fp_rate: float = 0.01,
    min_bits: int = 1 << 10,
) -> NgramBloom:
    """Distributed Bloom build over the benchmark's distinct n-grams.

    m and k follow the standard optimum: m = -n·ln(p)/ln(2)²,
    k = (m/n)·ln(2). The driver receives only (word_index, or-ed bits)
    rows — O(m/64) regardless of gram count."""
    if not 0 < fp_rate < 1:
        raise ValueError(f"fp_rate must be in (0,1), got {fp_rate}")
    min_bits = (max(min_bits, 64) + 63) & ~63  # whole words, >= 1 word
    grams = _gram_hashes(benchmark, text_col, id_col, "__bid", n).select("h1", "h2").distinct()
    n_grams = grams.count()
    if n_grams == 0:
        return NgramBloom(np.zeros(min_bits >> 6, dtype=np.uint64), min_bits, 1, n, 0)
    m = max(min_bits, int(-n_grams * math.log(fp_rate) / (math.log(2) ** 2)))
    m = (m + 63) & ~63  # whole words
    if m > (1 << 31):
        # the 31-bit h1/h2 masks (ANSI-safe arithmetic) can only
        # address 2^31 bits; beyond that the fp_rate contract would
        # silently break — fail loudly instead. ~2e8 grams fit at 1%.
        raise ValueError(
            f"bloom needs m={m} bits for {n_grams} grams at fp_rate="
            f"{fp_rate}, above the 2^31 addressing limit of the 31-bit "
            "hash masks; raise fp_rate, shard the blocklist, or widen "
            "the masks to DECIMAL arithmetic"
        )
    k = max(1, round((m / n_grams) * math.log(2)))
    # k positions per gram -> per-word OR, computed where the data is
    i = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
    words = (
        grams.select("h1", "h2", i)
        .select(F.pmod(F.col("h1") + F.col("i") * F.col("h2"), F.lit(m)).alias("pos"))
        .select(
            F.expr("CAST(pos DIV 64 AS BIGINT)").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    bits = np.zeros(m >> 6, dtype=np.uint64)
    for r in words:
        bits[r["w"]] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return NgramBloom(bits, m, k, n, n_grams)


def broadcast_bloom(spark, bloom: NgramBloom):
    """Ship the bitset to the executors ONCE; pass the returned handle
    to repeated :func:`bloom_flag_contaminated` calls (e.g. every
    micro-batch of a stream) instead of the raw NgramBloom — otherwise
    each call re-serializes the whole filter."""
    return spark.sparkContext.broadcast(bloom)


def bloom_flag_contaminated(
    corpus: DataFrame,
    bloom,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Flag corpus docs sharing (per the Bloom) ≥1 n-gram with the
    blocklist: (id_col, n_hit_ngrams). Superset of the exact join's
    flags; per-gram false positives at ~fp_rate. The corpus side is
    one scan + one per-doc aggregate — no shuffle of gram rows against
    anything, which is the whole point at blocklist scale.

    ``bloom`` is an :class:`NgramBloom` (broadcast on the spot — fine
    for one-shot batch use) or a handle from :func:`broadcast_bloom`
    (required discipline for repeated calls: one ship, many probes)."""
    bc = (
        bloom
        if hasattr(bloom, "value")  # already a Broadcast handle
        else corpus.sparkSession.sparkContext.broadcast(bloom)
    )
    n = bc.value.n

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        b = bc.value
        return pd.Series(b.contains_batch(h1.to_numpy(), h2.to_numpy()))

    g = _gram_hashes(corpus, text_col, id_col, id_col, n)
    return (
        g.filter(probe("h1", "h2"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit_ngrams"))
    )
