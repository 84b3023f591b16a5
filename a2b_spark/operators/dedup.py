"""Deduplication operators for large-scale training-data pipelines.

Scale design (the whole point — none of these is O(n²) except the
explicitly-named exact verifier used on *candidates*):

- exact/key dedup: one hash-shuffle on the dedup key; deterministic
  survivor via window row_number (dropDuplicates keeps an arbitrary
  row — unacceptable for reproducible pipelines).
- MinHash+LSH: shingle → k independent minhashes (map-only, built-in
  xxhash64 inside higher-order functions) → band hashes → shuffle on
  (band, hash) buckets → candidate pairs only within buckets → exact
  jaccard verification on candidates. Cost O(n·k + candidate pairs).
- SimHash: 64-bit signature by sign-aggregated token hashes, banded
  for candidates, Hamming-distance verify.
- Embedding near-dup: exact all-pairs variant for oracle-checked
  correctness at small n; SRP-LSH-bucketed variant for scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from a2b_spark.functions.text import word_shingles, word_tokens
from a2b_spark.functions.vectors import as_double, cosine, hyperplane_bits


def spread(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Ensure at least core-count partitions before compute-heavy
    per-row stages (signatures, all-pairs stream side). A small local
    parquet file scans as ONE split and would serialize the whole
    stage; at 100 TB the scan already has thousands of splits and this
    is a no-op — the shuffle only happens when the input is tiny."""
    target = df.sparkSession.sparkContext.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def exact_dedup(df: DataFrame, keys: Sequence[str], order_by: Sequence[str]) -> DataFrame:
    """Keep exactly one row per key tuple — the first under
    ``order_by`` (deterministic, unlike dropDuplicates)."""
    w = W.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingle_docs(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """id + distinct word-k-gram shingle set (the unit of jaccard)."""
    toks = word_tokens(text_col)
    return spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), word_shingles(toks, k).alias("shingles")
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays; integer-count
    division → engine-portable doubles."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return inter / union


_MERSENNE31 = 2147483647  # 2^31 - 1, prime


def shingle_hash_pairs(shingles: Column) -> Column:
    """Per-shingle (h1, h2) base hashes for Carter-Wegman minhashing —
    the only place the (expensive) string hashing happens. MUST be
    projected into its own named column before minhash_signature runs
    over it, otherwise Catalyst re-inlines the string hashing into
    every one of the k signature slots."""
    return F.transform(
        shingles,
        lambda s: F.struct(
            F.pmod(F.xxhash64(s), F.lit(_MERSENNE31)).alias("h1"),
            (F.pmod(F.xxhash64(s, F.lit(1)), F.lit(_MERSENNE31 - 1)) + 1).alias("h2"),
        ),
    )


def minhash_signature(hash_pairs: Column, k: int = 64) -> Column:
    """k minhashes from pre-computed base hashes: slot i is
    min over shingles of (h1 + i·h2) mod p — the classic 2-universal
    "permutation" family. Only cheap long arithmetic per slot (k·|sh|
    mul/add/mod), string hashing stays at 2·|sh| per doc. All values
    < 2^37, safe under ANSI mode."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(hash_pairs, lambda h: F.pmod(h["h1"] + i * h["h2"], F.lit(_MERSENNE31)))
        ),
    )


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, bands: int = 16, rows: int = 4
) -> DataFrame:
    """Band the signature; docs sharing any band-hash become candidate
    pairs. One shuffle keyed on (band, band_hash); bucket sizes stay
    tiny because a band hash is 64-bit. Returns (id_a, id_b)."""
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda j: F.struct(
                    j.alias("band"),
                    F.xxhash64(j, F.slice(F.col("signature"), j * rows + 1, rows).cast("string")).alias("bh"),
                ),
            )
        ).alias("b"),
    ).select(id_col, "b.band", "b.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """MinHash-LSH candidates, then *exact* jaccard verification on the
    candidates only. With bands=16/rows=4, a pair at the 0.8 threshold
    is missed with p=(1-0.8⁴)¹⁶ ≈ 2e-4 and pairs at ≥0.95 with p≈1e-11
    — so output matches the exact all-pairs join with near certainty
    at a fraction of its cost. Returns (id_a, id_b, jaccard)."""
    from pyspark import StorageLevel

    rows = num_hashes // bands
    # shingles feed three consumers (signatures + both verify sides):
    # persist the one expensive text→shingle pass instead of running it
    # three times. MEMORY_AND_DISK: spills instead of OOM at scale.
    sh = shingle_docs(df, text_col, id_col, shingle_k).persist(StorageLevel.MEMORY_AND_DISK)
    # two projections on purpose: hs must be a materialized column so
    # the k signature slots share it (CollapseProject would otherwise
    # duplicate the string hashing k times)
    sigs = sh.select(id_col, shingle_hash_pairs(F.col("shingles")).alias("hs")).select(
        id_col, minhash_signature(F.col("hs"), num_hashes).alias("signature")
    )
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows)
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def exact_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.8, shingle_k: int = 3
) -> DataFrame:
    """EXACT jaccard pairs without the O(n²) cross join: inverted-index
    similarity join (Vernica et al.). Explode shingles, equi-join on the
    shingle, count shared shingles per pair; since shingle sets are
    distinct-element, jaccard = co / (|a| + |b| - co) exactly — same
    integers, hence bit-identical doubles, as intersect/union.

    Cost is Σ_shingle df(s)² instead of n²: pairs that share nothing
    never meet. Skewed (very frequent) shingles are the hazard at
    scale — AQE skew-join splits those buckets; a PPJoin-style prefix
    filter is the next refinement if corpus-frequency skew dominates."""
    sh = shingle_docs(df, text_col, id_col, shingle_k)
    inv = sh.select(
        F.col(id_col), F.size("shingles").alias("sz"), F.explode("shingles").alias("s")
    )
    a = inv.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "s")
    b = inv.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "s")
    co = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    return (
        co.withColumn(
            "jaccard",
            F.col("co").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("co")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(tokens: Column, bands: int = 4, band_bits: int = 16) -> Column:
    """64-bit SimHash stored as ``bands`` band values (array<long>,
    band_bits bits each — avoids signed-64 top-bit overflow under ANSI
    mode). Bit b's sign is Σ_tokens ±1 where the ±1 for (token, b) is
    the parity of xxhash64(token, b). Map-only built-ins."""
    nbits = bands * band_bits
    counts = F.aggregate(
        tokens,
        F.array_repeat(F.lit(0).cast("long"), nbits),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(nbits - 1)),
                lambda b: F.when(F.pmod(F.xxhash64(t, b), 2) == 1, 1)
                .otherwise(-1)
                .cast("long"),
            ),
            lambda a, x: a + x,
        ),
    )
    def band_value(j: int) -> Column:
        return F.aggregate(
            F.slice(counts, j * band_bits + 1, band_bits),
            F.lit(0).cast("long"),
            lambda acc, c: acc * 2 + F.when(c >= 0, 1).otherwise(0).cast("long"),
        )

    return F.array(*[band_value(j) for j in range(bands)])


def simhash_near_dup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash banding (4×16-bit) candidates + Hamming verify. A pair
    within Hamming distance 3 shares at least one exact 16-bit band
    (pigeonhole), so recall is exact for max_hamming ≤ 3."""
    sigs = spread(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), simhash64(word_tokens(text_col)).alias("sig")
    )
    banded = sigs.select(
        id_col,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.element_at(F.col("sig"), j + 1).alias("bh"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("b"),
    ).select(id_col, "sig", "b.band", "b.bh")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(
            F.col("sig_a"), F.col("sig_b"), lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return pairs.withColumn("hamming", hamming.cast("int")).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def embedding_dup_pairs_exact(
    df: DataFrame, vec_col: str, id_col: str, threshold: float
) -> DataFrame:
    """All-pairs cosine near-dup — O(n²) verifier/oracle path."""
    e = df.select(F.col(id_col), as_double(vec_col).alias("v"))
    a = spread(e, 4).select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    b = e.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_dup_pairs_lsh(
    df: DataFrame, vec_col: str, id_col: str, threshold: float, n_bits: int = 12
) -> DataFrame:
    """SRP-LSH bucketed near-dup: vectors only compare within their
    sign-signature bucket — the 100 TB path (map + one bucket-keyed
    shuffle + small within-bucket joins). Approximate: recall depends
    on the angle/bits tradeoff."""
    e = spread(df.select(F.col(id_col), as_double(vec_col).alias("v"))).withColumn(
        "bucket", hyperplane_bits(F.col("v"), n_bits)
    )
    a = e.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), "bucket")
    b = e.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
