"""Edit-distance similarity join (fuzzy key matching) with exact
pigeonhole blocking — the PassJoin family (Li, Deng, Feng, PVLDB 2011).

The curation use case: entity keys that should be identical but
diverge by a couple of typos (crawl ids, file names, near-identical
titles). An all-pairs levenshtein is the O(n²) anti-pattern; PassJoin
blocks exactly:

- ``max_dist == 1`` with ``same_length=True`` keeps the cheap HALVES
  pigeonhole: one edit touches one position, so splitting each string
  into two halves, at least one half is untouched — every qualifying
  pair collides on (half index, half text, length).
- The general scheme (``max_dist`` ∈ {1, 2, 3}, true edit distance
  incl. inserts/deletes): each indexed string of length ℓ splits into
  k+1 segments (even scheme: the last ``ℓ mod (k+1)`` segments one
  char longer). If ed(r, s) ≤ k with \\|s\\| ≤ \\|r\\|, some segment of s
  appears VERBATIM in r, and the multi-match-aware substring selection
  bounds where: segment i (1-based) can only start in r at
  ``p_i + δ`` with ``-(i-1) ≤ δ ≤ i-1`` (at most i-1 edits strictly
  before it) and ``Δ-(k+1-i) ≤ δ ≤ Δ+(k+1-i)`` where ``Δ = |r|-|s|``
  (at most k+1-i edits after it must absorb the length drift). Both
  bounds are static per (Δ, i, δ) combo, so the probe side explodes a
  PYTHON-pruned literal combo array (≤ ~12 combos at k=2, ~24 at
  k=3) — no HOF re-evaluation, every expression JVM-side.

The candidate join is equi on (indexed length, segment index, segment
text) — bounded buckets — and survivors verify with the built-in
thresholded ``levenshtein(a, b, k)`` (codegen, early-exit above k).
Self-join orientation: probes only look at indexed strings of equal
or SHORTER length, equal-length pairs keep ``id_a < id_b``, so each
unordered pair is generated once (segment multi-collisions are
dropped by a pre-verify ``distinct``).

Scale notes for the 100 TB tier: postings are O(k·n) rows on the
index side and O(k²·n) on the probe side, the join shuffles on
(length, segment, text) — no quadratic stage anywhere; strings
shorter than k+1 produce zero-length segments whose buckets pair all
short strings of compatible length (bounded by the short-string
population — document-key corpora have vanishingly few ≤3-char keys).

Reference parity: the reference's per-row key lookup
(src/DataMigration/DataMigrationMapper.php) is exact-match only; this
operator is the fuzzy extension a large dirty corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_K = 3


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
    same_length: bool = False,
) -> DataFrame:
    """(id_a, id_b, dist): unordered pairs of values with levenshtein
    distance ≤ ``max_dist`` (true edit distance — length changes
    count; pass ``same_length=True`` to restrict to equal-length
    pairs, the pre-round-10 semantics). Null values never match.
    ``max_dist`` up to 3; beyond that the candidate windows grow
    quadratically and a sketch-based join (minhash on q-grams) is the
    honest tool — fail loudly rather than degrade."""
    if not 1 <= max_dist <= _MAX_K:
        raise NotImplementedError(
            f"edit_distance_pairs supports max_dist in 1..{_MAX_K} "
            "(PassJoin candidate windows grow quadratically in k; use "
            "edit_distance_pairs_approx — q-gram minhash blocking — "
            "beyond that)"
        )
    if max_dist == 1 and same_length:
        return _halves_pairs(df, text_col, id_col)
    return _passjoin_pairs(df, text_col, id_col, max_dist, same_length)


def _halves_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """k=1 equal-length fast path: 2 postings per string."""
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t")).filter(
        F.col("__t").isNotNull()
    )
    ln = F.length("__t")
    left = F.expr("substring(__t, 1, cast(length(__t)/2 as int))")
    right = F.expr("substring(__t, cast(length(__t)/2 as int) + 1, length(__t))")
    # two posting keys per value: (segment index, segment text, length)
    keys = base.select(
        "__id",
        "__t",
        ln.alias("__len"),
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("seg"), left.alias("part")),
                F.struct(F.lit(1).alias("seg"), right.alias("part")),
            )
        ).alias("__k"),
    ).select(
        "__id", "__t", "__len",
        F.col("__k.seg").alias("__seg"), F.col("__k.part").alias("__part"),
    )
    a = keys.select(
        F.col("__id").alias("id_a"), F.col("__t").alias("__ta"),
        "__len", "__seg", "__part",
    )
    b = keys.select(
        F.col("__id").alias("id_b"), F.col("__t").alias("__tb"),
        "__len", "__seg", "__part",
    )
    cands = (
        a.join(b, ["__len", "__seg", "__part"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__ta", "__tb")
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein("__ta", "__tb").cast("int"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "dist")
    )


def _seg_exprs(length_col, i_col, nseg: int):
    """Even partition scheme of a ``length_col``-char string into
    ``nseg`` segments: (start p_i 0-based, length l_i) of segment
    ``i_col`` (1-based). First ``nseg - (ℓ mod nseg)`` segments have
    ⌊ℓ/nseg⌋ chars, the rest one more."""
    q0 = F.floor(length_col / nseg)
    rem = length_col % nseg
    short_segs = F.lit(nseg) - rem  # count of ⌊ℓ/nseg⌋-sized segments
    li = q0 + F.when(i_col > short_segs, F.lit(1)).otherwise(F.lit(0))
    pi = (i_col - 1) * q0 + F.greatest(F.lit(0), (i_col - 1) - short_segs)
    return pi.cast("int"), li.cast("int")


def _passjoin_pairs(
    df: DataFrame, text_col: str, id_col: str, k: int, same_length: bool
) -> DataFrame:
    nseg = k + 1
    base = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t")).filter(
        F.col("__t").isNotNull()
    )

    # ---- index side: one posting per (string, segment)
    idx = (
        base.select(
            "__id",
            "__t",
            F.length("__t").cast("int").alias("__jl"),
            F.explode(
                F.array(*[F.lit(i) for i in range(1, nseg + 1)])
            ).alias("__ji"),
        )
    )
    pi, li = _seg_exprs(F.col("__jl"), F.col("__ji"), nseg)
    idx = idx.select(
        F.col("__id").alias("__iid"),
        F.col("__t").alias("__tb"),
        "__jl",
        "__ji",
        F.substring("__t", pi + 1, li).alias("__jp"),
    )

    # ---- probe side: (Δ, i, δ) combos pruned in PYTHON — both window
    # bounds are static per combo (see module docstring)
    deltas = [0] if same_length else list(range(0, k + 1))
    combos = [
        (d, i, off)
        for d in deltas
        for i in range(1, nseg + 1)
        for off in range(-k, k + 1)
        if -(i - 1) <= off <= (i - 1)
        and d - (nseg - i) <= off <= d + (nseg - i)
    ]
    probe = base.select(
        "__id",
        "__t",
        F.length("__t").cast("int").alias("__n"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.lit(i).alias("i"),
                        F.lit(off).alias("off"),
                    )
                    for d, i, off in combos
                ]
            )
        ).alias("__c"),
    ).select(
        "__id",
        "__t",
        "__n",
        (F.col("__n") - F.col("__c.d")).alias("__jl"),  # indexed length probed
        F.col("__c.i").alias("__ji"),
        F.col("__c.off").alias("__off"),
    ).filter(F.col("__jl") >= 0)
    ppi, pli = _seg_exprs(F.col("__jl"), F.col("__ji"), nseg)
    q = (ppi + F.col("__off")).alias("__q")
    probe = (
        probe.select(
            F.col("__id").alias("__pid"),
            F.col("__t").alias("__ta"),
            "__n",
            "__jl",
            "__ji",
            q,
            pli.alias("__sl"),
        )
        .filter((F.col("__q") >= 0) & (F.col("__q") + F.col("__sl") <= F.col("__n")))
        .select(
            "__pid",
            "__ta",
            "__n",
            "__jl",
            "__ji",
            F.substring("__ta", F.col("__q") + 1, F.col("__sl")).alias("__jp"),
        )
    )

    # ---- candidate join on (indexed length, segment index, segment
    # text); orientation: probe length ≥ indexed length, equal-length
    # pairs ordered by id so each unordered pair is generated once
    cands = (
        probe.join(idx, ["__jl", "__ji", "__jp"])
        .filter(
            (F.col("__n") > F.col("__jl"))
            | (F.col("__pid") < F.col("__iid"))
        )
        .select(
            F.least("__pid", "__iid").alias("id_a"),
            F.greatest("__pid", "__iid").alias("id_b"),
            "__ta",
            "__tb",
        )
        .distinct()  # one pair may collide on several segments
    )
    # thresholded levenshtein: codegen early-exit, -1 above k
    dist = F.expr(f"levenshtein(__ta, __tb, {int(k)})").cast("int")
    return (
        cands.withColumn("dist", dist)
        .filter((F.col("dist") >= 0) & (F.col("dist") <= k))
        .select("id_a", "id_b", "dist")
    )


def _char_qgram_hashes(base: DataFrame, q: int) -> DataFrame:
    """(__id, khs): DISTINCT character q-gram xxhash64 set per string.

    The string is bound ONCE as the ``__t`` attribute before the
    higher-order transform (HOF lambdas get no common-subexpression
    elimination — see the O(L²) n-gram postmortem in operators/lm.py);
    each lambda evaluation is one O(q) substring copy + one hash, so
    gram construction is O(L·q) per string, entirely JVM-side, and no
    gram *string* ever leaves the executor — only 64-bit hashes.
    Strings shorter than ``q`` get an empty set (they drop out of the
    signature stage; see the recall floor in the caller's docstring).
    """
    n = F.length("__t")
    grams = F.when(
        n >= q,
        F.transform(
            F.sequence(F.lit(1), n - (q - 1)),
            lambda i: F.xxhash64(F.col("__t").substr(i, F.lit(q))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return base.select("__id", F.array_distinct(grams).alias("khs"))


def edit_distance_pairs_approx(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int,
    qgram: int = 2,
    num_hashes: int = 64,
    bands: int = 64,
) -> DataFrame:
    """(id_a, id_b, dist): unordered pairs with levenshtein distance
    ≤ ``max_dist``, found by q-gram MINHASH-LSH BLOCKING instead of
    PassJoin segment enumeration — the scale path for ``max_dist``
    beyond 3, where PassJoin's candidate windows grow quadratically.

    Precision is EXACT: every candidate is verified with the
    thresholded codegen ``levenshtein(a, b, k)``, so no reported pair
    is ever wrong and ``dist`` is the true edit distance. Recall is
    probabilistic but engineered to saturate: ``k`` edits destroy at
    most ``k·q`` distinct q-grams per side, so a qualifying pair's
    gram-set jaccard is ≥ (G − k·q)/(G + k·q) for gram-set size G, and
    with the default 64 single-row bands the per-pair miss probability
    is (1 − j)^64 — below 1e-12 whenever j ≥ 0.35, i.e. for strings
    longer than ~2·k·q chars. Everything is seed-fixed hashing:
    output is DETERMINISTIC for a given input (re-runs and engines
    agree bit-for-bit), which is what lets an exact brute-force oracle
    certify it at test scale.

    Recall floors (documented, not silent): strings shorter than
    ``qgram`` produce no grams and never pair; strings whose length
    approaches ``max_dist·qgram`` have diluted gram overlap and may
    miss — for short-key corpora at k ≤ 3 use the exact
    ``edit_distance_pairs`` instead.

    Scale shape (100 TB tier): one gram pass O(L·q) per string, one
    shuffle to aggregate ``num_hashes`` map-side-combined MIN slots,
    one shuffle on (band, band-hash) for candidates, one melt-join to
    fetch pair texts (single pass over the corpus — see
    dedup._fetch_pair_payloads), then per-candidate verify. No stage
    is quadratic in n; bucket sizes are bounded by band-hash
    collisions exactly as in the near-dup LSH operators.
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    if qgram < 1:
        raise ValueError(f"qgram must be >= 1, got {qgram}")
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    from a2b_spark.operators.dedup import (
        _fetch_pair_payloads,
        _minhash_sigs,
        _pin_with_packable,
        lsh_candidate_pairs,
    )

    base = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__t")
    ).filter(F.col("__t").isNotNull())
    # materialized: Catalyst's InferFiltersFromGenerate otherwise
    # re-evaluates the whole gram transform inside an inferred
    # size>0 filter below the signature explode (see _minhash_sigs);
    # the packability probe rides the pin job (the old standalone
    # aggregate probe was a full extra planning+job round-trip here —
    # the corpus ids are derived, so the footer path never fired)
    sh, packable = _pin_with_packable(
        _char_qgram_hashes(base, qgram), "__id", df, id_col
    )
    sigs = _minhash_sigs(sh, "__id", num_hashes)
    cands = lsh_candidate_pairs(
        sigs, "__id", bands, num_hashes // bands,
        packable=packable,
    )
    pay = _fetch_pair_payloads(cands, base, "__id", "__t", "__ta", "__tb")
    k = int(max_dist)
    dist = F.expr(f"levenshtein(__ta, __tb, {k})").cast("int")
    return (
        # length gap > k can't qualify: free prune before the verify
        pay.filter(
            F.abs(F.length("__ta") - F.length("__tb")) <= k
        )
        .withColumn("dist", dist)
        .filter((F.col("dist") >= 0) & (F.col("dist") <= k))
        .select("id_a", "id_b", "dist")
    )
