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
            "q-gram minhash blocking beyond that)"
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
