"""Round-6 reports tranche (q112-q118): table profiling, semantic
dedup, corpus-overlap and distribution reports.

Everything follows the established oracle discipline: exact integer
arithmetic wherever possible (percentiles, budgets, outlier bounds are
PURE integer math), one ln()/cosine rounded through the decimal
fixed-point or round-6 contract where a float is unavoidable, and
deterministic total orders on every top-k. Reference citations live on
the operators; these queries are the `queries()` surface of SURVEY §8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from a2b_spark.functions import text as TXT
from a2b_spark.queries.relational import _t

QUERIES: dict = {}
ORACLES: dict = {}


# --------------------------------------------------------------- Q112
def q112_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column data-quality profile of the orders table: null
    count, exact distinct count, canonicalized min/max (see
    operators/profile.py for the one-scan wide-aggregate shape and
    the per-type string canonicalization contract)."""
    from a2b_spark.operators.profile import table_profile

    o = _t(spark, sf_dir, "orders")
    return table_profile(
        o,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )


def _o_q112() -> str:
    def block(col, canon):
        return f"""
SELECT '{col}' AS col_name,
       CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
       CAST(MIN({canon}) AS VARCHAR) AS min_s,
       CAST(MAX({canon}) AS VARCHAR) AS max_s
FROM orders"""

    blocks = [
        block("o_orderkey", "o_orderkey"),
        block("o_custkey", "o_custkey"),
        block("o_orderstatus", "o_orderstatus"),
        block(
            "o_totalprice",
            "CAST(round(o_totalprice, 4) AS DECIMAL(28,4))",
        ),
        block("o_orderdate", "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')"),
        block("o_orderpriority", "o_orderpriority"),
    ]
    return (
        "SELECT * FROM ("
        + " UNION ALL ".join(blocks)
        + ") ORDER BY col_name"
    )


# --------------------------------------------------------------- Q113
def q113_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding table: deterministic k-means
    clusters bound the quadratic pair search; within-cluster cosine
    pairs >= 0.45 are the semantic duplicates (the corpus-calibrated
    threshold of q29; the operator docstring has the scale analysis —
    k grows with n so the per-cluster tile stays bounded)."""
    from a2b_spark.operators.dedup import semantic_dedup_pairs

    e = _t(spark, sf_dir, "embeddings")
    # SemDeDup's scale contract is k ∝ n (bounded cluster tiles), so k
    # self-tunes to ~250-vector clusters. At every oracle SF this
    # yields exactly the oracle's fixed k=8 (2000 vecs at sf0.1 →
    # 2000//250 = 8; smaller SFs floor at 8); past that, k grows so
    # the per-cluster pair tile stays ~250²/2 regardless of corpus
    # size — the measured sub-linear point in SCALE_TRAJECTORY.json.
    n = e.count()
    return semantic_dedup_pairs(
        e, "embedding", "vec_id", k=max(8, n // 250), threshold=0.45
    )


O_Q113 = """
WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vec
           FROM embeddings WHERE embedding IS NOT NULL),
c AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, vec AS cvec
      FROM v ORDER BY vec_id LIMIT 8),
scored AS (
  SELECT v.vec_id, c.cid,
         round(list_sum([ (v.vec[i+1] - c.cvec[i+1]) * (v.vec[i+1] - c.cvec[i+1])
                          for i in range(0, len(v.vec))]), 6) AS d
  FROM v CROSS JOIN c),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
    FROM scored) WHERE rk = 1),
p AS (
  SELECT a.cid AS cluster_id, a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_inner_product(va.vec, vb.vec)
               / (sqrt(list_inner_product(va.vec, va.vec))
                  * sqrt(list_inner_product(vb.vec, vb.vec))), 6) AS cos
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN v va ON va.vec_id = a.vec_id
  JOIN v vb ON vb.vec_id = b.vec_id)
SELECT CAST(cluster_id AS INTEGER) AS cluster_id, id_a, id_b, cos
FROM p WHERE cos >= 0.45
"""


# --------------------------------------------------------------- Q114
def q114_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise SOURCE-level vocabulary overlap: exact Jaccard between
    the distinct word-3-gram sets of every source pair that shares at
    least one gram (zero-overlap pairs are omitted — emitting them
    would need a small cross join the plan audit bans). The
    cross-corpus similarity map behind mixture design: which sources
    are stylistically redundant before any training tokens are spent.

    Scale shape (round-7 rewrite; was a gram-keyed SELF-JOIN —
    two shuffles of the full (source, gram) set plus a sort-merge
    join): ONE shuffle total on the gram hash. kgram_hash_docs +
    explode feeds groupBy(gram).collect_set(source) directly — the
    partial aggregate dedups map-side and every per-gram set is
    bounded by |sources| (20 here; a profile dimension, never
    doc-scale). Per-source totals fall out of the same frame
    (explode + count, map-side combine to ≤|sources| rows per task),
    and the pairwise intersections come from exploding each gram's
    C(|set|,2) source pairs — after DROPPING single-source grams,
    which are the heavy tail of any vocabulary and contribute nothing
    to an intersection (the join version shuffled and probed them
    all). Jaccard = one long/long division. Gram identity is
    xxhash64 — the kgram_hash contract (oracle computes gram
    STRINGS; counts agree modulo a ~|set|²/2^64 collision, same
    accepted bound as q25)."""
    from a2b_spark.operators.dedup import kgram_hash_docs

    d = _t(spark, sf_dir, "documents")
    by_g = (
        kgram_hash_docs(
            d.select(F.col("source").alias("__sid"), "text"), "text", "__sid", 3
        )
        .select("__sid", F.explode_outer("khs").alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy("g")
        .agg(F.sort_array(F.collect_set("__sid")).alias("ss"))
        # one wide consumer tree (totals + pairs) over one shuffle
        .localCheckpoint(eager=False)
    )
    tot = (
        by_g.select(F.explode_outer("ss").alias("__sid"))
        .groupBy("__sid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_g"))
    )
    # C(|ss|,2) ordered pairs per multi-source gram; ss is sorted so
    # x < y holds by construction (no post-filter re-inlining the HOF)
    pairs = (
        by_g.filter(F.size("ss") >= 2)
        .select(
            F.explode_outer(
                F.expr(
                    "flatten(transform(ss, (x, i) -> "
                    "transform(slice(ss, i + 2, size(ss) - i - 1), "
                    "y -> struct(x AS src_a, y AS src_b))))"
                )
            ).alias("p")
        )
        .filter(F.col("p").isNotNull())
    )
    inter = (
        pairs.groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    ta = tot.select(F.col("__sid").alias("src_a"), F.col("n_g").alias("n_a"))
    tb = tot.select(F.col("__sid").alias("src_b"), F.col("n_g").alias("n_b"))
    return (
        inter.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


O_Q114 = """
WITH t AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
g0 AS (
  SELECT source,
         unnest(CASE WHEN len(ws) >= 3
                     THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                           for i in range(1, len(ws) - 1)]
                     ELSE [] END) AS g
  FROM t),
grams AS (SELECT DISTINCT source, g FROM g0),
tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_g FROM grams GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2)
SELECT i.src_a, i.src_b, ta.n_g AS n_a, tb.n_g AS n_b, i.n_shared,
       CAST(i.n_shared AS DOUBLE) / (ta.n_g + tb.n_g - i.n_shared) AS jaccard
FROM inter i
JOIN tot ta ON ta.source = i.src_a
JOIN tot tb ON tb.source = i.src_b
"""


# --------------------------------------------------------------- Q115
def q115_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by pointwise mutual information
    (min count 5): PMI = ln(c_xy·N / (c_x·c_y)), the classic
    collocation-extraction statistic. Fixed-point discipline: the one
    ln() per surviving bigram is rounded to 7 places and scaled to an
    integer (``pmi_e7``, 1e-7 nats — the q53 idiom), so the top-20
    order (pmi_e7 desc, w1, w2) is a pure integer/string sort.

    The products run in DOUBLE on both engines (exact below 2^53;
    beyond that both engines perform the identical correctly-rounded
    IEEE multiply, so a 100 TB corpus can't overflow the way an ANSI
    int64 product would). N attaches as a literal from a bounded
    one-value driver pull off the pinned bigram aggregate. Top-20 is
    orderBy+limit — a distributed TakeOrdered, not a global window."""
    d = _t(spark, sf_dir, "documents")
    toks = TXT.word_tokens("text")
    n = F.size(toks)
    staged = d.select(
        F.slice(toks, 1, n - 1).alias("__w1"), F.slice(toks, 2, n - 1).alias("__w2")
    )
    big = (
        staged.select(F.explode(F.arrays_zip("__w1", "__w2")).alias("bg"))
        .select(F.col("bg.__w1").alias("w1"), F.col("bg.__w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        .localCheckpoint(eager=True)
    )
    uni = (
        d.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    )
    n_big = big.agg(F.sum("n_xy")).first()[0] or 0
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_y"))
    ratio = (F.col("n_xy").cast("double") * F.lit(float(n_big))) / (
        F.col("n_x").cast("double") * F.col("n_y").cast("double")
    )
    pmi_e7 = (
        F.round(F.log(ratio), 7).cast("decimal(20,7)") * 10_000_000
    ).cast("long")
    return (
        big.filter(F.col("n_xy") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .select("w1", "w2", "n_xy", "n_x", "n_y", pmi_e7.alias("pmi_e7"))
        .orderBy(F.desc("pmi_e7"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


O_Q115 = """
WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
b AS (SELECT unnest([{'w1': ws[i], 'w2': ws[i+1]} for i in range(1, len(ws))], recursive := true) FROM t),
big AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_xy FROM b GROUP BY 1, 2),
uni AS (SELECT unnest(ws) AS w FROM t),
u AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM uni GROUP BY 1),
nb AS (SELECT SUM(n_xy) AS n_big FROM big),
scored AS (
  SELECT big.w1, big.w2, big.n_xy, ux.n_w AS n_x, uy.n_w AS n_y,
         CAST(CAST(round(ln( (CAST(big.n_xy AS DOUBLE) * CAST(nb.n_big AS DOUBLE))
                            / (CAST(ux.n_w AS DOUBLE) * CAST(uy.n_w AS DOUBLE))), 7)
                   AS DECIMAL(20,7)) * 10000000 AS BIGINT) AS pmi_e7
  FROM big, nb
  JOIN u ux ON ux.w = big.w1
  JOIN u uy ON uy.w = big.w2
  WHERE big.n_xy >= 5)
SELECT w1, w2, n_xy, n_x, n_y, pmi_e7
FROM scored ORDER BY pmi_e7 DESC, w1, w2 LIMIT 20
"""


def _grouped_cum_hist(d: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """The grouped-histogram percentile spine shared by q116/q118:
    collapse rows to (group, distinct value, count), then attach the
    per-group cumulative and total counts. The exact-percentile pick
    is the cross-multiplied ``cum·den >= tot·num`` MIN — callers
    apply it so p-lists stay per-query, the machinery doesn't."""
    g = d.groupBy(group_col, val_col).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wc = W.partitionBy(group_col).orderBy(val_col)
    wt = W.partitionBy(group_col)
    return g.select(
        group_col,
        val_col,
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wt).alias("tot"),
    )


def _pct(num: int, den: int, val_col: str):
    """Smallest value whose cumulative count reaches ceil(num/den · n)
    — written cross-multiplied so no division or ceil ever runs."""
    return F.min(
        F.when(F.col("cum") * den >= F.col("tot") * num, F.col(val_col))
    )


# --------------------------------------------------------------- Q116
def q116_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source length percentiles (p50/p90/p99 of n_chars),
    percentile_disc semantics via PURE INTEGER math: group by
    (source, n_chars), cumulative count over the ordered distinct
    values, and the percentile is the smallest value whose cumulative
    count reaches ceil(p·n) — computed with integer ceil-division
    ((p·t + q-1) div q), never a float.

    Scale shape: the heavy input collapses to (source, distinct
    n_chars) in one map-side-combined aggregate; the window runs over
    per-source DISTINCT VALUE rows (bounded by value cardinality, not
    row count) — exact percentiles without sorting raw rows, the
    grouped-histogram formulation."""
    d = _t(spark, sf_dir, "documents")
    staged = _grouped_cum_hist(d, "source", "n_chars")
    return (
        staged.groupBy("source")
        .agg(
            F.max("tot").alias("n_docs"),
            _pct(1, 2, "n_chars").alias("p50"),
            _pct(9, 10, "n_chars").alias("p90"),
            _pct(99, 100, "n_chars").alias("p99"),
        )
        .select("source", "n_docs", "p50", "p90", "p99")
    )


O_Q116 = """
WITH g AS (
  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2),
s AS (
  SELECT source, n_chars,
         SUM(n) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
         SUM(n) OVER (PARTITION BY source) AS tot
  FROM g)
SELECT source,
       CAST(MAX(tot) AS BIGINT) AS n_docs,
       MIN(CASE WHEN cum * 2 >= tot THEN n_chars END) AS p50,
       MIN(CASE WHEN cum * 10 >= tot * 9 THEN n_chars END) AS p90,
       MIN(CASE WHEN cum * 100 >= tot * 99 THEN n_chars END) AS p99
FROM s GROUP BY 1
"""


# --------------------------------------------------------------- Q117
def q117_quality_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curve: per source, greedily keep the longest
    documents (quality proxy = n_chars, ties by doc_id) until a
    10,000-char budget is exhausted; report how many documents and
    characters the budget captures. The selection-under-budget
    report behind "which sources saturate their allocation".

    All integer: a per-source ROWS-window running sum over a
    deterministic total order, then conditional counts. Scale note:
    a mega-source's window partition sorts in one task — the
    distributed two-phase prefix sum (operators/prefix.py) is the
    100 TB path; this is the oracle-checkable shape."""
    budget = 10_000
    d = _t(spark, sf_dir, "documents")
    w = (
        W.partitionBy("source")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    staged = d.select(
        "source", "n_chars", F.sum("n_chars").over(w).alias("cum")
    )
    kept = F.when(F.col("cum") <= budget, F.lit(1)).otherwise(F.lit(0))
    return (
        staged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(kept).cast("long").alias("docs_kept"),
            F.coalesce(
                F.max(F.when(F.col("cum") <= budget, F.col("cum"))), F.lit(0)
            )
            .cast("long")
            .alias("chars_kept"),
        )
    )


O_Q117 = """
WITH s AS (
  SELECT source, n_chars,
         SUM(n_chars) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cum <= 10000 THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
       CAST(COALESCE(MAX(CASE WHEN cum <= 10000 THEN cum END), 0) AS BIGINT) AS chars_kept
FROM s GROUP BY 1
"""


# --------------------------------------------------------------- Q118
def q118_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence length outliers per source: quartiles from the
    exact grouped-histogram percentile (q116's idiom), fences at
    p25 − 1.5·IQR and p75 + 1.5·IQR, outliers counted against the
    doubled bounds so EVERYTHING stays integer (2x < 2·p25 − 3·IQR
    avoids the .5 factor). The distribution-drift tripwire for a
    corpus ingest."""
    d = _t(spark, sf_dir, "documents")
    staged = _grouped_cum_hist(d, "source", "n_chars")
    q = staged.groupBy("source").agg(
        _pct(1, 4, "n_chars").alias("p25"),
        _pct(3, 4, "n_chars").alias("p75"),
    )
    iqr = F.col("p75") - F.col("p25")
    bounds = q.select(
        "source",
        "p25",
        "p75",
        (2 * F.col("p25") - 3 * iqr).alias("lo2"),
        (2 * F.col("p75") + 3 * iqr).alias("hi2"),
    )
    out = (
        d.join(F.broadcast(bounds), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("n_chars") * 2 < F.col("lo2"))
                    | (F.col("n_chars") * 2 > F.col("hi2")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_outliers"),
            F.max("p25").alias("p25"),
            F.max("p75").alias("p75"),
        )
    )
    return out.select("source", "n_docs", "p25", "p75", "n_outliers")


O_Q118 = """
WITH g AS (
  SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2),
s AS (
  SELECT source, n_chars,
         SUM(n) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
         SUM(n) OVER (PARTITION BY source) AS tot
  FROM g),
q AS (
  SELECT source,
         MIN(CASE WHEN cum * 4 >= tot THEN n_chars END) AS p25,
         MIN(CASE WHEN cum * 4 >= tot * 3 THEN n_chars END) AS p75
  FROM s GROUP BY 1)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MAX(q.p25) AS p25,
       MAX(q.p75) AS p75,
       CAST(SUM(CASE WHEN d.n_chars * 2 < 2 * q.p25 - 3 * (q.p75 - q.p25)
                       OR d.n_chars * 2 > 2 * q.p75 + 3 * (q.p75 - q.p25)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM documents d JOIN q ON q.source = d.source
GROUP BY 1
"""


def _cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oriented (u < v) distinct edge list of the high-quantity
    co-supply graph shared by q119/q120: suppliers are linked when
    both shipped a qty>=45 lineitem in the same order. Per-order edge
    fan-out is C(k,2) on k = qualifying suppliers per order — bounded
    small by order shape, so the generate-then-distinct stays linear
    in lineitems at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.filter(F.col("l_quantity") >= 45)
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    return (
        ps.alias("a")
        .join(ps.alias("b"), "o")
        .filter(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
    )


# --------------------------------------------------------------- Q119
def q119_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census of the high-quantity co-supply graph:
    vertices are suppliers, an edge links two suppliers that both
    shipped a qty>=45 lineitem in the SAME order. Emits the classic
    graph summary (n_vertices, n_edges, n_wedges, n_triangles) —
    the structure report one runs on a near-dup pair graph before
    choosing a clustering strategy (dense cores vs sparse chains).

    Shape: the triangle chain runs on a DEGREE-ORDERED orientation
    (operators.graph.orient_by_degree — each edge points to its
    higher-degree endpoint, ties by id), so each triangle is counted
    exactly once by the e1=(u,v) ⋈ e2=(v,w) ⋈ e3=(u,w) chain with NO
    /6 correction, and every out-degree is bounded by O(sqrt(m)) even
    under a power-law hub — the wedge join from one vertex is
    out-deg², which id-orientation leaves unbounded for a low-id hub
    but degree-orientation caps at O(m). The triangle COUNT is
    orientation-invariant (any acyclic orientation), so the oracle's
    simpler id-oriented chain hashes identically. All three joins are
    hash equi-joins on supplier keys; the two scalar aggregate
    branches (degree stats, triangle count) are 1-row frames combined
    by unionByName + a final max-fold, never a constant-key cross
    join (which Catalyst folds to a nested-loop).

    At 100 TB: the per-order edge fan-out is C(k,2) on k = qualifying
    suppliers per order (bounded small by order shape); wedge/triangle
    stats are pure integer math (sum deg·(deg−1) is even, the /2 is
    exact), so the oracle hash is engine-independent."""
    from a2b_spark.operators.graph import orient_by_degree

    e_und = _cosupply_edges(spark, sf_dir)
    # one pipeline feeds the degree stats AND two sides of the triangle
    # join — pin it so the order-distinct + edge-distinct work runs once
    e_und = e_und.localCheckpoint()
    e = orient_by_degree(e_und)
    deg = (
        e_und.select(F.col("u").alias("x"))
        .unionAll(e_und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    deg_stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        (F.sum("deg") / F.lit(2)).cast("long").alias("n_edges"),
        (F.sum(F.col("deg") * (F.col("deg") - F.lit(1))) / F.lit(2))
        .cast("long")
        .alias("n_wedges"),
    )
    tri_stats = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .join(
            e.alias("e3"),
            (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    nulls = F.lit(None).cast("long")
    combined = deg_stats.select(
        "n_vertices", "n_edges", "n_wedges", nulls.alias("n_triangles")
    ).unionByName(
        tri_stats.select(
            nulls.alias("n_vertices"),
            nulls.alias("n_edges"),
            nulls.alias("n_wedges"),
            "n_triangles",
        )
    )
    return combined.agg(
        F.max("n_vertices").alias("n_vertices"),
        F.max("n_edges").alias("n_edges"),
        F.max("n_wedges").alias("n_wedges"),
        F.max("n_triangles").alias("n_triangles"),
    )


O_Q119 = """
WITH ps AS (
  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
  FROM lineitem WHERE l_quantity >= 45),
e AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM ps a JOIN ps b ON a.o = b.o AND a.s < b.s),
deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) GROUP BY 1)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_vertices,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
  (SELECT CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) FROM deg) AS n_wedges,
  (SELECT CAST(COUNT(*) AS BIGINT)
   FROM e e1
   JOIN e e2 ON e2.u = e1.v
   JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
"""


# --------------------------------------------------------------- Q120
def q120_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the co-supply graph
    (q119's edge set): the 20 supplier pairs sharing the most
    neighbors, with each endpoint's degree — the integer inputs to
    any neighborhood-similarity score (Jaccard common/(du+dv−common),
    Adamic-Adar), left un-divided so the result hashes exactly.

    Shape: the candidate pairs are generated per CENTER vertex x
    (a1.x = a2.x, a1.y < a2.y — Σ deg(x)² wedge rows, ~1.2M at
    sf0.1), then one hash aggregation; degrees attach by broadcast.
    The global top-20 is a TakeOrdered (per-partition partial top-k,
    no full sort) on the total order (common DESC, u, v).

    Hub hazard, MITIGATED: Σ deg² means one degree-10^6 hub would
    emit 10^12 wedge rows in a single key group. The self-join
    therefore runs on operators.graph.cap_adjacency(hub_cap=1024) —
    a deterministic md5-ordered neighbor cap bounding the worst
    vertex at cap² ≈ 10^6 wedge rows. Vertices with deg <= cap
    contribute EXACTLY; through a capped hub a pair's count becomes
    a uniform cap/deg subsample (bound documented on the operator).
    Max degree here is 58 at sf0.1, so the capped plan is
    bit-identical to the uncapped oracle at every test SF —
    equivalence pinned by tests/test_operators.py. Reported degrees
    (deg_u/deg_v) are always the TRUE uncapped degrees."""
    from a2b_spark.operators.graph import cap_adjacency

    e = _cosupply_edges(spark, sf_dir)
    adj = e.select(F.col("u").alias("x"), F.col("v").alias("y")).unionAll(
        e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    # pin: adj feeds the true-degree agg and BOTH sides of the wedge
    # self-join (through the cap's own top-k pre-pass)
    adj = adj.localCheckpoint()
    deg = adj.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    capped = cap_adjacency(adj, "x", "y", cap=1024)
    cn = (
        capped.alias("a1")
        .join(capped.alias("a2"), "x")
        .filter(F.col("a1.y") < F.col("a2.y"))
        .groupBy(F.col("a1.y").alias("u"), F.col("a2.y").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    out = (
        cn.join(F.broadcast(deg.select(F.col("x").alias("u"), F.col("deg").alias("deg_u"))), "u")
        .join(F.broadcast(deg.select(F.col("x").alias("v"), F.col("deg").alias("deg_v"))), "v")
        .orderBy(F.col("common").desc(), "u", "v")
        .limit(20)
    )
    return out.select("u", "v", "common", "deg_u", "deg_v")


O_Q120 = """
WITH ps AS (
  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
  FROM lineitem WHERE l_quantity >= 45),
e AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM ps a JOIN ps b ON a.o = b.o AND a.s < b.s),
adj AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v AS x, u AS y FROM e),
deg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
cn AS (
  SELECT a1.y AS u, a2.y AS v, CAST(COUNT(*) AS BIGINT) AS common
  FROM adj a1 JOIN adj a2 ON a1.x = a2.x AND a1.y < a2.y
  GROUP BY 1, 2)
SELECT cn.u, cn.v, cn.common, du.deg AS deg_u, dv.deg AS deg_v
FROM cn
JOIN deg du ON du.x = cn.u
JOIN deg dv ON dv.x = cn.v
ORDER BY cn.common DESC, cn.u, cn.v
LIMIT 20
"""


# --------------------------------------------------------------- Q121
_Q121_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")


def q121_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report for every lineitem FK: distinct keys,
    total rows, hottest key's row count, and the exact p99 of
    rows-per-key — the diagnostic one runs BEFORE choosing a shuffle
    strategy at 100 TB (a max_rows ≫ p99_rows key wants salting or an
    AQE skew join; a flat profile wants plain hash partitioning).

    Shape: per key column, one hash aggregation to rows-per-key, a
    second to the count-of-counts histogram, then the cross-multiplied
    integer percentile (q116's idiom: smallest n with cum·100 ≥
    tot·99, no division) over that histogram. The unpartitioned
    window runs only on the histogram — tens of rows (distinct count
    VALUES), never row data. Everything emitted is a BIGINT, so the
    oracle hash is engine-exact; ratios (hot-key share) are left to
    the consumer."""
    li = _t(spark, sf_dir, "lineitem")
    parts = []
    for c in _Q121_KEYS:
        g = li.groupBy(F.col(c).alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        h = g.groupBy("n").agg(F.count(F.lit(1)).cast("long").alias("keys"))
        s = h.select(
            "n",
            "keys",
            F.sum("keys").over(W.orderBy("n")).alias("cum"),
            F.sum("keys").over(W.partitionBy()).alias("tot"),
        )
        parts.append(
            s.agg(
                F.max("tot").alias("n_keys"),
                F.sum(F.col("n") * F.col("keys")).cast("long").alias("total_rows"),
                F.max("n").alias("max_rows"),
                F.min(
                    F.when(F.col("cum") * 100 >= F.col("tot") * 99, F.col("n"))
                ).alias("p99_rows"),
            ).select(
                F.lit(c).alias("join_key"),
                "n_keys",
                "total_rows",
                "max_rows",
                "p99_rows",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("join_key")


def _o_q121() -> str:
    ctes, selects = [], []
    for i, c in enumerate(_Q121_KEYS, 1):
        ctes.append(
            f"g{i} AS (SELECT {c} AS k, CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM lineitem GROUP BY 1),\n"
            f"h{i} AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS keys FROM g{i} GROUP BY 1),\n"
            f"s{i} AS (SELECT n, keys, SUM(keys) OVER (ORDER BY n) AS cum, "
            f"SUM(keys) OVER () AS tot FROM h{i})"
        )
        selects.append(
            f"SELECT '{c}' AS join_key,\n"
            f"       CAST(MAX(tot) AS BIGINT) AS n_keys,\n"
            f"       CAST(SUM(n * keys) AS BIGINT) AS total_rows,\n"
            f"       MAX(n) AS max_rows,\n"
            f"       MIN(CASE WHEN cum * 100 >= tot * 99 THEN n END) AS p99_rows\n"
            f"FROM s{i}"
        )
    body = "\nUNION ALL\n".join(selects)
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT * FROM (\n" + body + "\n) ORDER BY join_key"
    )


QUERIES.update(
    {
        "q112_table_profile": q112_table_profile,
        "q113_semantic_dedup": q113_semantic_dedup,
        "q114_source_overlap": q114_source_overlap,
        "q115_pmi_bigrams": q115_pmi_bigrams,
        "q116_length_percentiles": q116_length_percentiles,
        "q117_quality_budget_curve": q117_quality_budget_curve,
        "q118_length_outliers": q118_length_outliers,
        "q119_triangle_count": q119_triangle_count,
        "q120_common_neighbors": q120_common_neighbors,
        "q121_join_skew_report": q121_join_skew_report,
    }
)

ORACLES.update(
    {
        "q112_table_profile": _o_q112(),
        "q113_semantic_dedup": O_Q113,
        "q114_source_overlap": O_Q114,
        "q115_pmi_bigrams": O_Q115,
        "q116_length_percentiles": O_Q116,
        "q117_quality_budget_curve": O_Q117,
        "q118_length_outliers": O_Q118,
        "q119_triangle_count": O_Q119,
        "q120_common_neighbors": O_Q120,
        "q121_join_skew_report": _o_q121(),
    }
)
