"""Connected components over an edge list — the step a dedup pipeline
needs between near-dup PAIR generation (minhash/simhash/embedding LSH)
and actually dropping duplicates: pairs form clusters, and the keep
decision is per-cluster (keep the minimum id), not per-pair.

Two execution paths, picked by edge-set size:

- **Small graphs** (distinct edge count <= ``collect_threshold``,
  default 2^18): one BOUNDED ``limit(T+1)`` Arrow fetch + driver
  union-find + broadcast join back. Near-dup pair lists are tiny
  relative to their corpus (they're the output of an LSH filter), so
  this is the common case even for large inputs, and it replaces ~6
  shuffles x O(log n) driver-synced rounds with two jobs. Honest
  driver cost at the default: the Arrow transfer is ~4 MB of id
  pairs, but the union-find's Python dicts dominate at ~50-150 MB
  peak (4 dict structures over up to 2^19 nodes at ~tens of bytes
  per entry) — bounded by construction, never proportional to the
  input, and sized so a modest driver absorbs it; raise the
  threshold explicitly on a large-memory driver.
- **Large graphs**: alternating large-star / small-star contraction
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14). Each round is two groupBy-min shuffles over the edge list;
  convergence is O(log n) rounds even for path graphs — NOT the
  O(diameter) of naive label propagation. At 100 TB the edge list is
  the only shuffled payload (two longs per row), every round shrinks
  it toward star form, and `localCheckpoint` truncates the growing
  lineage so round N's plan doesn't replay rounds 1..N-1.

Determinism: both star operations are pure min-reductions — the result
(each node mapped to its component's minimum id) is unique regardless
of partitioning or execution order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _driver_union_find(rows) -> dict:
    """Union-find with path halving over a collected edge list; returns
    {node: min id of its component} for every node in the edges."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for a, b in rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict = {}
    roots = {n: find(n) for n in parent}
    for n, r in roots.items():
        m = comp_min.get(r)
        if m is None or n < m:
            comp_min[r] = n
    return {n: comp_min[r] for n, r in roots.items()}


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u, connect every strictly-larger neighbor to
    m(u) = min(Γ(u) ∪ {u}). Keeps (v, m) edges with v > m."""
    sym = e.select(F.col("a"), F.col("b")).union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    m = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        sym.join(m, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Canonicalize edges to (hi, lo); for each hi, connect hi and all
    its lo-neighbors to min(Γ_lo(hi))."""
    canon = e.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    )
    m = canon.groupBy("a").agg(F.min("b").alias("m"))
    nbr = (
        canon.join(m, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    self_edge = m.select(F.col("a"), F.col("m").alias("b"))
    return (
        nbr.union(self_edge)
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    collect_threshold: int = 1 << 18,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    component is the minimum node id reachable from it. Edges are
    undirected; self-loops and duplicates are tolerated.

    Runs alternating large-star/small-star rounds until the edge set
    reaches a fixpoint (checked with one count + min-sum checksum
    aggregate per round — an O(1)-row driver fetch, not a collect of
    data). Raises if ``max_iter`` rounds don't converge, which for
    O(log n) convergence would take a graph of 2^25 ≈ 3e7 chained
    components — a config error, not a data regime.

    Job budget: exactly ONE Spark job per round. The per-round
    checkpoint is lazy (``eager=False``), so the convergence-signature
    aggregate both materializes the checkpointed edge set (persisted,
    lineage truncated) and fetches the O(1)-row signature in a single
    action — an eager checkpoint plus a separate signature job would
    double the driver-sync count on this latency-bound fixpoint loop.
    """
    # Materialize the input ONCE: edges usually arrive from an expensive
    # pair-generation pipeline (minhash/LSH), and both `nodes` and the
    # round-0 edge set (plus every downstream action) must not replay it.
    # EAGER deliberately (round-13 optimization A/B): a lazy pin whose
    # first materializing action is the small-path bounded collect was
    # measured consistently SLOWER (q68 5.5s vs 3.5s, q49 3.9 vs 3.0 —
    # CollectLimit executes partitions incrementally, so the expensive
    # pair lineage runs under several escalating limit jobs plus the
    # checkpoint-completion fill-in, instead of one straight job).
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    nodes = (
        raw.select(F.col("a").alias("n"))
        .union(raw.select(F.col("b").alias("n")))
        .distinct()
    )
    # Lazy: the next action over `e` materializes this together with
    # its own work — no standalone startup job for the initial edge set.
    e = (
        raw.filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Small-graph fast path: the fixpoint loop costs ~6 shuffles x
    # O(log n) rounds — pure scheduler latency when the (distinct,
    # self-loop-free) edge set fits in one BOUNDED fetch. limit(T+1)
    # caps driver transfer at O(T) rows regardless of input size
    # (Arrow columnar via toPandas — no per-row Row objects); if more
    # rows come back we fall through to the distributed loop having
    # spent one bounded job (which also materialized e's checkpoint,
    # so nothing is replayed). At 100 TB pair lists exceed T and
    # always take the Kiveris path.
    if collect_threshold:
        head = e.limit(collect_threshold + 1).toPandas()
        if len(head) <= collect_threshold:
            comp = _driver_union_find(
                zip(head["a"].tolist(), head["b"].tolist())
            )
            node_t = raw.schema["a"].dataType
            comp_df = raw.sparkSession.createDataFrame(
                list(comp.items()),
                T.StructType(
                    [
                        T.StructField("n", node_t),
                        T.StructField("component", node_t),
                    ]
                ),
            )
            return (
                nodes.join(F.broadcast(comp_df), "n", "left")
                .select(
                    F.col("n").alias("node"),
                    F.coalesce("component", "n").alias("component"),
                )
            )
    prev_sig = None
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # count + order-independent xor fingerprint (edges are distinct,
        # so no self-cancelling duplicates; ANSI-safe, unlike sum).
        # This action materializes e2's checkpoint as a side effect.
        sig_row = e2.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        e = e2
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # At fixpoint every edge is (node, root). Roots themselves carry no
    # outgoing edge — join nodes back so they appear as their own
    # component; isolated nodes can't occur (every node came from an edge).
    comp = e.select(F.col("a").alias("n"), F.col("b").alias("component"))
    return (
        nodes.join(comp, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.coalesce("component", "n").alias("component"),
        )
    )


def cap_adjacency(
    adj: DataFrame,
    x: str = "x",
    y: str = "y",
    cap: int = 1024,
    salts: int = 32,
) -> DataFrame:
    """Deterministic hub cap for an adjacency list: keep at most
    ``cap`` neighbors per center vertex, chosen by ascending
    md5(x,y) — a fixed pseudo-random sample that is stable across
    partitionings, engines and runs (never ``rand()``/``sample()``).

    This is the standard pre-join guard for wedge enumeration
    (common-neighbor counting, candidate generation): the self-join on
    the center vertex emits Σ deg(x)² rows, so ONE hub of degree 10^6
    emits 10^12 rows in a single key group. Capped, the worst vertex
    emits cap² — at cap=1024 that is ~10^6 rows, executor-sized.

    Approximation bound: a pair's common-neighbor count through capped
    hubs becomes a uniform subsample — for a center x with
    deg(x) = d > cap, each wedge through x survives with probability
    cap/d, so a count C is under-counted by expectation
    C·(1 - cap/d_hubs) through those hubs only; vertices with
    deg <= cap contribute EXACTLY. On graphs whose max degree is
    below ``cap`` (the co-supply graphs at every test SF) the output
    is bit-identical to the uncapped one — equivalence is pinned by
    ``tests/test_operators.py::test_cap_adjacency_equivalence``.

    Cost: one salted top-k per center (``operators.topk`` two-phase,
    no hot-key single-task window), O(Σ deg) rows total.
    """
    from a2b_spark.operators.topk import top_k_per_group

    return top_k_per_group(
        adj,
        [x],
        [F.md5(F.concat_ws("\x1f", F.col(x).cast("string"), F.col(y).cast("string"))).asc()],
        cap,
        salts=salts,
    ).drop("rk")


def orient_by_degree(
    edges: DataFrame,
    u: str = "u",
    v: str = "v",
) -> DataFrame:
    """Re-orient an undirected edge list toward the HIGHER-degree
    endpoint (ties broken by id): the classic triangle-enumeration
    refinement (degree ordering / degeneracy orientation). Any acyclic
    orientation counts each triangle exactly once via the
    e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c) chain, but id-orientation lets a
    low-id HUB keep all its edges outgoing — deg² wedge rows from one
    vertex. Degree-orientation bounds every out-degree by O(sqrt(m))
    on any graph, so the wedge join stays executor-sized even with
    power-law hubs. Output columns keep the input names, oriented
    (deg(u), id(u)) < (deg(v), id(v)) lexicographically.

    Cost: one degree aggregation + two broadcast-sized joins when the
    vertex set is broadcastable, shuffle joins otherwise — both plain
    hash equi-joins either way."""
    deg = (
        edges.select(F.col(u).alias("n"))
        .unionAll(edges.select(F.col(v).alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias(u), F.col("deg").alias("__du"))
    dv = deg.select(F.col("n").alias(v), F.col("deg").alias("__dv"))
    keep = (F.col("__du") < F.col("__dv")) | (
        (F.col("__du") == F.col("__dv")) & (F.col(u) < F.col(v))
    )
    return (
        # self-loops survive any orientation unchanged and each one
        # fabricates a phantom triangle per out-neighbor in the
        # e1⋈e2⋈e3 chain — drop them, like connected_components does
        edges.filter(~F.col(u).eqNullSafe(F.col(v)))
        .join(du, u)
        .join(dv, v)
        .select(
            F.when(keep, F.col(u)).otherwise(F.col(v)).alias(u),
            F.when(keep, F.col(v)).otherwise(F.col(u)).alias(v),
        )
    )
