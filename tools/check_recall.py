"""Approx-vs-exact recall gate, Spark-vs-Spark: every approximate
operator whose oracle contract is "output == the exact twin" is
re-checked at an arbitrary scale factor WITHOUT DuckDB (whose
single-threaded all-pairs oracles take hours past sf0.01).

LSH/IVF/PQ recall guarantees are scale-dependent — more documents
mean more chances for a near-threshold pair to miss every band — so
the driver's sf0.01 gate alone doesn't prove the configs hold at
larger corpora. This runs both sides distributed and compares exact
row sets.

Usage: python tools/check_recall.py [sf_dir] [--only approx_name ...]
(default sf0.1; must run with the repo root on PYTHONPATH so executors
can import a2b_spark for the Arrow-batched operators).

``--only`` restricts to the named approx queries — the 100× path:
fabricate a corpus with tools.scale_trajectory.build_scaled(spark,100)
and run just the capped-slice q168 contract there (the other exact
twins are corpus-sized and would run for hours at 500k docs, while
q169's doc_id<2000 window stays constant-cost at ANY scale).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (approx, exact, contract): "exact" = row sets identical at any n;
# ("subset_miss", b) = NEVER any extra row (candidates are verified
# with exact cosine), and a miss RATE <= b — the documented budget of
# operators whose plan re-derives with n (q36's _srp_plan holds 1e-2
# per true pair past the n<=2000 exact-replica regime; the sf0.01
# driver oracle still certifies strict equality there);
# ("knn_recall", r) = per-query top-k NEIGHBOR-SET recall averaged
# over queries >= r (ranks/ties ignored) — the ANN-literature metric
# for PQ, whose quantized distances cannot promise equality on a
# corpus whose true-neighbor similarity gap (~0.02 here) is below the
# code resolution; exact equality still holds and is still required
# at the oracle SFs where the codebook resolves the corpus.
# ("capped_slice", id_cap) = the exact twin runs on a CAPPED corpus
# (ids < cap — its quadratic cost must stay constant-sized at every
# SF); the approx side runs FULL-scale and its rows with both ids
# under the cap must equal the twin exactly. Certifies pair-level
# recall at scale: a pair's blocking fate depends only on its own two
# signatures, never on corpus size.
PAIRS = [
    ("q26_near_dup_minhash_lsh", "q25_near_dup_exact_jaccard", "exact"),
    (
        "q168_fuzzy_key_pairs_approx_k4",
        "q169_fuzzy_key_pairs_exact_k4",
        ("capped_slice", 4000),
    ),
    ("q36_embedding_dups_lsh", "q29_embedding_dups", ("subset_miss", 0.01)),
    ("q30_knn_lsh", "q28_knn_bruteforce", "exact"),
    ("q38_knn_ivf", "q28_knn_bruteforce", "exact"),
    ("q50_knn_pq", "q28_knn_bruteforce", ("knn_recall", 0.9)),
    ("q64_knn_ivf_pq", "q28_knn_bruteforce", "exact"),
]


def _knn_set_recall(a_rows, e_rows) -> float:
    """Mean per-query |approx top-k ∩ exact top-k| / k, rows shaped
    (query_id, neighbor_id, ...)."""
    from collections import defaultdict

    a_sets, e_sets = defaultdict(set), defaultdict(set)
    for r in a_rows:
        a_sets[r[0]].add(r[1])
    for r in e_rows:
        e_sets[r[0]].add(r[1])
    if not e_sets:
        return 1.0
    return sum(
        len(a_sets[q] & nbrs) / len(nbrs) for q, nbrs in e_sets.items() if nbrs
    ) / len(e_sets)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    only: set[str] = set()
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1:])
        args = args[:i]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    pairs = [p for p in PAIRS if not only or p[0] in only]
    unknown = only - {p[0] for p in PAIRS}
    if unknown:
        print(f"unknown --only name(s): {sorted(unknown)}")
        return 2
    from a2b_spark.session import get_spark

    spark = get_spark("check-recall")
    spark.sparkContext.setLogLevel("ERROR")
    from a2b_spark.queries import QUERIES

    def rows(name):
        out = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()))
        spark.catalog.clearCache()
        return out

    cache: dict = {}
    failures = 0
    for approx, exact, contract in pairs:
        a = rows(approx)
        if exact not in cache:
            cache[exact] = rows(exact)
        e = cache[exact]
        if isinstance(contract, tuple) and contract[0] == "capped_slice":
            cap = contract[1]
            a = sorted(r for r in a if r[0] < cap and r[1] < cap)
            contract = "exact"
        a_set, e_set = set(a), set(e)
        n_miss, n_extra = len(e_set - a_set), len(a_set - e_set)
        if a == e:
            print(f"PASS {approx} == {exact} ({len(a)} rows)")
            continue
        if (
            isinstance(contract, tuple)
            and contract[0] == "subset_miss"
            and n_extra == 0
            and e
            and n_miss / len(e_set) <= contract[1]
        ):
            print(
                f"PASS {approx} subset of {exact}, miss rate "
                f"{n_miss}/{len(e_set)} = {n_miss / len(e_set):.4f} "
                f"<= budget {contract[1]}"
            )
            continue
        if isinstance(contract, tuple) and contract[0] == "knn_recall":
            rec = _knn_set_recall(a, e)
            if rec >= contract[1]:
                print(
                    f"PASS {approx} top-k set recall {rec:.4f} >= "
                    f"floor {contract[1]} vs {exact} "
                    f"({n_miss} row diffs of {len(e)})"
                )
                continue
        failures += 1
        missing = sorted(e_set - a_set)[:3]
        extra = sorted(a_set - e_set)[:3]
        print(
            f"FAIL {approx}: {len(a)} vs {len(e)} rows; "
            f"missing={n_miss} extra={n_extra}; "
            f"first missing={missing} first extra={extra}"
        )
    print(f"{len(pairs) - failures}/{len(pairs)} recall contracts hold at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
