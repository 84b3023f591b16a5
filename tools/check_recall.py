"""Approx-vs-exact recall gate, Spark-vs-Spark: every approximate
operator whose oracle contract is "output == the exact twin" is
re-checked at an arbitrary scale factor WITHOUT DuckDB (whose
single-threaded all-pairs oracles take hours past sf0.01).

LSH/IVF/PQ recall guarantees are scale-dependent — more documents
mean more chances for a near-threshold pair to miss every band — so
the driver's sf0.01 gate alone doesn't prove the configs hold at
larger corpora. This runs both sides distributed and compares exact
row sets.

Usage: python tools/check_recall.py [sf_dir]   (default sf0.1;
must run with the repo root on PYTHONPATH so executors can import
a2b_spark for the Arrow-batched operators).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAIRS = [
    ("q26_near_dup_minhash_lsh", "q25_near_dup_exact_jaccard"),
    ("q36_embedding_dups_lsh", "q29_embedding_dups"),
    ("q30_knn_lsh", "q28_knn_bruteforce"),
    ("q38_knn_ivf", "q28_knn_bruteforce"),
    ("q50_knn_pq", "q28_knn_bruteforce"),
    ("q64_knn_ivf_pq", "q28_knn_bruteforce"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
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
    for approx, exact in PAIRS:
        a = rows(approx)
        if exact not in cache:
            cache[exact] = rows(exact)
        e = cache[exact]
        if a == e:
            print(f"PASS {approx} == {exact} ({len(a)} rows)")
        else:
            failures += 1
            print(
                f"FAIL {approx}: {len(a)} vs {len(e)} rows; "
                f"missing={len(e - a)} extra={len(a - e)}"
            )
    print(f"{len(PAIRS) - failures}/{len(PAIRS)} recall contracts hold at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
