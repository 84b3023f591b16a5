"""Fuzzy key reconciliation — the migration-domain use of the edit
join family (reference parity note: the reference's id-map lookup,
src/DataMigration/DataMigrationMapper.php, is exact-match only; a
dirty source corpus needs a fuzzy pre-pass to find the keys that
SHOULD have matched).

Scenario: a source system re-exports entities whose natural keys
picked up typos (OCR, manual entry, encoding damage). Exact-keyed
migration treats every typo'd key as a NEW entity — duplicating rows
on the destination. The fuzzy pre-pass finds (dirty key, canonical
key) pairs within a small edit distance, emits a reconciliation map,
and the migration then runs exact-keyed on the REPAIRED keys.

Operator choice, by distance budget:
- k ≤ 3 → ``edit_distance_pairs`` (exact PassJoin — no pair missed)
- k ≥ 4 → ``edit_distance_pairs_approx`` (q-gram minhash blocking;
  verified precise, recall engineered to saturate on id-like keys)

Run: python examples/fuzzy_key_reconciliation.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from a2b_spark.operators.editjoin import (  # noqa: E402
    edit_distance_pairs,
    edit_distance_pairs_approx,
)
from a2b_spark.session import get_spark  # noqa: E402


def main() -> int:
    spark = get_spark("fuzzy_key_reconciliation")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    # canonical registry: one md5-hex key per document
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    canon = docs.select(
        (F.col("doc_id") * 2).alias("kid"),
        F.md5(F.col("doc_id").cast("string")).alias("key"),
    )
    # dirty re-export: every key re-arrives with 1-3 damaged positions
    L = (F.col("doc_id") % 3 + 1).cast("int")
    p = (F.col("doc_id") % (F.lit(33) - L)).cast("int")
    h = F.md5(F.col("doc_id").cast("string"))
    dirty = docs.select(
        (F.col("doc_id") * 2 + 1).alias("kid"),
        F.concat(
            F.substring(h, F.lit(1), p),
            F.repeat(F.lit("x"), L),
            F.substring(h, p + L + 1, F.lit(32)),
        ).alias("key"),
    )
    universe = canon.unionByName(dirty)

    # exact PassJoin at k=3: every qualifying pair, no blocking loss
    pairs = edit_distance_pairs(universe, "key", "kid", max_dist=3)
    # orient: even kid = canonical, odd = dirty; keep (dirty -> canon)
    recon = (
        pairs.select(
            F.when(F.col("id_a") % 2 == 1, F.col("id_a"))
            .otherwise(F.col("id_b")).alias("dirty_kid"),
            F.when(F.col("id_a") % 2 == 0, F.col("id_a"))
            .otherwise(F.col("id_b")).alias("canon_kid"),
            "dist",
        )
        .filter(
            (F.col("dirty_kid") % 2 == 1) & (F.col("canon_kid") % 2 == 0)
        )
    )
    n_dirty = dirty.count()
    n_recon = recon.count()
    print(f"dirty keys          : {n_dirty}")
    print(f"reconciled at k<=3  : {n_recon}")
    assert n_recon == n_dirty, "every damaged key must find its canonical"

    # the same map through the k>=4 scale path (approx blocking)
    recon4 = edit_distance_pairs_approx(universe, "key", "kid", max_dist=4)
    n4 = recon4.count()
    print(f"approx pairs at k=4 : {n4} (superset: includes k=4 accidents)")
    assert n4 >= n_recon
    print("RECONCILIATION OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
