"""Round-11 tranche.

- q168: APPROXIMATE edit-distance join beyond the PassJoin window
  (operators/editjoin.py:edit_distance_pairs_approx) — fuzzy catalog-
  key pairs at levenshtein ≤ 4 via q-gram minhash-LSH blocking with
  thresholded verify. Output is deterministic (seed-fixed hashing),
  so the brute-force all-pairs oracle certifies EXACT equality at the
  driver SF: the blocking loses no qualifying pair here and the
  verify admits no extra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.queries.relational import _t

QUERIES: dict = {}
ORACLES: dict = {}


def q168_fuzzy_key_pairs_approx_k4(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fuzzy key matching at distance ≤ 4 — past the exact PassJoin
    window (k ≤ 3), where segment candidate windows grow
    quadratically. The scale path: per-key char-2-gram xxhash sets,
    64-slot minhash signatures, 64 single-row LSH bands (per-pair
    miss probability (1−j)^64 ≈ 0 for these ~40-char keys whose
    4-edit gram jaccard stays ≥ 0.6), one melt-join text fetch, then
    the thresholded codegen levenshtein verify. The oracle below is
    the brute-force quadratic this operator exists to avoid."""
    from a2b_spark.operators.editjoin import edit_distance_pairs_approx

    p = _t(spark, sf_dir, "part")
    keys = (
        p.groupBy(
            F.concat(F.col("p_name"), F.lit(" "), F.col("p_brand")).alias("key")
        )
        .agg(F.min("p_partkey").alias("pk"))
    )
    return edit_distance_pairs_approx(keys, "key", "pk", max_dist=4)


O_Q168 = """
WITH k AS (
  SELECT MIN(p_partkey) AS pk, p_name || ' ' || p_brand AS key
  FROM part GROUP BY 2)
SELECT a.pk AS id_a, b.pk AS id_b,
       CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
FROM k a JOIN k b ON a.pk < b.pk
WHERE levenshtein(a.key, b.key) <= 4
"""

QUERIES["q168_fuzzy_key_pairs_approx_k4"] = q168_fuzzy_key_pairs_approx_k4
ORACLES["q168_fuzzy_key_pairs_approx_k4"] = O_Q168
