"""Round-10 tranche: driver-grade oracle coverage of the round-10
operators.

- q153: GENERAL-k PassJoin edit-distance join (operators/editjoin.py)
  — fuzzy catalog-key pairs at levenshtein ≤ 2 with TRUE edit
  distance (length changes count; over half the qualifying pairs at
  this SF differ in length). The oracle is the brute-force all-pairs
  levenshtein, so the driver hash certifies the multi-match-aware
  substring selection loses no pair and the thresholded verify
  admits no extra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.queries.relational import _t

QUERIES: dict = {}
ORACLES: dict = {}


def q153_fuzzy_key_pairs_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy key matching at distance ≤ 2 over catalog keys
    (name + brand): the general PassJoin segment scheme — each indexed
    key splits into 3 segments, probes generate only the multi-match-
    aware substring windows (a Python-pruned literal combo explode,
    ~12 combos), candidates join equi on (length, segment, text) and
    verify with the thresholded codegen levenshtein. Never an
    all-pairs cross join; the oracle below IS the brute-force
    quadratic this operator exists to avoid."""
    from a2b_spark.operators.editjoin import edit_distance_pairs

    p = _t(spark, sf_dir, "part")
    keys = (
        p.groupBy(
            F.concat(F.col("p_name"), F.lit(" "), F.col("p_brand")).alias("key")
        )
        .agg(F.min("p_partkey").alias("pk"))
    )
    return edit_distance_pairs(keys, "key", "pk", max_dist=2)


O_Q153 = """
WITH k AS (
  SELECT MIN(p_partkey) AS pk, p_name || ' ' || p_brand AS key
  FROM part GROUP BY 2)
SELECT a.pk AS id_a, b.pk AS id_b,
       CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist
FROM k a JOIN k b ON a.pk < b.pk
WHERE levenshtein(a.key, b.key) <= 2
"""


QUERIES["q153_fuzzy_key_pairs_k2"] = q153_fuzzy_key_pairs_k2
ORACLES["q153_fuzzy_key_pairs_k2"] = O_Q153
