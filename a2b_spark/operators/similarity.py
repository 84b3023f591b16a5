"""Similarity search over embedding columns.

- knn_bruteforce: exact top-k by cosine. Cost O(|queries|·|corpus|) —
  correct baseline; fine when |queries| is small or as the per-bucket
  kernel. The corpus side stays distributed; queries broadcast.
- knn_lsh: SRP-LSH bucketed candidate generation + exact re-rank —
  the scale path (no all-pairs cross join).

Determinism for the oracle: cosine computed in double with a
sequential fold, rounded to 6 decimals, ranked with (sim DESC, id ASC)
row_number — bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from a2b_spark.functions.vectors import as_double, cosine, hyperplane_bits
from a2b_spark.operators.dedup import spread


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self-matches
    excluded). Queries are broadcast; the big corpus never shuffles."""
    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    # corpus is the stream side of the broadcast join — its partition
    # count IS the parallelism; spread() is a no-op on real multi-split
    # scans and only kicks in for tiny single-file local inputs
    c = spread(corpus.select(F.col(id_col).alias("corpus_id"), as_double(vec_col).alias("cv")), 4)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("corpus_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "corpus_id", "cos", F.col("rk").cast("int").alias("rk"))
    )


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_bits: int = 4,
    n_tables: int = 24,
) -> DataFrame:
    """Approximate top-k: n_tables independent SRP signatures; a corpus
    vector is a candidate if it shares any table's bucket with the
    query. Candidates then re-rank by exact cosine. Shuffles on
    (table, bucket) only — never |q|×|c|.

    Tuning: P(candidate) per table = (1-θ/π)^n_bits. Defaults (4 bits ×
    24 tables → recall ≈ 0.98 at cos≈0.4 neighbors) suit weakly-similar
    corpora like random embeddings; for genuine near-dup search
    (cos ≥ 0.9) raise n_bits to 12-16 and drop tables, which shrinks
    buckets and cost by orders of magnitude."""
    def with_buckets(df: DataFrame, prefix: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(f"{prefix}_id"), as_double(vec_col).alias(f"{prefix}v")
        )
        return out.withColumn(
            "tb",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_tables - 1)),
                    lambda t: F.struct(
                        t.alias("table"),
                        hyperplane_bits(
                            F.col(f"{prefix}v"), n_bits, table=t
                        ).alias("bucket"),
                    ),
                )
            ),
        ).select(f"{prefix}_id", f"{prefix}v", "tb.table", "tb.bucket")

    qb = with_buckets(queries, "query")
    cb = with_buckets(spread(corpus), "corpus")
    cands = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select("query_id", "queryv", "corpus_id", "corpusv")
        .distinct()
    )
    scored = cands.withColumn("cos", F.round(cosine(F.col("queryv"), F.col("corpusv")), 6))
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("corpus_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "corpus_id", "cos", F.col("rk").cast("int").alias("rk"))
    )
