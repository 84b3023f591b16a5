"""Round-9 second tranche: driver-grade oracle coverage of the
round-9 lakehouse features (each built this round, pytest-proven, and
here certified under the external driver's row/schema/value-hash gate):

- q148: Delta-style MERGE FILE PRUNING — a small repricing batch
  merges into a key-clustered table; the in-query check raises unless
  untouched files really HARD-LINKED (zero bytes rewritten), and the
  post-merge rollup must match the oracle's CASE recomputation, so
  the driver hash certifies no row was lost or duplicated by the
  file-granular commit.
- q149: the a2b_table_changes STREAMING source over commit-time
  change files (enable_cdf) — a merge/delete history streams
  availableNow into a memory sink; the per-(commit, change) fold plus
  the updated-rows price sum must match the oracle's churn
  recomputation. Certifies the change-file write path, offsets, and
  the vectorized read end-to-end.
- q150: DROP COLUMN schema evolution — metadata-only drop (raise
  in-query if any data file was rewritten), post-drop projection and
  PRE-drop time travel of the dropped column's values in one result
  the oracle rebuilds from the raw table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.queries.relational import _t, dsum
from a2b_spark.queries.round7 import _scratch_path


def _data_file_stats(vdir: str):
    """(paths, nlink>1 count) of the data files directly under a
    version dir (unpartitioned layout)."""
    files = [
        os.path.join(vdir, f)
        for f in os.listdir(vdir)
        if not f.startswith(("_", "."))
    ]
    linked = sum(1 for p in files if os.stat(p).st_nlink > 1)
    return files, linked


# --------------------------------------------------------------- Q148
def q148_pruned_merge_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE file pruning end-to-end: orders lands key-clustered
    (compact(cluster_by=o_orderkey) → ~16 key-ranged files), then a
    small batch reprices every 97th order (+1000.00) and inserts two
    synthetic high-key orders. The stats sidecar proves most files
    cannot hold those keys, so the commit hard-links them — the
    in-query check raises unless linked files outnumber rewritten
    ones — and the per-priority rollup of the merged table must hash-
    match the oracle's CASE recomputation over raw orders."""
    from a2b_spark.storage.table import VersionedParquetTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = _scratch_path(sf_dir, "q148")
    t = VersionedParquetTable(path, key_cols=["o_orderkey"], retention=5)
    t.overwrite(o)
    # ~16 key-ranged files at ANY test SF (q142's sizing idiom)
    vdir0 = os.path.join(path, t.current_version())
    nbytes = sum(os.path.getsize(p) for p in _data_file_stats(vdir0)[0])
    t.compact(
        spark,
        target_file_bytes=max(2 << 10, nbytes // 16),
        min_files=1,
        cluster_by=["o_orderkey"],
    )
    pre_files, _ = _data_file_stats(os.path.join(path, t.current_version()))
    if len(pre_files) < 8:
        raise RuntimeError(
            f"q148 expects a multi-file clustered layout, got {len(pre_files)}"
        )
    hi = o.agg(F.max("o_orderkey")).first()[0]
    # a NARROW key band (lowest eighth): uniformly-spread keys would
    # touch every key-ranged file and nothing could prune
    batch = o.filter(
        (F.col("o_orderkey") % 97 == 0) & (F.col("o_orderkey") * 8 <= hi)
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
    # a literal driver-side batch is ONE partition of data: bare
    # createDataFrame spreads 2 rows over defaultParallelism mostly
    # EMPTY partitions, and every downstream action of the pinned
    # batch then pays a task (plus a Python-worker round-trip) per
    # empty partition — parallelize(..., 1) pins the honest layout
    extra = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(hi + 1, "9-SYNTH", 111.11), (hi + 2, "9-SYNTH", 222.22)], 1
        ),
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    t.merge(batch.unionByName(extra))
    vdir = os.path.join(path, t.current_version())
    files, linked = _data_file_stats(vdir)
    if not linked or linked <= len(files) - linked:
        raise RuntimeError(
            f"q148 merge did not file-prune: {linked} linked of {len(files)}"
        )
    return (
        t.read(spark)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("o_totalprice", "total_price", 2),
        )
        .orderBy("o_orderpriority")
    )


O_Q148 = """
WITH merged AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 97 = 0
                   AND o_orderkey * 8 <= (SELECT MAX(o_orderkey) FROM orders)
              THEN o_totalprice + 1000.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders
  UNION ALL
  SELECT (SELECT MAX(o_orderkey) FROM orders) + 1, '9-SYNTH', 111.11
  UNION ALL
  SELECT (SELECT MAX(o_orderkey) FROM orders) + 2, '9-SYNTH', 222.22
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM merged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------- Q149
def q149_changes_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-time change files + the a2b_table_changes streaming
    source, end-to-end under the driver hash: customers land in a
    CDF-enabled table, commit 3 reprices every 13th account (+50.00)
    and inserts one synthetic key, commit 4 deletes every 41st key.
    The stream (availableNow, memory sink) must deliver exactly the
    initial inserts + the staged change files; the fold per
    (commit, change) with the repriced-rows balance sum equals the
    oracle's churn recomputation."""
    from a2b_spark.storage.cdf import TableChangesDataSource
    from a2b_spark.storage.table import VersionedParquetTable

    if TableChangesDataSource is None:
        raise RuntimeError(
            "a2b_table_changes needs pyspark >= 4 (python data source API)"
        )
    spark.dataSource.register(TableChangesDataSource)
    path = _scratch_path(sf_dir, "q149")
    tag = path.rsplit("_", 1)[1]
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    t = VersionedParquetTable(path, key_cols=["c_custkey"], retention=5)
    t.overwrite(c)                                   # v1: initial load
    t.enable_cdf()                                   # v2: layout-only
    upd = c.filter(F.col("c_custkey") % 13 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + F.lit(50.0)
    )
    hi = c.agg(F.max("c_custkey")).first()[0]
    ins = spark.createDataFrame(
        spark.sparkContext.parallelize([(hi + 1, 777.77)], 1),
        "c_custkey long, c_acctbal double",
    )
    t.merge(upd.unionByName(ins))                    # v3: update + insert
    t.delete_keys(c.filter(F.col("c_custkey") % 41 == 0)
                  .select("c_custkey"))              # v4: deletes
    sink = f"q149_sink_{tag}"
    finished = (
        spark.readStream.format("a2b_table_changes")
        .option("path", t.path)
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", os.path.join(path, "_ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    if not finished:
        raise TimeoutError("a2b_table_changes availableNow stream exceeded 300s")
    return (
        spark.table(sink)
        .groupBy("_commit_version", "change")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            dsum(F.coalesce(F.col("c_acctbal"), F.lit(0.0)), "bal_sum", 2),
        )
        .orderBy("_commit_version", "change")
    )


O_Q149 = """
SELECT * FROM (
  SELECT CAST(1 AS INTEGER) AS _commit_version, 'insert' AS change,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
  FROM customer
  UNION ALL
  SELECT 3, 'update', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(c_acctbal + 50.0 AS DECIMAL(18,2))) AS DOUBLE)
  FROM customer WHERE c_custkey % 13 = 0 HAVING COUNT(*) > 0
  UNION ALL
  SELECT 3, 'insert', CAST(1 AS BIGINT), CAST(777.77 AS DOUBLE)
  UNION ALL
  SELECT 4, 'delete', CAST(COUNT(*) AS BIGINT), CAST(0.0 AS DOUBLE)
  FROM customer WHERE c_custkey % 41 = 0 HAVING COUNT(*) > 0
) ORDER BY _commit_version, change
"""


# --------------------------------------------------------------- Q150
def q150_drop_column_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DROP COLUMN as a metadata-only commit: customers (key, balance,
    segment) land once; drop_columns('c_acctbal') must rewrite ZERO
    data files (raise unless every data file of the new version
    hard-links the old one), the post-drop read projects the
    survivors, and PRE-drop time travel still reads the dropped
    column's values — both certified in one per-segment result the
    oracle rebuilds from raw customer."""
    from a2b_spark.storage.table import VersionedParquetTable

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    path = _scratch_path(sf_dir, "q150")
    t = VersionedParquetTable(path, key_cols=["c_custkey"], retention=5)
    t.overwrite(c)
    pre_version = t.current_version()
    t.drop_columns(spark, "c_acctbal")
    vdir = os.path.join(path, t.current_version())
    files, linked = _data_file_stats(vdir)
    if not files or linked != len(files):
        raise RuntimeError(
            f"q150 drop rewrote data: {linked}/{len(files)} files linked"
        )
    post = t.read(spark)
    if "c_acctbal" in post.columns:
        raise RuntimeError("q150 post-drop read still exposes c_acctbal")
    post_counts = post.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_post")
    )
    pre = t.read(spark, version=pre_version)
    pre_sums = pre.groupBy("c_mktsegment").agg(
        dsum("c_acctbal", "bal_sum_pre", 2)
    )
    return (
        post_counts.join(pre_sums, "c_mktsegment")
        .orderBy("c_mktsegment")
        .select("c_mktsegment", "n_post", "bal_sum_pre")
    )


O_Q150 = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_post,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum_pre
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES = {
    "q148_pruned_merge_walk": q148_pruned_merge_walk,
    "q149_changes_stream_rollup": q149_changes_stream_rollup,
    "q150_drop_column_walk": q150_drop_column_walk,
}

ORACLES = {
    "q148_pruned_merge_walk": O_Q148,
    "q149_changes_stream_rollup": O_Q149,
    "q150_drop_column_walk": O_Q150,
}


# --------------------------------------------------------------- Q151
def q151_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality suite over customer, computed in ONE
    aggregation pass (operators/expectations.py) — completeness,
    uniqueness, value bounds, set membership, a custom row predicate,
    and a size gate; the oracle recomputes every metric in SQL, so the
    driver hash certifies both the metrics and the pass/fail logic."""
    from a2b_spark.operators.expectations import ExpectationSuite

    c = _t(spark, sf_dir, "customer")
    rep = (
        ExpectationSuite()
        .completeness("c_name", min_ratio=1.0)
        .uniqueness("c_custkey", min_ratio=1.0)
        .min_value("c_acctbal", -1000.0)
        .max_value("c_acctbal", 10000.0)
        .in_set(
            "c_mktsegment",
            ["BUILDING", "MACHINERY", "AUTOMOBILE"],
            min_ratio=0.4,
        )
        .satisfies(
            "name_prefixed",
            F.substring(F.col("c_name"), 1, 9) == F.lit("Customer#"),
            min_ratio=1.0,
        )
        .size_between(10, 10_000_000)
        .run(c)
    )
    return rep.orderBy("expectation", "column")


O_Q151 = """
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN c_name IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS nn,
         CAST(COUNT(DISTINCT c_custkey) AS DOUBLE) AS d,
         CAST(MIN(c_acctbal) AS DOUBLE) AS mn,
         CAST(MAX(c_acctbal) AS DOUBLE) AS mx,
         CAST(SUM(CASE WHEN c_mktsegment IN ('BUILDING','MACHINERY','AUTOMOBILE')
                       THEN 1 ELSE 0 END) AS DOUBLE) AS seg,
         CAST(SUM(CASE WHEN substr(c_name, 1, 9) = 'Customer#' THEN 1 ELSE 0 END)
              AS DOUBLE) AS ph
  FROM customer
)
SELECT * FROM (
  SELECT 'completeness' AS expectation, 'c_name' AS "column",
         nn / n AS metric, CAST(1.0 AS DOUBLE) AS threshold, nn / n >= 1.0 AS passed FROM m
  UNION ALL
  SELECT 'in_set', 'c_mktsegment', seg / n, CAST(0.4 AS DOUBLE), seg / n >= 0.4 FROM m
  UNION ALL
  SELECT 'max_value', 'c_acctbal', mx, CAST(10000.0 AS DOUBLE), mx <= 10000.0 FROM m
  UNION ALL
  SELECT 'min_value', 'c_acctbal', mn, CAST(-1000.0 AS DOUBLE), mn >= -1000.0 FROM m
  UNION ALL
  SELECT 'satisfies', 'name_prefixed', ph / n, CAST(1.0 AS DOUBLE), ph / n >= 1.0 FROM m
  UNION ALL
  SELECT 'size_between', '*', n, CAST(10.0 AS DOUBLE), n >= 10 AND n <= 10000000 FROM m
  UNION ALL
  SELECT 'uniqueness', 'c_custkey', d / n, CAST(1.0 AS DOUBLE), d / n >= 1.0 FROM m
) ORDER BY expectation, "column"
"""

QUERIES["q151_expectations_report"] = q151_expectations_report
ORACLES["q151_expectations_report"] = O_Q151


# --------------------------------------------------------------- Q152
def q152_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus saturation diagnostics for data mixing: per ingestion-
    order decile, the fraction of each document's DISTINCT word
    3-grams never seen in any earlier document (gram first-occurrence
    via one MIN aggregate; no window, no collect). A flattening curve
    says new data stops contributing novel n-grams — the standard
    go/no-go signal for continuing a crawl. Two shuffles total: gram
    first-seen agg + the gram-keyed join back (reused exchange)."""
    from a2b_spark.operators.dedup import doc_word_ngrams

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    hi = d.agg(F.max("doc_id")).first()[0] + 1
    dg = doc_word_ngrams(d, "text", "doc_id", "doc_id", 3)
    fs = dg.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per = (
        dg.join(fs, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("new_g"),
            F.count(F.lit(1)).alias("tot_g"),
        )
    )
    return (
        per.withColumn("bucket", F.expr(f"CAST(doc_id * 10 DIV {hi} AS INT)"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("new_g").cast("long").alias("new_grams"),
            F.sum("tot_g").cast("long").alias("total_grams"),
            (F.sum("new_g") / F.sum("tot_g")).alias("novelty"),
        )
        .orderBy("bucket")
    )


O_Q152 = """
WITH hi AS (SELECT MAX(doc_id) + 1 AS h FROM documents),
toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
grams AS (
  SELECT doc_id, g FROM (
    SELECT doc_id,
           CASE WHEN len(l) >= 3
                THEN list_distinct(list_transform(
                       range(1, len(l) - 1),
                       i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2]))
                ELSE [array_to_string(l, ' ')] END AS gs
    FROM toks) s, UNNEST(s.gs) AS t(g)
  WHERE length(g) > 0
),
fs AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g),
per AS (
  SELECT grams.doc_id,
         SUM(CASE WHEN fs.first_doc = grams.doc_id THEN 1 ELSE 0 END) AS new_g,
         COUNT(*) AS tot_g
  FROM grams JOIN fs USING (g)
  GROUP BY grams.doc_id
)
SELECT CAST(doc_id * 10 // h AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(new_g) AS BIGINT) AS new_grams,
       CAST(SUM(tot_g) AS BIGINT) AS total_grams,
       CAST(SUM(new_g) AS DOUBLE) / CAST(SUM(tot_g) AS DOUBLE) AS novelty
FROM per, hi
GROUP BY bucket
ORDER BY bucket
"""

QUERIES["q152_ngram_novelty_curve"] = q152_ngram_novelty_curve
ORACLES["q152_ngram_novelty_curve"] = O_Q152
