"""Round-9 PENDING registry tranche — written in round 8, NOT yet
imported by ``a2b_spark/queries/__init__.py``.

Round 7's verdict pinned the registry for round 8: the 50-entry
driver window is exactly saturated with the 21 one-green queries
(q76 + q122–q141) plus 29 two-green ones, so adding any new query
would displace an under-covered one. These queries therefore wait:
once CORRECTNESS_r08 lands, add ``round9`` to the import list and
``for mod in (...)`` loop in ``queries/__init__.py`` and regenerate
coverage.json. Until then ``tests/test_round9_pending.py`` runs each
query against its DuckDB oracle with the same comparison the driver
uses, so the tranche cannot rot while it waits.

Coverage targets (the round-8 features):

- q142: Z-ORDER clustered scan — compact(cluster_mode="zorder") on
  two columns, then a predicate on the SECOND cluster column proves
  files were skipped (raise if not) while the oracle recomputes the
  report from the raw table: the driver hash certifies interleaved
  clustering lost no rows where lexicographic clustering cannot
  prune at all.
- q143: ADD-COLUMN schema evolution — merge a WIDENED batch into a
  live table, read back under the evolved schema (old files
  null-fill), time-travel the pre-evolution version (raise unless it
  still has the narrow schema), and report per-flag rollups the
  oracle rebuilds with CASE.
- q144: streaming CDF fold — TableChangesStream delivers per-commit
  keyed diffs (incl. the initial load as inserts) over a 3-commit
  merge/delete history; the folded per-(version, change) counts
  match the oracle's churn recomputation, certifying the streaming
  twin against batch semantics.
- q145: the a2b_table_appends Spark 4 Python streaming source driven
  availableNow into a memory sink; the rollup of the STREAMED rows
  (incl. the partition column that exists only in dir names and the
  commit tag) matches the oracle.
- q147: RESTORE — v2 repricing overwrite, then restore(v1); the CDF
  walk shows commit 3 as the exact inverse of commit 2, proving the
  hardlinked restore committed v1's content bit-for-bit.
- q146: the stdlib PNG codec under the driver hash — rule-derived
  solid PNGs are synthesized, decoded back by decode_media
  (decoder='png') on the executors, and the decoded-dimension sums
  must reproduce the construction rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.queries.relational import _t, dsum


# --------------------------------------------------------------- Q142
def q142_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order file skipping end-to-end: orders clustered on
    (o_custkey, o_totalprice) with cluster_mode="zorder"; the report
    predicate touches ONLY the second cluster column — the case
    lexicographic range layout cannot prune — and the in-query check
    raises unless files were actually skipped. Oracle recomputes from
    the raw table, so the driver hash proves the pruned scan is
    exact."""
    import os

    from a2b_spark.queries.round7 import _scratch_path
    from a2b_spark.storage.table import VersionedParquetTable

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    path = _scratch_path(sf_dir, "q142")
    t = VersionedParquetTable(path, key_cols=["o_orderkey"])
    t.overwrite(o.repartition(8, "o_orderkey"))  # hash layout: no skipping
    vdir = os.path.join(path, t.current_version())
    nbytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(vdir)
        for f in fs
        if not f.startswith(("_", "."))
    )
    # ~16 z-clustered files at ANY test SF: enough tiles that a band
    # on the SECOND cluster column provably skips some of them
    t.compact(
        spark,
        target_file_bytes=max(1, nbytes // 16),
        cluster_by=["o_custkey", "o_totalprice"],
        cluster_mode="zorder",
    )
    lo, hi = 900.0, 25000.0
    kept, total = t.prune_files([("o_totalprice", "between", (lo, hi))])
    if not (0 < len(kept) < total):  # raise, not assert: -O must not void it
        raise ValueError(
            f"zorder second-column skipping did not engage: kept {len(kept)}/{total}"
        )
    pruned = t.read_pruned(spark, [("o_totalprice", "between", (lo, hi))])
    return (
        pruned.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("o_totalprice", "total_price", 2),
        )
        .orderBy("o_orderpriority")
    )


O_Q142 = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_totalprice BETWEEN 900.0 AND 25000.0
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------- Q143
def q143_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD-COLUMN evolution over a live keyed table: v1 = orders
    without o_flag; v2 = merge of a WIDENED batch (keys %7 == 0 carry
    o_flag = o_orderpriority and a +1.0 reprice). The current read
    serves the evolved schema with old rows null-filled; time travel
    still reads v1 under its own (narrow) sidecar — checked in-query.
    Output: per-flag counts and exact repriced sums the oracle
    rebuilds with CASE."""
    import os

    from a2b_spark.queries.round7 import _scratch_path
    from a2b_spark.storage.table import VersionedParquetTable

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = _scratch_path(sf_dir, "q143")
    t = VersionedParquetTable(path, key_cols=["o_orderkey"], retention=5)
    t.overwrite(o)
    widened = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + F.lit(1.0)).alias("o_totalprice"),
            F.col("o_orderpriority").alias("o_flag"),
        )
    )
    t.merge(widened)
    v1_cols = len(t.read(spark, version=t.versions()[0]).columns)
    if v1_cols != 2:  # raise, not assert: -O must not void it
        raise ValueError(f"v1 must keep its narrow schema, saw {v1_cols} cols")
    cur = t.read(spark)
    if len(cur.columns) != 3:
        raise ValueError(f"evolved read must serve 3 cols, saw {cur.columns}")
    return (
        cur.groupBy(F.coalesce(F.col("o_flag"), F.lit("UNFLAGGED")).alias("flag"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("o_totalprice", "total_price", 2),
        )
        .orderBy("flag")
    )


O_Q143 = """
SELECT CASE WHEN o_orderkey % 7 = 0 THEN o_orderpriority
            ELSE 'UNFLAGGED' END AS flag,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0
                          THEN o_totalprice + 1.0
                          ELSE o_totalprice END AS DECIMAL(18,2)))
            AS DOUBLE) AS total_price
FROM orders
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------- Q144
def q144_changes_stream_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDF certified against batch semantics: a
    TableChangesStream consumes a 3-commit history (load, reprice
    %89, delete %97 + insert shifted %101 clones — q141's script) and
    FOLDS each delivered micro-batch into per-(commit, change)
    counts, including the initial load as inserts (which batch
    table_changes cannot express once v1 is the floor). The oracle
    recomputes every commit's churn from the source table."""
    import os

    from a2b_spark.queries.round7 import _scratch_path
    from a2b_spark.storage.cdf import TableChangesStream
    from a2b_spark.storage.table import VersionedParquetTable

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = _scratch_path(sf_dir, "q144")
    t = VersionedParquetTable(path, key_cols=["o_orderkey"], retention=5)
    t.overwrite(o)
    v2 = o.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    t.overwrite(v2)
    shift = o.agg(F.max("o_orderkey")).first()[0] + 1
    v3 = v2.filter(F.col("o_orderkey") % 97 != 0).unionByName(
        v2.filter(F.col("o_orderkey") % 101 == 0).select(
            (F.col("o_orderkey") + F.lit(shift)).alias("o_orderkey"),
            "o_totalprice",
        )
    )
    t.overwrite(v3)

    batches: list[DataFrame] = []
    stream = TableChangesStream(t, spark, os.path.join(path, "_ck"))
    stream.process_available(
        lambda df, v: batches.append(
            df.groupBy("_commit_version", "change").agg(
                F.count(F.lit(1)).cast("long").alias("n_keys")
            )
        )
    )
    out = batches[0]
    for b in batches[1:]:
        out = out.unionByName(b)
    return out.orderBy("_commit_version", "change")


O_Q144 = """
WITH s AS (SELECT MAX(o_orderkey) + 1 AS shift FROM orders)
SELECT * FROM (
  SELECT CAST(1 AS INTEGER) AS _commit_version, 'insert' AS change,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM orders HAVING COUNT(*) > 0
  UNION ALL
  SELECT CAST(2 AS INTEGER), 'update', CAST(COUNT(*) AS BIGINT)
  FROM orders WHERE o_orderkey % 89 = 0 HAVING COUNT(*) > 0
  UNION ALL
  SELECT CAST(3 AS INTEGER), 'delete', CAST(COUNT(*) AS BIGINT)
  FROM orders WHERE o_orderkey % 97 = 0 HAVING COUNT(*) > 0
  UNION ALL
  SELECT CAST(3 AS INTEGER), 'insert', CAST(COUNT(*) AS BIGINT)
  FROM orders WHERE o_orderkey % 101 = 0 HAVING COUNT(*) > 0
) ORDER BY _commit_version, change
"""


# --------------------------------------------------------------- Q145
def q145_appends_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 Python streaming data source (a2b_table_appends)
    driven END-TO-END under the oracle gate: orders lands in an
    epoch-partitioned insert-only table over three append commits
    (epoch = o_orderkey % 3), the source streams every commit
    availableNow into a memory sink, and the per-epoch rollup of the
    STREAMED rows — including the commit tag and the partition column,
    which only exists in dir names — must equal the oracle's
    recomputation from the source table. Certifies offsets, new-file
    planning, the vectorized Arrow read, and partition-value fill in
    one driver-hashed query."""
    import os

    from a2b_spark.queries.round7 import _scratch_path
    from a2b_spark.storage.cdf import VersionAppendsDataSource
    from a2b_spark.storage.table import VersionedParquetTable

    if VersionAppendsDataSource is None:
        raise RuntimeError(
            "a2b_table_appends needs pyspark >= 4 (python data source API)"
        )
    path = _scratch_path(sf_dir, "q145")
    tag = path.rsplit("_", 1)[1]
    # re-registering the same source in a session is a no-op in
    # Spark 4; real registration failures must propagate, not be
    # swallowed into a confusing "source not found" later
    spark.dataSource.register(VersionAppendsDataSource)
    t = VersionedParquetTable(
        path,
        key_cols=["o_orderkey"],
        partition_by=("epoch",),
        partitions_derived_from_keys=True,
        retention=5,
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_orderkey") % 3).cast("int").alias("epoch"),
    )
    for e in (0, 1, 2):  # one FRESH partition per commit
        t.append(o.filter(F.col("epoch") == e))
    sink = f"q145_sink_{tag}"
    finished = (
        spark.readStream.format("a2b_table_appends")
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
        # awaitTermination returns False on timeout (it only RAISES if
        # the query died); reading a partially-filled sink would show
        # up as a confusing oracle divergence instead of this error
        raise TimeoutError("a2b_table_appends availableNow stream exceeded 300s")
    return (
        spark.table(sink)
        .groupBy("epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dsum("o_totalprice", "total_price", 2),
            F.min("_commit_version").alias("commit_version"),
        )
        .orderBy("epoch")
    )


O_Q145 = """
SELECT CAST(o_orderkey % 3 AS INTEGER) AS epoch,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(o_orderkey % 3 + 1 AS INTEGER) AS commit_version
FROM orders
GROUP BY 1, 4 ORDER BY 1
"""


# --------------------------------------------------------------- Q146
def q146_png_decode_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stdlib PNG codec certified under the driver hash: each
    document (doc_id < 500) synthesizes a REAL solid-color PNG with
    rule-derived dimensions (w = 4 + id%13, h = 3 + id%7,
    c = 1 + id%3), decode_media(decoder='png') parses the actual
    bytes back on the executors (Arrow-batched mapInPandas), and the
    per-channel rollup must equal the oracle's recomputation of the
    construction rule. The dimension sums certify the HEADER parse;
    the feature sum certifies the PIXEL path (features are per-channel
    means of the decoded bytes — a broken scanline unfilter diverges
    it even when the header reads fine). Exact-sum discipline: the
    per-image mean of a solid image is exactly (id%256)/255, rounded
    to 6 by the kernel; both engines cast that double to DECIMAL(12,6)
    (unambiguous — the double sits ~1e-17 from the 6-dp value, and
    k/255 values are >=0.002 away from any rounding boundary) and sum
    exactly.
    """
    from a2b_spark.operators.multimodal import decode_media

    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 500)
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        from a2b_spark.operators.png import encode_png

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h, c = 4 + d % 13, 3 + d % 7, 1 + d % 3
                img = np.full((h, w, c), d % 256, np.uint8)
                payloads.append(bytearray(encode_png(img)))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    media = docs.mapInPandas(synth, "media_id long, payload binary")
    dec = decode_media(media, "payload", "media_id", decoder="png")
    return (
        dec.groupBy("channels")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum("width").cast("long").alias("sum_width"),
            F.sum("height").cast("long").alias("sum_height"),
            F.sum(F.col("width") * F.col("height")).cast("long").alias("sum_pixels"),
            F.sum(
                F.element_at(F.col("features"), 1).cast("decimal(12,6)")
            )
            .cast("double")
            .alias("sum_mean_feature"),
        )
        .orderBy("channels")
    )


O_Q146 = """
SELECT CAST(1 + doc_id % 3 AS INTEGER) AS channels,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(4 + doc_id % 13) AS BIGINT) AS sum_width,
       CAST(SUM(3 + doc_id % 7) AS BIGINT) AS sum_height,
       CAST(SUM((4 + doc_id % 13) * (3 + doc_id % 7)) AS BIGINT) AS sum_pixels,
       CAST(SUM(CAST(ROUND(CAST(doc_id % 256 AS DOUBLE) / 255, 6)
                     AS DECIMAL(12,6))) AS DOUBLE) AS sum_mean_feature
FROM documents
WHERE doc_id < 500
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------- Q147
def q147_restore_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE certified under the driver hash: v1 = orders, v2 = an
    overwrite repricing keys %89, v3 = restore(v1). The CDF walk must
    show commit 3 as the exact INVERSE of commit 2 (the same %89 keys
    updating back), and the oracle recomputes both counts from the
    source table — proving the hardlinked restore committed v1's
    content bit-for-bit (any drift would change the diff)."""
    from a2b_spark.queries.round7 import _scratch_path
    from a2b_spark.storage.cdf import table_changes
    from a2b_spark.storage.table import VersionedParquetTable

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = _scratch_path(sf_dir, "q147")
    t = VersionedParquetTable(path, key_cols=["o_orderkey"], retention=5)
    t.overwrite(o)
    v1 = t.current_version()
    t.overwrite(
        o.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + F.lit(1.0)
            ).otherwise(F.col("o_totalprice")),
        )
    )
    t.restore(v1)
    return (
        table_changes(t, spark)
        .groupBy("_commit_version", "change")
        .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
        .orderBy("_commit_version", "change")
    )


O_Q147 = """
SELECT * FROM (
  SELECT CAST(2 AS INTEGER) AS _commit_version, 'update' AS change,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM orders WHERE o_orderkey % 89 = 0 HAVING COUNT(*) > 0
  UNION ALL
  SELECT CAST(3 AS INTEGER), 'update', CAST(COUNT(*) AS BIGINT)
  FROM orders WHERE o_orderkey % 89 = 0 HAVING COUNT(*) > 0
) ORDER BY _commit_version, change
"""


QUERIES = {
    "q142_zorder_pruned_scan": q142_zorder_pruned_scan,
    "q143_schema_evolution": q143_schema_evolution,
    "q144_changes_stream_fold": q144_changes_stream_fold,
    "q145_appends_stream_rollup": q145_appends_stream_rollup,
    "q146_png_decode_rollup": q146_png_decode_rollup,
    "q147_restore_walk": q147_restore_walk,
}

ORACLES = {
    "q142_zorder_pruned_scan": O_Q142,
    "q143_schema_evolution": O_Q143,
    "q144_changes_stream_fold": O_Q144,
    "q145_appends_stream_rollup": O_Q145,
    "q146_png_decode_rollup": O_Q146,
    "q147_restore_walk": O_Q147,
}
