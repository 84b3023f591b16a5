"""Subquery, grouping-set, and pipeline-analytics coverage: the query
shapes an engine must decorrelate/plan well beyond plain joins+aggs —
correlated scalar subqueries (TPC-H Q17 shape), correlated EXISTS
(Q4 shape), NOT EXISTS + uncorrelated scalar threshold (Q22 shape),
explicit GROUPING SETS, a cascading time-hierarchy rollup, distributed
sequence packing, and corpus mixture rebalancing.

The subquery queries are written in Spark SQL on purpose: the point is
Catalyst's subquery decorrelation (RewriteCorrelatedScalarSubquery /
RewritePredicateSubquery turn them into aggregate+join and semi/anti
joins) — the same text runs on the DuckDB oracle modulo dialect.

Float discipline: every avg-threshold comparison is algebraically
cleared of division (``5 * qty * cnt < sum`` instead of
``qty < 0.2 * sum/cnt``) so the predicate is exact decimal/int
arithmetic in both engines — a float threshold could flip rows on the
last bit and break the value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a2b_spark.queries.relational import _events, _t, dsum


def _v(spark: SparkSession, sf_dir: str, name: str) -> None:
    _t(spark, sf_dir, name).createOrReplaceTempView(name)


# --------------------------------------------------------------- Q71
def q71_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems far below their part's average
    order quantity (small/residual orders) for one brand. The
    correlated aggregate subqueries are decorrelated by Catalyst into
    one grouped aggregate joined back on l_partkey — verify with
    .explain(): no per-row subquery execution survives.

    Exactness: ``l_quantity < 0.2 * avg(qty)`` is restated as
    ``5 * qty * cnt < sum(qty)`` — pure decimal×bigint arithmetic.

    At 100 TB: the subquery side aggregates lineitem once (map-side
    partial agg), the join is a hash join on l_partkey, and the
    brand filter pushes into the part scan; nothing is per-row."""
    for t in ("lineitem", "part"):
        _v(spark, sf_dir, t)
    return spark.sql(
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND CAST(l_quantity AS DECIMAL(18,2)) * 5 *
              (SELECT COUNT(*) FROM lineitem l2
               WHERE l2.l_partkey = part.p_partkey)
            < (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) FROM lineitem l3
               WHERE l3.l_partkey = part.p_partkey)
        """
    )


O_Q71 = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 *
      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    < (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) FROM lineitem l3
       WHERE l3.l_partkey = part.p_partkey)
"""


# --------------------------------------------------------------- Q72
def q72_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts per priority for one quarter,
    restricted to orders with at least one returned line (correlated
    EXISTS). Catalyst rewrites the EXISTS into a LEFT SEMI join on
    l_orderkey; the returnflag filter pushes into the lineitem scan
    and the date range into the orders scan."""
    for t in ("orders", "lineitem"):
        _v(spark, sf_dir, t)
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    )


O_Q72 = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------- Q73
def q73_not_exists_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    finished ('F') order — uncorrelated scalar subquery (broadcast
    single-row threshold) + NOT EXISTS (left anti join). The avg
    threshold is division-free: ``bal * cnt > sum`` in exact
    decimal×bigint arithmetic."""
    for t in ("customer", "orders"):
        _v(spark, sf_dir, t)
    return spark.sql(
        """
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
              (SELECT COUNT(*) FROM customer c2 WHERE c2.c_acctbal > 0.0)
            > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c3
               WHERE c3.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        GROUP BY c_mktsegment
        """
    )


O_Q73 = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
      (SELECT COUNT(*) FROM customer c2 WHERE c2.c_acctbal > 0.0)
    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c3
       WHERE c3.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------- Q74
def q74_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form of q06's rollup /
    q18's cube: four chosen granularities in ONE pass (Spark's Expand
    replicates each input row once per set before a single shuffle —
    not four scans). gid disambiguates aggregation levels the same
    way GROUPING() does in the oracle."""
    _v(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT)
                 AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        """
    )


O_Q74 = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
"""


# --------------------------------------------------------------- Q75
def q75_time_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style cascading time rollup: events → hourly
    aggregates → daily aggregates, where the DAY level is computed
    FROM the hourly aggregates (a second tiny shuffle over ~720 rows),
    not from raw events. That cascade is the point at 100 TB: the raw
    table is scanned once, and each coarser granularity re-aggregates
    the previous level — the continuous-aggregate pattern of
    TimescaleDB/Druid rollup, here as plain DataFrame algebra.
    Sums stay decimal until the final cast so re-aggregation is exact
    (decimal addition is associative; double addition is not)."""
    e = _events(spark, sf_dir)
    hour = F.floor(F.col("ts_us") / F.lit(3_600_000_000)).cast("long")
    hourly = (
        e.groupBy(hour.alias("bucket_hour"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,3)")).alias("dv"),
        )
    )
    daily = (
        hourly.groupBy(
            F.floor(F.col("bucket_hour") / 24).cast("long").alias("bucket"),
            "event_type",
        )
        .agg(F.sum("n").cast("long").alias("n"), F.sum("dv").alias("dv"))
        .withColumn("level", F.lit("day"))
    )
    out_h = hourly.select(
        F.col("bucket_hour").alias("bucket"),
        "event_type",
        "n",
        "dv",
    ).withColumn("level", F.lit("hour"))
    return (
        out_h.unionByName(daily)
        .select(
            "level",
            "bucket",
            "event_type",
            "n",
            F.col("dv").cast("double").alias("sum_value"),
        )
    )


O_Q75 = """
WITH hourly AS (
  SELECT epoch_ns(ts) // 1000 // 3600000000 AS bucket_hour, event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(value AS DECIMAL(18,3))) AS dv
  FROM events GROUP BY 1, 2)
SELECT 'hour' AS level, bucket_hour AS bucket, event_type, n,
       CAST(dv AS DOUBLE) AS sum_value
FROM hourly
UNION ALL
SELECT 'day' AS level, bucket_hour // 24 AS bucket, event_type,
       CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(dv) AS DOUBLE) AS sum_value
FROM hourly GROUP BY 2, 3
"""


# --------------------------------------------------------------- Q76
def q76_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: stream documents in doc_id order
    into fixed 2048-token packs (operators.prefix.pack_sequences —
    two-phase distributed prefix sum, never a single global window
    partition). Output is per-pack: how many docs and tokens each
    training sequence carries — the batch-shape accounting step before
    tokenizer sharding."""
    from a2b_spark.operators.prefix import pack_sequences

    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    packed = pack_sequences(d, "doc_id", toks, budget=2048)
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tokens").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


O_Q76 = """
WITH toks AS (
  SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS tokens
  FROM documents),
run AS (
  SELECT doc_id, tokens,
         SUM(tokens) OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS running
  FROM toks)
SELECT (running - tokens) // 2048 AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM run GROUP BY 1
"""


# --------------------------------------------------------------- Q77
def q77_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture rebalancing to a uniform language mix: compute
    per-language counts (one tiny agg), set each language's sampling
    rate to min_count/count (the dominant languages are downsampled to
    the rarest), and apply the deterministic md5 keep-filter per row.
    Unlike q51's operator-supplied fixed rates, the rates here are
    DERIVED from the data in the same plan — the self-tuning variant.

    At 100 TB: the per-language count is a broadcast-size aggregate
    (≤ #languages rows) joined back by broadcast hash join; the filter
    itself is codegen, one scan, no data shuffle."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    min_cnt = counts.agg(F.min("cnt").alias("m"))
    rates = F.broadcast(counts.crossJoin(F.broadcast(min_cnt)))
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string")).cast("binary")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 10_000
    )
    # keep iff u/10000 < m/cnt, cleared of division: u * cnt < m * 10000
    return (
        d.join(rates, "lang")
        .filter(u * F.col("cnt") < F.col("m") * 10_000)
        .select("doc_id", "lang", "source", "n_chars")
    )


O_Q77 = """
WITH counts AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt FROM documents GROUP BY lang),
m AS (SELECT MIN(cnt) AS m FROM counts)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d JOIN counts USING (lang) CROSS JOIN m
WHERE (CAST(('0x' || substring(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) % 10000) * cnt < m * 10000
"""


QUERIES = {
    "q71_correlated_scalar_subquery": q71_correlated_scalar_subquery,
    "q72_exists_correlated": q72_exists_correlated,
    "q73_not_exists_threshold": q73_not_exists_threshold,
    "q74_grouping_sets": q74_grouping_sets,
    "q75_time_rollup_cascade": q75_time_rollup_cascade,
    "q76_pack_sequences": q76_pack_sequences,
    "q77_mixture_rebalance": q77_mixture_rebalance,
}

ORACLES = {
    "q71_correlated_scalar_subquery": O_Q71,
    "q72_exists_correlated": O_Q72,
    "q73_not_exists_threshold": O_Q73,
    "q74_grouping_sets": O_Q74,
    "q75_time_rollup_cascade": O_Q75,
    "q76_pack_sequences": O_Q76,
    "q77_mixture_rebalance": O_Q77,
}
