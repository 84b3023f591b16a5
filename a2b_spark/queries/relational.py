"""Relational operator coverage (SURVEY §2.4): the operations the
reference delegates to its source database — projection/alias, filter,
equi-join, aggregation, anti/semi join, merge (full-outer coalesce),
point lookup — plus the standard analytics surface beyond it (window
functions, rollup, set ops, sessionization, JSON extraction).

Every query here is pure built-in DataFrame API (whole-stage codegen,
no Python UDFs) and is paired with a DuckDB oracle in ORACLES.

Scale notes: dimension joins (region/nation/supplier) are explicitly
broadcast; fact-fact joins shuffle on their keys and AQE handles
skew/strategy at runtime. Filters sit directly on the scans so
Catalyst pushes them into the Parquet readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Self-sufficient on ANY session (the correctness driver builds its
    # own): events.parquet stores TIMESTAMP(NANOS), which Spark refuses
    # unless nanos are read as raw longs. Runtime-settable conf.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts_us`` (µs since epoch, long) — integer µs are
    exact across engines. Handles every physical type the generator
    has produced: TIMESTAMP(NANOS) (read as a ns long under
    nanosAsLong), TIMESTAMP(MICROS) without tz (timestamp_ntz — the
    wall-clock is treated as UTC, independent of session timezone),
    and tz-adjusted TIMESTAMP (unix_micros)."""
    e = _t(spark, sf_dir, "events")
    ts_type = dict(e.dtypes)["ts"]
    if ts_type == "bigint":
        us = F.expr("ts div 1000")
    elif ts_type == "timestamp_ntz":
        us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    else:
        us = F.unix_micros(F.col("ts"))
    return e.withColumn("ts_us", us.cast("long"))


def dsum(col, alias: str, scale: int = 2):
    """Exact decimal accumulation, double at the boundary — engine-
    portable deterministic SUM over float money columns."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double").alias(alias) if isinstance(col, str) else F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


# --------------------------------------------------------------- Q01
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan+filter+group+agg.
    Exercises: filter pushdown, partial aggregation (map-side combine),
    decimal-exact sums."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price", 6),
            dsum(charge, "sum_charge", 6),
            (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_qty"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


O_Q01 = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------- Q02
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + column alias + predicate (the embedded source-SQL
    pattern of the reference, doc/drivers/source/dbal.rst:29-48)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 100000))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").alias("price"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
    )


O_Q02 = """
SELECT o_orderkey, o_custkey, o_totalprice AS price,
       CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year
FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000
"""


# --------------------------------------------------------------- Q03
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + group + top-10. Customer filter is
    applied before the join (pushdown); ordering has a deterministic
    tiebreak so the top-k set is stable."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1999-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-01-01")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, "revenue", 6))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


O_Q03 = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------- Q04
def q04_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join: fact tables shuffle-join, dimension
    tables (nation/region/supplier) broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue", 6))
    )


O_Q04 = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# --------------------------------------------------------------- Q05
def q05_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation by balance (custkey tiebreak) via
    the skew-bounded salted top-k (operators/topk.py): a nation
    holding half the table no longer sorts inside one window task."""
    from a2b_spark.operators.topk import top_k_per_group

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    top = top_k_per_group(
        c, ["c_nationkey"], [F.desc("c_acctbal"), F.asc("c_custkey")], k=3
    )
    return (
        top.join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("n_name", "c_custkey", "c_name", "c_acctbal", "rk")
    )


O_Q05 = """
WITH ranked AS (
  SELECT c_nationkey, c_custkey, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer)
SELECT n_name, c_custkey, c_name, c_acctbal, CAST(rk AS INTEGER) AS rk
FROM ranked JOIN nation ON c_nationkey = n_nationkey
WHERE rk <= 3
"""


# --------------------------------------------------------------- Q06
def q06_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (grouping sets) — beyond the reference's surface."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"), dsum("o_totalprice", "total"))
    )


O_Q06 = """
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------- Q07
def q07_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — the orphan-detection primitive (reference C6,
    DataMigrationExecutor.php:368-382)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


O_Q07 = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --------------------------------------------------------------- Q08
def q08_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join — the previously-migrated existence check (reference
    rowMigratedPreviously, DataMigrationMapper.php:366-383)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_acctbal")


O_Q08 = """
SELECT c_custkey, c_acctbal FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
"""


# --------------------------------------------------------------- Q09
def q09_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's keyed MERGE itself (C5): existing customer entities
    full-outer-merged with an updated batch, batch wins on match.
    Runs a2b_spark.storage.merge.merge_dataframes — the exact code the
    executor uses — against a SQL FULL OUTER JOIN + COALESCE oracle."""
    from a2b_spark.storage.merge import merge_dataframes

    c = _t(spark, sf_dir, "customer")
    existing = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
        F.lit("old").alias("status"),
    )
    batch = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            (F.col("c_acctbal") + 100.0).alias("balance"),
            F.lit("new").alias("status"),
        )
    )
    return merge_dataframes(existing, batch, ["id"])


O_Q09 = """
WITH existing AS (
  SELECT c_custkey AS id, c_name AS name, c_acctbal AS balance, 'old' AS status FROM customer),
batch AS (
  SELECT c_custkey AS id, c_name AS name, c_acctbal + 100.0 AS balance, 'new' AS status
  FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT COALESCE(b.id, e.id) AS id,
       CASE WHEN b.id IS NOT NULL THEN b.name ELSE e.name END AS name,
       CASE WHEN b.id IS NOT NULL THEN b.balance ELSE e.balance END AS balance,
       CASE WHEN b.id IS NOT NULL THEN b.status ELSE e.status END AS status
FROM existing e FULL OUTER JOIN batch b ON e.id = b.id
"""


# --------------------------------------------------------------- Q10
def q10_orphan_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan anti-diff as a query: destination keys with no source
    counterpart after a filtered re-run (C6/C7 report policy)."""
    c = _t(spark, sf_dir, "customer")
    dest_ids = c.select(F.col("c_custkey").alias("id"))
    new_source = c.filter(F.col("c_acctbal") >= 0).select(F.col("c_custkey").alias("id"))
    return dest_ids.join(new_source, "id", "left_anti")


O_Q10 = """
SELECT c_custkey AS id FROM customer
EXCEPT
SELECT c_custkey AS id FROM customer WHERE c_acctbal >= 0
"""


# --------------------------------------------------------------- Q11
def q11_idmap_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID-map lookup shape (C3): orders resolve their customer's
    destination id through a mapping relation via broadcast equi-join
    (the reference's per-row getDestIdsFromSourceIds → one join)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    id_map = c.select(
        F.col("c_custkey").alias("source_id"),
        (F.col("c_custkey") * 1000 + 7).cast("long").alias("dest_id"),
    )
    return (
        o.join(F.broadcast(id_map), o.o_custkey == id_map.source_id, "left")
        .groupBy("dest_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"), dsum("o_totalprice", "total"))
    )


O_Q11 = """
WITH id_map AS (SELECT c_custkey AS source_id, CAST(c_custkey * 1000 + 7 AS BIGINT) AS dest_id FROM customer)
SELECT dest_id, CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders LEFT JOIN id_map ON o_custkey = source_id
GROUP BY dest_id
"""


# --------------------------------------------------------------- Q12
def q12_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-point readback (C14 readMultiple): key-set lookup."""
    c = _t(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey").isin([1, 2, 3, 5, 8, 13, 21, 34, 55, 89])).select(
        "c_custkey", "c_name", "c_acctbal"
    )


O_Q12 = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE c_custkey IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
"""


# --------------------------------------------------------------- Q13
def q13_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window over an event stream: per-user inter-event gap in
    microseconds (integer-exact across engines)."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    us = F.col("ts_us")
    return (
        e.withColumn("gap_us", us - F.lag(us).over(w))
        .select("user_id", "event_id", "gap_us")
    )


O_Q13 = """
SELECT user_id, event_id,
  (epoch_ns(ts) // 1000) - LAG(epoch_ns(ts) // 1000)
    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
"""


# --------------------------------------------------------------- Q14
def q14_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gaps-and-islands): a new session starts after a
    >30 min silence; count sessions per user. The batch analogue of
    streaming session windows."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    us = F.col("ts_us")
    gap = us - F.lag(us).over(w)
    new_session = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    return (
        e.withColumn("new_s", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_s").cast("long").alias("n_sessions"))
    )


O_Q14 = """
WITH g AS (
  SELECT user_id,
    CASE WHEN (epoch_ns(ts) // 1000)
            - LAG(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          > 30 * 60 * 1000000
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
    THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions FROM g GROUP BY user_id
"""


# --------------------------------------------------------------- Q15
def q15_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a key out of the JSON props
    column, aggregate per event type."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(k).cast("long").alias("sum_k"),
            dsum("value", "sum_value"),
        )
    )


O_Q15 = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------- Q16
def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: (BUILDING ∖ big-spenders) ∪ (AUTOMOBILE ∩ positive
    balance), tagged by branch."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 150000).select(F.col("o_custkey").alias("c_custkey"))
    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    pos = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    a = building.exceptAll(big).distinct().withColumn("branch", F.lit("minus"))
    b = auto.intersect(pos).withColumn("branch", F.lit("intersect"))
    return a.unionByName(b)


O_Q16 = """
SELECT c_custkey, 'minus' AS branch FROM (
  SELECT DISTINCT c_custkey FROM (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 150000))
UNION ALL
SELECT c_custkey, 'intersect' AS branch FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_acctbal > 0)
"""


# --------------------------------------------------------------- Q17
def q17_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate kitchen-sink on one scan: distinct counts, extrema."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dsum("l_extendedprice", "sum_price"),
    )


O_Q17 = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
"""


# --------------------------------------------------------------- Q18
def q18_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^n grouping-set combinations (rollup's big sibling;
    one shuffle, Expand feeds partial aggregation)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"), dsum("o_totalprice", "total")
    )


O_Q18 = """
SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------- Q19
def q19_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts, status rows × priority columns. Explicit
    pivot value list keeps it one pass (no distinct-values pre-job) —
    the form that scales; Catalyst compiles it to conditional
    aggregation, which is also exactly how the oracle states it."""
    o = _t(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)).cast("long"))
    )
    renames = {p: f"p{p[0]}" for p in prios}  # stable, engine-neutral names
    return out.select(
        "o_orderstatus", *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(renames[p]) for p in prios]
    )


O_Q19 = """
SELECT o_orderstatus,
  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS p1,
  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS p2,
  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS p3,
  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p4,
  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS p5
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------- Q39
def q39_grouped_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined grouped aggregation (pandas GROUPED_AGG UDAF — the
    UDAF surface the reference lacks entirely): geometric mean of
    account balance per market segment. Arrow-batched per group;
    log-sum form keeps it numerically stable and oracle-expressible."""
    import numpy as np

    # explicit GROUPED_AGG eval type: this module's stringified
    # annotations (`from __future__ import annotations`) break
    # pandas_udf's hint inference
    geomean = F.pandas_udf(
        lambda v: float(np.exp(np.log(v[v > 0]).mean())),
        "double",
        F.PandasUDFType.GROUPED_AGG,
    )

    c = _t(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(F.round(geomean(F.col("c_acctbal")), 4).alias("geomean_bal"))
    )


O_Q39 = """
SELECT c_mktsegment,
  ROUND(EXP(AVG(CASE WHEN c_acctbal > 0 THEN LN(c_acctbal) END)), 4) AS geomean_bal
FROM customer GROUP BY c_mktsegment
"""


# --------------------------------------------------------------- Q41
def q41_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated scalar-MIN subquery) over the tables
    we have: for each size-15 part, the supplier(s) whose lineitem hits
    that part's minimum extended price. Spark-first: filter part FIRST
    and broadcast-semi-join it into lineitem (cuts the window input to
    the ~2% of rows that matter), then a window MIN over l_partkey —
    one shuffle, no second scan of lineitem, where the literal
    correlated-subquery translation would scan+aggregate lineitem
    twice and join. Catalyst decorrelates the SQL form the same way —
    this is that plan, stated directly."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = _t(spark, sf_dir, "supplier")
    cand = li.join(
        F.broadcast(p.select("p_partkey", "p_name")),
        li.l_partkey == F.col("p_partkey"),
    )
    w = W.partitionBy("p_partkey")
    best = cand.withColumn("min_price", F.min("l_extendedprice").over(w)).filter(
        F.col("l_extendedprice") == F.col("min_price")
    )
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.col("l_extendedprice").alias("price"),
        )
        .distinct()
    )


O_Q41 = """
SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
       l.l_extendedprice AS price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size = 15
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey)
"""


# --------------------------------------------------------------- Q45
def q45_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90 / p99) of extended
    price per return flag — the EXACT percentile (sort-based), not
    percentile_approx: both engines state the same linear interpolation
    over the sorted group, so values hash-match bit-for-bit after the
    6-decimal round."""
    li = _t(spark, sf_dir, "lineitem")
    # ONE array-argument percentile aggregate: three scalar percentile
    # calls would each buffer + sort the whole group independently
    # (ObjectHashAggregate holds raw values for exact percentiles) —
    # 3x the memory and the measured cost of the query
    pct = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).cast("long").alias("n"), pct.alias("ps"))
        .select(
            "l_returnflag",
            "n",
            F.round(F.element_at("ps", 1), 6).alias("p50"),
            F.round(F.element_at("ps", 2), 6).alias("p90"),
            F.round(F.element_at("ps", 3), 6).alias("p99"),
        )
    )


O_Q45 = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
  ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
  ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
  ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------- Q107
def q107_sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to this schema's columns): suppliers
    who were the ONLY supplier with a returned line in a multi-supplier
    order — EXISTS (another supplier in the order) composed with NOT
    EXISTS (another supplier who also had a return). The classic
    double-correlated-subquery plan, expressed as semi + anti
    self-joins of lineitem on the order key.

    Scale shape: both subqueries reduce to DISTINCT (orderkey,
    suppkey) projections of the same scan; the semi/anti joins are
    equi on l_orderkey with a residual suppkey-inequality condition —
    hash-joinable, never a nested loop. The supplier dim broadcasts.

    Reference parity: the anti-join/semi-join machinery of orphan
    detection (/root/reference/src/DataMigration/DataMigrationExecutor
    .php:275-328) generalized to correlated-pair form."""
    li = _t(spark, sf_dir, "lineitem")
    rl = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    al = li.select("l_orderkey", "l_suppkey").distinct()
    other = al.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    )
    r_other = rl.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    )
    cand = rl.join(
        other,
        (F.col("l_orderkey") == F.col("__ok")) & (F.col("l_suppkey") != F.col("__sk")),
        "left_semi",
    ).join(
        r_other,
        (F.col("l_orderkey") == F.col("__ok")) & (F.col("l_suppkey") != F.col("__sk")),
        "left_anti",
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        cand.join(F.broadcast(s), cand["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


O_Q107 = """
WITH rl AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
al AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM rl c JOIN supplier s ON c.l_suppkey = s.s_suppkey
WHERE EXISTS (SELECT 1 FROM al o
              WHERE o.l_orderkey = c.l_orderkey AND o.l_suppkey != c.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM rl r
                  WHERE r.l_orderkey = c.l_orderkey AND r.l_suppkey != c.l_suppkey)
GROUP BY 1
"""


# --------------------------------------------------------------- Q108
def q108_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier revenue over one quarter, keep the
    supplier(s) achieving the MAXIMUM — the view-plus-max-equality
    pattern. The max attaches via a global window over the per-supplier
    AGGREGATE (≤ |suppliers| rows — the repo's scalar-fanout idiom;
    a constant-key join would fold into a nested loop), and revenue
    accumulates as DECIMAL so the equality compare is engine-exact."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(dsum(disc_price, "total_revenue", 6))
    )
    mx = rev.withColumn("__mx", F.max("total_revenue").over(W.partitionBy()))
    return (
        mx.filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), mx["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


O_Q108 = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


# --------------------------------------------------------------- Q109
def q109_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): orders whose total
    quantity exceeds 300, joined back to customer — the
    aggregation-DRIVEN semi-join (the filter exists only after the
    groupBy, so no scan-level pushdown can help; the planner must
    aggregate first and join the survivors).

    Scale shape: the lineitem agg map-side-combines on l_orderkey;
    survivors (a tiny fraction) drive broadcast-able joins to orders
    and customer."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice", "total_qty",
        )
    )


O_Q109 = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
       o.o_totalprice, b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# --------------------------------------------------------------- Q110
def q110_domestic_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share), parameter-free variant: per
    (customer region, order year), the revenue share supplied
    DOMESTICALLY (supplier nation == customer nation). Five-table join
    with every dim broadcast; shares are one double division of two
    DECIMAL-accumulated sums.

    Scale shape: lineitem joins orders on the order key (the only
    big-big join — co-partitioned by AQE); customer, supplier,
    nation, region broadcast; one (region, year) agg."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    agg = (
        j.select(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").alias("year"),
            disc_price.alias("__rev"),
            F.when(F.col("s_nationkey") == F.col("c_nationkey"), disc_price)
            .otherwise(F.lit(0.0))
            .alias("__dom"),
        )
        .groupBy("region", "year")
        .agg(
            dsum(F.col("__rev"), "total_revenue", 6),
            dsum(F.col("__dom"), "domestic_revenue", 6),
        )
    )
    return agg.withColumn(
        "domestic_share", F.col("domestic_revenue") / F.col("total_revenue")
    )


O_Q110 = """
SELECT r.r_name AS region, CAST(year(o.o_orderdate) AS BIGINT) AS year,
  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue,
  CAST(SUM(CAST(CASE WHEN s.s_nationkey = c.c_nationkey
                     THEN l.l_extendedprice * (1 - l.l_discount)
                     ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS domestic_revenue,
  CAST(SUM(CAST(CASE WHEN s.s_nationkey = c.c_nationkey
                     THEN l.l_extendedprice * (1 - l.l_discount)
                     ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
    / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS domestic_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q41_min_cost_supplier": q41_min_cost_supplier,
    "q45_group_percentiles": q45_group_percentiles,
    "q02_filter_project": q02_filter_project,
    "q03_shipping_priority": q03_shipping_priority,
    "q04_region_revenue": q04_region_revenue,
    "q05_top_customers_per_nation": q05_top_customers_per_nation,
    "q06_rollup_orders": q06_rollup_orders,
    "q07_customers_without_orders": q07_customers_without_orders,
    "q08_customers_with_orders": q08_customers_with_orders,
    "q09_merge_upsert": q09_merge_upsert,
    "q10_orphan_diff": q10_orphan_diff,
    "q11_idmap_lookup": q11_idmap_lookup,
    "q12_point_lookup": q12_point_lookup,
    "q13_event_gaps": q13_event_gaps,
    "q14_sessionize": q14_sessionize,
    "q15_events_json": q15_events_json,
    "q16_set_ops": q16_set_ops,
    "q17_agg_stats": q17_agg_stats,
    "q18_cube_orders": q18_cube_orders,
    "q19_pivot_status_by_priority": q19_pivot_status_by_priority,
    "q39_grouped_udaf_geomean": q39_grouped_udaf_geomean,
    "q107_sole_return_suppliers": q107_sole_return_suppliers,
    "q108_top_supplier_revenue": q108_top_supplier_revenue,
    "q109_big_orders": q109_big_orders,
    "q110_domestic_share": q110_domestic_share,
}

ORACLES = {
    "q01_pricing_summary": O_Q01,
    "q41_min_cost_supplier": O_Q41,
    "q45_group_percentiles": O_Q45,
    "q02_filter_project": O_Q02,
    "q03_shipping_priority": O_Q03,
    "q04_region_revenue": O_Q04,
    "q05_top_customers_per_nation": O_Q05,
    "q06_rollup_orders": O_Q06,
    "q07_customers_without_orders": O_Q07,
    "q08_customers_with_orders": O_Q08,
    "q09_merge_upsert": O_Q09,
    "q10_orphan_diff": O_Q10,
    "q11_idmap_lookup": O_Q11,
    "q12_point_lookup": O_Q12,
    "q13_event_gaps": O_Q13,
    "q14_sessionize": O_Q14,
    "q15_events_json": O_Q15,
    "q16_set_ops": O_Q16,
    "q17_agg_stats": O_Q17,
    "q18_cube_orders": O_Q18,
    "q19_pivot_status_by_priority": O_Q19,
    "q39_grouped_udaf_geomean": O_Q39,
    "q107_sole_return_suppliers": O_Q107,
    "q108_top_supplier_revenue": O_Q108,
    "q109_big_orders": O_Q109,
    "q110_domestic_share": O_Q110,
}
