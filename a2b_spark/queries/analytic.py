"""Subquery, grouping-set, and pipeline-analytics coverage: the query
shapes an engine must decorrelate/plan well beyond plain joins+aggs —
correlated scalar subqueries (TPC-H Q17 shape), correlated EXISTS
(Q4 shape), NOT EXISTS + uncorrelated scalar threshold (Q22 shape),
explicit GROUPING SETS, a cascading time-hierarchy rollup, window
frames (q81) — plus the dataset-assembly surface: distributed
sequence packing (q76), corpus mixture rebalancing (q77), KMV
distinct sketches (q78), retention cohorts / funnels (q79, q80),
exact-k reservoirs (q82), hash-range splits (q83), length-bucketed
batching (q84), and migration-validation fingerprints (q85).

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

from a2b_spark.operators import dedup as D
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
    # integer div, not double division: a correctly-rounded double
    # ratio can land across an integer boundary and truncate to a
    # different bucket than the oracle's integer //
    hour = F.expr("ts_us div 3600000000").cast("long")
    hourly = (
        e.groupBy(hour.alias("bucket_hour"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,3)")).alias("dv"),
        )
    )
    daily = (
        hourly.groupBy(
            F.expr("bucket_hour div 24").cast("long").alias("bucket"),
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
    into fixed 8192-char packs (operators.prefix.pack_sequences —
    two-phase distributed prefix sum, never a single global window
    partition). Output is per-pack: how many docs and chars each
    training sequence carries — the batch-shape accounting step before
    tokenizer sharding.

    The pack weight is the EXISTING integer column ``n_chars``, not a
    derived regex token count: the operator under test is the
    distributed prefix sum / packing, and tokenization has its own
    oracles (q23/q61). Deriving the weight via ``\\s+`` splits in two
    different regex engines (Spark vs the oracle's DuckDB) made the
    oracle pair version-sensitive — one divergent document shifts
    every later pack boundary (rounds 4–5 postmortem, PORTING.md)."""
    from a2b_spark.operators.prefix import pack_sequences

    d = _t(spark, sf_dir, "documents")
    packed = pack_sequences(d, "doc_id", F.col("n_chars"), budget=8192)
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
-- pack_id MUST be cast to BIGINT: DuckDB promotes the window SUM over
-- BIGINT to HUGEINT, so the uncast `//` result Arrow-exports as
-- decimal128(38,0) while Spark emits bigint — the driver value hash
-- then mismatches even though every value is identical (rounds 4-6 red).
WITH toks AS (
  SELECT doc_id, n_chars AS tokens
  FROM documents),
run AS (
  SELECT doc_id, tokens,
         SUM(tokens) OVER (ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS running
  FROM toks)
SELECT CAST((running - tokens) // 8192 AS BIGINT) AS pack_id,
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
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    # global-window min over the COUNTS AGGREGATE — an unpartitioned
    # window is the single-task anti-pattern on row data, but here it
    # runs over ≤ #languages rows (the aggregate), where it is the
    # cheapest way to attach the global min without a cross join
    # (which Catalyst would plan as a nested-loop after folding any
    # constant join key)
    rates = F.broadcast(
        counts.withColumn("m", F.min("cnt").over(W.partitionBy()))
    )
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


# --------------------------------------------------------------- Q78
def q78_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate COUNT(DISTINCT) via the k-minimum-values sketch
    (operators.sketch.kmv_distinct) next to the exact count — the
    estimate is deterministic integer arithmetic over md5 hashes, so
    unlike HLL it is oracle-checkable bit-for-bit. k=64 → ~13% rel.
    error; the same call with k=1024 is ~3%. The exact twin column
    shows the error in the result itself."""
    from a2b_spark.operators.sketch import kmv_distinct

    e = _t(spark, sf_dir, "events")
    est = kmv_distinct(e, ["event_type"], "user_id", k=64)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type", "exact_distinct", "n_seen", "est_distinct"
    )


def _o_q78() -> str:
    from a2b_spark.operators.sketch import kmv_oracle_sql

    kmv = kmv_oracle_sql("events", ["event_type"], "user_id", k=64)
    return f"""
WITH kmv AS ({kmv}),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type)
SELECT event_type, exact_distinct, n_seen, est_distinct
FROM kmv JOIN exact USING (event_type)
"""


O_Q78 = _o_q78()


# --------------------------------------------------------------- Q79
def q79_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted on each later day-offset they were active. Two grouped
    aggregations sharing the user_id shuffle key (the min-day pass and
    the distinct activity pass co-partition) + one broadcast-size join
    of per-user cohorts back onto per-user-day activity. The classic
    product-analytics rollup, all codegen."""
    e = _events(spark, sf_dir)
    day = F.expr("ts_us div 86400000000").cast("long")  # exact integer div
    activity = e.select("user_id", day.alias("day")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


O_Q79 = """
WITH activity AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // 1000 // 86400000000 AS day
  FROM events),
cohort AS (
  SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id)
SELECT cohort_day, day - cohort_day AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM activity JOIN cohort USING (user_id)
GROUP BY cohort_day, day_offset
"""


# --------------------------------------------------------------- Q80
def q80_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user
    converts a stage only with an event strictly AFTER their previous
    stage's first event. Formulated as three stacked window passes
    reusing ONE user_id exchange (each later window keeps the previous
    partitioning — no extra shuffle), then a single global aggregate.
    No per-stage self-joins: at 100 TB the join formulation would
    shuffle the events table once per stage."""
    e = _events(spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id")
    first_view = F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w)
    staged = e.select("user_id", "event_type", "ts_us", first_view.alias("t_view"))
    first_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_us") > F.col("t_view")),
            F.col("ts_us"),
        )
    ).over(w)
    staged = staged.select("user_id", "event_type", "ts_us", "t_view", first_click.alias("t_click"))
    first_buy = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("t_click")),
            F.col("ts_us"),
        )
    ).over(w)
    per_user = (
        staged.select("user_id", "t_view", "t_click", first_buy.alias("t_buy"))
        .groupBy("user_id")
        .agg(
            F.max("t_view").alias("t_view"),
            F.max("t_click").alias("t_click"),
            F.max("t_buy").alias("t_buy"),
        )
    )
    return per_user.agg(
        F.count("t_view").cast("long").alias("n_view"),
        F.count("t_click").cast("long").alias("n_view_click"),
        F.count("t_buy").cast("long").alias("n_view_click_buy"),
    )


O_Q80 = """
WITH v AS (
  SELECT user_id, MIN(epoch_ns(ts) // 1000) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(epoch_ns(ts) // 1000) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE event_type = 'click' AND epoch_ns(ts) // 1000 > v.t_view
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(epoch_ns(ts) // 1000) AS t_buy
  FROM events e JOIN c USING (user_id)
  WHERE event_type = 'purchase' AND epoch_ns(ts) // 1000 > c.t_click
  GROUP BY e.user_id)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_view_click_buy
"""


# --------------------------------------------------------------- Q81
def q81_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame coverage beyond plain rank/lag: a bounded ROWS
    frame (3-order moving sum, decimal-exact), ntile quartiles, and
    percent_rank — all over ONE window partitioning (o_custkey), so
    the plan carries a single shuffle+sort for the three functions.
    Ordering is keyed by o_orderkey (unique), making every frame
    deterministic and the int/int percent_rank division bit-identical
    across engines."""
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    frame = w.rowsBetween(-2, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(frame)
        .cast("double")
        .alias("moving_sum3"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
    )


O_Q81 = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3,
  NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS quartile,
  PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pr
FROM orders
"""


# --------------------------------------------------------------- Q82
def q82_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample per stratum: EXACTLY
    min(k, |group|) documents per language, chosen by md5-hash order —
    the reservoir-sampling contract (uniform, exact size) without the
    sequential reservoir state, so it distributes as one window over
    the group key and stays reproducible across engines, runs, and
    partitionings. Complements rate-based q43/q51/q69: those bound
    EXPECTED size; training-data recipes that say "exactly 50 docs per
    language" need this one."""
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("rsv"), F.col("doc_id").cast("string")).cast("binary")), 1, 15),
        16,
        10,
    ).cast("long")
    w = W.partitionBy("lang").orderBy(u.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 50)
        .select("doc_id", "lang", "source", "n_chars")
    )


O_Q82 = """
WITH r AS (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY CAST(('0x' || substring(md5('rsv' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) ASC,
                    doc_id ASC) AS rn
  FROM documents)
SELECT doc_id, lang, source, n_chars FROM r WHERE rn <= 50
"""


# --------------------------------------------------------------- Q83
def q83_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by hash range —
    the split is a pure function of doc_id (stable as the corpus
    grows: adding documents never moves an existing one across
    splits, unlike ntile/percent-based splits). Output: per
    (lang, split) counts — the stratification report a dataset card
    publishes. One scan + one tiny agg, no shuffle of the data."""
    d = _t(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("split"), F.col("doc_id").cast("string")).cast("binary")), 1, 15),
        16,
        10,
    ).cast("long") % 100
    split = (
        F.when(u < 80, F.lit("train")).when(u < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


O_Q83 = """
WITH d AS (
  SELECT lang,
         CAST(('0x' || substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS u
  FROM documents)
SELECT lang,
       CASE WHEN u < 80 THEN 'train' WHEN u < 90 THEN 'val' ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM d GROUP BY 1, 2
"""


# --------------------------------------------------------------- Q84
def q84_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching stats: documents grouped into power-of-
    two token-length buckets (the dynamic-batching layout that
    minimizes padding waste when forming training batches). Reports
    per-bucket doc count, token total, and the padding overhead of
    batching that bucket to its max length — the number a pipeline
    uses to pick bucket boundaries. floor(log2) via bigint bit length
    keeps the bucketing integer-exact in both engines."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    staged = d.select(toks.alias("tokens")).filter(F.col("tokens") > 0)
    # bucket = floor(log2(tokens)): binary-representation length - 1 —
    # integer-exact (no float log whose rounding could flip a power of
    # two across engines)
    bucket = (F.length(F.conv(F.col("tokens"), 10, 2)) - 1).cast("long")
    return (
        staged.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tokens").cast("long").alias("n_tokens"),
            F.max("tokens").cast("long").alias("max_tokens"),
            (F.count(F.lit(1)) * F.max("tokens") - F.sum("tokens"))
            .cast("long")
            .alias("padding_waste"),
        )
    )


O_Q84 = """
WITH t AS (
  SELECT len(regexp_split_to_array(trim(text), '\\s+')) AS tokens
  FROM documents),
s AS (SELECT CAST(tokens AS BIGINT) AS tokens FROM t WHERE tokens > 0)
SELECT CAST(length(bin(tokens)) - 1 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS n_tokens,
       CAST(MAX(tokens) AS BIGINT) AS max_tokens,
       CAST(COUNT(*) * MAX(tokens) - SUM(tokens) AS BIGINT) AS padding_waste
FROM s GROUP BY 1
"""


# --------------------------------------------------------------- Q85
def q85_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Migration-validation fingerprint of the customer table
    (operators.validate.table_fingerprint): order/partitioning-
    independent (count, xor-hash, decimal hash-sum) triple — the
    source-vs-destination equality check a cut-over runs, computable
    by ANY engine over the same rows (which is exactly what this
    oracle demonstrates: DuckDB derives the identical fingerprint
    independently). Floats ride at a fixed decimal scale so the
    fingerprint never depends on float printing."""
    from a2b_spark.operators.validate import table_fingerprint

    d = _t(spark, sf_dir, "customer")
    return table_fingerprint(
        d,
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        decimals={"c_acctbal": 2},
    )


def _o_q85() -> str:
    from a2b_spark.operators.validate import fingerprint_oracle_sql

    return fingerprint_oracle_sql(
        "customer",
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
        decimals={"c_acctbal": 2},
    )


O_Q85 = _o_q85()


# --------------------------------------------------------------- Q86
def q86_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (covariance/correlation of quantity vs
    price per return flag) with CROSS-ENGINE EXACT values: the naive
    corr()/covar_samp() aggregates accumulate in floats whose summation
    order differs per engine, so instead the sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) accumulate in exact DECIMAL and the
    final covariance/correlation is ONE fixed double expression over
    their double casts. The casts themselves can double-round
    differently per engine once the scaled decimal exceeds 2⁵³
    (Java BigDecimal.doubleValue is one correctly-rounded conversion;
    an int128/10^scale path rounds twice), so the OUTPUTS take the
    repo's standard final rounding (corr to 9 — it lives in [-1,1];
    covar to 4) to absorb the ≤2-ulp divergence (first seen as a
    3e-18 corr diff at sf0.001). One scan, map-side-combined
    aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(38,4)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(38,4)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,4)")).cast("double").alias("syy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * (F.col("n") - 1)
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(cov, 4).alias("covar_samp"),
        F.round(corr, 9).alias("corr"),
    )


O_Q86 = """
WITH s AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
  round((n * sxy - sx * sy) / (n * (n - 1)), 4) AS covar_samp,
  round((n * sxy - sx * sy)
    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9) AS corr
FROM s
"""


# --------------------------------------------------------------- Q87
def q87_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates: several differently-conditioned
    aggregates in ONE pass over orders (the idiom that replaces N
    self-joins or N scans with per-aggregate predicates), plus
    count_if and bool_or. All codegen, one shuffle."""
    _v(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               FILTER (WHERE o_totalprice > 200000) AS DOUBLE) AS big_total,
          CAST(COUNT_IF(o_orderstatus = 'O') AS BIGINT) AS n_open,
          BOOL_OR(o_totalprice > 400000) AS has_jumbo
        FROM orders
        GROUP BY o_orderpriority
        """
    )


O_Q87 = """
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       FILTER (WHERE o_totalprice > 200000) AS DOUBLE) AS big_total,
  CAST(COUNT_IF(o_orderstatus = 'O') AS BIGINT) AS n_open,
  BOOL_OR(o_totalprice > 400000) AS has_jumbo
FROM orders
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------- Q88
def q88_containment_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-based decontamination (the audit shape q59's
    any-overlap rule misses): flag (train doc, benchmark doc) pairs
    where the train doc contains ≥50% of the benchmark doc's distinct
    5-grams — a long doc embedding an eval question wholesale has tiny
    jaccard but containment ≈ 1. Same deterministic 20% hash cut as
    q59, so both views of the same leakage are oracle-checked."""
    from a2b_spark.operators.dedup import containment_contaminated_pairs
    from a2b_spark.operators.rangejoin import hash_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = hash_sample(d, "doc_id", percent=20, salt="decon")
    rest = d.join(bench.select("doc_id"), "doc_id", "left_anti")
    return containment_contaminated_pairs(
        rest, bench, "text", "doc_id", n=5, threshold=0.5
    )


O_Q88 = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         CAST(('0x' || substring(md5('decon' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 20 AS is_bench
  FROM documents),
g AS (
  SELECT doc_id, is_bench,
         unnest(list_distinct(CASE WHEN len(ws) >= 5
           THEN [list_aggregate(ws[i+1:i+5], 'string_agg', ' ') for i in range(0, len(ws)-4)]
           ELSE [list_aggregate(ws, 'string_agg', ' ')] END)) AS ng
  FROM d),
gg AS (SELECT doc_id, is_bench, ng FROM g WHERE ng <> ''),
b AS (SELECT doc_id AS bench_id, ng FROM gg WHERE is_bench),
bsz AS (SELECT bench_id, COUNT(*) AS bn FROM b GROUP BY 1),
c AS (SELECT doc_id, ng FROM gg WHERE NOT is_bench),
sh AS (SELECT c.doc_id, b.bench_id, COUNT(*) AS ns
       FROM c JOIN b ON c.ng = b.ng GROUP BY 1, 2)
SELECT sh.doc_id, sh.bench_id,
       CAST(ns AS BIGINT) AS n_shared_ngrams,
       CAST(bn AS BIGINT) AS bench_ngrams,
       CAST(ns AS DOUBLE) / bn AS containment
FROM sh JOIN bsz USING (bench_id)
WHERE CAST(ns AS DOUBLE) / bn >= 0.5
"""


# --------------------------------------------------------------- Q89
def q89_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-cluster assignment over the embedding column: one
    deterministic k-means assignment step (centroids = the 8 smallest
    vec_ids, argmin of rounded squared L2, ties to the lower centroid
    index) — the clustering primitive behind topic capping / mixture
    balancing, reduced to its oracle-checkable core. In-row transform
    + array_min over a literal centroid array: no join, no shuffle."""
    from a2b_spark.operators.similarity import kmeans_assign

    e = _t(spark, sf_dir, "embeddings")
    return kmeans_assign(e, "embedding", "vec_id", k=8)


O_Q89 = """
WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS vec
           FROM embeddings WHERE embedding IS NOT NULL),
c AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, vec AS cvec
      FROM v ORDER BY vec_id LIMIT 8),
scored AS (
  SELECT v.vec_id, c.cid,
         round(list_sum([ (v.vec[i+1] - c.cvec[i+1]) * (v.vec[i+1] - c.cvec[i+1])
                          for i in range(0, len(v.vec))]), 6) AS d
  FROM v CROSS JOIN c),
ranked AS (
  SELECT vec_id, cid, d,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
  FROM scored)
SELECT vec_id, cid AS cluster_id, d AS dist2 FROM ranked WHERE rk = 1
"""


# --------------------------------------------------------------- Q90
def q90_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: near-dup pairs (q26's
    minhash-LSH operator) attributed back to their documents' sources
    — the report that tells a curation run WHERE its duplication comes
    from (intra-crawl boilerplate vs cross-source syndication).
    Unordered source pair via least/greatest, one count per cell."""
    d = _t(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup_pairs(d, "text", "doc_id", threshold=0.8)
    src = d.select("doc_id", "source")
    labelled = (
        pairs.join(src.withColumnRenamed("doc_id", "id_a").withColumnRenamed("source", "src_a"), "id_a")
        .join(src.withColumnRenamed("doc_id", "id_b").withColumnRenamed("source", "src_b"), "id_b")
    )
    return (
        labelled.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


O_Q90 = """
SELECT least(a.source, b.source) AS source_a,
       greatest(a.source, b.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM (
  WITH t AS (
    SELECT doc_id,
           list_distinct([ws[i+1]||' '||ws[i+2]||' '||ws[i+3]
                          for i in range(0, greatest(len(ws)-2, 0))]) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM t a JOIN t b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
) p
JOIN documents a ON p.id_a = a.doc_id
JOIN documents b ON p.id_b = b.doc_id
GROUP BY 1, 2
"""


# --------------------------------------------------------------- Q91
def q91_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty attribution: for each document (in doc_id
    order), how many distinct 3-gram shingles it introduces that no
    earlier document contains — the vocabulary-growth / redundancy
    signal data-mixture audits plot as a saturation curve. One
    explode + min-per-gram + count-per-first-doc; shuffles carry the
    64-bit shingle hash (kgram contract), never the string."""
    d = _t(spark, sf_dir, "documents")
    sh = D.kgram_hash_docs(d, "text", "doc_id", 3)
    # explode_OUTER + null filter: plain explode's size-filter rewrite
    # inlines the whole k-gram HOF per generated row (the engine's
    # explode pathology — measured 3.7s → ~1s here)
    first = (
        sh.select("doc_id", F.explode_outer("khs").alias("__g"))
        .filter(F.col("__g").isNotNull())
        .groupBy("__g")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return first.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_new_ngrams")
    )


O_Q91 = """
WITH t AS (
  SELECT doc_id,
         list_distinct([ws[i+1]||' '||ws[i+2]||' '||ws[i+3]
                        for i in range(0, greatest(len(ws)-2, 0))]) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
g AS (SELECT doc_id, unnest(sh) AS ng FROM t),
fs AS (SELECT ng, MIN(doc_id) AS doc_id FROM g GROUP BY 1)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_new_ngrams
FROM fs GROUP BY 1
"""


# --------------------------------------------------------------- Q92
def q92_token_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token frequency-of-frequencies (the Zipf audit): how many
    distinct tokens occur exactly k times in the corpus. Two map-side
    combined aggregations; the token string never rides a shuffle —
    the first groupBy keys on its 64-bit hash (distinct-token counts
    are identical absent a collision, the kgram contract)."""
    d = _t(spark, sf_dir, "documents")
    tok = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("t"))
        .filter(F.length("t") > 0)
        .select(F.xxhash64("t").alias("th"))
    )
    cnt = tok.groupBy("th").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    ).select(F.col("c").cast("long").alias("occurrences"), "n_tokens")


O_Q92 = """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
cnt AS (SELECT t, COUNT(*) AS c FROM tok WHERE t <> '' GROUP BY 1)
SELECT CAST(c AS BIGINT) AS occurrences, CAST(COUNT(*) AS BIGINT) AS n_tokens
FROM cnt GROUP BY 1
"""


QUERIES = {
    "q71_correlated_scalar_subquery": q71_correlated_scalar_subquery,
    "q72_exists_correlated": q72_exists_correlated,
    "q73_not_exists_threshold": q73_not_exists_threshold,
    "q74_grouping_sets": q74_grouping_sets,
    "q75_time_rollup_cascade": q75_time_rollup_cascade,
    "q76_pack_sequences": q76_pack_sequences,
    "q77_mixture_rebalance": q77_mixture_rebalance,
    "q78_kmv_distinct": q78_kmv_distinct,
    "q79_retention_cohorts": q79_retention_cohorts,
    "q80_event_funnel": q80_event_funnel,
    "q81_window_frames": q81_window_frames,
    "q82_reservoir_per_group": q82_reservoir_per_group,
    "q83_train_val_test_split": q83_train_val_test_split,
    "q84_length_buckets": q84_length_buckets,
    "q85_table_fingerprint": q85_table_fingerprint,
    "q86_corr_stats": q86_corr_stats,
    "q87_filtered_aggregates": q87_filtered_aggregates,
    "q88_containment_decontaminate": q88_containment_decontaminate,
    "q89_kmeans_assign": q89_kmeans_assign,
    "q90_source_leakage": q90_source_leakage,
    "q91_ngram_novelty": q91_ngram_novelty,
    "q92_token_spectrum": q92_token_spectrum,
}

ORACLES = {
    "q71_correlated_scalar_subquery": O_Q71,
    "q72_exists_correlated": O_Q72,
    "q73_not_exists_threshold": O_Q73,
    "q74_grouping_sets": O_Q74,
    "q75_time_rollup_cascade": O_Q75,
    "q76_pack_sequences": O_Q76,
    "q77_mixture_rebalance": O_Q77,
    "q78_kmv_distinct": O_Q78,
    "q79_retention_cohorts": O_Q79,
    "q80_event_funnel": O_Q80,
    "q81_window_frames": O_Q81,
    "q82_reservoir_per_group": O_Q82,
    "q83_train_val_test_split": O_Q83,
    "q84_length_buckets": O_Q84,
    "q85_table_fingerprint": O_Q85,
    "q86_corr_stats": O_Q86,
    "q87_filtered_aggregates": O_Q87,
    "q88_containment_decontaminate": O_Q88,
    "q89_kmeans_assign": O_Q89,
    "q90_source_leakage": O_Q90,
    "q91_ngram_novelty": O_Q91,
    "q92_token_spectrum": O_Q92,
}
