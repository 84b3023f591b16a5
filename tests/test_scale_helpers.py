"""Scale helpers: salted skew joins (result parity with plain joins)
and bucketed tables (plan-level proof the shuffle disappears)."""

import pytest
from pyspark.sql import functions as F

from a2b_spark.operators.skew import salted_agg_count, salted_join
from a2b_spark.storage.bucketed import bucketed_join_is_shuffle_free, write_bucketed


@pytest.fixture()
def skewed(spark):
    # 10k rows of key 1 (hot), 100 spread over 2..11
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select((F.col("id") % 10 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionAll(cold)


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.range(12).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    plain = skewed.join(dim, "k").agg(F.sum("w"), F.count(F.lit(1))).first()
    salted = salted_join(skewed, dim, ["k"]).agg(F.sum("w"), F.count(F.lit(1))).first()
    assert plain == salted


def test_salted_agg_matches_plain_count(spark, skewed):
    plain = {r["k"]: r["n"] for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in salted_agg_count(skewed, ["k"]).collect()}
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    write_bucketed(left, "t_bleft", ["k"], n_buckets=8)
    write_bucketed(right, "t_bright", ["k"], n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # small inputs would broadcast (which also skips bucketing);
        # force the sort-merge path the tables would take at scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # the library helper itself must report shuffle-free
        assert bucketed_join_is_shuffle_free(spark, "t_bleft", "t_bright", ["k"])
        j = spark.table("t_bleft").join(spark.table("t_bright"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert j.count() == 1000
        # and the unbucketed control DOES shuffle under the same conf
        control = left.join(right, "k")
        cplan = control._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in cplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")
