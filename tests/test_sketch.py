"""Distinct-count sketches (operators/sketch.py): KMV exactness below
k, KMV error bound above k, HLL accuracy, and the mergeability
contract (rollup of per-day sketches == one-pass sketch)."""

from pyspark.sql import functions as F

from a2b_spark.operators.sketch import hll_distinct, hll_rollup, kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    out = {r["g"]: r for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert out[0]["est_distinct"] == 20 and out[0]["n_seen"] == 20
    assert out[1]["est_distinct"] == 20


def test_kmv_error_bound_above_k(spark):
    n = 5000
    df = spark.range(n).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    row = kmv_distinct(df, ["g"], "v", k=256).collect()[0]
    assert row["n_seen"] == 256
    # rel err ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(row["est_distinct"] - n) / n < 0.25, row["est_distinct"]


def test_kmv_rejects_tiny_k(spark):
    import pytest

    df = spark.range(5).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        kmv_distinct(df, ["g"], "v", k=2)


def test_hll_accuracy_and_mergeability(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = e.agg(F.countDistinct("user_id")).first()[0]
    one_pass = hll_distinct(e.withColumn("g", F.lit(1)), ["g"], "user_id")
    est = one_pass.first()["est_distinct"]
    assert abs(est - exact) / exact < 0.05, (est, exact)

    # mergeability: sketch per event_type, roll up to global — the
    # estimate must EQUAL the one-pass estimate (same algorithm, and
    # HLL union is lossless at equal lgk)
    per_type = hll_distinct(e, ["event_type"], "user_id").withColumn("g", F.lit(1))
    rolled = hll_rollup(per_type, ["g"]).first()["est_distinct"]
    assert rolled == est, (rolled, est)


def test_kmv_ignores_nulls(spark):
    rows = [("a", i) for i in range(10)] + [("a", None)] * 5
    df = spark.createDataFrame(rows, "g string, v int")
    row = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert row["est_distinct"] == 10  # COUNT(DISTINCT) semantics


def test_kmv_salted_two_phase_identical(spark):
    """The salted pre-pass must not change output: k smallest overall
    ⊆ union of per-salt k smallest. Compared against the unsalted
    formulation on a group large enough that salt classes matter."""
    from a2b_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("g", i) for i in range(5000)] + [("h", i) for i in range(40)],
        "grp string, v long",
    )
    a = sorted(
        map(tuple, kmv_distinct(df, ["grp"], "v", k=64, salt_partitions=32).collect())
    )
    b = sorted(
        map(tuple, kmv_distinct(df, ["grp"], "v", k=64, salt_partitions=1).collect())
    )
    assert a == b
