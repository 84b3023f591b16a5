"""Deequ-style ExpectationSuite: one-pass dataset-level quality
metrics. Contract pins: single aggregation job, definition-order
report, NULL/empty semantics (can't certify -> failed), approx
uniqueness path."""

import pytest

from a2b_spark.operators.expectations import ExpectationSuite


def test_suite_metrics_and_pass_fail(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5.0, "X"),
            (2, "b", -3.0, "Y"),
            (3, None, 12.0, "X"),
            (3, "d", None, "Z"),
        ],
        "k long, name string, score double, tag string",
    )
    rep = (
        ExpectationSuite()
        .completeness("name", min_ratio=0.9)
        .uniqueness("k", min_ratio=1.0)
        .min_value("score", -10.0)
        .max_value("score", 10.0)
        .in_set("tag", ["X", "Y"], min_ratio=0.5)
        .satisfies("k_positive", df["k"] > 0, min_ratio=1.0)
        .size_between(2, 10)
        .run(df)
    )
    rows = {(r.expectation, r.column): (r.metric, r.passed) for r in rep.collect()}
    assert rows[("completeness", "name")] == (0.75, False)
    assert rows[("uniqueness", "k")] == (0.75, False)  # k=3 twice
    assert rows[("min_value", "score")] == (-3.0, True)
    assert rows[("max_value", "score")] == (12.0, False)
    assert rows[("in_set", "tag")] == (0.75, True)
    assert rows[("satisfies", "k_positive")] == (1.0, True)
    assert rows[("size_between", "*")] == (4.0, True)
    # definition order preserved
    assert [r.expectation for r in rep.collect()][0] == "completeness"


def test_single_pass_and_edge_semantics(spark):
    sc = spark.sparkContext
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "k long, x double")
    suite = (
        ExpectationSuite()
        .completeness("x")
        .min_value("x", 0.0)
        .max_value("x", 99.0)
        .in_set("k", list(range(100)))
    )
    sc.setJobGroup("exp_probe", "one-pass expectations")
    suite.run(df).collect()
    jobs = sc.statusTracker().getJobIdsForGroup("exp_probe")
    sc.setJobGroup("", "")
    # one agg job + the report createDataFrame/collect job(s): the
    # METRIC computation itself must not fan out per expectation
    assert len(jobs) <= 3

    # empty input: nothing can be certified
    empty = df.filter("k < 0")
    rep = ExpectationSuite().completeness("x").min_value("x", 0.0).run(empty)
    assert all(not r.passed and r.metric is None for r in rep.collect())

    # all-NULL column: min_value cannot certify
    nulls = spark.createDataFrame([(1, None), (2, None)], "k long, x double")
    rep2 = ExpectationSuite().min_value("x", 0.0).completeness("x").run(nulls)
    got = {r.expectation: (r.metric, r.passed) for r in rep2.collect()}
    assert got["min_value"] == (None, False)
    assert got["completeness"] == (0.0, False)

    # approx uniqueness path runs (HLL, no expand)
    rep3 = ExpectationSuite(approx=True).uniqueness("k", 0.5).run(df)
    r = rep3.collect()[0]
    assert r.passed and 0.8 <= r.metric <= 1.2

    with pytest.raises(ValueError, match="empty"):
        ExpectationSuite().run(df)


def test_two_size_checks_do_not_interfere(spark):
    """Round-9 review finding: the hi bound rode suite-level state, so
    a second size_between silently clobbered the first's upper bound."""
    df = spark.createDataFrame([(i,) for i in range(75)], "k long")
    rep = ExpectationSuite().size_between(10, 50).size_between(10, 1000).run(df)
    rows = [r.passed for r in rep.collect()]
    assert rows == [False, True]  # 75 > 50 fails; 75 <= 1000 passes
