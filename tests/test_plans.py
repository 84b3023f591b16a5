"""Physical-plan contracts — the 100 TB checklist as assertions, not
prose: filters reach the parquet scan (PushedFilters), projection
prunes the read schema (ReadSchema), dimension joins broadcast, and
whole-stage codegen covers the aggregation hot path."""

import pytest

SF_DIR = None  # filled by fixture


@pytest.fixture(autouse=True)
def _sf(sf_dir):
    global SF_DIR
    SF_DIR = sf_dir


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    from a2b_spark.queries.relational import q02_filter_project

    plan = plan_of(q02_filter_project(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # the query's predicates must be inside the scan, not residual-only
    seg = plan[plan.index("PushedFilters") : plan.index("PushedFilters") + 300]
    assert "EqualTo(o_orderstatus" in seg and "GreaterThan(o_total" in seg, seg


def test_column_pruning_minimal_read_schema(spark):
    from a2b_spark.queries.relational import q02_filter_project

    plan = plan_of(q02_filter_project(spark, SF_DIR))
    i = plan.index("ReadSchema")
    # slice to end-of-line: the "..." elision marker isn't always
    # present, and find() returning -1 would span the whole plan
    eol = plan.find("\n", i)
    schema = plan[i : eol if eol != -1 else len(plan)]
    # orders has 9 columns; a scan reading o_comment or o_clerk for
    # this projection would mean pruning is broken
    assert "o_comment" not in schema and "o_clerk" not in schema, schema


def test_dimension_joins_broadcast(spark):
    from a2b_spark.queries.relational import q04_region_revenue

    plan = plan_of(q04_region_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_whole_stage_codegen_covers_agg(spark):
    from a2b_spark.queries.relational import q01_pricing_summary

    df = q01_pricing_summary(spark, SF_DIR)
    import re

    df.collect()  # AQE finalizes the plan only on execution
    plan = plan_of(df)
    assert "isFinalPlan=true" in plan
    # "*(n) Op" marks an operator inside a WholeStageCodegen stage;
    # the aggregate itself must be inside one
    assert re.search(r"\*\(\d+\) HashAggregate", plan), plan[:400]
