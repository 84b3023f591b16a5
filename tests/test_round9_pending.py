"""The PENDING round-9 tranche (a2b_spark/queries/round9.py) is not
registered yet — round 7's verdict pinned the 50-entry driver window
for round 8 — but it must not rot while it waits: run every pending
query against its DuckDB oracle with the SAME comparison the driver
gate uses (tools/check_oracle: row count, column names, numeric type
categories, exact sorted values incl. float bits)."""

import pytest

from a2b_spark.queries import round9
from tools.check_oracle import compare, make_duckdb_con, type_gate


@pytest.mark.parametrize("name", sorted(round9.QUERIES))
def test_pending_query_matches_oracle(spark, sf_dir, name):
    sdf = round9.QUERIES[name](spark, sf_dir)
    con = make_duckdb_con(sf_dir)
    oracle = con.sql(round9.ORACLES[name])
    arrow = oracle.arrow()
    problems = type_gate(sdf.schema, arrow.schema)
    assert not problems, problems
    problems = compare(name, sdf.toPandas(), arrow.to_pandas())
    assert not problems, problems


def test_pending_tranche_not_registered_yet():
    """Guard the round-7 verdict's registry pin: round9 queries stay
    OUT of the live registry until CORRECTNESS_r08 lands (drop this
    test when wiring round9 into queries/__init__.py)."""
    from a2b_spark import queries

    assert not (set(round9.QUERIES) & set(queries.QUERIES))
