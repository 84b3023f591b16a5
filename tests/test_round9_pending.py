"""Direct oracle check of the round-9 tranche
(a2b_spark/queries/round9.py) with the SAME comparison the driver
gate uses (tools/check_oracle: row count, column names, numeric type
categories, exact sorted values incl. float bits). The tranche was
registered at the start of round 9 (after CORRECTNESS_r08 landed);
this keeps the per-query pytest signal either way."""

import pytest

from a2b_spark.queries import round9, round9b
from tools.check_oracle import compare, make_duckdb_con, type_gate

_ALL_Q = {**round9.QUERIES, **round9b.QUERIES}
_ALL_O = {**round9.ORACLES, **round9b.ORACLES}


@pytest.mark.parametrize("name", sorted(_ALL_Q))
def test_pending_query_matches_oracle(spark, sf_dir, name):
    sdf = _ALL_Q[name](spark, sf_dir)
    con = make_duckdb_con(sf_dir)
    oracle = con.sql(_ALL_O[name])
    arrow = oracle.arrow()
    problems = type_gate(sdf.schema, arrow.schema)
    assert not problems, problems
    problems = compare(name, sdf.toPandas(), arrow.to_pandas())
    assert not problems, problems


def test_tranche_registered():
    """Round 9 wired round9 + round9b into queries/__init__.py; until
    the tranche reaches two driver-green rounds it must stay inside
    the harness's 50-entry window (fewest-green-first ordering —
    newer zero-green registrations may precede it)."""
    from a2b_spark import queries

    assert set(_ALL_Q) <= set(queries.QUERIES)
    window = set(list(queries.QUERIES)[:50])
    under_confirmed = {
        q for q in _ALL_Q if queries._coverage().get(q, 0) < 2
    }
    assert under_confirmed <= window
