"""Registry contract tests: the external harness checks only the
FIRST 50 registered queries, so ordering is load-bearing — these pin
the coverage-debt invariant (see a2b_spark/queries/__init__.py)."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _prior_coverage() -> dict:
    with open(os.path.join(REPO, "a2b_spark", "queries", "coverage.json")) as f:
        return json.load(f)["green_rounds"]


def test_coverage_manifest_is_fresh():
    """The committed manifest must match a regeneration from the
    git-TRACKED correctness files — if a new CORRECTNESS_r{N}.json was
    committed without rerunning tools/update_coverage.py, fail loudly
    so the registry order never drifts from committed state."""
    import update_coverage

    with open(os.path.join(REPO, "a2b_spark", "queries", "coverage.json")) as f:
        committed = json.load(f)
    assert committed == update_coverage.build_manifest(), (
        "coverage manifest stale: run `python tools/update_coverage.py` "
        "and commit a2b_spark/queries/coverage.json"
    )


def test_every_query_has_an_oracle():
    from a2b_spark.queries import ORACLES, QUERIES

    assert set(QUERIES) == set(ORACLES)
    assert list(ORACLES) == list(QUERIES), "oracle order must mirror query order"


def test_cap_only_drops_multiply_covered_queries():
    """Whatever falls outside the harness's 50-entry window must have
    at least two prior driver-green rounds (it stays covered every
    round by tools/check_oracle.py + pytest regardless)."""
    from a2b_spark.queries import QUERIES

    cov = _prior_coverage()
    outside = list(QUERIES)[50:]
    for q in outside:
        assert cov.get(q, 0) >= 2, (
            f"{q} would lose driver coverage without being multiply "
            f"covered before (rounds green: {cov.get(q, 0)}); reorder "
            "_PRIORITIZED/_DEPRIORITIZED in a2b_spark/queries/__init__.py"
        )


def test_never_checked_queries_are_inside_the_cap():
    from a2b_spark.queries import QUERIES

    cov = _prior_coverage()
    inside = set(list(QUERIES)[:50])
    never = [q for q in QUERIES if cov.get(q, 0) == 0]
    missing = [q for q in never if q not in inside]
    assert not missing, f"never-driver-checked queries outside the cap: {missing}"


def test_no_oracle_binds_hugeint_or_decimal():
    """Cross-engine type audit, encoded after the q76 postmortem: a
    DuckDB window SUM over BIGINT silently promotes to HUGEINT, which
    Arrow-exports as decimal128(38,0) while the Spark twin emits
    bigint — the driver's value hash then mismatches even though every
    value is equal (q76 was red rounds 4-6 on exactly this). Our
    oracle discipline casts every aggregate to BIGINT/DOUBLE
    explicitly, so NO oracle column may bind to HUGEINT or DECIMAL.
    This uses the DuckDB binder only (no execution), so it is cheap
    enough to run over the whole registry every pytest."""
    from a2b_spark.queries import ORACLES

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from check_oracle import make_duckdb_con  # single source of the table list

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    con = make_duckdb_con(sf_dir)
    offenders = {}
    for name, sql in ORACLES.items():
        if sql is None:
            continue
        rel = con.sql(sql)
        bad = [
            f"{c}:{ty}"
            for c, ty in zip(rel.columns, rel.types)
            if str(ty) == "HUGEINT" or str(ty).startswith("DECIMAL")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracle columns that will Arrow-export as decimal128 and "
        f"hash-mismatch the integer/double Spark twin: {offenders} — "
        f"add an explicit CAST in the oracle SQL"
    )
