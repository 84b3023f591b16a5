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
