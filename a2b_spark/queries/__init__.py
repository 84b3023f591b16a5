"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a
DuckDB oracle — the correctness gate of SURVEY §2.

Float discipline: monetary aggregates run through exact DECIMAL
accumulation and only convert to DOUBLE at the end, so Spark and
DuckDB produce bit-identical values regardless of summation order.

Registry ORDER is part of the driver contract: the external harness
checks only the FIRST 50 registered queries (CORRECTNESS_r03 kept
exactly the first 50 insertion-order entries of a larger registry and
silently dropped the rest). The order is therefore DERIVED at import
time: queries with the fewest prior driver-green rounds come first
(insertion order breaks ties), so whatever the cap drops is always
the most-audited tail — never a query that still lacks independent
driver confirmation. The green-round counts come from the COMMITTED
manifest ``coverage.json`` next to this file (regenerated from the
git-tracked CORRECTNESS_r*.json files by ``tools/update_coverage.py``)
— never from a repo-root scan, so a stray or partial local results
file cannot reorder the capped prefix (round-4 advice).
``tests/test_registry.py`` pins both invariants (cap composition and
manifest freshness); every query, capped or not, still runs in
tools/check_oracle.py and bench.py each round.
"""

import json
import os

from a2b_spark.queries import (
    analytic,
    curation,
    pipeline,
    relational,
    reports,
    round7,
    round7b,
    round9,
    round9b,
    round10,
    round10b,
    round11,
    round12,
    round13,
)

QUERIES: dict = {}
ORACLES: dict = {}

for mod in (relational, pipeline, analytic, curation, reports, round7, round7b,
            round9, round9b, round10, round10b, round11, round12, round13):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

_MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)), "coverage.json")


def _coverage() -> dict:
    """Per-query count of prior driver-green rounds, read from the
    committed manifest (see module docstring)."""
    try:
        with open(_MANIFEST) as f:
            return json.load(f)["green_rounds"]
    except (OSError, ValueError, KeyError):
        return {}


def _reorder() -> None:
    global QUERIES, ORACLES
    cov = _coverage()
    insertion = {n: i for i, n in enumerate(QUERIES)}
    order = sorted(QUERIES, key=lambda n: (cov.get(n, 0), insertion[n]))
    QUERIES = {n: QUERIES[n] for n in order}
    ORACLES = {n: ORACLES[n] for n in order if n in ORACLES}


_reorder()


def register(mod) -> None:
    """Add a module's queries and RE-DERIVE the order: appending after
    the initial _reorder would park never-driver-checked queries past
    the 50-entry harness window — the exact silent-drop the ordering
    exists to prevent."""
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
    _reorder()
