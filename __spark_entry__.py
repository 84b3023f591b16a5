"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship migration-merge query on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# module reference, NOT name binding: registry.register() REBINDS a
# new reordered dict — a captured `from ... import QUERIES` would keep
# serving the stale order with late-registered queries appended past
# the driver's 50-entry window (the silent drop _reorder exists to
# prevent)
from a2b_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the engine's keyed merge semantics (upsert of a
    transformed batch over existing entities) on sf0.001."""
    return _registry.QUERIES["q09_merge_upsert"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_registry.ORACLES)
