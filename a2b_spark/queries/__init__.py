"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a
DuckDB oracle — the correctness gate of SURVEY §2.

Float discipline: monetary aggregates run through exact DECIMAL
accumulation and only convert to DOUBLE at the end, so Spark and
DuckDB produce bit-identical values regardless of summation order.
"""

from a2b_spark.queries import pipeline, relational

QUERIES: dict = {}
ORACLES: dict = {}

for mod in (relational, pipeline):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)


def register(mod) -> None:
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
