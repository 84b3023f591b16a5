"""Declarative data-quality expectations (Deequ / Great Expectations
analogue, reduced to the Spark-native core): a suite of checks over a
DataFrame computed in ONE aggregation pass.

Reference parity note: the reference's only quality gate is its CHECK
on required CSV headers (src/Drivers/Source/CsvSourceDriver.php:60-75)
— everything else here is beyond-reference surface for the
training-data-pipeline tier, complementing the row-level CHECK
constraints of the storage layer (which REJECT commits) with
dataset-level METRICS that report.

Scale shape: every expectation lowers to JVM-side aggregate
expressions in a single ``df.agg(...)`` — one scan, map-side partial
aggregation, a single 1-row driver pull regardless of table size.
``uniqueness`` uses exact ``count_distinct`` (adds Spark's expand for
multi-distinct; at 100 TB prefer ``approx=True``, HyperLogLog++, zero
expand). No per-row Python, no collects of row data.

Usage::

    report = (ExpectationSuite()
        .completeness("c_name", min_ratio=1.0)
        .uniqueness("c_custkey", min_ratio=1.0)
        .min_value("c_acctbal", -1000.0)
        .in_set("c_mktsegment", ["BUILDING", "MACHINERY"], min_ratio=0.3)
        .matches("c_phone", r"^[0-9]{2}-", min_ratio=1.0)
        .run(df))            # DataFrame: one row per expectation

Report columns: ``expectation`` (kind), ``column``, ``metric``
(measured value, DOUBLE), ``threshold``, ``passed`` (BOOLEAN).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ExpectationSuite:
    def __init__(self, approx: bool = False):
        # (kind, column, threshold, agg_exprs, metric_from_row,
        #  passed_fn or None-for-default)
        self._checks: list = []
        self._approx = approx

    # ------------------------------------------------------- builders
    def _ratio(self, kind: str, col: str, cond, min_ratio: float):
        """Fraction of rows satisfying ``cond`` (NULL counts as not
        satisfying) must be >= min_ratio."""
        i = len(self._checks)
        aggs = [
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__e{i}_ok"),
        ]
        self._checks.append(
            (
                kind,
                col,
                float(min_ratio),
                aggs,
                lambda row, i=i: (
                    None
                    if not row["__n"]
                    else (row[f"__e{i}_ok"] or 0) / row["__n"]
                ),
                None,
            )
        )
        return self

    def completeness(self, col: str, min_ratio: float = 1.0):
        """Fraction of non-NULL values."""
        return self._ratio("completeness", col, F.col(col).isNotNull(), min_ratio)

    def uniqueness(self, col: str, min_ratio: float = 1.0):
        """distinct(col) / rows (NULLs count as one distinct value the
        way count_distinct sees them: not at all — a fully-NULL column
        scores 0)."""
        i = len(self._checks)
        distinct = (
            F.approx_count_distinct(col)
            if self._approx
            else F.count_distinct(F.col(col))
        )
        aggs = [distinct.alias(f"__e{i}_d")]
        self._checks.append(
            (
                "uniqueness",
                col,
                float(min_ratio),
                aggs,
                lambda row, i=i: (
                    None if not row["__n"] else (row[f"__e{i}_d"] or 0) / row["__n"]
                ),
                None,
            )
        )
        return self

    def min_value(self, col: str, bound: float):
        """Every non-NULL value >= bound (metric = observed minimum)."""
        i = len(self._checks)
        aggs = [F.min(col).alias(f"__e{i}_m")]
        self._checks.append(
            (
                "min_value",
                col,
                float(bound),
                aggs,
                lambda row, i=i: (
                    None if row[f"__e{i}_m"] is None else float(row[f"__e{i}_m"])
                ),
                None,
            )
        )
        return self

    def max_value(self, col: str, bound: float):
        i = len(self._checks)
        aggs = [F.max(col).alias(f"__e{i}_m")]
        self._checks.append(
            (
                "max_value",
                col,
                float(bound),
                aggs,
                lambda row, i=i: (
                    None if row[f"__e{i}_m"] is None else float(row[f"__e{i}_m"])
                ),
                lambda metric, bound=float(bound): metric <= bound,
            )
        )
        return self

    def non_negative(self, col: str):
        return self.min_value(col, 0.0)

    def in_set(self, col: str, allowed: Sequence[Any], min_ratio: float = 1.0):
        return self._ratio(
            "in_set", col, F.col(col).isin(list(allowed)), min_ratio
        )

    def matches(self, col: str, pattern: str, min_ratio: float = 1.0):
        return self._ratio(
            "matches", col, F.col(col).rlike(pattern), min_ratio
        )

    def satisfies(self, name: str, cond, min_ratio: float = 1.0):
        """Custom row predicate (a Column) labeled ``name``."""
        return self._ratio("satisfies", name, cond, min_ratio)

    def size_between(self, lo: int, hi: Optional[int] = None):
        """Row count within [lo, hi] (metric = count; the report's
        threshold column carries lo — hi rides the check itself, so
        multiple size checks never interfere)."""
        self._checks.append(
            (
                "size_between",
                "*",
                float(lo),
                [],
                lambda row: float(row["__n"]),
                lambda metric, lo=float(lo), hi=hi: (
                    metric >= lo and (hi is None or metric <= hi)
                ),
            )
        )
        return self

    # ------------------------------------------------------------- run
    def run(self, df: DataFrame) -> DataFrame:
        """ONE aggregation pass; returns the per-expectation report
        (deterministic order: suite definition order)."""
        if not self._checks:
            raise ValueError("empty expectation suite")
        aggs = [F.count(F.lit(1)).alias("__n")]
        for _, _, _, a, _, _ in self._checks:
            aggs.extend(a)
        row = df.agg(*aggs).first()  # 1-row bounded pull by design
        out = []
        for kind, col, threshold, _, metric_fn, passed_fn in self._checks:
            metric = metric_fn(row)
            if metric is None:
                passed = False  # empty input / all-NULL: can't certify
            elif passed_fn is not None:
                passed = passed_fn(metric)
            else:  # ratios and min_value: measured >= threshold
                passed = metric >= threshold
            out.append(
                (
                    kind,
                    col,
                    None if metric is None else float(metric),
                    threshold,
                    bool(passed),
                )
            )
        spark = df.sparkSession
        return spark.createDataFrame(
            out,
            "expectation string, column string, metric double, "
            "threshold double, passed boolean",
        )
