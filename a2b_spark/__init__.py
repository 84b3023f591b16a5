"""a2b_spark — a PySpark-native ETL/analytics engine.

Re-expresses the semantics of the reference A2B migration framework
(pluggable sources/sinks, per-row transform, persistent source↔dest ID
mapping, orphan detection, cross-migration references, DAG-ordered
execution — see SURVEY.md) as declarative Spark DataFrame dataflows,
and supplies first-class relational + LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) that the
reference delegates to its source database.

Design rules (100 TB north star):
- DataFrame/SQL only; no RDDs, no driver-side row loops.
- Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs
  only where semantics are genuinely opaque (multimodal decode).
- Joins broadcast small sides; big joins/aggs rely on AQE + explicit
  repartitioning; LSH banding replaces O(n²) similarity scans.
"""

from a2b_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
