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
__version__ = "0.4.0"


def __getattr__(name):
    """Lazy top-level access to the public surface without importing
    Spark-heavy modules at package import (keeps ``import a2b_spark``
    cheap for tooling). ``a2b_spark.Migration``, ``a2b_spark.dedup``,
    ``a2b_spark.similarity`` etc. resolve on first touch."""
    import importlib

    lazy = {
        # core migration surface
        "Migration": ("a2b_spark.core.migration", "Migration"),
        "IdField": ("a2b_spark.core.migration", "IdField"),
        "MigrationRegistry": ("a2b_spark.core.migration", "MigrationRegistry"),
        "run_migration": ("a2b_spark.exec.executor", "run_migration"),
        "existing_field": ("a2b_spark.exec.executor", "existing_field"),
        "MappingStore": ("a2b_spark.mapping.store", "MappingStore"),
        "DataFrameSource": ("a2b_spark.sources.base", "DataFrameSource"),
        "ParquetDestination": ("a2b_spark.sinks.parquet", "ParquetDestination"),
        "VersionedParquetTable": ("a2b_spark.storage.table", "VersionedParquetTable"),
        # operator modules (import the module itself)
        "dedup": ("a2b_spark.operators.dedup", None),
        "similarity": ("a2b_spark.operators.similarity", None),
        "ranking": ("a2b_spark.operators.ranking", None),
        "graph": ("a2b_spark.operators.graph", None),
        "multimodal": ("a2b_spark.operators.multimodal", None),
        "chunk": ("a2b_spark.operators.chunk", None),
        "spans": ("a2b_spark.operators.spans", None),
        "text": ("a2b_spark.functions.text", None),
        "vectors": ("a2b_spark.functions.vectors", None),
    }
    if name not in lazy:
        raise AttributeError(f"module 'a2b_spark' has no attribute {name!r}")
    mod_name, attr = lazy[name]
    mod = importlib.import_module(mod_name)
    return mod if attr is None else getattr(mod, attr)
