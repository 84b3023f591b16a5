"""Table profiler — the data-quality report every migration and
curation run wants before it trusts a table: per-column null counts,
exact distinct counts, and canonicalized min/max.

Reference parity: the reference validates migrated data only by row
count (src/DataMigration/DataMigrationExecutor.php — the executor
reports written-row totals); this is the per-column generalization a
100 TB pipeline actually needs to detect silent truncation, nulled-out
joins, or a collapsed id column after a merge.

Engine-portability contract (the oracle discipline): min/max are
reported as STRINGS through a per-type canonical form so Spark and
DuckDB render identically —

* integral types: plain decimal string of the exact value;
* strings: the raw value (both engines compare strings bytewise);
* date: ISO ``yyyy-MM-dd``;
* timestamp: formatted ``yyyy-MM-dd HH:mm:ss`` (zero-padded ISO sorts
  like the timestamp; fractional seconds deliberately dropped on both
  engines — raw timestamp→string rendering differs across engines);
* float/double: rounded to 4 places and passed through DECIMAL(28,4)
  so the string has a fixed scale (raw double→string formatting is
  engine-specific: ``1.0E4`` vs ``10000.0``);
* boolean: ``true`` / ``false``.

Scale shape: ONE scan. All per-column stats are computed in a single
wide aggregate (Spark plans the multiple COUNT(DISTINCT)s as one
Expand + two-stage aggregate — one shuffle whose width is
rows × profiled-columns, map-side partially combined), then the single
result row is unpivoted driver-free with ``stack``. No per-column
scans, no collect of anything data-sized.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canon(col: Column, dt: T.DataType) -> Column:
    """Canonical orderable form of a column for min/max reporting —
    see the module docstring's per-type table."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return col
    if isinstance(dt, T.StringType):
        return col
    if isinstance(dt, T.DateType):
        return col
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # format, don't epoch-convert: NTZ has no zone, so an epoch
        # conversion would inject the session timezone; the padded ISO
        # string sorts identically to the timestamp and renders the
        # same in DuckDB (strftime) — fractional seconds deliberately
        # dropped on BOTH sides
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return F.round(col, 4).cast("decimal(28,4)")
    if isinstance(dt, T.DecimalType):
        return col
    if isinstance(dt, T.BooleanType):
        return col
    raise ValueError(f"table_profile: unsupported column type {dt}")


def table_profile(df: DataFrame, columns: Optional[Sequence[str]] = None) -> DataFrame:
    """Profile ``columns`` (default: every supported column) of ``df``.

    Returns one row per column, ordered by name:
    ``(col_name, null_count, n_distinct, min_s, max_s)`` — counts as
    exact longs, min/max canonicalized to strings (nulls when the
    column is entirely null). COUNT(DISTINCT) ignores nulls, matching
    ANSI SQL in both engines.
    """
    if columns is None:
        columns = [f.name for f in df.schema.fields]
    if not columns:
        raise ValueError("table_profile: no columns to profile")
    # index-based internal aliases + a pure Column-API unpivot: column
    # NAMES never pass through the SQL parser, so names with hyphens,
    # spaces, quotes, or backticks profile fine (round-6 review — an
    # f-string stack() expr broke on any non-bare identifier)
    aggs = []
    for i, c in enumerate(columns):
        dt = df.schema[c].dataType
        canon = _canon(df[c], dt)
        aggs.extend(
            [
                F.count(F.when(df[c].isNull(), F.lit(1))).cast("long").alias(f"__n_{i}"),
                F.count_distinct(df[c]).cast("long").alias(f"__d_{i}"),
                F.min(canon).cast("string").alias(f"__mn_{i}"),
                F.max(canon).cast("string").alias(f"__mx_{i}"),
            ]
        )
    row = df.agg(*aggs)
    stats = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__n_{i}").alias("null_count"),
                F.col(f"__d_{i}").alias("n_distinct"),
                F.col(f"__mn_{i}").alias("min_s"),
                F.col(f"__mx_{i}").alias("max_s"),
            )
            for i, c in enumerate(columns)
        ]
    )
    return (
        row.select(F.explode(stats).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )
