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

Scale shape: ONE scan. Each row explodes into one cell per profiled
column (typed value slot + canonical string), then two HASH
aggregations — dedup on (column, raw value), then per-column stats —
both map-side partially combined. No per-column scans, no sorts of
the input (the naive multi-COUNT(DISTINCT) wide aggregate plans as
back-to-back SortAggregates keyed on every profiled column), and no
collect of anything data-sized.
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
    # Formulation: unpivot FIRST (one (cidx, raw-value, canon) row per
    # cell), then two hash aggregations — dedup on (cidx, raw value),
    # then per-cidx stats. NOT one wide agg of count_distinct()s:
    # Spark's multi-distinct rewrite plans that as back-to-back
    # SortAggregates keyed on EVERY profiled column (two full sorts of
    # the table — measured 3.2s on 1.5M rows where this runs 0.5s, and
    # a sort-vs-hash gap that only widens at scale). Distinct-counting
    # groups on the RAW value in a typed slot (so 0.0/-0.0/NaN follow
    # grouping semantics and a lossy canonicalization can't collapse
    # two values); the canonical string is carried only for min/max.
    # Column NAMES never pass through the SQL parser (round-6 review).
    slots: dict[str, T.DataType] = {}
    for c in columns:
        dt = df.schema[c].dataType
        slots.setdefault(dt.simpleString(), dt)
    slot_names = {k: f"__v_{i}" for i, k in enumerate(slots)}
    entries = []
    for i, c in enumerate(columns):
        dt = df.schema[c].dataType
        tkey = dt.simpleString()
        fields = [
            F.lit(i).alias("cidx"),
            df[c].isNull().cast("int").alias("isn"),
        ]
        for k, slot in slot_names.items():
            fields.append(
                (df[c] if k == tkey else F.lit(None).cast(slots[k])).alias(slot)
            )
        entries.append(F.struct(*fields))
    cells = df.select(F.explode(F.array(*entries)).alias("e")).select("e.*")
    per_value = cells.groupBy("cidx", "isn", *slot_names.values()).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    nn = F.col("isn") == 0
    stats = per_value.groupBy("cidx").agg(
        F.coalesce(
            F.sum(F.when(~nn, F.col("__cnt"))), F.lit(0)
        ).cast("long").alias("null_count"),
        F.count(F.when(nn, F.lit(1))).cast("long").alias("n_distinct"),
        # min/max on the TYPED slots (numeric order, not string order);
        # canonical rendering happens after aggregation — canon is
        # monotone per type, so canon(min(x)) == min(canon(x))
        *[F.min(s).alias(f"__mn{s}") for s in slot_names.values()],
        *[F.max(s).alias(f"__mx{s}") for s in slot_names.values()],
    )

    def _render(prefix: str) -> F.Column:
        out = None
        for i, c in enumerate(columns):
            dt = df.schema[c].dataType
            slot = slot_names[dt.simpleString()]
            rendered = _canon(F.col(f"{prefix}{slot}"), dt).cast("string")
            out = (
                F.when(F.col("cidx") == i, rendered)
                if out is None
                else out.when(F.col("cidx") == i, rendered)
            )
        return out

    names = F.array(*[F.lit(c) for c in columns])
    return (
        stats.select(
            F.element_at(names, F.col("cidx") + 1).alias("col_name"),
            "null_count",
            "n_distinct",
            _render("__mn").alias("min_s"),
            _render("__mx").alias("max_s"),
        )
        .orderBy("col_name")
    )
