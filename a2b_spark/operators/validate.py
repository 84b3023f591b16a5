"""Migration validation: order-independent table fingerprints and
table equality — the "did the migration produce exactly the rows I
expect" check a reference user runs after a cut-over (the reference
has no verification story; its tests re-read and compare by hand).

Fingerprint = (row count, XOR of a per-row 60-bit md5, decimal SUM of
the same hashes) — order- and partitioning-independent (both folds are
commutative), one aggregation, no sort, no collect of data. Comparing
two 100 TB tables costs two scans and exchanges ~32 bytes. Neither
fold alone is multiset-safe (XOR cancels even-multiplicity rows; SUM
can balance swaps), but drift that fools BOTH simultaneously plus the
count requires an md5 collision or adversarial construction — not the
target failure mode (lost rows, mangled values, type drift). The sum
accumulates in DECIMAL(38,0), overflow-free past 10^18 rows.

The hash is the engine's md5 idiom, so the same fingerprint is
computable in any SQL engine over the same data — source-vs-dest
checks can span engines (the actual cut-over scenario: old system's
DB vs the new pipeline's output).

Float columns: cast to a fixed decimal scale BEFORE fingerprinting
(the ``decimals`` parameter) — double→string formatting differs
between engines, and a fingerprint that depends on float printing
would false-alarm on every cross-engine check.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NULL_SENTINEL = "\x00NULL\x00"
_SEP = "\x1f"


def _row_hash(cols: Sequence[str], decimals: Mapping[str, int]) -> F.Column:
    parts = []
    for c in sorted(cols):
        col = F.col(c)
        if c in decimals:
            col = col.cast(f"decimal(18,{decimals[c]})")
        parts.append(F.coalesce(col.cast("string"), F.lit(_NULL_SENTINEL)))
    return F.conv(
        F.substring(F.md5(F.concat_ws(_SEP, *parts).cast("binary")), 1, 15), 16, 10
    ).cast("long")


def table_fingerprint(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    decimals: Mapping[str, int] | None = None,
) -> DataFrame:
    """One row: (n_rows, fingerprint). ``columns`` defaults to all,
    compared under sorted-name order; ``decimals`` maps float column
    names to a fixed scale (required for engine-portable results on
    float data)."""
    cols = list(columns) if columns is not None else df.columns
    h = _row_hash(cols, decimals or {})
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.bit_xor(h), F.lit(0)).cast("long").alias("fingerprint"),
        # string-typed: a DECIMAL(38,0) exceeds every engine's native
        # int and silently degrades to float in dataframe interchange
        # (pandas renders DuckDB's as 8.8e+20) — the exact digits are
        # the point of a fingerprint
        F.coalesce(F.sum(h.cast("decimal(38,0)")), F.lit(0))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("hash_sum"),
    )


def fingerprint_oracle_sql(
    table: str,
    columns: Sequence[str],
    decimals: Mapping[str, int] | None = None,
) -> str:
    """DuckDB twin of :func:`table_fingerprint` — identical hashes."""
    decimals = decimals or {}
    # control chars via chr(): raw NUL/unit-separator bytes inside SQL
    # string literals break the DuckDB parser
    sentinel = "chr(0) || 'NULL' || chr(0)"
    parts = []
    for c in sorted(columns):
        expr = f"CAST({c} AS DECIMAL(18,{decimals[c]}))" if c in decimals else c
        parts.append(f"COALESCE(CAST({expr} AS VARCHAR), {sentinel})")
    concat = f"concat_ws(chr(31), {', '.join(parts)})"
    h = f"CAST(('0x' || substring(md5({concat}), 1, 15)) AS BIGINT)"
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(bit_xor({h}), 0) AS BIGINT) AS fingerprint,
       CAST(CAST(COALESCE(SUM(CAST({h} AS DECIMAL(38,0))), 0) AS DECIMAL(38,0)) AS VARCHAR) AS hash_sum
FROM {table}
"""


def tables_equal(
    a: DataFrame,
    b: DataFrame,
    columns: Sequence[str] | None = None,
    decimals: Mapping[str, int] | None = None,
) -> bool:
    """True iff both tables carry the same row multiset over
    ``columns`` (count + fingerprint match). Two scans, ~16 bytes to
    the driver."""
    cols = list(columns) if columns is not None else sorted(set(a.columns) & set(b.columns))
    fa = table_fingerprint(a, cols, decimals).first()
    fb = table_fingerprint(b, cols, decimals).first()
    return (fa["n_rows"], fa["fingerprint"], fa["hash_sum"]) == (
        fb["n_rows"],
        fb["fingerprint"],
        fb["hash_sum"],
    )
