"""Per-file column statistics for VersionedParquetTable — the
file-skipping layer (Delta/Iceberg data-skipping analogue).

At 100 TB a table is millions of parquet files; Spark's row-group
pruning only helps AFTER a file's footer is opened, and opening a
million footers is itself the bottleneck. Delta and Iceberg solve
this with per-file min/max statistics in the commit metadata so the
DRIVER can drop files before any scan task is scheduled. Same here:
each commit writes a ``_STATS`` sidecar mapping every data file's
relative path to per-column {min, max, null_count} harvested from the
parquet FOOTERS of the just-written files (metadata-only reads — no
data pages; cost proportional to NEW files only, hardlinked files
reuse the base version's entries by inode).

Reference parity note: the reference (A2B) delegates all storage to
its source/destination DBs and has no analogue; this is part of the
beyond-reference lakehouse surface (SURVEY §8) alongside versioning,
compaction, optimistic concurrency and vacuum.

Safety model: statistics can only SKIP a file when its [min, max]
range provably cannot satisfy a predicate. Missing stats (unsupported
column type, truncated string upper bound, NaN floats, a file written
before stats existed) always mean KEEP — the pruned read then applies
the full predicate as a real Spark filter, so results are exact even
when stats are absent; the stats only decide how many files the scan
touches.

Supported predicate ops: =, <, <=, >, >=, between (conjunctive AND).
IS NULL / IS NOT NULL are deliberately out: null_count is recorded
and used only for the all-null fast skip of value predicates.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
from typing import Any, Iterable, Optional, Sequence

STATS_FILE = "_STATS"
STATS_FORMAT_VERSION = 1
MAX_STATS_COLUMNS = 32  # Delta's first-N-columns discipline
MAX_STRING_LEN = 64

# arrow type family -> tag stored in the sidecar
_TAGS = {"int": "i", "float": "f", "string": "s", "bool": "b", "ts": "ts", "date": "d"}


def _type_tag(arrow_type) -> Optional[str]:
    import pyarrow as pa

    if pa.types.is_integer(arrow_type):
        return "i"
    if pa.types.is_floating(arrow_type):
        return "f"
    if pa.types.is_string(arrow_type) or pa.types.is_large_string(arrow_type):
        return "s"
    if pa.types.is_boolean(arrow_type):
        return "b"
    if pa.types.is_timestamp(arrow_type):
        return "ts"
    if pa.types.is_date(arrow_type):
        return "d"
    return None


def _encode(v: Any, tag: str) -> Optional[Any]:
    """JSON-encode a stats value; None = unknown/unencodable (never
    prunes)."""
    if v is None:
        return None
    if tag == "f":
        v = float(v)
        return None if v != v else v  # NaN -> unknown
    if tag == "i":
        return int(v)
    if tag == "b":
        return bool(v)
    if tag == "s":
        if isinstance(v, bytes):
            try:
                v = v.decode("utf-8")
            except UnicodeDecodeError:
                return None
        return str(v)
    if tag == "ts":
        # normalize to NAIVE UTC: Spark writes TIMESTAMP_MICROS as
        # UTC-adjusted instants (pyarrow yields tz-aware datetimes);
        # storing naive-UTC makes stats comparable with the naive
        # datetimes Spark rows round-trip as in a UTC session
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if tag == "d":
        return v.isoformat()
    return None


def _decode(v: Any, tag: str) -> Any:
    if v is None:
        return None
    if tag == "ts":
        return _dt.datetime.fromisoformat(v)
    if tag == "d":
        return _dt.date.fromisoformat(v)
    return v


def _coerce_literal(value: Any, tag: str) -> Any:
    """Make a user-supplied predicate literal comparable with decoded
    stats values (ISO strings accepted for timestamp/date columns)."""
    if tag == "ts":
        if isinstance(value, str):
            value = _dt.datetime.fromisoformat(value)
        elif isinstance(value, _dt.date) and not isinstance(value, _dt.datetime):
            value = _dt.datetime(value.year, value.month, value.day)
        if isinstance(value, _dt.datetime):
            if value.tzinfo is not None:  # stats are naive UTC
                value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return value
    if tag == "d":
        if isinstance(value, str):
            return _dt.date.fromisoformat(value)
        if isinstance(value, _dt.datetime):
            return value.date()
    return value


def collect_parquet_file_stats(path: str) -> dict:
    """Footer-only stats for ONE parquet file:
    {"rows": n, "cols": {name: {"t": tag, "min": v|None, "max": v|None,
    "nulls": n|None}}}. Only top-level columns of supported types, the
    first MAX_STATS_COLUMNS of the schema. String maxima longer than
    MAX_STRING_LEN store None (a truncated prefix is a valid LOWER
    bound for min but not an upper bound for max)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    arrow_schema = pf.schema_arrow
    # map top-level supported fields -> their leaf column index in the
    # parquet schema (nested fields have path names with dots; skip)
    leaf_names = [md.schema.column(i).path for i in range(md.num_columns)]
    wanted: dict[str, tuple[int, str]] = {}
    for field in list(arrow_schema)[:MAX_STATS_COLUMNS]:
        tag = _type_tag(field.type)
        if tag is None:
            continue
        try:
            idx = leaf_names.index(field.name)
        except ValueError:
            continue
        wanted[field.name] = (idx, tag)

    cols: dict[str, dict] = {}
    for name, (idx, tag) in wanted.items():
        mn = mx = None
        nulls: Optional[int] = 0
        seen_minmax = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None:
                seen_minmax = False
                nulls = None
                break
            if st.null_count is None:
                nulls = None
            elif nulls is not None:
                nulls += st.null_count
            if not st.has_min_max:
                # a row group of only nulls has no min/max; that's
                # fine unless ALL groups lack it (handled below by
                # mn/mx staying None)
                continue
            lo, hi = _encode(st.min, tag), _encode(st.max, tag)
            if lo is not None and (mn is None or _decode(lo, tag) < _decode(mn, tag)):
                mn = lo
            if hi is not None and (mx is None or _decode(hi, tag) > _decode(mx, tag)):
                mx = hi
        if not seen_minmax:
            mn = mx = None
        if tag == "s":
            if mn is not None and len(mn) > MAX_STRING_LEN:
                mn = mn[:MAX_STRING_LEN]  # prefix = valid lower bound
            if mx is not None and len(mx) > MAX_STRING_LEN:
                mx = None  # a truncated prefix is NOT an upper bound
        cols[name] = {"t": tag, "min": mn, "max": mx, "nulls": nulls}
    return {"rows": md.num_rows, "cols": cols}


def _data_files(version_dir: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(version_dir):
        for fn in files:
            if fn.startswith(("_", ".")):
                continue
            out.append(os.path.relpath(os.path.join(root, fn), version_dir))
    return sorted(out)


def build_version_stats(
    version_dir: str,
    base_dir: Optional[str] = None,
    base_stats: Optional[dict] = None,
) -> dict:
    """Stats for every data file under ``version_dir``. Files that are
    HARDLINKS of a base-version file with the same relative path (same
    inode — how _commit_touched reuses untouched partitions) copy the
    base entry instead of re-reading the footer, so the cost of a
    partitioned commit stays proportional to its new files."""
    files: dict[str, dict] = {}
    base_files = (base_stats or {}).get("files", {})
    for rel in _data_files(version_dir):
        full = os.path.join(version_dir, rel)
        if base_dir is not None and rel in base_files:
            old = os.path.join(base_dir, rel)
            try:
                if os.path.exists(old) and os.path.samestat(
                    os.stat(old), os.stat(full)
                ):
                    files[rel] = base_files[rel]
                    continue
            except OSError:
                pass
        try:
            files[rel] = collect_parquet_file_stats(full)
        except Exception:
            # unreadable footer -> no stats -> file is never pruned
            files[rel] = {"rows": None, "cols": {}}
    return {"version": STATS_FORMAT_VERSION, "files": files}


def write_stats(version_dir: str, stats: dict) -> None:
    with open(os.path.join(version_dir, STATS_FILE), "w") as f:
        json.dump(stats, f)


def load_stats(version_dir: str) -> Optional[dict]:
    p = os.path.join(version_dir, STATS_FILE)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            s = json.load(f)
        return s if s.get("version") == STATS_FORMAT_VERSION else None
    except (OSError, ValueError):
        return None


def _tzinfo(name: str):
    """Session-timezone string → tzinfo (IANA name or ±HH:MM offset)."""
    if name.upper() in ("UTC", "Z", "GMT"):
        return _dt.timezone.utc
    try:
        from zoneinfo import ZoneInfo

        return ZoneInfo(name)
    except Exception:
        pass
    try:  # ±HH:MM zone offsets, which Spark also accepts
        sign = -1 if name.startswith("-") else 1
        hh, mm = name.lstrip("+-").split(":")
        return _dt.timezone(sign * _dt.timedelta(hours=int(hh), minutes=int(mm)))
    except Exception as exc:
        raise ValueError(f"unrecognized session timezone {name!r}") from exc


def localize_ts_predicates(
    predicates: Sequence[tuple], schema, session_tz: str
) -> list[tuple]:
    """Re-express timestamp-column literals in the naive-UTC frame the
    ``_STATS`` sidecar stores. Spark evaluates a naive/string timestamp
    literal in the SESSION timezone; the sidecar stores UTC instants —
    comparing them raw under a non-UTC session would skip files whose
    rows the real filter matches (silent row loss). ``schema`` is the
    table's Spark schema (identifies TimestampType columns); literals
    that are already tz-aware convert exactly, naive ones are localized
    to ``session_tz`` first."""
    from pyspark.sql import types as T

    ts_cols = {f.name for f in schema.fields if isinstance(f.dataType, T.TimestampType)}
    if not ts_cols:
        return list(predicates)
    tz = _tzinfo(session_tz)

    def conv(v):
        if isinstance(v, str):
            v = _dt.datetime.fromisoformat(v)
        elif isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            v = _dt.datetime(v.year, v.month, v.day)
        if not isinstance(v, _dt.datetime):
            return v
        if v.tzinfo is None:
            v = v.replace(tzinfo=tz)
        return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)

    out = []
    for col, op, value in predicates:
        if col in ts_cols:
            value = (conv(value[0]), conv(value[1])) if op == "between" else conv(value)
        out.append((col, op, value))
    return out


_OPS = {"=", "<", "<=", ">", ">=", "between"}


def normalize_predicates(predicates: Iterable) -> list[tuple]:
    out = []
    for p in predicates:
        col, op, value = p
        if op not in _OPS:
            raise ValueError(f"unsupported predicate op {op!r}; use one of {_OPS}")
        if op == "between":
            lo, hi = value
            out.append((col, op, (lo, hi)))
        else:
            out.append((col, op, value))
    if not out:
        raise ValueError("predicates must be non-empty")
    return out


def file_may_match(entry: dict, predicates: Sequence[tuple]) -> bool:
    """False only when the file's stats PROVE no row satisfies the
    conjunction. Missing stats for a column keep the file."""
    cols = entry.get("cols", {})
    rows = entry.get("rows")
    for col, op, value in predicates:
        c = cols.get(col)
        if c is None:
            continue  # no stats for this column -> can't prune on it
        tag = c["t"]
        # every supported op compares against non-null values; a file
        # whose column is entirely null cannot satisfy any of them
        if (
            c.get("nulls") is not None
            and rows not in (None, 0)
            and c["nulls"] == rows
        ):
            return False
        mn, mx = _decode(c.get("min"), tag), _decode(c.get("max"), tag)
        try:
            if op == "between":
                lo = _coerce_literal(value[0], tag)
                hi = _coerce_literal(value[1], tag)
                if (mx is not None and mx < lo) or (mn is not None and mn > hi):
                    return False
                continue
            v = _coerce_literal(value, tag)
            if op == "=":
                if (mn is not None and v < mn) or (mx is not None and v > mx):
                    return False
            elif op == "<":
                if mn is not None and mn >= v:
                    return False
            elif op == "<=":
                if mn is not None and mn > v:
                    return False
            elif op == ">":
                if mx is not None and mx <= v:
                    return False
            elif op == ">=":
                if mx is not None and mx < v:
                    return False
        except TypeError as exc:
            raise TypeError(
                f"predicate literal {value!r} is not comparable with "
                f"column {col!r} stats (type tag {tag!r})"
            ) from exc
    return True


def predicates_to_column(predicates: Sequence[tuple]):
    """The SAME conjunction as a Spark Column — applied after the
    pruned scan so results stay exact regardless of stats coverage."""
    from pyspark.sql import functions as F

    cond = None
    for col, op, value in predicates:
        c = F.col(col)
        if op == "between":
            e = c.between(F.lit(value[0]), F.lit(value[1]))
        elif op == "=":
            e = c == F.lit(value)
        elif op == "<":
            e = c < F.lit(value)
        elif op == "<=":
            e = c <= F.lit(value)
        elif op == ">":
            e = c > F.lit(value)
        else:
            e = c >= F.lit(value)
        cond = e if cond is None else (cond & e)
    return cond
