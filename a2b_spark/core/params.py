"""``%param%`` substitution — the reference's container-parameter
resolution (DataMigrationManager.php:155-183, A2BExtension.php:52-112)
as a plain-dict pass over source/destination configuration.

The reference resolves Symfony container parameters inside each
migration's ``source``/``destination`` spec when the migration is
registered; here, ``resolve_params(migration, params)`` walks the
migration's source and destination objects and substitutes
``%name%`` placeholders in their string configuration (paths, JDBC
urls/tables, option dicts) in place. ``MigrationRegistry`` applies it
automatically when constructed with a params dict, so the same
pipeline definition resolves to different environments:

    reg = MigrationRegistry(params={"data_root": "/prod/tables"})
    reg.register(Migration(..., destination=ParquetDestination(
        "%data_root%/customers", ...)))

Syntax matches Symfony: ``%name%`` substitutes, ``%%`` escapes a
literal percent. Unknown parameters raise KeyError at registration —
fail at definition time, not mid-run.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

_PARAM_RE = re.compile(r"%(%|[A-Za-z0-9_.\-]+%)")


def resolve_str(value: str, params: Mapping[str, Any]) -> str:
    """Substitute every ``%name%`` in ``value``; ``%%`` -> ``%``."""

    def sub(m: re.Match) -> str:
        token = m.group(1)
        if token == "%":
            return "%"
        name = token[:-1]
        if name not in params:
            raise KeyError(f"unresolved parameter %{name}% (known: {sorted(params)})")
        return str(params[name])

    return _PARAM_RE.sub(sub, value)


def _walk(obj: Any, params: Mapping[str, Any], seen: set[int], depth: int = 0) -> None:
    """Recursively rewrite ``%param%`` strings in an object's __dict__.

    Bounded depth and an id-set guard keep this safe on arbitrary
    source/sink objects; DataFrames and Spark internals are skipped
    (they have no plain string config and their __dict__ is huge).
    """
    if depth > 4 or id(obj) in seen:
        return
    seen.add(id(obj))
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return

    def fix(v: Any, dep: int) -> Any:
        # containers are resolved RECURSIVELY (lists of paths, nested
        # option dicts — Source(paths=['%root%/x']) must resolve at
        # registration, not fail mid-run with a literal-% path)
        if isinstance(v, str):
            return resolve_str(v, params) if "%" in v else v
        if isinstance(v, dict):
            return {kk: fix(vv, dep + 1) for kk, vv in v.items()}
        if isinstance(v, list):
            return [fix(x, dep + 1) for x in v]
        if isinstance(v, tuple):
            items = [fix(x, dep + 1) for x in v]
            if all(a is b for a, b in zip(items, v)):
                return v  # nothing changed — keep the original object
            # preserve tuple SUBCLASSES: a NamedTuple config field must
            # keep its named-attribute access after resolution
            if hasattr(v, "_make"):
                return type(v)._make(items)
            if type(v) is tuple:
                return tuple(items)
            # unknown tuple subclass: its one-iterable constructor (if
            # any) may VALIDATE, reorder, or coerce — reconstructing
            # through it could silently build a wrong value, so always
            # fall back to a plain tuple (the documented pre-resolution
            # behavior for non-NamedTuple subclasses)
            return tuple(items)
        if type(v).__module__.startswith(("pyspark", "py4j")):
            return v
        if hasattr(v, "__dict__"):
            _walk(v, params, seen, dep + 1)
        return v

    for k, v in list(d.items()):
        d[k] = fix(v, depth)


def resolve_params(migration: Any, params: Mapping[str, Any]) -> Any:
    """Resolve ``%param%`` placeholders in a migration's source and
    destination configuration, in place; returns the migration."""
    seen: set[int] = set()
    _walk(migration.source, params, seen)
    _walk(migration.destination, params, seen)
    return migration
