"""Migration scaffold generator (reference C17: MigrationMaker.php:
31-370 + Resources/skeleton/migration.tpl.php — the ``make:a2b:
migration`` command). Generates a ready-to-edit migration module."""

from __future__ import annotations

import os
from typing import Sequence

_TEMPLATE = '''"""Migration: {name}."""

from pyspark.sql import functions as F

from a2b_spark.core.migration import IdField, Migration
from a2b_spark.sinks.parquet import ParquetDestination
from a2b_spark.sources.files import ParquetSource


def transform(df):
    """Edit me: df carries the source columns, ``__src__`` (cast id
    tuple), ``__existing`` (previously-migrated entity or null) and
    ``__dest_<id>`` precomputed ids. Drop rows to skip them; read
    prior values via a2b_spark.exec.executor.existing_field."""
    return df.select(
        "__src__",
        {dest_id_helpers}
        *[c for c in df.columns if not c.startswith("__")],
    )


MIGRATION = Migration(
    name={name!r},
    group={group!r},
    source=ParquetSource({source!r}),
    destination=ParquetDestination({destination!r}, key_cols=({dest_key_names},)),
    source_ids=({source_id_fields},),
    destination_ids=({dest_id_fields},),
    transform=transform,
    depends={depends!r},
)
'''


def make_migration(
    out_dir: str,
    name: str,
    source: str,
    destination: str,
    source_ids: Sequence[tuple[str, str]] = (("id", "int"),),
    destination_ids: Sequence[tuple[str, str]] = (("id", "int"),),
    group: str = "default",
    depends: tuple[str, ...] = (),
) -> str:
    """Write ``<out_dir>/<name>_migration.py``; returns the path."""
    # validate BEFORE writing: empty id tuples render `(,)` (a
    # SyntaxError on import) and empty names mint IdField('', ...)
    # that fails only at run time — a scaffolder must fail fast
    if not name.isidentifier():
        raise ValueError(f"migration name must be a Python identifier: {name!r}")
    for label, ids in (("source_ids", source_ids), ("destination_ids", destination_ids)):
        if not ids:
            raise ValueError(f"{label} must not be empty")
        for n, t in ids:
            if not n:
                raise ValueError(f"{label} contains an empty field name")
            if t not in ("int", "string"):
                raise ValueError(f"{label} field {n!r} has unknown type {t!r}")
    code = _TEMPLATE.format(
        name=name,
        group=group,
        source=source,
        destination=destination,
        depends=depends,
        dest_key_names=", ".join(repr(n) for n, _ in destination_ids),
        source_id_fields=", ".join(f"IdField({n!r}, {t!r})" for n, t in source_ids),
        dest_id_fields=", ".join(f"IdField({n!r}, {t!r})" for n, t in destination_ids),
        dest_id_helpers="\n        ".join(f'"__dest_{n}",' for n, _ in destination_ids),
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}_migration.py")
    if os.path.exists(path):
        raise FileExistsError(path)
    with open(path, "w") as f:
        f.write(code)
    return path


def main(argv: Sequence[str] | None = None) -> int:
    """CLI analogue of the reference's ``make:a2b:migration`` console
    command: ``python -m a2b_spark.maker NAME --source S --destination
    D [--out DIR] [--source-id name:type ...] [--dest-id name:type ...]
    [--group G] [--depends M ...]``."""
    import argparse

    p = argparse.ArgumentParser(prog="a2b-make-migration")
    p.add_argument("name")
    p.add_argument("--source", required=True)
    p.add_argument("--destination", required=True)
    p.add_argument("--out", default=".")
    p.add_argument("--source-id", action="append", default=[])
    p.add_argument("--dest-id", action="append", default=[])
    p.add_argument("--group", default="default")
    p.add_argument("--depends", action="append", default=[])
    args = p.parse_args(argv)

    def ids(pairs, fallback):
        if not pairs:
            return fallback
        out = []
        for s in pairs:
            n, _, t = s.partition(":")
            out.append((n, t or "int"))
        return tuple(out)

    path = make_migration(
        args.out,
        args.name,
        args.source,
        args.destination,
        source_ids=ids(args.source_id, (("id", "int"),)),
        destination_ids=ids(args.dest_id, (("id", "int"),)),
        group=args.group,
        depends=tuple(args.depends),
    )
    print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
