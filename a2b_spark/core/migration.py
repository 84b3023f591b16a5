"""Migration definition + registry.

Mirrors the reference's ``@DataMigration`` annotation surface
(reference: src/Annotations/DataMigration.php:15-113 — fields name,
group, source, sourceIds, destination, destinationIds, depends, flush,
extends) re-expressed as a plain dataclass over Spark dataflows.

A *transform* here is a function ``DataFrame -> DataFrame``:

- input: the source DataFrame with its id columns already cast
  (reference C2) plus, when the destination already holds a previously
  migrated entity for the row, a struct column ``__existing`` carrying
  that entity (reference semantics: transform receives the *current
  destination entity*, DataMigrationExecutor.php:178-190).
- output: the destination entity columns. Rows dropped by the
  transform (``filter``) are "skips" — reference: returning null from
  transform() skips the row (DataMigrationExecutor.php:222-226).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Callable, Optional

from pyspark.sql import DataFrame

EXISTING_COL = "__existing"

# id type name -> Spark SQL cast target (reference IdField.php:26-48:
# type ∈ {int, string}, default int)
ID_TYPES = {"int": "bigint", "string": "string"}


@dataclass(frozen=True)
class IdField:
    name: str
    type: str = "int"  # "int" | "string"

    def __post_init__(self):
        if self.type not in ID_TYPES:
            raise ValueError(f"id type must be one of {sorted(ID_TYPES)}, got {self.type!r}")

    @property
    def spark_type(self) -> str:
        return ID_TYPES[self.type]


@dataclass
class Migration:
    """One unit of pipeline: source → transform → keyed destination."""

    name: str
    source: object  # Source protocol: .load(spark) -> DataFrame
    destination: object  # Destination protocol: see a2b_spark.sinks.base
    source_ids: tuple[IdField, ...]
    destination_ids: tuple[IdField, ...]
    transform: Callable[[DataFrame], DataFrame]
    depends: tuple[str, ...] = ()
    group: str = "default"
    flush: bool = False  # reference flag retained; Spark writes are already atomic per-action
    extends: Optional[str] = None  # share the parent's mapping table (reference C10)

    def mapping_key(self) -> str:
        """Mapping-table identity: extends-children share the parent's table
        (reference: DataMigrationExecutor.php:172-175)."""
        return self.extends or self.name


class MigrationRegistry:
    """Collects migrations; resolves groups, explicit selection, and the
    dependency DAG (reference: DataMigrationManager.php:256-266, 271-326)."""

    def __init__(self, params: Optional[dict] = None):
        """``params``: container-parameter dict; ``%name%`` placeholders
        in each registered migration's source/destination configuration
        are resolved at registration (reference
        DataMigrationManager.php:155-183)."""
        self._migrations: dict[str, Migration] = {}
        self._params = dict(params or {})

    def register(self, migration: Migration) -> Migration:
        if migration.name in self._migrations:
            raise ValueError(f"duplicate migration {migration.name!r}")
        if self._params:
            from a2b_spark.core.params import resolve_params

            resolve_params(migration, self._params)
        self._migrations[migration.name] = migration
        return migration

    def get(self, name: str) -> Migration:
        return self._migrations[name]

    def __contains__(self, name: str) -> bool:
        return name in self._migrations

    def validate_extends(self, migration: Migration) -> None:
        """extends requires identical source/dest id shape
        (reference: DataMigrationManager.php:230-251)."""
        if migration.extends is None:
            return
        parent = self._migrations[migration.extends]
        if (parent.source_ids, parent.destination_ids) != (
            migration.source_ids,
            migration.destination_ids,
        ):
            raise ValueError(
                f"{migration.name} extends {parent.name} but id definitions differ"
            )

    def select(self, groups: tuple[str, ...] = ("default",), names: tuple[str, ...] = ()) -> list[Migration]:
        """Explicit name list wins, else all migrations in the groups
        (reference: MigrateCommand.php:228-247)."""
        if names:
            return [self._migrations[n] for n in names]
        return [m for m in self._migrations.values() if m.group in groups]

    def resolve_order(self, selected: list[Migration], with_deps: bool = True) -> list[Migration]:
        """Expand the depends closure and topologically sort. Circular
        dependencies raise (graphlib CycleError), matching the reference
        (DataMigrationManager.php:271-326)."""
        if not with_deps:
            return selected
        wanted: dict[str, Migration] = {}
        stack = list(selected)
        while stack:
            m = stack.pop()
            if m.name in wanted:
                continue
            wanted[m.name] = m
            for dep in m.depends:
                stack.append(self._migrations[dep])
            if m.extends:
                stack.append(self._migrations[m.extends])
        # extends is an ORDERING edge too: the child writes the
        # PARENT's mapping table and resolves against its output, so
        # it must never be scheduled before the parent
        ts = TopologicalSorter(
            {
                name: set(m.depends) | ({m.extends} if m.extends else set())
                for name, m in wanted.items()
            }
        )
        order = list(ts.static_order())
        return [wanted[n] for n in order]

    def parallel_batches(self, selected: list[Migration]) -> list[list[Migration]]:
        """Group an ALREADY-RESOLVED list into dependency levels;
        migrations within a level are independent and can run as
        concurrent Spark jobs (FAIR pool). The input is used as given —
        re-resolving here would re-expand the depends closure and
        silently override the caller's with_deps=False opt-out."""
        ordered = selected
        level: dict[str, int] = {}
        for m in ordered:
            parents = list(m.depends) + ([m.extends] if m.extends else [])
            level[m.name] = 1 + max(
                (level[d] for d in parents if d in level), default=-1
            )
        batches: dict[int, list[Migration]] = {}
        for m in ordered:
            batches.setdefault(level[m.name], []).append(m)
        return [batches[i] for i in sorted(batches)]
