"""Config-file pipeline loading — the reference's deployment mode.

The reference wires whole pipelines from configuration
(``doc/usage/configuration.rst:10-49``): ``a2b.yaml`` names reusable
sources/destinations (``name`` + ``uri`` + optional explicit
``driver``), and each migration references them by NAME or inlines a
URI; the ``@DataMigration`` annotation carries ids, group, and
dependencies as data. This module is that loader for the Spark
engine: a plain dict (or a YAML file that deserializes to one) becomes
a fully-wired :class:`~a2b_spark.core.migration.MigrationRegistry`,
with every endpoint resolved through the URI-scheme driver registry
(:mod:`a2b_spark.core.drivers` — BadUri/NoDriverForScheme/
UnclearDriver validation happens at LOAD time, before any data moves,
exactly like the reference's configure() pass).

Config shape (all endpoint opts beyond the URI ride as data too)::

    params:        {key: value}          # %key% substitution values
    sources:
      - {name: old_db, uri: "sql:SELECT ...", driver: null, opts: {}}
    destinations:
      - {name: out, uri: "parquet:///data/out", opts: {key_cols: [id]}}

``driver`` pins an explicit driver NAME when more than one implements
the URI's scheme — the UnclearDriverException resolution, parity with
the reference's annotation fields
(``src/Annotations/DataMigration.php:107-113``); it works on named
entries and inline endpoint dicts alike. Migration shape::

    migrations:
      - name: customers
        source: old_db                    # a named source, or a URI
        destination: out
        source_ids:  [{name: c_custkey, type: int}]
        destination_ids: [{name: id, type: int}]
        transform: my_pkg.transforms:customers   # module[:attr] path
        depends: [regions]
        group: default
        extends: null

The TRANSFORM is the one thing a config file cannot carry as data —
it is named by dotted import path (``module:attr`` or ``module.attr``)
and imported at load, mirroring the reference where the migration
CLASS is the config unit. Unknown top-level or migration keys raise
(a typo like ``source_id`` must not silently wire a default).
"""

from __future__ import annotations

import importlib
from typing import Callable, Optional

from a2b_spark.core.drivers import DriverRegistry
from a2b_spark.core.drivers import _default as _default_drivers
from a2b_spark.core.migration import IdField, Migration, MigrationRegistry

_MIGRATION_KEYS = {
    "name", "source", "destination", "source_ids", "destination_ids",
    "transform", "depends", "group", "extends",
}
_TOP_KEYS = {"params", "sources", "destinations", "migrations"}
_ENDPOINT_KEYS = {"name", "uri", "driver", "opts"}


def load_transform(path: str) -> Callable:
    """Import ``module:attr`` (or ``module.attr`` — last dot splits).
    Loud on missing modules/attributes and non-callables."""
    if ":" in path:
        mod_name, attr = path.split(":", 1)
    elif "." in path:
        mod_name, attr = path.rsplit(".", 1)
    else:
        raise ValueError(
            f"transform {path!r} is not a dotted path (module:attr)"
        )
    mod = importlib.import_module(mod_name)
    try:
        fn = getattr(mod, attr)
    except AttributeError:
        raise ValueError(
            f"transform {path!r}: module {mod_name!r} has no "
            f"attribute {attr!r}"
        ) from None
    if not callable(fn):
        raise ValueError(f"transform {path!r} is not callable")
    return fn


def _id_fields(entries, where: str) -> tuple[IdField, ...]:
    out = []
    for e in entries or ():
        if isinstance(e, str):
            out.append(IdField(e))
        elif isinstance(e, dict):
            bad = set(e) - {"name", "type"}
            if bad:
                raise ValueError(f"{where}: unknown id-field keys {sorted(bad)}")
            out.append(IdField(e["name"], e.get("type", "int")))
        else:
            raise ValueError(f"{where}: id field must be a name or dict, got {e!r}")
    return tuple(out)


def _endpoint_table(entries, kind: str) -> dict:
    table = {}
    for e in entries or ():
        bad = set(e) - _ENDPOINT_KEYS
        if bad:
            raise ValueError(f"{kind} {e.get('name')!r}: unknown keys {sorted(bad)}")
        if "name" not in e or "uri" not in e:
            raise ValueError(f"every named {kind} needs name and uri: {e!r}")
        if e["name"] in table:
            raise ValueError(f"duplicate {kind} name {e['name']!r}")
        table[e["name"]] = e
    return table


def registry_from_config(
    cfg: dict, drivers: Optional[DriverRegistry] = None
) -> MigrationRegistry:
    """Build a fully-wired MigrationRegistry from a config dict. Every
    endpoint resolves NOW (bad URIs, unknown schemes, ambiguous or
    missing drivers all raise before anything runs); ``%param%``
    placeholders in endpoint opts resolve through the registry's
    params pass like any programmatic registration."""
    drivers = drivers or _default_drivers()
    bad = set(cfg) - _TOP_KEYS
    if bad:
        raise ValueError(f"unknown top-level config keys: {sorted(bad)}")
    params = cfg.get("params") or {}
    sources = _endpoint_table(cfg.get("sources"), "source")
    dests = _endpoint_table(cfg.get("destinations"), "destination")

    def _sub(v):
        """%param% substitution BEFORE driver resolution: the eager
        validation pass (yaml-dir existence, scheme checks) must see
        the real environment-specific value, not the placeholder —
        the reference resolves container parameters at exactly this
        point (DataMigrationManager.php:155-183)."""
        if isinstance(v, str) and "%" in v:
            from a2b_spark.core.params import resolve_str

            return resolve_str(v, params)
        if isinstance(v, dict):
            return {k: _sub(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return type(v)(_sub(x) for x in v)
        return v

    def resolve(kind: str, ref, table: dict):
        """A migration endpoint: a named entry, or an inline URI."""
        if isinstance(ref, dict):
            # inline {uri, driver, opts} — same unknown-key contract as
            # named entries ('opt:'/'key_col:' typos must raise here,
            # not surface later as a missing-option error)
            bad = set(ref) - (_ENDPOINT_KEYS - {"name"})
            if bad:
                raise ValueError(
                    f"inline {kind} endpoint: unknown keys {sorted(bad)} "
                    f"(valid: {sorted(_ENDPOINT_KEYS - {'name'})})"
                )
            if "uri" not in ref:
                raise ValueError(f"inline {kind} endpoint needs uri: {ref!r}")
            entry = ref
        elif ref in table:
            entry = table[ref]
        elif isinstance(ref, str) and (
            ":" in ref
            # bare stderr/stdout are DESTINATION names in the driver
            # registry; a source named 'stderr' must hit the
            # unknown-reference error, not a confusing no-scheme BadUri
            or (kind == "destination" and ref in ("stderr", "stdout"))
        ):
            entry = {"uri": ref}
        else:
            raise ValueError(
                f"migration references unknown {kind} {ref!r} "
                f"(known: {sorted(table)}; or pass a URI)"
            )
        opts = _sub(dict(entry.get("opts") or {}))
        for k in ("key_cols", "id_fields"):
            if k in opts and k == "id_fields":
                opts[k] = _id_fields(opts[k], f"{kind} opts.id_fields")
            elif k in opts:
                opts[k] = tuple(opts[k])
        return drivers.resolve(
            kind, _sub(entry["uri"]), entry.get("driver"), **opts
        )

    reg = MigrationRegistry(params=cfg.get("params"))
    for m in cfg.get("migrations") or ():
        bad = set(m) - _MIGRATION_KEYS
        if bad:
            raise ValueError(
                f"migration {m.get('name')!r}: unknown keys {sorted(bad)} "
                f"(valid: {sorted(_MIGRATION_KEYS)})"
            )
        for req in ("name", "source", "destination", "transform"):
            if req not in m:
                raise ValueError(f"migration config needs {req!r}: {m!r}")
        transform = m["transform"]
        if isinstance(transform, str):
            transform = load_transform(transform)
        reg.register(
            Migration(
                name=m["name"],
                source=resolve("source", m["source"], sources),
                destination=resolve("destination", m["destination"], dests),
                source_ids=_id_fields(m.get("source_ids"), m["name"]),
                destination_ids=_id_fields(m.get("destination_ids"), m["name"]),
                transform=transform,
                depends=tuple(m.get("depends") or ()),
                group=m.get("group", "default"),
                extends=m.get("extends"),
            )
        )
    # extends validates at LOAD time like every other wiring error (the
    # runner re-checks at run time for programmatic registrations);
    # deferred past the loop so a child may precede its parent in the file
    for m in cfg.get("migrations") or ():
        mig = reg.get(m["name"])
        if mig.extends is not None:
            if mig.extends not in reg:
                raise ValueError(
                    f"migration {mig.name!r} extends unknown migration "
                    f"{mig.extends!r}"
                )
            reg.validate_extends(mig)
    return reg


def registry_from_yaml(
    path: str, drivers: Optional[DriverRegistry] = None
) -> MigrationRegistry:
    """:func:`registry_from_config` over a YAML file — the literal
    ``a2b.yaml`` deployment shape."""
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    if not isinstance(cfg, dict):
        raise ValueError(f"pipeline config must be a mapping: {path}")
    return registry_from_config(cfg, drivers)
