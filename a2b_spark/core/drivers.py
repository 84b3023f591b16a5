"""URI-scheme driver resolution — the reference's config-file wiring.

The reference deploys pipelines from configuration: a migration names
its endpoints as URIs (``doc/usage/configuration.rst:10-49`` —
``uri: 'sqlite:///srv/data/db.sqlite'``) and a driver manager turns
each URI into a concrete driver, failing loudly BEFORE any data moves:

- ``BadUriException`` — malformed URI, or the driver rejects the
  target up front (``src/Drivers/Source/YamlSourceDriver.php:64``
  throws when the directory does not exist;
  ``src/Command/MigrateCommand.php:162`` declares the whole family).
- ``NoDriverForSchemeException`` — no registered driver implements
  the scheme (``src/Exception/NoDriverForSchemeException.php``).
- ``UnclearDriverException`` — more than one driver implements the
  scheme and the migration did not pin one explicitly
  (``src/Exception/UnclearDriverException.php``: "Specify the driver
  using the sourceDriver or destinationDriver property").
- ``NonexistentDriverException`` — an explicitly named driver is not
  registered (``src/Exception/NonexistentDriverException.php``).

Spark design: a plain in-process registry mapping scheme → factory
over the EXISTING source/sink classes (no reflection, no annotations —
those are Symfony container mechanics, not semantics). Resolution is
driver-side and instant; all data-plane validation beyond cheap
existence checks stays in each driver's ``load``/``merge``. Keyword
arguments that a URI cannot express (``key_cols``, ``id_fields``,
schemas, SQL text) pass through ``resolve_*(**opts)`` verbatim —
the analogue of the reference's per-migration annotation fields.

URI grammar notes:

- file-ish schemes use ``scheme:///abs/path`` (``csv://host/path`` is
  rejected: there is no remote-host transport here, and silently
  treating the host as a path segment mangles the target);
  ``?key=value`` query pairs become reader/writer options.
- ``jdbc:`` URIs are OPAQUE (``jdbc:derby:/tmp/db;create=true``):
  the full string passes through to the JDBC driver untouched.
- ``sql:`` is opaque too: everything after the colon is the query
  text (URL-decoded), so ``sql:SELECT * FROM t`` just works.
- the bare names ``stderr``/``stdout`` resolve to the console
  destination — reference parity: simulate mode injects destination
  ``stderr`` with the debug driver (MigrateCommand.php:195-198).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional
from urllib.parse import parse_qsl, unquote, urlsplit


class DriverResolutionError(ValueError):
    """Base of every resolution failure (all config-time)."""


class BadUriException(DriverResolutionError):
    pass


class NoDriverForSchemeException(DriverResolutionError):
    def __init__(self, scheme: str, kind: str):
        super().__init__(
            f'No {kind} driver was found for the scheme "{scheme}".'
        )
        self.scheme = scheme


class UnclearDriverException(DriverResolutionError):
    def __init__(self, scheme: str, names: list[str], kind: str):
        super().__init__(
            f'More than one {kind} driver implements the scheme '
            f'"{scheme}": {", ".join(sorted(names))}. Pin one with '
            f"driver=<name>."
        )
        self.scheme = scheme
        self.driver_names = tuple(sorted(names))


class NonexistentDriverException(DriverResolutionError):
    def __init__(self, name: str, kind: str, known: list[str]):
        super().__init__(
            f"no {kind} driver named {name!r} is registered "
            f"(known: {', '.join(sorted(known))})"
        )
        self.driver_name = name


@dataclass(frozen=True)
class ParsedUri:
    """The pre-validated pieces factories consume."""

    uri: str
    scheme: str
    path: str  # decoded filesystem path ('' for opaque schemes)
    opaque: str  # everything after 'scheme:' verbatim
    options: dict  # decoded ?key=value pairs ({} for opaque schemes)


#: schemes whose payload is NOT hierarchical — never urlsplit their
#: body into netloc/path/query (a ';create=true' or a '?' inside SQL
#: text is payload, not URI syntax)
_OPAQUE_SCHEMES = frozenset({"jdbc", "sql"})


def parse_driver_uri(uri: str) -> ParsedUri:
    """Validate shape early (the reference's BadUriException contract):
    a scheme is mandatory, file-ish URIs need a non-empty path and no
    authority besides ''/'localhost'."""
    if not isinstance(uri, str) or not uri.strip():
        raise BadUriException(f"empty or non-string URI: {uri!r}")
    parts = urlsplit(uri)
    if not parts.scheme:
        raise BadUriException(
            f"URI {uri!r} has no scheme; expected e.g. csv:///path, "
            "yaml-dir:///dir, jdbc:derby:..."
        )
    scheme = parts.scheme.lower()
    if scheme in _OPAQUE_SCHEMES:
        return ParsedUri(uri, scheme, "", uri[len(parts.scheme) + 1:], {})
    if parts.netloc not in ("", "localhost"):
        raise BadUriException(
            f"URI {uri!r} names an authority {parts.netloc!r}; file "
            f"schemes take no host — write {parts.scheme}:///abs/path"
        )
    path = unquote(parts.path)
    if not path:
        raise BadUriException(f"URI {uri!r} has no path")
    options = dict(parse_qsl(parts.query, keep_blank_values=True))
    return ParsedUri(uri, scheme, path, uri[len(parts.scheme) + 1:], options)


@dataclass(frozen=True)
class _Driver:
    name: str
    schemes: tuple[str, ...]
    factory: Callable  # (ParsedUri, **opts) -> driver object


class DriverRegistry:
    """Scheme → driver-factory registry, one instance per kind pair.

    ``resolve(kind, uri, driver=None, **opts)`` implements the
    reference DriverManager's lookup ladder: explicit name first
    (NonexistentDriverException when unknown), otherwise by scheme
    (NoDriverForScheme / UnclearDriver)."""

    def __init__(self):
        self._by_kind: dict[str, dict[str, _Driver]] = {
            "source": {},
            "destination": {},
        }

    def register(
        self, kind: str, name: str, schemes, factory: Callable
    ) -> None:
        if kind not in self._by_kind:
            raise ValueError(f"kind must be source|destination, got {kind!r}")
        table = self._by_kind[kind]
        if name in table:
            raise ValueError(f"duplicate {kind} driver name {name!r}")
        table[name] = _Driver(name, tuple(s.lower() for s in schemes), factory)

    def drivers(self, kind: str) -> dict[str, tuple[str, ...]]:
        return {d.name: d.schemes for d in self._by_kind[kind].values()}

    def resolve(
        self, kind: str, uri: str, driver: Optional[str] = None, **opts
    ):
        table = self._by_kind[kind]
        # reference parity: simulate mode's destination is the bare
        # name 'stderr' (no scheme), wired to the debug driver
        if kind == "destination" and uri in ("stderr", "stdout"):
            uri = "debug:///" + uri
        parsed = parse_driver_uri(uri)
        if driver is not None:
            if driver not in table:
                raise NonexistentDriverException(driver, kind, list(table))
            chosen = table[driver]
            if parsed.scheme not in chosen.schemes:
                raise BadUriException(
                    f"driver {driver!r} implements schemes "
                    f"{list(chosen.schemes)}, not {parsed.scheme!r} "
                    f"(uri {uri!r})"
                )
        else:
            matches = [d for d in table.values() if parsed.scheme in d.schemes]
            if not matches:
                raise NoDriverForSchemeException(parsed.scheme, kind)
            if len(matches) > 1:
                raise UnclearDriverException(
                    parsed.scheme, [d.name for d in matches], kind
                )
            chosen = matches[0]
        return chosen.factory(parsed, **opts)

    def resolve_source(self, uri: str, driver: Optional[str] = None, **opts):
        return self.resolve("source", uri, driver, **opts)

    def resolve_destination(
        self, uri: str, driver: Optional[str] = None, **opts
    ):
        return self.resolve("destination", uri, driver, **opts)


# --------------------------------------------------------------- factories
def _require(opts: dict, key: str, scheme: str, kind: str):
    if key not in opts or opts[key] in (None, (), []):
        raise BadUriException(
            f"{scheme} {kind} requires {key}=... (URIs cannot carry it; "
            "pass it as a resolve keyword, like the reference's "
            "annotation fields)"
        )
    return opts[key]


def _exists_dir(p: ParsedUri):
    import os

    if not os.path.isdir(p.path):
        # YamlSourceDriver.php:64: configure() throws BadUriException
        # when the source directory does not exist — fail at wiring
        # time, not mid-run
        raise BadUriException(f"source directory does not exist: {p.path}")


def _src_csv(p: ParsedUri, **opts):
    from a2b_spark.sources.files import CsvSource

    return CsvSource(p.path, schema=opts.get("schema"), **p.options)


def _src_parquet(p: ParsedUri, **opts):
    from a2b_spark.sources.files import ParquetSource

    return ParquetSource(p.path)


def _src_orc(p: ParsedUri, **opts):
    from a2b_spark.sources.files import OrcSource

    return OrcSource(p.path)


def _dst_orc(p: ParsedUri, **opts):
    from a2b_spark.sinks.orc import OrcDestination

    return OrcDestination(
        p.path, _require(opts, "key_cols", "orc", "destination")
    )


def _src_json(p: ParsedUri, **opts):
    from a2b_spark.sources.files import JsonSource

    return JsonSource(p.path, schema=opts.get("schema"), **p.options)


def _src_yaml(p: ParsedUri, **opts):
    from a2b_spark.sources.yaml_dir import YamlDirSource

    _exists_dir(p)
    return YamlDirSource(
        p.path,
        id_fields=opts.get("id_fields", ()),
        schema=opts.get("schema"),
        recursive=p.options.get("recursive", "true").lower() != "false",
        schema_sample_files=opts.get("schema_sample_files", 1000),
    )


def _src_sql(p: ParsedUri, **opts):
    from a2b_spark.sources.sql import SqlSource

    sql = unquote(p.opaque).strip()
    if not sql:
        raise BadUriException("sql: URI carries no query text")
    return SqlSource(sql, views=opts.get("views"))


def _src_jdbc(p: ParsedUri, **opts):
    from a2b_spark.sources.sql import JdbcSource

    query = _require(opts, "query", "jdbc", "source")
    rest = {k: v for k, v in opts.items() if k != "query"}
    return JdbcSource(p.uri, query, **rest)


def _dst_csv(p: ParsedUri, **opts):
    from a2b_spark.sinks.csv import CsvDestination

    return CsvDestination(p.path, _require(opts, "key_cols", "csv", "destination"))


def _dst_parquet(p: ParsedUri, **opts):
    from a2b_spark.sinks.parquet import ParquetDestination

    return ParquetDestination(
        p.path,
        _require(opts, "key_cols", "parquet", "destination"),
        partition_by=opts.get("partition_by"),
    )


def _dst_jsonl(p: ParsedUri, **opts):
    from a2b_spark.sinks.jsonl import JsonlDestination

    return JsonlDestination(
        p.path, _require(opts, "key_cols", "jsonl", "destination")
    )


def _dst_yaml(p: ParsedUri, **opts):
    from a2b_spark.sinks.yaml_dir import YamlDirDestination

    return YamlDirDestination(
        p.path, _require(opts, "id_fields", "yaml-dir", "destination")
    )


def _dst_jdbc(p: ParsedUri, **opts):
    from a2b_spark.sinks.jdbc import JdbcDestination

    table = _require(opts, "table", "jdbc", "destination")
    key_cols = _require(opts, "key_cols", "jdbc", "destination")
    rest = {k: v for k, v in opts.items() if k not in ("table", "key_cols")}
    return JdbcDestination(p.uri, table, key_cols, **rest)


def _dst_debug(p: ParsedUri, **opts):
    from a2b_spark.sinks.console import ConsoleDestination

    return ConsoleDestination(key_cols=opts.get("key_cols", ()))


def default_registry() -> DriverRegistry:
    """A fresh registry wired with every built-in driver."""
    r = DriverRegistry()
    r.register("source", "csv", ("csv",), _src_csv)
    r.register("source", "parquet", ("parquet",), _src_parquet)
    r.register("source", "orc", ("orc",), _src_orc)
    r.register("source", "json", ("json", "jsonl"), _src_json)
    r.register("source", "yaml-dir", ("yaml-dir", "yaml"), _src_yaml)
    r.register("source", "sql", ("sql",), _src_sql)
    r.register("source", "jdbc", ("jdbc",), _src_jdbc)
    r.register("destination", "csv", ("csv",), _dst_csv)
    r.register("destination", "parquet", ("parquet",), _dst_parquet)
    r.register("destination", "orc", ("orc",), _dst_orc)
    r.register("destination", "jsonl", ("jsonl", "json"), _dst_jsonl)
    r.register("destination", "yaml-dir", ("yaml-dir", "yaml"), _dst_yaml)
    r.register("destination", "jdbc", ("jdbc",), _dst_jdbc)
    r.register("destination", "debug", ("debug",), _dst_debug)
    return r


_DEFAULT: Optional[DriverRegistry] = None


def _default() -> DriverRegistry:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = default_registry()
    return _DEFAULT


def resolve_source(uri: str, driver: Optional[str] = None, **opts):
    """Module-level convenience over a shared default registry."""
    return _default().resolve_source(uri, driver, **opts)


def resolve_destination(uri: str, driver: Optional[str] = None, **opts):
    return _default().resolve_destination(uri, driver, **opts)
