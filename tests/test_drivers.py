"""URI-scheme driver resolution (core/drivers.py) — the reference's
config-file wiring (doc/usage/configuration.rst URIs;
MigrateCommand.php:162 BadUriException family;
DriverManager.php getSourceDriver/getDestinationDriver ladder).

Matrix per the round-11 verdict: a good URI per driver, bad scheme,
ambiguous scheme, malformed URI — plus one migration run end-to-end
wired purely from URI strings."""

import pytest

from a2b_spark.core.drivers import (
    BadUriException,
    DriverRegistry,
    NoDriverForSchemeException,
    NonexistentDriverException,
    UnclearDriverException,
    default_registry,
    parse_driver_uri,
    resolve_destination,
    resolve_source,
)
from a2b_spark.core.migration import IdField


# ------------------------------------------------------------ parsing
def test_malformed_uris_rejected():
    for bad in ("", "   ", "/just/a/path", "csv://", "csv://host/p", None, 7):
        with pytest.raises(BadUriException):
            parse_driver_uri(bad)


def test_opaque_schemes_keep_payload_verbatim():
    p = parse_driver_uri("jdbc:derby:/tmp/db;create=true")
    assert p.scheme == "jdbc" and p.opaque == "derby:/tmp/db;create=true"
    q = parse_driver_uri("sql:SELECT 1 AS x -- what?=nope")
    assert q.scheme == "sql" and "what?=nope" in q.opaque


def test_file_uri_options_and_percent_decoding():
    p = parse_driver_uri("csv:///data/my%20file.csv?sep=%3B&header=false")
    assert p.path == "/data/my file.csv"
    assert p.options == {"sep": ";", "header": "false"}


# ------------------------------------------------------- resolution ladder
def test_good_uri_per_builtin_driver(tmp_path):
    from a2b_spark.sinks.console import ConsoleDestination
    from a2b_spark.sinks.csv import CsvDestination
    from a2b_spark.sinks.jdbc import JdbcDestination
    from a2b_spark.sinks.jsonl import JsonlDestination
    from a2b_spark.sinks.parquet import ParquetDestination
    from a2b_spark.sinks.yaml_dir import YamlDirDestination
    from a2b_spark.sources.files import CsvSource, JsonSource, ParquetSource
    from a2b_spark.sources.sql import JdbcSource, SqlSource
    from a2b_spark.sources.yaml_dir import YamlDirSource

    ydir = tmp_path / "y"
    ydir.mkdir()
    ids = (IdField("k", "int"),)
    cases = [
        (resolve_source("csv:///tmp/in.csv"), CsvSource),
        (resolve_source("parquet:///tmp/in.pq"), ParquetSource),
        (resolve_source("jsonl:///tmp/in.jsonl"), JsonSource),
        (resolve_source(f"yaml-dir://{ydir}", id_fields=ids), YamlDirSource),
        (resolve_source("sql:SELECT 1 AS one"), SqlSource),
        (
            resolve_source("jdbc:derby:memory:x", query="SELECT 1"),
            JdbcSource,
        ),
        (resolve_destination("csv:///tmp/out", key_cols=("k",)), CsvDestination),
        (
            resolve_destination("parquet:///tmp/out", key_cols=("k",)),
            ParquetDestination,
        ),
        (
            resolve_destination("jsonl:///tmp/out", key_cols=("k",)),
            JsonlDestination,
        ),
        (
            resolve_destination(f"yaml://{ydir}", id_fields=ids),
            YamlDirDestination,
        ),
        (
            resolve_destination(
                "jdbc:derby:memory:x", table="t", key_cols=("k",)
            ),
            JdbcDestination,
        ),
        (resolve_destination("stderr"), ConsoleDestination),
    ]
    for obj, cls in cases:
        assert isinstance(obj, cls), (obj, cls)
    # the opaque jdbc URI must reach the driver untouched
    assert cases[5][0].url == "jdbc:derby:memory:x"
    # csv query options flow into the reader options
    src = resolve_source("csv:///tmp/in.csv?sep=%7C")
    assert src.options["sep"] == "|"


def test_bad_scheme_and_nonexistent_driver():
    with pytest.raises(NoDriverForSchemeException, match='"gopher"'):
        resolve_source("gopher:///hole")
    with pytest.raises(NonexistentDriverException, match="known:"):
        resolve_source("csv:///p", driver="nope")
    # explicit driver that does not implement the URI's scheme
    with pytest.raises(BadUriException, match="implements schemes"):
        resolve_source("csv:///p", driver="parquet")


def test_ambiguous_scheme_requires_explicit_driver(tmp_path):
    """Reference UnclearDriverException semantics: two drivers on one
    scheme fail by-scheme resolution but resolve when pinned by name —
    'Specify the driver using the sourceDriver ... property'."""
    from a2b_spark.sources.files import CsvSource

    r = default_registry()
    r.register(
        "source", "csv-strict", ("csv",), lambda p, **o: ("strict", p.path)
    )
    with pytest.raises(UnclearDriverException) as ei:
        r.resolve_source("csv:///p")
    assert ei.value.driver_names == ("csv", "csv-strict")
    assert isinstance(r.resolve_source("csv:///p", driver="csv"), CsvSource)
    assert r.resolve_source("csv:///p", driver="csv-strict") == ("strict", "/p")


def test_early_validation_yaml_dir_and_required_opts(tmp_path):
    # YamlSourceDriver.php:64 parity: missing dir fails at WIRING time
    with pytest.raises(BadUriException, match="does not exist"):
        resolve_source(f"yaml-dir://{tmp_path}/missing")
    with pytest.raises(BadUriException, match="key_cols"):
        resolve_destination("parquet:///tmp/out")
    with pytest.raises(BadUriException, match="query"):
        resolve_source("jdbc:derby:memory:x")
    with pytest.raises(BadUriException, match="no query text"):
        resolve_source("sql:")


def test_registry_rejects_duplicates_and_bad_kind():
    r = DriverRegistry()
    r.register("source", "x", ("x",), lambda p: p)
    with pytest.raises(ValueError, match="duplicate"):
        r.register("source", "x", ("y",), lambda p: p)
    with pytest.raises(ValueError, match="kind"):
        r.register("sink", "y", ("y",), lambda p: p)


# ------------------------------------------------- URI-wired migration
def test_migration_wired_purely_from_uris(spark, tmp_path, sf_dir):
    """A config-style pipeline: every endpoint named by URI string,
    resolved through the registry, run through the real executor."""
    from pyspark.sql import functions as F

    from a2b_spark.core.migration import Migration
    from a2b_spark.exec.executor import run_migration
    from a2b_spark.mapping.store import MappingStore

    config = {
        "source": "sql:SELECT r_regionkey, r_name FROM "
        f"parquet.`{sf_dir}/region.parquet`",
        "destination": f"parquet://{tmp_path}/regions_out",
    }
    m = Migration(
        name="regions_by_uri",
        source=resolve_source(config["source"]),
        destination=resolve_destination(
            config["destination"], key_cols=("id",)
        ),
        source_ids=(IdField("r_regionkey", "int"),),
        destination_ids=(IdField("id", "int"),),
        transform=lambda df: df.select(
            "__src__",
            "__dest_id",
            "r_regionkey",
            F.upper("r_name").alias("name"),
        ),
    )
    store = MappingStore(spark, str(tmp_path / "map"))
    run_migration(spark, m, store)
    out = m.destination.read_snapshot(spark)
    assert out.count() == 5
    assert {r.name for r in out.collect()} == {
        "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"
    }
