"""%param% container-parameter resolution (reference
DataMigrationManager.php:155-183): the same pipeline definition
resolves to different environments at registration time."""

import pytest
from pyspark.sql import functions as F

from a2b_spark.core.migration import IdField, Migration, MigrationRegistry
from a2b_spark.core.params import resolve_params, resolve_str
from a2b_spark.sinks.jdbc import JdbcDestination
from a2b_spark.sinks.parquet import ParquetDestination
from a2b_spark.sources.files import CsvSource


def test_resolve_str_basics():
    p = {"root": "/data", "env": "prod"}
    assert resolve_str("%root%/t_%env%", p) == "/data/t_prod"
    assert resolve_str("100%% pure %env%", p) == "100% pure prod"
    with pytest.raises(KeyError, match="unresolved parameter %missing%"):
        resolve_str("%missing%/x", p)


def _pipeline(dest_tpl):
    return Migration(
        name="m",
        source=CsvSource("%data_root%/in.csv"),
        destination=ParquetDestination(dest_tpl, key_cols=("id",)),
        source_ids=(IdField("id", "int"),),
        destination_ids=(IdField("id", "int"),),
        transform=lambda df: df,
    )


def test_same_pipeline_two_environments():
    dev = MigrationRegistry(params={"data_root": "/tmp/dev"})
    prod = MigrationRegistry(params={"data_root": "/srv/prod"})
    m_dev = dev.register(_pipeline("%data_root%/customers"))
    m_prod = prod.register(_pipeline("%data_root%/customers"))
    assert m_dev.source.path == "/tmp/dev/in.csv"
    assert m_dev.destination.path == "/tmp/dev/customers"
    assert m_prod.source.path == "/srv/prod/in.csv"
    assert m_prod.destination.path == "/srv/prod/customers"


def test_jdbc_url_and_properties_resolved():
    dest = JdbcDestination(
        "jdbc:postgresql://%db_host%/app",
        "entities",
        ["id"],
        properties={"user": "%db_user%", "driver": "org.postgresql.Driver"},
    )
    m = Migration(
        name="j",
        source=CsvSource("/in.csv"),
        destination=dest,
        source_ids=(IdField("id", "int"),),
        destination_ids=(IdField("id", "int"),),
        transform=lambda df: df,
    )
    resolve_params(m, {"db_host": "db.prod", "db_user": "svc"})
    assert dest.url == "jdbc:postgresql://db.prod/app"
    assert dest.properties == {"user": "svc", "driver": "org.postgresql.Driver"}


def test_unknown_param_fails_at_registration():
    reg = MigrationRegistry(params={"other": "x"})
    with pytest.raises(KeyError, match="unresolved parameter"):
        reg.register(_pipeline("%data_root%/customers"))


def test_registry_without_params_leaves_placeholders():
    reg = MigrationRegistry()
    m = reg.register(_pipeline("%data_root%/customers"))
    assert m.destination.path == "%data_root%/customers"


def test_resolved_pipeline_runs(spark, tmp_path, sf_dir):
    """End-to-end: registration-resolved destination actually receives
    the migrated rows."""
    from a2b_spark.exec.executor import run_migration
    from a2b_spark.mapping.store import MappingStore
    from a2b_spark.sources.base import DataFrameSource

    reg = MigrationRegistry(params={"out_root": str(tmp_path)})
    src = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(10)
    m = reg.register(
        Migration(
            name="cust",
            source=DataFrameSource(src),
            destination=ParquetDestination("%out_root%/dest", key_cols=("id",)),
            source_ids=(IdField("c_custkey", "int"),),
            destination_ids=(IdField("id", "int"),),
            transform=lambda df: df.select("__src__", "__dest_id", "c_custkey"),
        )
    )
    assert m.destination.path == f"{tmp_path}/dest"
    mapper = MappingStore(spark, str(tmp_path / "maps"))
    r = run_migration(spark, m, mapper)
    assert r.rows_written == 10
    assert m.destination.read_snapshot(spark).count() == 10


def test_params_resolve_inside_lists_and_nested_dicts():
    """%param% placeholders inside list values and nested dicts must
    resolve at registration — they used to survive silently and fail
    mid-run as literal paths (round-5 review)."""
    from a2b_spark.core.params import resolve_params

    class Src:
        def __init__(self):
            self.paths = ["%root%/a", "%root%/b"]
            self.options = {"jdbc": {"url": "%db%", "n": 3}, "flat": "%root%"}
            self.mixed = ("%root%/t",)

    class M:
        pass

    m = M()
    m.source = Src()
    m.destination = Src()
    resolve_params(m, {"root": "/data", "db": "jdbc:x"})
    s = m.source
    assert s.paths == ["/data/a", "/data/b"]
    assert s.options == {"jdbc": {"url": "jdbc:x", "n": 3}, "flat": "/data"}
    assert s.mixed == ("/data/t",)
    # unknown params still raise, now also from inside containers
    import pytest as _p

    m2 = M(); m2.source = Src(); m2.destination = Src()
    with _p.raises(KeyError, match="unresolved parameter"):
        resolve_params(m2, {"root": "/data"})  # %db% missing


def test_resolve_params_preserves_namedtuple():
    """A NamedTuple config field must keep its named-attribute access
    after %param% resolution (a plain-tuple downcast fails later with
    AttributeError); unchanged tuples keep their identity."""
    from collections import namedtuple

    from a2b_spark.core.params import resolve_params

    Endpoint = namedtuple("Endpoint", ["host", "port"])

    class Cfg:
        pass

    class M:
        pass

    src, dst = Cfg(), Cfg()
    src.endpoint = Endpoint("%host%", "5432")
    src.untouched = (1, 2, 3)
    m = M()
    m.source, m.destination = src, dst
    resolve_params(m, {"host": "db.example"})
    assert isinstance(src.endpoint, Endpoint)
    assert src.endpoint.host == "db.example"
    assert src.endpoint.port == "5432"
    assert src.untouched == (1, 2, 3) and isinstance(src.untouched, tuple)


def test_resolve_params_tuple_subclass_odd_constructor():
    """A tuple subclass whose constructor does NOT accept one iterable
    (so ``type(v)(items)`` would raise) must fall back to a plain
    tuple — the pre-resolution behavior — instead of aborting the
    whole migration resolution (round-6 review)."""
    from a2b_spark.core.params import resolve_params

    class Pair(tuple):
        def __new__(cls, a, b):
            return super().__new__(cls, (a, b))

    class Cfg:
        pass

    class M:
        pass

    src, dst = Cfg(), Cfg()
    src.pair = Pair("%root%/x", "y")
    m = M()
    m.source, m.destination = src, dst
    resolve_params(m, {"root": "/data"})
    assert tuple(src.pair) == ("/data/x", "y")
