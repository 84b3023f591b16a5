"""Reference store (C8) + stub (C9) + extends (C10) semantics.

Modeled on the reference's MigrationReferenceStoreTest and the stub
lifecycle documented in doc/usage/creating_migrations.rst:196-238:
a stub entity is created for a dangling forward reference, mapped
STATUS_STUB, and a later run of the owning migration updates it in
place (same destination id).
"""

import pytest
from pyspark.sql import functions as F

from a2b_spark.core.migration import IdField, Migration, MigrationRegistry
from a2b_spark.exec.executor import run_migration
from a2b_spark.exec.references import ReferenceStore, ensure_stubs
from a2b_spark.mapping.store import MappingStore, STATUS_MIGRATED, STATUS_STUB
from a2b_spark.sinks.parquet import ParquetDestination
from a2b_spark.sources.base import DataFrameSource


def nation_migration(tmp_path, df):
    return Migration(
        name="nation",
        source=DataFrameSource(df),
        destination=ParquetDestination(str(tmp_path / "nation_dest"), key_cols=("id",)),
        source_ids=(IdField("n_nationkey", "int"),),
        destination_ids=(IdField("id", "int"),),
        transform=lambda d: d.select(
            "__src__", "__dest_id", "n_nationkey", F.upper("n_name").alias("nation_name")
        ),
    )


@pytest.fixture()
def nations(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet")


@pytest.fixture()
def customers(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


def test_reference_resolve_joins_referenced_output(spark, tmp_path, nations, customers):
    reg = MigrationRegistry()
    mapper = MappingStore(spark, str(tmp_path / "maps"))
    nm = reg.register(nation_migration(tmp_path, nations))
    run_migration(spark, nm, mapper)

    refs = ReferenceStore(spark, reg, mapper)
    out = refs.resolve(
        customers.select("c_custkey", "c_nationkey"),
        "nation",
        on={"c_nationkey": "n_nationkey"},
        broadcast=True,
    )
    row = out.filter(F.col("__ref_nation").isNotNull()).first()
    assert row["__ref_nation"]["nation_name"].isupper()
    # every customer's nation exists -> no unresolved refs
    assert out.filter(F.col("__ref_nation").isNull()).count() == 0


def test_stub_then_real_run_updates_in_place(spark, tmp_path, nations):
    reg = MigrationRegistry()
    mapper = MappingStore(spark, str(tmp_path / "maps"))
    nm = reg.register(nation_migration(tmp_path, nations))

    # forward references arrive before the nation migration has run
    needed = spark.range(3).select(F.col("id").cast("bigint").alias("n_nationkey"))
    n_stubs = ensure_stubs(spark, nm, mapper, needed)
    assert n_stubs == 3
    assert ensure_stubs(spark, nm, mapper, needed) == 0  # idempotent

    map_df = mapper.load("nation", nm.source_ids, nm.destination_ids)
    assert map_df.filter(F.col("status") == STATUS_STUB).count() == 3

    refs = ReferenceStore(spark, reg, mapper)
    stub_table = refs.lookup_table("nation")
    stub_ids = {
        r["entity"]["id"] for r in stub_table.filter(F.col("status") == STATUS_STUB).collect()
    }
    assert len(stub_ids) == 3

    # the real run overwrites stubs in place: same dest ids, real values
    run_migration(spark, nm, mapper)
    map_df = mapper.load("nation", nm.source_ids, nm.destination_ids)
    assert map_df.filter(F.col("status") == STATUS_STUB).count() == 0
    assert map_df.filter(F.col("status") == STATUS_MIGRATED).count() == nations.count()

    snap = nm.destination.read_snapshot(spark)
    assert snap.count() == nations.count()  # no duplicates from the stub pass
    filled = snap.filter(F.col("id").isin(list(stub_ids)))
    assert filled.count() == 3
    assert filled.filter(F.col("nation_name").isNull()).count() == 0


def test_extends_shares_parent_mapping(spark, tmp_path, nations):
    reg = MigrationRegistry()
    mapper = MappingStore(spark, str(tmp_path / "maps"))
    nm = reg.register(nation_migration(tmp_path, nations))
    run_migration(spark, nm, mapper)
    base = nm.destination.read_snapshot(spark).select("id", "nation_name").collect()

    child = Migration(
        name="nation_enrich",
        source=DataFrameSource(nations),
        destination=nm.destination,
        source_ids=nm.source_ids,
        destination_ids=nm.destination_ids,
        transform=lambda d: d.select(
            "__src__",
            "__dest_id",
            "n_nationkey",
            F.initcap("n_name").alias("nation_name"),
        ),
        extends="nation",
    )
    reg.register(child)
    reg.validate_extends(child)
    run_migration(spark, child, mapper)

    # same mapping table, same dest ids, updated values — no duplicates
    snap = nm.destination.read_snapshot(spark)
    assert snap.count() == nations.count()
    assert {r.id for r in snap.select("id").collect()} == {r.id for r in base}
    assert snap.filter(F.col("nation_name") == F.upper("nation_name")).count() == 0


def test_stub_ids_use_the_prepare_separator(spark, tmp_path, nations):
    """String stub ids must be minted with the same '~' rule as
    prepare() — '/' would nest paths in file-layout sinks and make ids
    unstable across the stub/re-migrate lifecycle (round-5 review)."""
    reg = MigrationRegistry()
    mapper = MappingStore(spark, str(tmp_path / "maps"))
    m = Migration(
        name="nation_str",
        source=DataFrameSource(nations),
        destination=ParquetDestination(str(tmp_path / "nd"), key_cols=("id",)),
        source_ids=(IdField("n_nationkey", "int"),),
        destination_ids=(IdField("id", "string"),),
        transform=lambda d: d.select(
            "__src__", "__dest_id", "n_nationkey", F.col("n_name")
        ),
    )
    reg.register(m)
    needed = spark.range(2).select(F.col("id").cast("bigint").alias("n_nationkey"))
    assert ensure_stubs(spark, m, mapper, needed) == 2
    stub_ids = [
        r["id"]
        for r in m.destination.read_snapshot(spark).select("id").collect()
    ]
    assert stub_ids and all("/" not in i and "~" in i for i in stub_ids)
    # a later real run re-mints the SAME ids (stability across lifecycle)
    run_migration(spark, m, mapper)
    real_ids = {
        r["id"] for r in m.destination.read_snapshot(spark).select("id").collect()
    }
    assert set(stub_ids) <= real_ids
