"""Runnable example: a pipeline wired PURELY from URI strings — the
reference's config-file deployment style (doc/usage/configuration.rst:
named sources/destinations with ``uri:`` keys, resolved to drivers by
scheme at wiring time, bad URIs rejected before any data moves).

    python -m a2b_spark.exec.runner --module examples.uri_pipeline
    python -m a2b_spark.exec.runner --module examples.uri_pipeline --simulate

The CONFIG dict below is what a YAML config file would deserialize to;
nothing in it is a Python object — every endpoint is a string. The
non-URI-expressible fields (key columns, id fields) ride alongside,
exactly like the reference's @DataMigration annotation fields.
"""

from pyspark.sql import functions as F

from a2b_spark.core.drivers import resolve_destination, resolve_source
from a2b_spark.core.migration import IdField, Migration, MigrationRegistry

SF_DIR = "/root/testdata/sf0.001"
OUT = "/tmp/a2b_uri_example"
MAPPING_DIR = f"{OUT}/maps"

CONFIG = {
    "regions": {
        "source": f"parquet://{SF_DIR}/region.parquet",
        "destination": f"parquet://{OUT}/regions",
    },
    "top_customers": {
        # sql: URIs are opaque — the whole query rides in the string
        "source": (
            "sql:SELECT c_custkey, c_name, c_acctbal FROM "
            f"parquet.`{SF_DIR}/customer.parquet` WHERE c_acctbal > 0"
        ),
        "destination": f"jsonl://{OUT}/top_customers",
    },
}

REGISTRY = MigrationRegistry()

REGISTRY.register(
    Migration(
        name="regions",
        source=resolve_source(CONFIG["regions"]["source"]),
        destination=resolve_destination(
            CONFIG["regions"]["destination"], key_cols=("id",)
        ),
        source_ids=(IdField("r_regionkey"),),
        destination_ids=(IdField("id"),),
        transform=lambda df: df.select(
            "__src__", "__dest_id", F.col("r_name").alias("name")
        ),
    )
)

REGISTRY.register(
    Migration(
        name="top_customers",
        source=resolve_source(CONFIG["top_customers"]["source"]),
        destination=resolve_destination(
            CONFIG["top_customers"]["destination"], key_cols=("id",)
        ),
        source_ids=(IdField("c_custkey"),),
        destination_ids=(IdField("id"),),
        transform=lambda df: df.select(
            "__src__",
            "__dest_id",
            F.upper("c_name").alias("name"),
            F.col("c_acctbal").alias("balance"),
        ),
        depends=("regions",),
    )
)
