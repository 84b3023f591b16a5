"""Runnable example pipeline (see PORTING.md): region -> customer with
a dependency, deterministic ids, and an update-in-place run counter.

    python -m a2b_spark.exec.runner --module examples.pipeline
    python -m a2b_spark.exec.runner --module examples.pipeline --simulate
    python -m a2b_spark.exec.runner --module examples.pipeline --prune

Reads the driver testdata at sf0.001; writes under /tmp/a2b_example.
"""

from pyspark.sql import functions as F

from a2b_spark.core.migration import IdField, Migration, MigrationRegistry
from a2b_spark.exec.executor import existing_field
from a2b_spark.sinks.parquet import ParquetDestination
from a2b_spark.sources.files import ParquetSource

SF_DIR = "/root/testdata/sf0.001"
OUT = "/tmp/a2b_example"
MAPPING_DIR = f"{OUT}/maps"

REGISTRY = MigrationRegistry()

REGISTRY.register(
    Migration(
        name="regions",
        source=ParquetSource(f"{SF_DIR}/region.parquet"),
        destination=ParquetDestination(f"{OUT}/regions", key_cols=("id",)),
        source_ids=(IdField("r_regionkey"),),
        destination_ids=(IdField("id"),),
        transform=lambda df: df.select(
            "__src__", "__dest_id", F.col("r_name").alias("name")
        ),
    )
)


def customer_transform(df):
    runs = existing_field(df, "runs", 0)  # previously-written value, null-safe
    return df.select(
        "__src__",
        "__dest_id",
        "c_custkey",
        F.upper("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
        (runs + 1).alias("runs"),  # increments on every re-run
    )


REGISTRY.register(
    Migration(
        name="customers",
        source=ParquetSource(f"{SF_DIR}/customer.parquet"),
        destination=ParquetDestination(f"{OUT}/customers", key_cols=("id",)),
        source_ids=(IdField("c_custkey"),),
        destination_ids=(IdField("id"),),
        transform=customer_transform,
        depends=("regions",),
    )
)
