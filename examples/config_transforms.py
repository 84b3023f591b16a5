"""Transforms referenced BY NAME from examples/pipeline.yaml — the one
pipeline ingredient a config file cannot carry as data (the reference's
config names migration CLASSES the same way)."""

from pyspark.sql import functions as F


def regions(df):
    return df.select("__src__", "__dest_id", F.col("r_name").alias("name"))


def top_customers(df):
    return df.select(
        "__src__",
        "__dest_id",
        F.upper("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
    )
