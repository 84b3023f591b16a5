"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]``; the same configuration block is what
we would ship to a 1000-executor cluster — AQE (runtime join-strategy
re-planning + skew-join splitting + partition coalescing) carries the
plan from sf0.001 to 100 TB without hand-retuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "a2b_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    shuffle partitions default to the core count locally — on a real
    cluster this would be ~2-3× total executor cores, and AQE coalesces
    downward from there.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # FAIR scheduling: independent migrations submit jobs from
        # multiple driver threads (exec.runner); FAIR keeps one long
        # migration from starving its DAG-level peers
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # answer unfiltered MIN/MAX/COUNT from parquet footer stats —
        # makes the similarity operators' id-packability probe ~free
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS); read as long (ns since
        # epoch) — queries normalize to microseconds explicitly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # Deployment-specific overrides (cluster memory sizes, shuffle/io
    # codecs, join-strategy preferences) ride one env knob instead of
    # code edits: SPARK_GRAFT_CONF is a JSON object of conf key→value
    # applied LAST, so a 100 TB deployment tunes without forking the
    # session factory, and local A/B experiments stay out of the code.
    extra = os.environ.get("SPARK_GRAFT_CONF")
    if extra:
        import json

        try:
            overrides = json.loads(extra)
        except json.JSONDecodeError as e:
            raise ValueError(
                f"SPARK_GRAFT_CONF is not valid JSON: {e} "
                f"(value was {extra!r})"
            ) from e
        for k, v in overrides.items():
            # JSON true/false must land as Spark's lowercase booleans,
            # not Python's str() "True"/"False"
            builder = builder.config(
                k, str(v).lower() if isinstance(v, bool) else str(v)
            )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Load the standard test tables from a scale-factor dir as DataFrames."""
    return tuple(spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names)
