"""Guards on the dedup spine's driver-side probes (round-14 advice):

- ``_ids_packable``'s parquet-footer fast path must only fire when the
  id column is provably the scanned file's own column — a derived id
  sharing a file column's name would probe the WRONG values, and a
  false ``True`` silently collides packed pair keys downstream.
- ``spread()`` must not ``.rdd``-probe shuffle-bearing plans (AQE
  finalization eagerly runs upstream exchanges as discarded jobs) and
  must pass MapType frames through (keyless repartition local-sorts
  its input and maps are unorderable).
"""

import os

import pytest
from pyspark.sql import functions as F

from a2b_spark.operators.dedup import (
    _contains_map_type,
    _ids_packable,
    _plain_scan_plan,
    spread,
)


@pytest.fixture(scope="module")
def idfile(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("probe") / "ids")
    spark.range(0, 100).select(F.col("id").alias("doc_id")).coalesce(
        1
    ).write.parquet(p)
    return p


def test_footer_path_fires_on_bare_scan(spark, idfile):
    df = spark.read.parquet(idfile)
    store = spark.sparkContext._jsc.sc().statusStore()
    before = store.jobsList(None).size()
    assert _ids_packable(df, "doc_id") is True
    # footer fast path: zero Spark jobs
    assert store.jobsList(None).size() == before
    # filters/projections that PRESERVE the column keep the fast path
    # (bounds over the raw file are conservative-wider)
    assert _ids_packable(df.filter("doc_id > 10").select("doc_id"), "doc_id")


def test_derived_id_must_not_use_file_stats(spark, idfile):
    """An id column REDEFINED over a scanned column of the same name:
    file stats say [0, 100) but actual values are negative. The footer
    path would wrongly return True; the guard must route this through
    the aggregate probe, which answers False."""
    df = spark.read.parquet(idfile).withColumn(
        "doc_id", -F.col("doc_id") - 1
    )
    assert _plain_scan_plan(df, "doc_id") is False
    assert _ids_packable(df, "doc_id") is False


def test_renamed_column_must_not_use_file_stats(spark, idfile):
    """withColumnRenamed onto the probed name is an Alias too."""
    df = (
        spark.read.parquet(idfile)
        .withColumn("other", (-F.col("doc_id") - 1))
        .drop("doc_id")
        .withColumnRenamed("other", "doc_id")
    )
    assert _plain_scan_plan(df, "doc_id") is False
    assert _ids_packable(df, "doc_id") is False


def test_union_with_local_rows_not_plain(spark, idfile):
    """inputFiles() ignores local relations: a union adding non-file
    rows (here a negative id) must not be judged by file stats."""
    extra = spark.createDataFrame([(-5,)], "doc_id long")
    df = spark.read.parquet(idfile).unionByName(extra)
    assert _plain_scan_plan(df, "doc_id") is False
    assert _ids_packable(df, "doc_id") is False


def test_spread_passes_through_map_and_shuffle_frames(spark):
    m = spark.range(4).select(
        "id", F.create_map(F.lit("k"), F.col("id")).alias("m")
    )
    assert _contains_map_type(m.schema["m"].dataType)
    assert spread(m) is m  # unsortable: no repartition attempted
    agg = spark.range(100).groupBy((F.col("id") % 3).alias("g")).count()
    assert spread(agg) is agg  # shuffle-bearing: no .rdd probe
    # the normal case still spreads a 1-split scan-shaped frame
    one = spark.range(0, 10, 1, 1)
    assert spread(one).rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 4
    )


def test_checkpointed_frame_still_spreads(spark):
    """The curation chain's stage pins are LogicalRDD leaves — the
    plan-shape gate must keep treating them as spreadable."""
    pinned = spark.range(0, 10, 1, 1).localCheckpoint(eager=True)
    assert _plain_scan_plan(pinned)
    assert spread(pinned).rdd.getNumPartitions() >= min(
        spark.sparkContext.defaultParallelism, 4
    )
