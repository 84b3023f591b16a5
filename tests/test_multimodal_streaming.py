"""Multimodal plumbing + streaming incremental migration + windowed
aggregation tests."""

import os

import pytest
from pyspark.sql import functions as F

from a2b_spark.core.migration import IdField, Migration
from a2b_spark.mapping.store import MappingStore
from a2b_spark.operators import multimodal as MM
from a2b_spark.sinks.parquet import ParquetDestination
from a2b_spark.streaming.incremental import run_incremental
from a2b_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg

PNG = b"\x89PNG\r\n\x1a\n" + b"payload-bytes-1"
JPG = b"\xff\xd8\xff\xe0" + b"payload-bytes-22"
WAV = b"RIFF\x24\x00\x00\x00WAVE" + b"x" * 30


@pytest.fixture()
def media(spark):
    return spark.createDataFrame(
        [(1, PNG), (2, JPG), (3, WAV), (4, b"plainbytes")],
        "media_id bigint, payload binary",
    )


def test_metadata_and_sniffing(spark, media):
    out = MM.with_media_metadata(media, "payload").select("media_id", "meta.*")
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["format"] == "png"
    assert rows[2]["format"] == "jpeg"
    assert rows[3]["format"] == "riff"
    assert rows[4]["format"] == "unknown"
    assert rows[1]["n_bytes"] == len(PNG)
    assert all(len(r["digest"]) == 32 for r in rows.values())


def test_decode_fake_deterministic(spark, media):
    out1 = {r["media_id"]: r for r in MM.decode_media(media, "payload", "media_id").collect()}
    out2 = {r["media_id"]: r for r in MM.decode_media(media, "payload", "media_id").collect()}
    assert len(out1) == 4
    for mid in out1:
        assert out1[mid] == out2[mid]  # deterministic
        assert 16 <= out1[mid]["width"] <= 255
        assert len(out1[mid]["features"]) == 8
    with pytest.raises(NotImplementedError):
        MM.decode_media(media, "payload", "media_id", decoder="real")


def test_sample_frames_shape(spark, media):
    frames = MM.sample_frames(media, "payload", "media_id", every_n=8, max_frames=3)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_no", "frame"}
    assert (pdf.groupby("media_id")["frame_no"].count() <= 3).all()


def test_incremental_migration_merges_per_batch(spark, tmp_path, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    schema = cust.schema
    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    dest = ParquetDestination(str(tmp_path / "dest"), key_cols=("id",))
    mapper = MappingStore(spark, str(tmp_path / "maps"))
    m = Migration(
        name="cust_stream",
        source=None,  # provided per-batch by run_incremental
        destination=dest,
        source_ids=(IdField("c_custkey", "int"),),
        destination_ids=(IdField("id", "int"),),
        transform=lambda d: d.select(
            "__src__", "__dest_id", "c_custkey", F.upper("c_name").alias("name")
        ),
    )

    # batch 1: first 60 customers
    cust.filter(F.col("c_custkey") < 60).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = run_incremental(spark, m, mapper, stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    n1 = dest.read_snapshot(spark).count()

    # batch 2: overlapping redelivery (40..90) — overlap must UPDATE
    cust.filter((F.col("c_custkey") >= 40) & (F.col("c_custkey") < 90)).write.mode(
        "append"
    ).parquet(src_dir)
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = run_incremental(spark, m, mapper, stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    snap = dest.read_snapshot(spark)
    keys = [r["c_custkey"] for r in snap.select("c_custkey").collect()]
    assert len(keys) == len(set(keys)), "redelivered rows must not duplicate"
    assert snap.count() == cust.filter(F.col("c_custkey") < 90).count()
    assert snap.count() > n1


def test_windowed_aggs_batch_semantics(spark, sf_dir):
    from a2b_spark.queries.relational import _events

    # _events normalizes ts to µs-long regardless of the parquet
    # physical type (TIMESTAMP(NANOS) read as long vs TIMESTAMP(MICROS)
    # read as timestamp_ntz)
    e = _events(spark, sf_dir).withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    tum = tumbling_agg(
        e, "ts", "1 hour", ["event_type"], {"n": F.count(F.lit(1)), "sum_v": F.sum("value")}
    )
    total = tum.agg(F.sum("n")).first()[0]
    assert total == e.count()  # tumbling partitions events exactly once

    sli = sliding_agg(
        e, "ts", "2 hours", "1 hour", ["event_type"], {"n": F.count(F.lit(1))}
    )
    assert sli.agg(F.sum("n")).first()[0] == 2 * e.count()  # each event in 2 windows

    ses = session_agg(e, "ts", "30 minutes", ["user_id"], {"n": F.count(F.lit(1))})
    assert ses.agg(F.sum("n")).first()[0] == e.count()
    # session windows never overlap per user
    overl = (
        ses.alias("a")
        .join(ses.alias("b"), "user_id")
        .filter(
            (F.col("a.session_start") < F.col("b.session_end"))
            & (F.col("b.session_start") < F.col("a.session_end"))
            & (F.col("a.session_start") != F.col("b.session_start"))
        )
    )
    assert overl.count() == 0


def test_streaming_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: a key that recurs in a
    LATER micro-batch must be suppressed by state, not re-emitted."""
    from a2b_spark.streaming.stateful import streaming_dedup_first_seen

    src_dir = str(tmp_path / "stream_in")
    os.makedirs(src_dir)
    # batch 1: keys a,b ; batch 2: keys b,c (b is a cross-batch dup)
    spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int").coalesce(
        1
    ).write.parquet(f"{src_dir}/batch1")
    spark.createDataFrame([("b", 3), ("c", 4)], "k string, v int").coalesce(
        1
    ).write.parquet(f"{src_dir}/batch2")

    sdf = (
        spark.readStream.schema("k string, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/batch*")
    )
    dedup = streaming_dedup_first_seen(sdf, ["k"])
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.k: r.v for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["b"] in (2, 3)  # exactly one of the b rows survived
    n = spark.sql("SELECT count(*) c FROM dedup_out").first().c
    assert n == 3, f"duplicate key re-emitted: {n} rows"
