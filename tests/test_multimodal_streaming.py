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


def test_decoder_injection(spark, media):
    """The seam's supported path for a REAL codec: pass a callable
    bytes -> (w, h, c, features). It must ship to the executors
    (cloudpickle), run inside the Arrow-batched kernel, and its
    output must land typed in the standard DECODED_SCHEMA — proving
    the bytes→dims→features contract without container codecs."""

    def header_codec(payload: bytes):
        # a self-contained "codec": dims from the payload header bytes,
        # features = first 4 bytes scaled — any PIL/ffmpeg wrapper has
        # exactly this shape
        w = 1 + payload[0]
        h = 1 + (payload[1] if len(payload) > 1 else 0)
        return w, h, 3, [b / 255.0 for b in payload[:4]]

    out = {
        r["media_id"]: r
        for r in MM.decode_media(
            media, "payload", "media_id", decoder=header_codec
        ).collect()
    }
    assert len(out) == 4
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, r in out.items():
        assert r["width"] == 1 + src[mid][0]
        assert r["height"] == 1 + src[mid][1]
        assert r["channels"] == 3
        assert r["features"] == pytest.approx([b / 255.0 for b in src[mid][:4]])


def test_resizer_injection(spark, media):
    """Same injection contract for resize_media: callable
    (payload, target_w, target_h) -> (in_w, in_h, channels, bytes)."""
    from a2b_spark.operators.multimodal import resize_media

    def header_resizer(payload: bytes, tw: int, th: int):
        return 2 * tw, 4 * th, 1, payload[:8]

    out = resize_media(
        media, "payload", "media_id", 32, 16, resizer=header_resizer
    ).collect()
    assert len(out) == 4
    for r in out:
        assert (r["width"], r["height"], r["channels"]) == (32, 16, 1)
        assert r["scale_x"] == 0.5 and r["scale_y"] == 0.25
        assert len(bytes(r["payload"])) <= 8


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


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a watermark: once the watermark
    passes a window it is emitted exactly once and its state evicted;
    a row for that window arriving in a LATER batch must be dropped —
    not re-open the state and emit a duplicate window row.

    (A late-per-watermark row that arrives in the same batch as the
    window's finalization is still admitted — the watermark is a
    state-eviction bound, not a per-row admission filter — so the late
    arrival here lands two batches after the window closed.)"""
    import datetime as dt
    import time

    from a2b_spark.streaming.windows import tumbling_agg, with_watermark

    def ts(h, m, s=0):
        return dt.datetime(2026, 1, 1, h, m, s)

    src_dir = str(tmp_path / "wm_in")
    os.makedirs(src_dir)
    # batch 1: two events in the 10:00-10:05 window, plus 11:00
    # advancing event time (watermark after the batch: 10:50)
    spark.createDataFrame(
        [(ts(10, 0, 30), "a"), (ts(10, 1, 30), "a"), (ts(11, 0), "a")],
        "ts timestamp, k string",
    ).coalesce(1).write.parquet(f"{src_dir}/b1")
    time.sleep(1.1)  # file-source ordering is by modification time
    # batch 2: finalizes + evicts the 10:00 window (emitted with n=2)
    spark.createDataFrame(
        [(ts(12, 0), "a")], "ts timestamp, k string"
    ).coalesce(1).write.parquet(f"{src_dir}/b2")
    time.sleep(1.1)
    # batch 3: the too-late 10:02 row (watermark is 11:50 by now) —
    # must NOT resurrect the evicted window
    spark.createDataFrame(
        [(ts(10, 2), "a"), (ts(13, 0), "a")], "ts timestamp, k string"
    ).coalesce(1).write.parquet(f"{src_dir}/b3")

    sdf = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/b*")
    )
    agg = tumbling_agg(
        with_watermark(sdf, "ts", "10 minutes"),
        "ts",
        "5 minutes",
        ["k"],
        {"n": F.count(F.lit(1)).cast("long")},
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [
        (r.window_start, r.n)
        for r in spark.sql("SELECT * FROM wm_out ORDER BY window_start").collect()
    ]
    # the 10:00 window appears exactly once, with only on-time events
    assert rows.count((ts(10, 0), 2)) == 1
    assert sum(1 for w, _ in rows if w == ts(10, 0)) == 1
    # and the late row produced no resurrected/duplicate emission
    assert (ts(10, 5), 1) not in rows


def test_streaming_session_window_merges_across_batches(spark, tmp_path):
    """session_agg in STREAMING mode (q57 is its batch twin): events
    arriving in separate micro-batches within the gap must merge into
    one session; a >gap silence starts a new one. Requires a watermark
    (Spark rejects streaming session windows without one)."""
    import datetime as dt
    import time

    from a2b_spark.streaming.windows import session_agg, with_watermark

    def ts(h, m):
        return dt.datetime(2026, 1, 1, h, m)

    src_dir = str(tmp_path / "sw_in")
    os.makedirs(src_dir)
    # batch 1: two events 10 min apart (same 30-min-gap session)
    spark.createDataFrame(
        [(ts(10, 0), "u1"), (ts(10, 10), "u1")], "ts timestamp, k string"
    ).coalesce(1).write.parquet(f"{src_dir}/b1")
    time.sleep(1.1)
    # batch 2: extends the same session (10:10 + 30min > 10:25), then a
    # far event that closes it and starts a new session
    spark.createDataFrame(
        [(ts(10, 25), "u1"), (ts(14, 0), "u1")], "ts timestamp, k string"
    ).coalesce(1).write.parquet(f"{src_dir}/b2")
    time.sleep(1.1)
    # batch 3: advance the watermark far enough to finalize everything
    spark.createDataFrame(
        [(ts(20, 0), "u1")], "ts timestamp, k string"
    ).coalesce(1).write.parquet(f"{src_dir}/b3")

    sdf = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/b*")
    )
    agg = session_agg(
        with_watermark(sdf, "ts", "10 minutes"),
        "ts",
        "30 minutes",
        ["k"],
        {"n": F.count(F.lit(1)).cast("long")},
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sw_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sw_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r.session_start, r.session_end): r.n
        for r in spark.sql("SELECT * FROM sw_out").collect()
    }
    # one merged session 10:00-10:55 (last event 10:25 + 30 min) with 3
    # events — batch-2's 10:25 row merged INTO the open cross-batch
    # session; 14:00 closed it
    assert rows.get((ts(10, 0), ts(10, 55))) == 3
    assert rows.get((ts(14, 0), ts(14, 30))) == 1


def test_resize_media_plumbing(spark):
    """resize_media: deterministic output payload sized
    target_w*target_h*channels (capped), exact scale factors, and the
    real-codec seam raises."""
    from a2b_spark.operators.multimodal import _fake_decode, resize_media

    df = spark.createDataFrame(
        [(1, bytearray(b"payload-one")), (2, bytearray(b"payload-two-longer"))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in resize_media(df, "payload", "media_id", 64, 64).collect()}
    for mid, raw in [(1, b"payload-one"), (2, b"payload-two-longer")]:
        in_w, in_h, ch, _ = _fake_decode(raw)
        r = out[mid]
        assert (r.width, r.height, r.channels) == (64, 64, ch)
        assert len(r.payload) == 64 * 64 * ch
        assert r.scale_x == 64 / in_w and r.scale_y == 64 / in_h
    # determinism: same input -> byte-identical output
    out2 = {r.media_id: bytes(r.payload) for r in resize_media(df, "payload", "media_id", 64, 64).collect()}
    assert out2 == {m: bytes(r.payload) for m, r in out.items()}
    # byte cap bounds the output even for huge targets
    capped = resize_media(df, "payload", "media_id", 4096, 4096, max_out_bytes=1000).collect()
    assert all(len(r.payload) == 1000 for r in capped)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        resize_media(df, "payload", "media_id", 64, 64, resizer="real")


def test_streaming_near_dup_filter_across_batches(spark, tmp_path):
    """Near-dup filtering against accepted HISTORY: a later micro-batch's
    near-copy of an earlier batch's doc must be dropped (exact-key
    streaming dedup cannot do this — near-dups share no key);
    within-batch twins collapse to the min id; redelivery is
    idempotent."""
    import time

    from a2b_spark.streaming.neardup import StreamingNearDupFilter

    base = "the quick brown fox jumps over the lazy dog again and again today friends"
    other = "completely different words describing unrelated things entirely here now yes ok"
    third = "a third topic about spark plans shuffles joins and aggregation pipelines"

    src_dir = str(tmp_path / "nd_in")
    os.makedirs(src_dir)
    spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src_dir}/b1")
    time.sleep(1.1)
    # batch 2: 10 = near-copy of doc 1 (history dup), 11/12 = in-batch
    # twins (keep 11), 13 = genuinely new, 2 = exact redelivery of doc 2
    spark.createDataFrame(
        [
            (10, base + " extra"),
            (11, third),
            (12, third + " more"),
            (13, "fresh unique content with nothing shared against anything else at all"),
            (2, other),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(f"{src_dir}/b2")

    f = StreamingNearDupFilter(
        spark, str(tmp_path / "nd_state"), "text", "doc_id", threshold=0.5
    )
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/b*")
    )
    q = f.start(sdf, str(tmp_path / "nd_ckpt"))
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = sorted(r.doc_id for r in f.accepted().select("doc_id").collect())
    assert got == [1, 2, 11, 13], got
    # O(batch) write contract: batch 2's commit must HARD-LINK batch
    # 1's epoch files into the new version, not rewrite history
    vdir = os.path.join(f.out.path, f.out.current_version())
    prev = [v for v in f.out.versions() if v != f.out.current_version()][-1]
    pdir = os.path.join(f.out.path, prev)

    def inodes(d):
        out = {}
        for root, _, files in os.walk(d):
            for fn in files:
                if not fn.startswith(("_", ".")):
                    p = os.path.join(root, fn)
                    out[os.path.relpath(p, d)] = os.stat(p).st_ino
        return out

    cur, old = inodes(vdir), inodes(pdir)
    shared = {f_ for f_ in cur if f_ in old}
    assert shared, "expected prior-epoch files carried forward"
    assert all(cur[f_] == old[f_] for f_ in shared), "history rewritten, not linked"


def test_near_dup_filter_history_first_order(spark, tmp_path):
    """Order regression: batch doc A is near accepted history doc H,
    doc B is near A but NOT near H. In-batch-dedup-first would elect
    A (min id) as the cluster survivor, then lose the whole cluster to
    the history filter — B's content would vanish. History-first keeps
    B."""
    from a2b_spark.streaming.neardup import StreamingNearDupFilter

    h = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    a = h + " one two three four five six"
    b = a + " s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"

    f = StreamingNearDupFilter(
        spark, str(tmp_path / "ord_state"), "text", "doc_id", threshold=0.5
    )
    f.process_batch(spark.createDataFrame([(1, h)], "doc_id long, text string"))
    f.process_batch(
        spark.createDataFrame([(20, a), (21, b)], "doc_id long, text string")
    )
    got = sorted(r.doc_id for r in f.accepted().select("doc_id").collect())
    # A(20) dropped vs history; B(21) survives — near A but not near H
    assert got == [1, 21], got


def test_near_dup_filter_epoch_monotone_past_retention(spark, tmp_path):
    """Epoch labels must stay MONOTONE once vacuum trims retained
    versions (default retention 3): deriving the epoch from the
    retained-version COUNT plateaus after ~4 batches, funneling every
    later batch into one ever-growing partition (O(accumulated)
    rewrites). Six distinct batches must land in six distinct
    epochs."""
    from a2b_spark.streaming.neardup import StreamingNearDupFilter

    f = StreamingNearDupFilter(
        spark, str(tmp_path / "ep_state"), "text", "doc_id", threshold=0.9
    )
    for i in range(6):
        text = " ".join(f"tok{i}w{j}" for j in range(12))
        f.process_batch(
            spark.createDataFrame([(i, text)], "doc_id long, text string")
        )
    rows = f.out.read(spark).select("doc_id", "__epoch").collect()
    assert len(rows) == 6
    epochs = {r["doc_id"]: r["__epoch"] for r in rows}
    assert len(set(epochs.values())) == 6, f"epoch collision: {epochs}"


def test_ppm_codec_end_to_end(spark):
    """Full round-trip through the codec seam with a REAL image format
    (binary PPM/P6, parseable in pure Python): decode carries actual
    pixel-derived features, resize produces a re-decodable payload at
    the target dims, and a second decode over the RESIZED payloads
    confirms the bytes flowing through mapInPandas are real image
    data, not stub features."""

    def ppm_encode(w, h, px):
        return f"P6\n{w} {h}\n255\n".encode() + bytes(px)

    def ppm_decoder(payload: bytes):
        head, dims, _maxval, body = payload.split(b"\n", 3)
        assert head == b"P6"
        w, h = map(int, dims.split())
        px = body[: w * h * 3]
        means = [
            round(sum(px[c::3]) / (w * h) / 255.0, 6) for c in range(3)
        ]
        return w, h, 3, means

    def ppm_resizer(payload: bytes, tw: int, th: int):
        head, dims, _maxval, body = payload.split(b"\n", 3)
        w, h = map(int, dims.split())
        out = bytearray()
        for y in range(th):
            sy = y * h // th
            for x in range(tw):
                sx = x * w // tw
                i = (sy * w + sx) * 3
                out += body[i : i + 3]
        return w, h, 3, f"P6\n{tw} {th}\n255\n".encode() + bytes(out)

    # solid-color 8x4 red + 6x6 teal: nearest-neighbor resample of a
    # solid image preserves per-channel means EXACTLY
    img1 = ppm_encode(8, 4, [200, 10, 30] * 32)
    img2 = ppm_encode(6, 6, [0, 128, 128] * 36)
    media = spark.createDataFrame(
        [(1, img1), (2, img2)], "media_id bigint, payload binary"
    )

    dec = {
        r["media_id"]: r
        for r in MM.decode_media(
            media, "payload", "media_id", decoder=ppm_decoder
        ).collect()
    }
    assert (dec[1]["width"], dec[1]["height"]) == (8, 4)
    assert (dec[2]["width"], dec[2]["height"]) == (6, 6)
    assert dec[1]["features"] == pytest.approx(
        [200 / 255, 10 / 255, 30 / 255], abs=1e-5
    )

    resized = MM.resize_media(
        media, "payload", "media_id", 4, 2, resizer=ppm_resizer
    )
    rz = {r["media_id"]: r for r in resized.collect()}
    assert all(
        (r["width"], r["height"], r["channels"]) == (4, 2, 3)
        for r in rz.values()
    )
    assert rz[1]["scale_x"] == pytest.approx(0.5)
    assert rz[1]["scale_y"] == pytest.approx(0.5)

    redec = {
        r["media_id"]: r
        for r in MM.decode_media(
            resized.select("media_id", "payload"),
            "payload",
            "media_id",
            decoder=ppm_decoder,
        ).collect()
    }
    for mid in (1, 2):
        assert (redec[mid]["width"], redec[mid]["height"]) == (4, 2)
        # solid color survives resampling bit-exactly
        assert redec[mid]["features"] == pytest.approx(
            dec[mid]["features"], abs=1e-5
        )


def test_stream_stream_join_windowed(spark, tmp_path):
    """Watermarked stream-stream inner join with a time-range bound:
    impression/click attribution. Clicks join their impression when
    keys match and the click lands within 10 minutes. The same helper
    run in BATCH mode is the oracle (watermarks no-op there); the
    streamed result must equal it exactly."""
    import datetime as dt

    from a2b_spark.streaming.windows import stream_stream_join

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    imps = [(1, ts(0)), (2, ts(5)), (3, ts(10))]
    clicks = [
        (1, ts(4), "a"),    # within 10m of imp 1 -> joins
        (2, ts(20), "b"),   # 15m after imp 2 -> outside bound
        (3, ts(9), "c"),    # BEFORE imp 3's ts? no: 9 < 10 -> outside
        (3, ts(18), "d"),   # within [10, 20] -> joins
        (4, ts(1), "e"),    # no impression -> drops
    ]
    imp_dir, clk_dir = str(tmp_path / "imps"), str(tmp_path / "clicks")
    os.makedirs(imp_dir); os.makedirs(clk_dir)
    imp_schema = "ad_id long, imp_ts timestamp"
    clk_schema = "ad_id long, click_ts timestamp, tag string"
    spark.createDataFrame(imps, imp_schema).coalesce(1).write.parquet(f"{imp_dir}/b")
    spark.createDataFrame(clicks, clk_schema).coalesce(1).write.parquet(f"{clk_dir}/b")

    # batch twin = oracle
    batch = stream_stream_join(
        spark.read.schema(imp_schema).parquet(f"{imp_dir}/*"),
        spark.read.schema(clk_schema).parquet(f"{clk_dir}/*"),
        ["ad_id"], "imp_ts", "click_ts", "15 minutes", "10 minutes",
    )
    expect = {(r["ad_id"], r["tag"]) for r in batch.collect()}
    assert expect == {(1, "a"), (3, "d")}

    out_dir = str(tmp_path / "out")
    q = (
        stream_stream_join(
            spark.readStream.schema(imp_schema).parquet(f"{imp_dir}/*"),
            spark.readStream.schema(clk_schema).parquet(f"{clk_dir}/*"),
            ["ad_id"], "imp_ts", "click_ts", "15 minutes", "10 minutes",
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r["ad_id"], r["tag"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == expect, (got, expect)


def test_streaming_real_codec_decode(spark, tmp_path):
    """The codec path under Structured Streaming: decode_media is a
    stateless mapInPandas, so the SAME operator (real JPEG/PNG/GIF
    codecs via decoder='auto') runs unchanged on a stream — payloads
    arriving across micro-batches decode exactly like the batch twin."""
    import numpy as np

    from a2b_spark.operators.gif import encode_gif
    from a2b_spark.operators.jpeg import encode_jpeg
    from a2b_spark.operators.multimodal import decode_media
    from a2b_spark.operators.png import encode_png

    src_dir = str(tmp_path / "media_in")
    os.makedirs(src_dir)
    codecs = [
        lambda img: encode_jpeg(img, quality=100),
        encode_png,
        encode_gif,
    ]
    expected = {}
    for batch in (1, 2):
        rows = []
        for j in range(3):
            i = (batch - 1) * 3 + j
            val = (i * 53) % 256
            img = np.full((4 + i, 5, 3), val, np.uint8)
            rows.append((i, bytearray(codecs[i % 3](img))))
            expected[i] = (5, 4 + i, round(val / 255, 6))
        spark.createDataFrame(rows, "media_id long, payload binary").coalesce(
            1
        ).write.parquet(f"{src_dir}/batch{batch}")

    sdf = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/batch*")
    )
    dec = decode_media(sdf, "payload", "media_id", decoder="auto")
    q = (
        dec.writeStream.format("memory")
        .queryName("media_dec_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_media"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r.media_id: r for r in spark.sql("SELECT * FROM media_dec_out").collect()}
    assert len(out) == 6
    for i, (w, h, mean) in expected.items():
        r = out[i]
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert abs(r.features[0] - mean) < 1e-6


def test_streaming_domain_quota_across_batches(spark, tmp_path):
    """streaming_domain_quota: at most cap rows per group across ALL
    micro-batches — a group filled in batch 1 admits nothing later; a
    group arriving split across batches admits only up to the
    remainder; a one-batch flood of a whole group caps within the
    batch."""
    from a2b_spark.streaming.stateful import streaming_domain_quota

    src_dir = str(tmp_path / "quota_in")
    os.makedirs(src_dir)
    # batch 1: A×2, B×1 ; batch 2: A×3 (only 1 more fits), B×1, C×4 (caps at 3)
    spark.createDataFrame(
        [("A", 1), ("A", 2), ("B", 10)], "dom string, v int"
    ).coalesce(1).write.parquet(f"{src_dir}/batch1")
    spark.createDataFrame(
        [("A", 3), ("A", 4), ("A", 5), ("B", 11), ("C", 20), ("C", 21),
         ("C", 22), ("C", 23)],
        "dom string, v int",
    ).coalesce(1).write.parquet(f"{src_dir}/batch2")

    sdf = (
        spark.readStream.schema("dom string, v int")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/batch*")
    )
    capped = streaming_domain_quota(sdf, ["dom"], cap=3)
    q = (
        capped.writeStream.format("memory")
        .queryName("quota_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [(r.dom, r.v) for r in spark.sql("SELECT * FROM quota_out").collect()]
    per = {}
    for dom, v in rows:
        per.setdefault(dom, []).append(v)
    assert len(per["A"]) == 3 and {1, 2} <= set(per["A"])  # batch-1 pair + 1
    assert sorted(per["B"]) == [10, 11]  # under cap: everything lands
    assert len(per["C"]) == 3  # one-batch flood caps inside the batch
    assert len(rows) == 8

    with pytest.raises(ValueError, match="cap"):
        streaming_domain_quota(sdf, ["dom"], cap=0)


def test_domaincap_batch_vs_streaming_divergence(spark, tmp_path):
    """The two domain-cap policies are NOT twins on the same corpus:
    batch frequency_cap keeps the salted-draw winners (for ids 1..5
    under the default salt that is {1, 2}), the stream admits the
    first cap ARRIVALS (here 3 then 4 — arrival order deliberately
    anti-aligned with the draw). Same frozen rows, same cap, different
    kept sets — both capped, both correct, documented in both
    docstrings so neither is mistaken for the other's replay."""
    from a2b_spark.operators.rangejoin import frequency_cap
    from a2b_spark.streaming.stateful import streaming_domain_quota

    arrival = [3, 4, 5, 1, 2]  # ids, one micro-batch each, in this order
    rows = [("A", i) for i in arrival]

    batch_df = spark.createDataFrame(rows, "dom string, doc_id int")
    batch_kept = {
        r.doc_id
        for r in frequency_cap(batch_df, ["dom"], "doc_id", 2).collect()
    }
    assert batch_kept == {1, 2}  # salted md5 order over ids 1..5

    src_dir = str(tmp_path / "divergence_in")
    os.makedirs(src_dir)
    for n, i in enumerate(arrival):
        spark.createDataFrame(
            [("A", i)], "dom string, doc_id int"
        ).coalesce(1).write.parquet(f"{src_dir}/batch{n}")
    sdf = (
        spark.readStream.schema("dom string, doc_id int")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/batch*")
    )
    q = (
        streaming_domain_quota(sdf, ["dom"], cap=2)
        .writeStream.format("memory")
        .queryName("divergence_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "divergence_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_kept = {
        r.doc_id
        for r in spark.sql("SELECT * FROM divergence_out").collect()
    }
    assert stream_kept == {3, 4}  # first two arrivals
    assert stream_kept != batch_kept
