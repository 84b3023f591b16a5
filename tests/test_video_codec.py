"""Stdlib MJPEG-AVI codec (operators/video.py) + the real frame-
sampling splitter: exact solid-frame roundtrips (the q159 oracle
identity), container-walk edge cases ('rec ' lists, truncation,
foreign codecs), splitter semantics, and the Spark composition
sample_frames(mjpeg_avi) → decode_media(jpeg)."""

import struct

import numpy as np
import pytest

from a2b_spark.operators.jpeg import decode_jpeg
from a2b_spark.operators.video import (
    avi_frames,
    encode_mjpeg_avi,
    mjpeg_avi_splitter,
)


def _clip(n, w=16, h=12, base=5, step=10):
    return [np.full((h, w, 3), (base + step * i) % 256, np.uint8) for i in range(n)]


def test_roundtrip_every_frame_exact_at_q100():
    b = encode_mjpeg_avi(_clip(6), fps=24, quality=100)
    w, h, fps, frames = avi_frames(b)
    assert (w, h, fps, len(frames)) == (16, 12, 24.0, 6)
    for i, f in enumerate(frames):
        fw, fh, fc, img = decode_jpeg(f)
        assert (fw, fh, fc) == (16, 12, 3)
        assert img.min() == img.max() == 5 + 10 * i


def test_rec_list_nesting_parses():
    # some muxers group frames into 'rec ' LISTs inside movi — rebuild
    # the movi body with each 00dc chunk wrapped in one
    b = bytearray(encode_mjpeg_avi(_clip(3), fps=10, quality=100))
    raw = bytes(b)
    i = raw.find(b"LIST", 12)
    while raw[i + 8 : i + 12] != b"movi":
        ln = struct.unpack("<I", raw[i + 4 : i + 8])[0]
        i = raw.find(b"LIST", i + 8 + ln)
    movi_ln = struct.unpack("<I", raw[i + 4 : i + 8])[0]
    body = raw[i + 12 : i + 8 + movi_ln]
    rec = b"LIST" + struct.pack("<I", 4 + len(body)) + b"rec " + body
    new_movi = b"LIST" + struct.pack("<I", 4 + len(rec)) + b"movi" + rec
    out = raw[:i] + new_movi + raw[i + 8 + movi_ln :]
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    w, h, fps, frames = avi_frames(out)
    assert len(frames) == 3
    assert decode_jpeg(frames[2])[3].max() == 25


def test_container_error_paths():
    with pytest.raises(ValueError, match="not an AVI"):
        avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    good = encode_mjpeg_avi(_clip(2), fps=5)
    with pytest.raises(ValueError, match="truncated"):
        avi_frames(good[: len(good) // 2])
    bad = bytearray(good)
    i = bad.find(b"MJPG")
    bad[i : i + 4] = b"XVID"
    with pytest.raises(ValueError, match="XVID"):
        avi_frames(bytes(bad))
    with pytest.raises(ValueError, match="at least one frame"):
        encode_mjpeg_avi([], fps=5)
    with pytest.raises(ValueError, match="invalid fps"):
        encode_mjpeg_avi(_clip(1), fps=0)
    with pytest.raises(ValueError, match="share one width"):
        encode_mjpeg_avi([np.zeros((4, 4, 3), np.uint8), np.zeros((4, 8, 3), np.uint8)])


def test_splitter_sampling_semantics():
    b = encode_mjpeg_avi(_clip(7), fps=25, quality=100)
    # every 3rd frame, uncapped → original frame numbers 0, 3, 6
    out = mjpeg_avi_splitter(b, 3, 10)
    assert [fno for fno, _ in out] == [0, 3, 6]
    assert decode_jpeg(out[1][1])[3].max() == 35
    # cap binds before the stride runs out
    assert [fno for fno, _ in mjpeg_avi_splitter(b, 2, 2)] == [0, 2]
    with pytest.raises(ValueError, match="every_n/max_frames"):
        mjpeg_avi_splitter(b, 0, 2)


def test_video_pipeline_end_to_end_spark(spark):
    """The composition a curation pipeline runs: container walk →
    exploded frame payloads → real JPEG decode → per-frame features."""
    from a2b_spark.operators.multimodal import decode_media, sample_frames

    rows = []
    for i in range(8):
        n = 2 + i % 4
        clip = [
            np.full((6 + i % 3, 8 + i % 2, 3), (i * 31 + 17 * f) % 256, np.uint8)
            for f in range(n)
        ]
        rows.append((i, bytearray(encode_mjpeg_avi(clip, fps=12, quality=100)), n))
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in rows], "media_id long, payload binary"
    )

    frames = sample_frames(
        df, "payload", "media_id", every_n=2, max_frames=3, splitter="mjpeg_avi"
    )
    from pyspark.sql import functions as F

    fid = frames.select(
        (F.col("media_id") * 10 + F.col("frame_no")).alias("fid"), "frame"
    )
    dec = decode_media(fid, "frame", "fid", decoder="jpeg").collect()
    expect = {
        (i, f): (i * 31 + 17 * f) % 256
        for i, _, n in rows
        for f in range(0, n, 2)
    }
    assert len(dec) == len(expect)
    for r in dec:
        i, f = divmod(r["media_id"], 10)
        assert (r["width"], r["height"]) == (8 + i % 2, 6 + i % 3)
        assert r["features"][0] == pytest.approx(
            round(expect[(i, f)] / 255, 6), abs=1e-6
        )

    # fake splitter still slices bytes (regression), callable injects
    fake = sample_frames(df, "payload", "media_id", every_n=64, max_frames=2)
    assert fake.count() == 16
    inject = sample_frames(
        df,
        "payload",
        "media_id",
        splitter=lambda b, e, m: [(0, b[:4])],
    ).collect()
    assert len(inject) == 8 and all(bytes(r["frame"]) == b"RIFF" for r in inject)
    with pytest.raises(ValueError, match="unknown splitter"):
        sample_frames(df, "payload", "media_id", splitter="h264")
