"""Stdlib baseline JPEG codec (operators/jpeg.py): exact solid-color
roundtrips at quality 100 (the q156 oracle contract), bounded loss on
smooth content, subsampling + restart-interval coverage, loud errors
on everything outside the baseline envelope, and the real-codec e2e
through Spark (the JPEG twin of the PNG codec test)."""

import struct

import numpy as np
import pytest

from a2b_spark.operators.jpeg import (
    _ZZ,
    decode_jpeg,
    encode_jpeg,
    jpeg_decoder,
    jpeg_resizer,
)

# The spec's zigzag sequence (ISO/IEC 10918-1 Figure 5) — guards the
# programmatic generator against a traversal-direction slip.
_SPEC_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_spec():
    assert _ZZ == _SPEC_ZIGZAG


@pytest.mark.parametrize("shape,val", [((13, 9, 1), 77), ((10, 17, 3), 200), ((8, 8, 3), 0), ((1, 1, 1), 255)])
def test_solid_roundtrip_exact_at_q100(shape, val):
    # Solid blocks carry only the (integral) DC coefficient and q100
    # quantizers are all 1 — the roundtrip must be bit-exact. This is
    # the identity q156's driver-hash oracle stands on.
    img = np.full(shape, val, np.uint8)
    w, h, c, out = decode_jpeg(encode_jpeg(img, quality=100))
    assert (w, h, c) == (shape[1], shape[0], shape[2])
    assert np.array_equal(out, img)


def test_gradient_q100_exact_and_q85_bounded():
    yy, xx = np.mgrid[0:32, 0:24]
    img = np.stack([yy * 4 % 256, xx * 2 % 256, (yy + xx) * 3 % 256], -1).astype(np.uint8)
    _, _, _, out = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    _, _, _, lossy = decode_jpeg(encode_jpeg(img, quality=85))
    assert np.abs(lossy.astype(int) - img.astype(int)).mean() < 8


def _sof_sampling(data: bytes):
    """Parse (h, v) sampling factors per component out of the SOF0."""
    pos = 2
    while True:
        marker = data[pos + 1]
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if marker == 0xC0:
            seg = data[pos + 4 : pos + 2 + ln]
            nc = seg[5]
            return [(seg[7 + 3 * i] >> 4, seg[7 + 3 * i] & 15) for i in range(nc)]
        pos += 2 + ln


def test_420_subsamples_chroma_and_stays_close_on_smooth():
    yy, xx = np.mgrid[0:33, 0:31]
    img = np.stack([yy * 3 % 200, xx * 3 % 200, 80 + 0 * yy], -1).astype(np.uint8)
    b444 = encode_jpeg(img, quality=95)
    b420 = encode_jpeg(img, quality=95, subsampling="4:2:0")
    assert _sof_sampling(b444) == [(1, 1), (1, 1), (1, 1)]
    assert _sof_sampling(b420) == [(2, 2), (1, 1), (1, 1)]
    assert len(b420) < len(b444)  # 3/4 of the chroma blocks are gone
    w, h, c, out = decode_jpeg(b420)
    assert (w, h, c) == (31, 33, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4


def test_restart_markers_decode_identically():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (48, 56, 3), dtype=np.uint8)
    plain = encode_jpeg(img, quality=92, subsampling="4:2:0")
    dri = encode_jpeg(img, quality=92, subsampling="4:2:0", restart_interval=2)
    assert any(bytes([0xFF, 0xD0 + i]) in dri for i in range(8))
    _, _, _, a = decode_jpeg(plain)
    _, _, _, b = decode_jpeg(dri)
    assert np.array_equal(a, b)  # DRI changes framing, not pixels


def test_restart_desync_raises():
    img = np.full((32, 32, 1), 9, np.uint8)
    b = bytearray(encode_jpeg(img, quality=90, restart_interval=1))
    i = b.find(bytes([0xFF, 0xD0]))
    assert i > 0
    b[i + 1] = 0xD5  # wrong restart sequence number
    with pytest.raises(ValueError, match="restart-marker desync"):
        decode_jpeg(bytes(b))


def test_unsupported_variants_raise():
    with pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # progressive: SOI + minimal SOF2 header
    sof2 = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(sof2)
    good = encode_jpeg(np.full((9, 9, 1), 50, np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(good[: len(good) - 8])
    with pytest.raises(ValueError, match="no SOS"):
        decode_jpeg(b"\xff\xd8\xff\xd9")


def test_encoder_input_contracts():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((4, 4), np.float64))
    with pytest.raises(ValueError, match="HxWx"):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))  # JPEG has no 2-channel
    with pytest.raises(ValueError, match="dimensions"):
        encode_jpeg(np.zeros((0, 4, 1), np.uint8))
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(np.zeros((4, 4, 3), np.uint8), subsampling="4:1:1")
    with pytest.raises(ValueError, match="resize target"):
        jpeg_resizer(encode_jpeg(np.zeros((4, 4, 1), np.uint8)), 0, 4)


def test_kernel_contracts():
    img = np.full((12, 20, 3), 60, np.uint8)
    w, h, c, feats = jpeg_decoder(encode_jpeg(img, quality=100))
    assert (w, h, c) == (20, 12, 3)
    assert feats[:3] == [round(60 / 255, 6)] * 3  # per-channel means
    assert feats[3:6] == [0.0] * 3  # solid → zero std
    assert len(feats) == 8
    in_w, in_h, ch, rb = jpeg_resizer(encode_jpeg(img, quality=100), 10, 6)
    assert (in_w, in_h, ch) == (20, 12, 3)
    w2, h2, c2, out = decode_jpeg(rb)
    assert (w2, h2, c2) == (10, 6, 3)
    assert np.abs(out.astype(int) - 60).max() <= 1


def test_jpeg_codec_end_to_end_spark(spark):
    """decoder='jpeg' and the magic-byte 'auto' dispatch through the
    Arrow-batched seam, mixed PNG + JPEG payloads in one column."""
    from a2b_spark.operators.multimodal import decode_media, resize_media
    from a2b_spark.operators.png import encode_png

    rows = []
    for i in range(12):
        val = (i * 37) % 256
        img = np.full((6 + i % 3, 5 + i % 4, 3), val, np.uint8)
        payload = (
            encode_jpeg(img, quality=100) if i % 2 == 0 else encode_png(img)
        )
        rows.append((i, bytearray(payload), val))
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in rows], "media_id long, payload binary"
    )

    dec = decode_media(df, "payload", "media_id", decoder="auto").collect()
    assert len(dec) == 12
    by_id = {r["media_id"]: r for r in dec}
    for i, _, val in rows:
        r = by_id[i]
        assert (r["width"], r["height"]) == (5 + i % 4, 6 + i % 3)
        assert r["channels"] == 3
        # both real codecs are exact on solid q100 / lossless payloads
        # (features land as float32 in the Arrow schema → approx)
        assert r["features"][0] == pytest.approx(round(val / 255, 6), abs=1e-6)

    jpeg_only = df.filter("media_id % 2 = 0")
    res = resize_media(
        jpeg_only, "payload", "media_id", 4, 3, resizer="jpeg"
    ).collect()
    assert {r["media_id"] for r in res} == {0, 2, 4, 6, 8, 10}
    for r in res:
        w, h, c, out = decode_jpeg(bytes(r["payload"]))
        assert (w, h, c) == (4, 3, 3)

    # auto on an unsupported format fails loudly on the executor
    # (GIF now dispatches to the real codec — BMP does not)
    bad = spark.createDataFrame(
        [(99, bytearray(b"BM bitmap not supported"))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="auto"):
        decode_media(bad, "payload", "media_id", decoder="auto").collect()
    # GIF-prefixed garbage routes to the GIF codec and fails THERE
    gifjunk = spark.createDataFrame(
        [(98, bytearray(b"GIF89a but not really"))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="GIF"):
        decode_media(gifjunk, "payload", "media_id", decoder="auto").collect()
