"""Stdlib PNG codec (operators/png.py): filter-by-filter round trips
against hand-FILTERED scanlines, palette expansion, kernel contracts,
and the real-codec e2e through Spark (decode → resize → re-decode)
— the PNG twin of the PPM injection test."""

import struct
import zlib

import numpy as np
import pytest

from a2b_spark.operators.png import (
    decode_png,
    encode_png,
    png_decoder,
    png_resizer,
)


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG applying the GIVEN filter type per scanline (the
    forward transform the decoder must invert)."""
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    a = img.astype(np.int32)
    prev = np.zeros((w, ch), np.int32)
    raw = bytearray()
    for y in range(h):
        row = a[y]
        f = filters[y % len(filters)]
        out = np.empty_like(row)
        left = np.zeros(ch, np.int32)
        ul = np.zeros(ch, np.int32)
        for x in range(w):
            cur = row[x]
            if f == 0:
                o = cur
            elif f == 1:
                o = cur - left
            elif f == 2:
                o = cur - prev[x]
            elif f == 3:
                o = cur - ((left + prev[x]) >> 1)
            else:  # Paeth
                pa = np.abs(prev[x] - ul)
                pb = np.abs(left - ul)
                pc = np.abs(left + prev[x] - 2 * ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, prev[x], ul),
                )
                o = cur - pred
            out[x] = o & 0xFF
            left = cur
            ul = prev[x]
        raw.append(f)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_decode_inverts_every_filter(filters, ch):
    rng = np.random.RandomState(7 + ch + sum(filters))
    img = rng.randint(0, 256, size=(9, 5, ch), dtype=np.uint8)
    w, h, c, got = decode_png(_png_with_filters(img, filters))
    assert (w, h, c) == (5, 9, ch)
    assert np.array_equal(got, img)


def test_encode_decode_round_trip():
    rng = np.random.RandomState(3)
    for ch in (1, 2, 3, 4):
        img = rng.randint(0, 256, size=(7, 11, ch), dtype=np.uint8)
        w, h, c, got = decode_png(encode_png(img))
        assert (w, h, c) == (11, 7, ch)
        assert np.array_equal(got, img)


def test_palette_png_expands_to_rgb():
    # 2x2 palette image: indices 0..3 into a 4-entry palette
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    idx = np.array([[0, 1], [2, 3]], np.uint8)[..., None]
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w, h, c, img = decode_png(png)
    assert (w, h, c) == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[1, 1].tolist() == [9, 9, 9]


def test_unsupported_variants_raise():
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr16)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(png16)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")


def test_kernel_contracts():
    img = np.zeros((4, 8, 3), np.uint8)
    img[:, :, 0] = 200  # solid-ish red
    payload = encode_png(img)
    w, h, c, feats = png_decoder(payload)
    assert (w, h, c) == (8, 4, 3)
    assert len(feats) == 8
    assert feats[0] == pytest.approx(200 / 255, abs=1e-6)
    assert feats[1] == feats[2] == 0.0  # green/blue mean
    in_w, in_h, ch, out = png_resizer(payload, 4, 2)
    assert (in_w, in_h, ch) == (8, 4, 3)
    w2, h2, c2, img2 = decode_png(out)
    assert (w2, h2, c2) == (4, 2, 3)
    assert np.array_equal(img2[:, :, 0], np.full((2, 4), 200, np.uint8))


def test_png_codec_end_to_end_spark(spark):
    """decoder='png' / resizer='png' through the Spark operators:
    decode carries actual image stats, resize halves a gradient, and
    re-decoding the resized payload agrees — all distributed via
    mapInPandas."""
    from a2b_spark.operators.multimodal import decode_media, resize_media

    grad = np.tile(
        np.linspace(0, 255, 16, dtype=np.uint8)[None, :, None], (8, 1, 3)
    )
    solid = np.full((6, 6, 4), 77, np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(grad))), (2, bytearray(encode_png(solid)))],
        "media_id long, payload binary",
    )
    dec = {
        r.media_id: r
        for r in decode_media(media, "payload", "media_id", decoder="png").collect()
    }
    assert (dec[1].width, dec[1].height, dec[1].channels) == (16, 8, 3)
    assert (dec[2].width, dec[2].height, dec[2].channels) == (6, 6, 4)
    assert dec[2].features[0] == pytest.approx(77 / 255, abs=1e-6)

    res = {
        r.media_id: r
        for r in resize_media(
            media, "payload", "media_id", 8, 4, resizer="png"
        ).collect()
    }
    assert res[1].scale_x == 0.5 and res[1].scale_y == 0.5
    # re-decode the resized payload THROUGH the operator again
    resized_df = spark.createDataFrame(
        [(1, bytearray(res[1].payload))], "media_id long, payload binary"
    )
    rd = decode_media(resized_df, "payload", "media_id", decoder="png").collect()[0]
    assert (rd.width, rd.height, rd.channels) == (8, 4, 3)
    # nearest-neighbor of a horizontal gradient keeps ordered columns
    w2, h2, c2, img2 = decode_png(bytes(res[1].payload))
    col_means = img2[:, :, 0].mean(axis=0)
    assert all(col_means[i] <= col_means[i + 1] for i in range(len(col_means) - 1))


def test_palette_trns_expands_to_rgba_and_colorkey_raises():
    """Round-8 review: palette tRNS alpha must survive (RGBA out, not
    silently-opaque RGB); gray/RGB color-key transparency raises."""
    pal = bytes([255, 0, 0, 0, 255, 0])
    trns = bytes([128])  # entry 0 half-transparent; entry 1 opaque
    idx = np.array([[0, 1]], np.uint8)[..., None]
    raw = b"\x00" + idx[0].tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal)
        + _chunk(b"tRNS", trns)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w, h, c, img = decode_png(png)
    assert (w, h, c) == (2, 1, 4)
    assert img[0, 0].tolist() == [255, 0, 0, 128]
    assert img[0, 1].tolist() == [0, 255, 0, 255]

    gray = np.zeros((2, 2, 1), np.uint8)
    body = b"".join(b"\x00" + gray[y].tobytes() for y in range(2))
    png_gray_trns = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + _chunk(b"tRNS", struct.pack(">H", 0))
        + _chunk(b"IDAT", zlib.compress(body))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="color-key"):
        decode_png(png_gray_trns)


def test_malformed_payloads_raise_valueerror_and_bomb_is_bounded():
    """Third review pass: every malformed payload raises ValueError
    (never zlib.error/struct.error/KeyError), chunk lengths past EOF
    are an error not a silent truncation, zero-dimension images
    raise instead of emitting NaN features, and a decompression bomb
    (tiny claimed dims, huge IDAT) is stopped by a BOUNDED inflate."""
    # zero dims
    png00 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 0, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b""))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="dimensions"):
        decode_png(png00)
    # chunk declaring bytes past EOF
    bad_len = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 10_000)
        + b"IDAT"
        + b"\x00" * 8
    )
    with pytest.raises(ValueError, match="past EOF"):
        decode_png(bad_len)
    # short IHDR -> ValueError, not struct.error
    short = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", b"\x00" * 5)
        + _chunk(b"IDAT", zlib.compress(b"\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IHDR"):
        decode_png(short)
    # corrupt IDAT -> ValueError, not zlib.error
    corrupt = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", b"\xde\xad\xbe\xef")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT|length"):
        decode_png(corrupt)
    # decompression bomb: 10x10 gray claims, 50 MB of actual zeros —
    # must raise on the BOUNDED inflate, never materialize 50 MB
    bomb_raw = zlib.compress(b"\x00" * (50 << 20), 9)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 10, 10, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", bomb_raw)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="length"):
        decode_png(bomb)


def test_encoder_and_resizer_input_contracts():
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.array([[300.7, -2.5]]))
    with pytest.raises(ValueError, match="channel count"):
        encode_png(np.zeros((2, 2, 5), np.uint8))
    with pytest.raises(ValueError, match="dimensions"):
        encode_png(np.zeros((0, 4, 3), np.uint8))
    payload = encode_png(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError, match="resize target"):
        png_resizer(payload, 0, 4)
