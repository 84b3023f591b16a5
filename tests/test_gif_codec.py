"""Stdlib GIF codec (operators/gif.py): lossless-palette roundtrips
(the q160 oracle identity — exact on ARBITRARY patterns, not just
solid blocks), LZW width-boundary/table-overflow stress, REAL
ground-truth fixtures (stock CPython idlelib icons), interlace,
transparency, animation splitting, and the Spark e2e."""

import glob

import numpy as np
import pytest

from a2b_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_decoder,
    gif_frame_splitter,
)

_FIXTURES = sorted(
    glob.glob(
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "idlelib/Icons/*.gif"
    )
)


def test_lzw_roundtrip_across_width_boundaries():
    rng = np.random.RandomState(0)
    for mcs in (2, 3, 4, 8):
        # long-enough streams cross every code-width boundary and (at
        # mcs=8) the 4096-entry table reset
        d = bytes(rng.randint(0, 1 << mcs, 20000, dtype=np.uint8))
        assert bytes(_lzw_decode(_lzw_encode(d, mcs), mcs)) == d
        # CONSTANT RUNS are the adversarial class (random data never
        # catches it): runs maximize insert rate, so the final flush
        # code lands exactly on a width boundary the decoder crosses
        # one insert after the encoder's own table does — the bug this
        # battery pinned. Structured ramps cross boundaries mid-run.
        for k in (0, 1, (1 << mcs) - 1):
            for ln in (1, 2, 59, 60, 61, 300, 5000):
                d = bytes([k]) * ln
                assert bytes(_lzw_decode(_lzw_encode(d, mcs), mcs)) == d
        for j in (1, 3, 17):
            d = bytes((i // j) % (1 << mcs) for i in range(2000))
            assert bytes(_lzw_decode(_lzw_encode(d, mcs), mcs)) == d


def test_palette_roundtrip_is_bit_exact():
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (250, 3)).astype(np.uint8)
    img = pal[rng.randint(0, 250, (64, 80))]
    w, h, ch, frames = decode_gif(encode_gif(img))
    assert (w, h, ch) == (80, 64, 3)
    assert np.array_equal(frames[0], img)


def test_interlaced_animation_roundtrip():
    clip = [
        np.full((17, 11, 3), ((10 * i) % 256, 5, (255 - 10 * i) % 256), np.uint8)
        for i in range(4)
    ]
    w, h, ch, frames = decode_gif(encode_gif(clip, interlace=True))
    assert len(frames) == 4
    assert all(np.array_equal(f, c) for f, c in zip(frames, clip))


@pytest.mark.skipif(not _FIXTURES, reason="no system GIF fixtures")
def test_real_world_gifs_decode():
    # stock CPython idlelib icons — ground truth that the LZW width
    # convention and block walk match what real encoders emit
    assert len(_FIXTURES) >= 5
    for p in _FIXTURES:
        w, h, ch, frames = decode_gif(open(p, "rb").read())
        assert w > 0 and h > 0 and len(frames) >= 1
        assert frames[0].shape == (h, w, ch)
    # content plausibility: plusnode is lines on a transparent ground
    plus = [p for p in _FIXTURES if p.endswith("plusnode.gif")]
    if plus:
        _, _, ch, frames = decode_gif(open(plus[0], "rb").read())
        assert ch == 4 and (frames[0][:, :, 3] == 0).sum() > 0


def test_error_paths():
    with pytest.raises(ValueError, match="bad signature"):
        decode_gif(b"\x89PNG\r\n\x1a\n")
    good = encode_gif(np.full((9, 9, 3), 7, np.uint8))
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(good[: len(good) - 6])
    with pytest.raises(ValueError, match="> 256"):
        rng = np.random.RandomState(1)
        encode_gif(rng.randint(0, 256, (40, 40, 3)).astype(np.uint8))
    with pytest.raises(ValueError, match="HxWx3"):
        encode_gif(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError, match="at least one frame"):
        encode_gif([])
    with pytest.raises(ValueError, match="every_n/max_frames"):
        gif_frame_splitter(good, 0, 1)


def test_kernel_contracts():
    img = np.full((6, 9, 3), 60, np.uint8)
    w, h, ch, feats = gif_decoder(encode_gif(img))
    assert (w, h, ch) == (9, 6, 3)
    assert feats[:3] == [round(60 / 255, 6)] * 3 and feats[3:6] == [0.0] * 3
    clip = [np.full((5, 4, 3), 10 * i, np.uint8) for i in range(5)]
    out = gif_frame_splitter(encode_gif(clip), 2, 2)
    assert [fno for fno, _ in out] == [0, 2]
    from a2b_spark.operators.png import decode_png

    assert decode_png(out[1][1])[3][0, 0, 0] == 20


def test_gif_pipeline_end_to_end_spark(spark):
    """Animated GIF → sample_frames(splitter='gif') → PNG payloads →
    decode_media(decoder='png'); plus 'gif'/'auto' dispatch."""
    from pyspark.sql import functions as F

    from a2b_spark.operators.multimodal import decode_media, sample_frames

    rows = []
    for i in range(8):
        n = 1 + i % 4
        clip = [
            np.full((4 + i % 3, 5 + i % 2, 3), (i * 41 + 13 * f) % 256, np.uint8)
            for f in range(n)
        ]
        rows.append((i, bytearray(encode_gif(clip)), n))
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in rows], "media_id long, payload binary"
    )

    dec = {
        r["media_id"]: r
        for r in decode_media(df, "payload", "media_id", decoder="auto").collect()
    }
    for i, _, n in rows:
        r = dec[i]
        assert (r["width"], r["height"], r["channels"]) == (5 + i % 2, 4 + i % 3, 3)
        assert r["features"][0] == pytest.approx(
            round((i * 41) % 256 / 255, 6), abs=1e-6
        )

    frames = sample_frames(
        df, "payload", "media_id", every_n=2, max_frames=2, splitter="gif"
    )
    fid = frames.select(
        (F.col("media_id") * 10 + F.col("frame_no")).alias("fid"), "frame"
    )
    out = decode_media(fid, "frame", "fid", decoder="png").collect()
    expect = {
        (i, f): (i * 41 + 13 * f) % 256
        for i, _, n in rows
        for f in list(range(0, n, 2))[:2]
    }
    assert len(out) == len(expect)
    for r in out:
        i, f = divmod(r["media_id"], 10)
        assert r["features"][0] == pytest.approx(
            round(expect[(i, f)] / 255, 6), abs=1e-6
        )
