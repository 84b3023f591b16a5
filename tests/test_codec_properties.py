"""Property-based tests (hypothesis) for the stdlib codecs — pure
Python, no Spark, so examples are cheap: breadth of SHAPE (1×1, 1×N,
odd dims, degenerate palettes, boundary amplitudes) against the exact
roundtrip contracts each codec's oracle queries stand on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_SET = settings(max_examples=60, deadline=None)
_SMALL = settings(max_examples=25, deadline=None)


@_SET
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_any_shape(h, w, c, seed):
    from a2b_spark.operators.png import decode_png, encode_png

    img = np.random.RandomState(seed).randint(0, 256, (h, w, c)).astype(np.uint8)
    ww, hh, cc, out = decode_png(encode_png(img))
    assert (ww, hh, cc) == (w, h, c)
    assert np.array_equal(out, img)


@_SET
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    n_colors=st.integers(1, 8),
    frames=st.integers(1, 3),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_any_palette(h, w, n_colors, frames, interlace, seed):
    from a2b_spark.operators.gif import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    clip = [pal[rng.randint(0, n_colors, (h, w))] for _ in range(frames)]
    ww, hh, cc, out = decode_gif(encode_gif(clip, interlace=interlace))
    assert (ww, hh, cc, len(out)) == (w, h, 3, frames)
    for got, want in zip(out, clip):
        assert np.array_equal(got, want)


@_SMALL
@given(
    h=st.integers(1, 17),
    w=st.integers(1, 17),
    c=st.sampled_from([1, 3]),
    val=st.integers(0, 255),
    sub=st.sampled_from(["4:4:4", "4:2:0"]),
    dri=st.sampled_from([0, 1, 3]),
)
def test_jpeg_q100_solid_exact_any_shape(h, w, c, val, sub, dri):
    from a2b_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = np.full((h, w, c), val, np.uint8)
    if c == 1:
        sub = "4:4:4"
    ww, hh, cc, out = decode_jpeg(
        encode_jpeg(img, quality=100, subsampling=sub, restart_interval=dri)
    )
    assert (ww, hh, cc) == (w, h, c)
    assert np.array_equal(out, img)


@_SMALL
@given(h=st.integers(8, 24), w=st.integers(8, 24), seed=st.integers(0, 2**31 - 1))
def test_jpeg_q100_grayscale_bounded_error(h, w, seed):
    # arbitrary content at q100: only coefficient rounding remains;
    # the analytic worst case is ~0.5 * (sum |C row|)^2 ≈ 7.4 → use 8
    from a2b_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = np.random.RandomState(seed).randint(0, 256, (h, w, 1)).astype(np.uint8)
    _, _, _, out = decode_jpeg(encode_jpeg(img, quality=100))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


@_SET
@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 3),
    sr=st.integers(1, 96000),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_int16_roundtrip_any_shape(n, ch, sr, seed):
    from a2b_spark.operators.wav import decode_wav, encode_wav

    pcm = (
        np.random.RandomState(seed)
        .randint(-32768, 32768, (n, ch))
        .astype(np.int16)
    )
    sr2, ch2, x = decode_wav(encode_wav(pcm, sr))
    assert (sr2, ch2) == (sr, ch)
    assert np.array_equal(np.round(x * 32768).astype(np.int16), pcm)


@_SET
@given(
    mcs=st.integers(2, 8),
    data=st.binary(min_size=0, max_size=4000),
)
def test_gif_lzw_roundtrip_any_bytes(mcs, data):
    from a2b_spark.operators.gif import _lzw_decode, _lzw_encode

    # clamp symbols into the alphabet for this code size
    data = bytes(b % (1 << mcs) for b in data)
    assert bytes(_lzw_decode(_lzw_encode(data, mcs), mcs)) == data


@_SET
@given(
    n_frames=st.integers(1, 4),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    val=st.integers(0, 255),
    fps=st.integers(1, 60),
)
def test_avi_container_roundtrip(n_frames, h, w, val, fps):
    from a2b_spark.operators.jpeg import decode_jpeg
    from a2b_spark.operators.video import avi_frames, encode_mjpeg_avi

    clip = [
        np.full((h, w, 3), (val + 7 * i) % 256, np.uint8) for i in range(n_frames)
    ]
    ww, hh, f, frames = avi_frames(encode_mjpeg_avi(clip, fps=fps, quality=100))
    assert (ww, hh, len(frames)) == (w, h, n_frames)
    assert abs(f - fps) < 1e-9
    for i, fr in enumerate(frames):
        _, _, _, img = decode_jpeg(fr)
        assert img.min() == img.max() == (val + 7 * i) % 256
