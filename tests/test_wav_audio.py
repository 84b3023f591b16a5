"""Stdlib WAV codec (operators/wav.py) + the audio operators
(decode_audio / audio_windows): exact square-wave feature contracts
(the q157/q158 oracle identities), every supported sample format,
loud errors outside the PCM envelope, and the Spark e2e."""

import struct

import numpy as np
import pytest

from a2b_spark.operators.wav import (
    decode_wav,
    encode_wav,
    wav_decoder,
    wav_window_kernel,
)


def _square(n, h, a, ch=1):
    """Square wave: +a for h samples, -a for h, ... (int16)."""
    i = np.arange(n)
    mono = np.where((i // h) % 2 == 0, a, -a).astype(np.int16)
    return np.repeat(mono[:, None], ch, axis=1)


def _raw_wav(tag, ch, sr, bits, payload, extensible=False):
    if extensible:
        # base fmt + cbSize(2) + validBits(2) + channelMask(4) + GUID(16,
        # whose first 2 bytes are the real format tag)
        fmt = struct.pack(
            "<HHIIHH", 0xFFFE, ch, sr, sr * ch * bits // 8, ch * bits // 8, bits
        ) + struct.pack("<HHI", 22, bits, (1 << ch) - 1) + struct.pack("<H", tag) + b"\x00" * 14
    else:
        fmt = struct.pack(
            "<HHIIHH", tag, ch, sr, sr * ch * bits // 8, ch * bits // 8, bits
        )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_int16_roundtrip_exact():
    pcm = _square(200, 3, 1234, ch=2)
    sr, ch, x = decode_wav(encode_wav(pcm, 8000))
    assert (sr, ch) == (8000, 2)
    assert np.array_equal(np.round(x * 32768).astype(np.int16), pcm)


@pytest.mark.parametrize("bits,vals,expect", [
    (8, bytes([128, 255, 0, 192]), [0.0, 127 / 128, -1.0, 0.5]),
    (24, b"".join(struct.pack("<i", v)[:3] for v in [1 << 22, -(1 << 23), 0]),
     [0.5, -1.0, 0.0]),
    (32, b"".join(struct.pack("<i", v) for v in [1 << 30, -(1 << 31), 0]),
     [0.5, -1.0, 0.0]),
])
def test_int_formats_normalize_exactly(bits, vals, expect):
    sr, ch, x = decode_wav(_raw_wav(1, 1, 44100, bits, vals))
    assert x[:, 0].tolist() == expect


@pytest.mark.parametrize("bits,pack", [(32, "<f"), (64, "<d")])
def test_float_formats_pass_through(bits, pack):
    vals = [0.25, -0.75, 1.0]
    payload = b"".join(struct.pack(pack, v) for v in vals)
    sr, ch, x = decode_wav(_raw_wav(3, 1, 16000, bits, payload))
    assert x[:, 0].tolist() == vals


def test_extensible_header_unwraps_to_pcm():
    pcm = _square(50, 2, 100)
    payload = pcm.astype("<i2").tobytes()
    sr, ch, x = decode_wav(_raw_wav(1, 1, 8000, 16, payload, extensible=True))
    assert np.array_equal(np.round(x * 32768).astype(np.int16), pcm)


def test_unsupported_and_malformed_raise():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS junk")
    with pytest.raises(ValueError, match="format tag 2"):
        decode_wav(_raw_wav(2, 1, 8000, 16, b"\x00\x00"))  # ADPCM
    with pytest.raises(ValueError, match="bit depth 12"):
        decode_wav(_raw_wav(1, 1, 8000, 12, b"\x00\x00"))
    good = encode_wav(_square(20, 2, 5), 8000)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-4])
    with pytest.raises(ValueError, match="missing fmt or data"):
        decode_wav(good[:12])
    with pytest.raises(ValueError, match="sample rate"):
        encode_wav(_square(4, 1, 1), 0)
    with pytest.raises(ValueError, match="16-bit"):
        encode_wav(_square(4, 1, 1), 8000, bits=8)


def test_decoder_kernel_square_wave_closed_forms():
    # the q157 oracle identity: duration/rms/crossings/peak all exact
    n, h, a = 161, 3, 777
    b = encode_wav(_square(n, h, a), 8000)
    sr, ch, ns, feats = wav_decoder(b)
    assert (sr, ch, ns) == (8000, 1, n)
    assert feats[0] == round(n / 8000, 6)
    assert feats[1] == a / 32768  # rms of |±a| is exactly a
    assert feats[2] == (n - 1) // h  # one crossing per block boundary
    assert feats[3] == a / 32768
    # stereo with identical channels mixes down to the same signal
    sr2, ch2, ns2, f2 = wav_decoder(encode_wav(_square(n, h, a, ch=2), 8000))
    assert (ch2, ns2) == (2, n)
    assert f2 == feats


def test_window_kernel_counts_and_exact_rms():
    n, h, a, w, hop = 100, 4, 512, 32, 16
    out = wav_window_kernel(encode_wav(_square(n, h, a), 8000), w, hop)
    k = (n - w) // hop + 1
    assert [o[0] for o in out] == list(range(k))
    assert [o[1] for o in out] == [i * hop for i in range(k)]
    assert all(o[2] == a / 32768 and o[3] == a / 32768 for o in out)
    assert wav_window_kernel(encode_wav(_square(10, 2, 5), 8000), 32, 16) == []
    with pytest.raises(ValueError, match="window/hop"):
        wav_window_kernel(b"", 0, 4)


def test_audio_operators_end_to_end_spark(spark):
    from a2b_spark.operators.multimodal import audio_windows, decode_audio

    rows = []
    for i in range(10):
        n, h, a, ch = 64 + i * 7, 1 + i % 4, 1 + i * 97, 1 + i % 2
        rows.append((i, bytearray(encode_wav(_square(n, h, a, ch), 8000)), n, h, a, ch))
    df = spark.createDataFrame(
        [(i, p) for i, p, *_ in rows], "media_id long, payload binary"
    )

    dec = {r["media_id"]: r for r in decode_audio(df, "payload", "media_id", decoder="wav").collect()}
    assert len(dec) == 10
    for i, _, n, h, a, ch in rows:
        r = dec[i]
        assert (r["sample_rate"], r["channels"], r["n_samples"]) == (8000, ch, n)
        assert r["features"][1] == a / 32768  # DoubleType keeps it exact
        assert r["features"][2] == (n - 1) // h

    win = audio_windows(df, "payload", "media_id", 32, 16).collect()
    expect_total = sum((n - 32) // 16 + 1 for _, _, n, _, _, _ in rows)
    assert len(win) == expect_total
    by_id = {}
    for r in win:
        by_id.setdefault(r["media_id"], []).append(r)
    for i, _, n, h, a, ch in rows:
        ws = sorted(by_id[i], key=lambda r: r["window_idx"])
        assert len(ws) == (n - 32) // 16 + 1
        assert all(r["rms"] == a / 32768 for r in ws)

    # fake decoder: plumbing-only, deterministic
    fake = decode_audio(df, "payload", "media_id", decoder="fake").collect()
    assert len(fake) == 10 and all(r["sample_rate"] % 8000 == 0 for r in fake)
    with pytest.raises(NotImplementedError, match="torchaudio"):
        decode_audio(df, "payload", "media_id", decoder="real")
    with pytest.raises(ValueError, match="unknown decoder"):
        audio_windows(df, "payload", "media_id", 32, 16, decoder="nope")
