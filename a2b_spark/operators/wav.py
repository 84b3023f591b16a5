"""Stdlib-only WAV (RIFF/PCM) codec — the real-decode kernel for the
AUDIO leg of the multimodal operators (images: operators/png.py +
operators/jpeg.py; this module completes the brief's image/audio/video
triple for the one audio container that needs no codec library).

WAV is a RIFF chunk walk plus raw sample frames, so a complete decoder
needs only ``struct`` + numpy. Supported (what recorders and tools
emit for uncompressed audio):

- PCM integer samples: unsigned 8-bit, signed 16/24/32-bit LE
- IEEE float samples: 32/64-bit
- WAVE_FORMAT_EXTENSIBLE wrapping either of the above
- any channel count / sample rate; data size taken from the chunk
  header and cross-checked against the payload

Compressed formats (ADPCM, A-law/µ-law, MP3-in-WAV, …) raise with a
clear message — same seam safety model as the image codecs: an
unsupported payload is an ERROR, never a silently wrong decode.

Samples normalize to float64 in [-1, 1) dividing by 2^(bits-1) (ints)
or pass through (floats) — exact dyadic scaling, so integer-amplitude
test signals keep exact representations end-to-end; that exactness is
what lets q157/q158 certify the decoded SAMPLE values (not just the
header) under the driver's value hash with square-wave closed forms.

Exported kernels match the audio operator injection contracts:

- :func:`wav_decoder`  ``bytes -> (sample_rate, channels, n_samples,
  features)`` with deterministic features: [duration_s (round 6),
  rms, zero_crossings, peak] over the channel-mean mono mixdown.
- :func:`wav_window_kernel`  ``(bytes, window, hop) -> iterator of
  (idx, start, rms, peak)`` — fixed-size analysis windows.
"""

from __future__ import annotations

import struct


def decode_wav(data: bytes):
    """WAV bytes → (sample_rate, channels, float64 array of shape
    (n_samples, channels) normalized to [-1, 1))."""
    import numpy as np

    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE header)")
    pos, n = 12, len(data)
    fmt = None
    payload = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        ln = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body_end = pos + 8 + ln
        if body_end > n:
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {ln} bytes past EOF"
            )
        body = data[pos + 8 : body_end]
        pos = body_end + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("corrupt WAV: fmt chunk shorter than 16 bytes")
            tag, ch, sr, _brate, _align, bits = struct.unpack("<HHIIHH", body[:16])
            if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag leads the GUID
                if ln < 40:
                    raise ValueError("corrupt WAV: extensible fmt without GUID")
                tag = struct.unpack("<H", body[24:26])[0]
            fmt = (tag, ch, sr, bits)
        elif cid == b"data":
            payload = body
            break  # fmt must precede data per spec; nothing else needed
    if fmt is None or payload is None:
        raise ValueError("truncated WAV (missing fmt or data chunk)")
    tag, ch, sr, bits = fmt
    if ch < 1 or sr < 1:
        raise ValueError(f"invalid WAV: {ch} channels at {sr} Hz")
    if tag == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(payload, "<u1").astype("float64") - 128.0
            x /= 128.0
        elif bits == 16:
            x = np.frombuffer(payload, "<i2").astype("float64") / 32768.0
        elif bits == 24:
            raw = np.frombuffer(payload, "<u1")
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3).astype("int64")
            v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype("float64") / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(payload, "<i4").astype("float64") / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(payload, "<f4").astype("float64")
        elif bits == 64:
            x = np.frombuffer(payload, "<f8").copy()
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(
            f"unsupported WAV format tag {tag} (only PCM=1 / IEEE float=3; "
            "compressed WAV needs an injected codec)"
        )
    frames = len(x) // ch
    return sr, ch, x[: frames * ch].reshape(frames, ch)


def encode_wav(samples, sample_rate: int, bits: int = 16) -> bytes:
    """(n_samples, channels) array → WAV bytes. Accepts int16 (written
    verbatim) or float in [-1, 1] (scaled to the target int width)."""
    import numpy as np

    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"encode_wav needs (n, channels), got {a.shape}")
    if sample_rate < 1:
        raise ValueError(f"invalid sample rate {sample_rate}")
    if bits != 16:
        raise ValueError("encode_wav writes 16-bit PCM only")
    if a.dtype == np.int16:
        pcm = a
    else:
        pcm = np.clip(np.round(a.astype("float64") * 32768.0), -32768, 32767).astype(
            "<i2"
        )
    ch = pcm.shape[1]
    payload = pcm.astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mono(x):
    """Channel-mean mixdown (deterministic; mono passes through)."""
    return x[:, 0] if x.shape[1] == 1 else x.mean(axis=1)


def wav_decoder(payload: bytes, n_features: int = 4):
    """decode_audio kernel: bytes → (sample_rate, channels, n_samples,
    features) with features [duration_s (round 6), rms,
    zero_crossings, peak] over the mono mixdown — each either exact
    integer-valued or a deterministic float64 reduction."""
    import numpy as np

    sr, ch, x = decode_wav(payload)
    m = _mono(x)
    n = len(m)
    if n == 0:
        feats = [0.0, 0.0, 0.0, 0.0]
    else:
        rms = float(np.sqrt(np.mean(m * m)))
        crossings = float(np.count_nonzero(np.signbit(m[1:]) != np.signbit(m[:-1])))
        feats = [round(n / sr, 6), rms, crossings, float(np.abs(m).max())]
    feats = (feats + [0.0] * n_features)[:n_features]
    return sr, ch, n, feats


def wav_window_kernel(payload: bytes, window: int, hop: int):
    """audio_windows kernel: bytes → list of (idx, start_sample, rms,
    peak) fixed-size analysis windows over the mono mixdown. Windows
    that would run past the end are dropped (no partial windows — a
    tail window's stats are not comparable to full ones)."""
    import numpy as np

    if window < 1 or hop < 1:
        raise ValueError(f"invalid window/hop {window}/{hop}")
    _sr, _ch, x = decode_wav(payload)
    m = _mono(x)
    out = []
    n = len(m)
    for i, start in enumerate(range(0, n - window + 1, hop)):
        seg = m[start : start + window]
        out.append(
            (
                i,
                start,
                float(np.sqrt(np.mean(seg * seg))),
                float(np.abs(seg).max()),
            )
        )
    return out
