"""Stdlib-only PNG codec — the "real decode" kernel for the multimodal
operators in an environment with no PIL/ffmpeg.

PNG is zlib (stdlib) + per-scanline byte filters, so a complete
decoder needs nothing beyond ``zlib``/``struct``/numpy: parse chunks,
inflate IDAT, undo filters 0–4, map palettes. Supported: bit depth 8,
color types 0/2/3/4/6 (gray, RGB, palette, gray+alpha, RGBA),
non-interlaced — i.e. what encoders emit by default; palette
transparency (tRNS) expands to RGBA. Adam7, 1/2/4/16 bit depths, and
gray/RGB color-key tRNS raise with a clear message (the safety model
of the seam: an unsupported payload is an ERROR, never a silently
wrong decode).

The exported kernels match the multimodal injection contracts
(``decode_media(decoder=...)`` / ``resize_media(resizer=...)``):

- :func:`png_decoder`  ``bytes -> (w, h, channels, features)`` with
  deterministic features (per-channel mean then std, /255, padded to
  8) — reproducible across runs and engines.
- :func:`png_resizer`  ``(bytes, tw, th) -> (in_w, in_h, channels,
  png_bytes)`` — nearest-neighbor resample (pure numpy indexing;
  deterministic, no kernel-choice ambiguity) re-encoded as PNG.

Unfiltering stays numpy-vectorized where the filter allows it (None/
Up whole-row; Sub via per-lane cumsum — byte addition is mod-256, so
cumsum mod 256 IS the recurrence); Average/Paeth have an inherent
left-pixel dependency and run a per-pixel loop vectorized across
channel lanes. Encoding always uses filter 0 (correct, simple; this
seam optimizes for determinism, not compression ratio).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes):
    """PNG bytes → (width, height, channels, HxWxC uint8 numpy array).
    Palette images return expanded RGB."""
    import numpy as np

    if bytes(data[:8]) != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, plte, trns, idat = 8, None, None, None, []
    n = len(data)
    while pos + 8 <= n:
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = bytes(data[pos + 4 : pos + 8])
        if pos + 12 + ln > n:
            # a silently shortened chunk would decode wrong, not fail
            raise ValueError(
                f"truncated PNG: chunk {typ!r} declares {ln} bytes past EOF"
            )
        chunk = bytes(data[pos + 8 : pos + 8 + ln])
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"tRNS":
            trns = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise ValueError("truncated PNG (missing/short IHDR or no IDAT)")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if w <= 0 or h <= 0:
        # a zero-dimension "image" would flow NaN features downstream
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if interlace:
        raise ValueError("Adam7-interlaced PNG unsupported")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype}")
    if trns is not None and ctype in (0, 2):
        # color-key transparency on gray/RGB: silently decoding it
        # opaque would be a WRONG decode, not a degraded one
        raise ValueError(
            "PNG tRNS color-key transparency on gray/RGB unsupported"
        )
    ch = _CHANNELS[ctype]
    stride = w * ch
    want = h * (stride + 1)
    # bounded inflate: the expected size is known from IHDR, so never
    # let a crafted payload (decompression bomb) expand past it — a
    # few-MB IDAT claiming 10x10 dims must not allocate gigabytes on
    # an executor before the length check fires
    try:
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), want + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT: {exc}") from exc
    if len(raw) != want or d.unconsumed_tail:
        raise ValueError(
            f"PNG scanline data has unexpected length ({len(raw)} "
            f"inflated{'+' if d.unconsumed_tail or len(raw) > want else ''} "
            f"vs {want} expected for {w}x{h}x{ch})"
        )

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    ppos = 0
    for y in range(h):
        f = raw[ppos]
        row = np.frombuffer(raw, np.uint8, count=stride, offset=ppos + 1).copy()
        ppos += stride + 1
        if f == 0:  # None
            pass
        elif f == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            row = (
                np.cumsum(row.reshape(w, ch).astype(np.uint32), axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up (uint8 addition wraps mod 256)
            row += prev
        elif f == 3:  # Average
            r = row.reshape(w, ch).astype(np.int32)
            p = prev.reshape(w, ch).astype(np.int32)
            left = np.zeros(ch, np.int32)
            for x in range(w):
                left = (r[x] + ((left + p[x]) >> 1)) & 0xFF
                r[x] = left
            row = r.astype(np.uint8).reshape(stride)
        elif f == 4:  # Paeth
            r = row.reshape(w, ch).astype(np.int32)
            p = prev.reshape(w, ch).astype(np.int32)
            left = np.zeros(ch, np.int32)
            ul = np.zeros(ch, np.int32)
            for x in range(w):
                a, b, c = left, p[x], ul
                pa = np.abs(b - c)
                pb = np.abs(a - c)
                pc = np.abs(a + b - 2 * c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                left = (r[x] + pred) & 0xFF
                r[x] = left
                ul = b
            row = r.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = row
        prev = row

    img = out.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if trns is not None:
            # palette transparency: expand to RGBA (entries past the
            # tRNS table are fully opaque, per spec) — dropping alpha
            # silently would be a wrong decode
            alpha = np.full(pal.shape[0], 255, np.uint8)
            a = np.frombuffer(trns, np.uint8)[: pal.shape[0]]
            alpha[: len(a)] = a
            pal = np.concatenate([pal, alpha[:, None]], axis=1)
            img = pal[img[..., 0]]
            ch = 4
        else:
            img = pal[img[..., 0]]
            ch = 3
    return int(w), int(h), int(ch), img


def encode_png(img) -> bytes:
    """HxWxC (or HxW) uint8 numpy array → PNG bytes (filter 0 rows).
    Rejects non-uint8 input (an unsafe cast would silently wrap
    300.7 → 44 — the decode side's loud-error contract applies to the
    encoder too) and channel counts outside 1–4."""
    import numpy as np

    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError(
            f"encode_png expects uint8 pixel data, got {a.dtype} "
            "(cast explicitly if the wrap/truncate is intended)"
        )
    a = np.ascontiguousarray(a)
    if a.ndim == 2:
        a = a[..., None]
    if a.ndim != 3:
        raise ValueError(f"encode_png expects HxW or HxWxC, got shape {a.shape}")
    h, w, c = a.shape
    if h == 0 or w == 0:
        raise ValueError(f"invalid image dimensions {w}x{h}")
    if c not in (1, 2, 3, 4):
        raise ValueError(
            f"unsupported channel count {c} (1=gray, 2=gray+alpha, 3=RGB, 4=RGBA)"
        )
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    # filter byte 0 per scanline
    body = np.empty((h, w * c + 1), dtype=np.uint8)
    body[:, 0] = 0
    body[:, 1:] = a.reshape(h, w * c)
    return (
        _SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(body.tobytes()))
        + chunk(b"IEND", b"")
    )


def png_decoder(payload: bytes, n_features: int = 8):
    """decode_media kernel: bytes → (w, h, channels, features).
    Features: per-channel mean then per-channel std (each /255, round
    6), zero-padded to ``n_features`` — deterministic."""
    w, h, ch, img = decode_png(payload)
    a = img.reshape(-1, ch).astype("float64")
    feats = [round(float(m) / 255.0, 6) for m in a.mean(axis=0)]
    feats += [round(float(s) / 255.0, 6) for s in a.std(axis=0)]
    feats = (feats + [0.0] * n_features)[:n_features]
    return w, h, ch, feats


def png_resizer(payload: bytes, target_w: int, target_h: int):
    """resize_media kernel: (bytes, tw, th) → (in_w, in_h, channels,
    png_bytes) — nearest-neighbor resample re-encoded as PNG."""
    import numpy as np

    if target_w <= 0 or target_h <= 0:
        raise ValueError(f"invalid resize target {target_w}x{target_h}")
    w, h, ch, img = decode_png(payload)
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    out = img[ys][:, xs]
    return w, h, ch, encode_png(out)
