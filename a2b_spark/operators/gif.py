"""Stdlib-only GIF codec — the third real image format (after PNG and
baseline JPEG) for the multimodal operators.

GIF is LZW over palette indices inside a simple block stream, so a
complete decoder needs only pure Python + numpy: header + logical
screen descriptor, global/local color tables, graphic-control
extensions (transparency), image descriptors (offsets, interlace),
and variable-width LSB-first LZW. Supported: GIF87a/GIF89a, multi-
frame animations, interlaced frames (deinterlaced on decode), local
palettes, transparent pixels (decoded to RGBA when any frame declares
transparency, RGB otherwise). Each frame renders independently onto
the logical screen (undrawn area = background color / transparent);
inter-frame disposal compositing is deliberately out of scope — frame
SAMPLING for curation treats frames independently, and a compositing
player belongs behind the ffmpeg seam.

The encoder (GIF89a, real LZW, global palette, optional interlace and
multi-frame) exists for fixture-free tests: palette formats are
LOSSLESS, so any image with ≤256 distinct colors roundtrips bit-exact
— an even stronger oracle identity than JPEG's solid-block case
(q160 certifies arbitrary patterned frames, not just solid ones).

Exported kernels match the multimodal injection contracts:

- :func:`gif_decoder`  ``bytes -> (w, h, channels, features)`` — the
  FIRST frame rendered on the logical screen, same feature discipline
  as png_decoder/jpeg_decoder.
- :func:`gif_frame_splitter`  ``(payload, every_n, max_frames) ->
  [(frame_no, png_bytes)]`` — animation frames re-encoded as
  standalone PNG payloads, composable with
  ``decode_media(decoder="png")`` (GIF frames are palette slices, not
  self-contained payloads, so the splitter normalizes them).
"""

from __future__ import annotations

import struct

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_order(h: int):
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """Variable-width LSB-first GIF LZW → index bytes."""
    clear = 1 << min_code_size
    end = clear + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    prev = None
    acc = 0
    acc_bits = 0
    pos = 0
    n = len(data)
    while True:
        while acc_bits < code_size:
            if pos >= n:
                raise ValueError("truncated GIF: LZW stream ended mid-code")
            acc |= data[pos] << acc_bits
            acc_bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        acc_bits -= code_size
        if code == clear:
            table = dict(base)
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("corrupt GIF: first LZW code not in table")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF: LZW code beyond table")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW encoder (variable width, LSB-first, clear-code start).

    Code width follows a SIMULATION of the decoder's state, not the
    encoder's own table: the decoder can only insert an entry after
    reading the NEXT code, so its table — and therefore the width it
    reads each code at — lags the encoder's by one insert, and the
    final flush code still triggers a decoder-side insert the encoder
    never mirrors in its own table. Tracking (seg_reads, dec_next)
    exactly as the decoder will reproduces giflib's width schedule at
    every boundary (verified against stock CPython idlelib GIFs)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = {bytes([i]): i for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    code_size = min_code_size + 1
    dec_next = end + 1  # decoder's next_code after its mirrored inserts
    seg_reads = 0  # data codes the decoder has read since the last clear
    out = bytearray()
    acc = 0
    acc_bits = 0

    def emit_raw(code):
        nonlocal acc, acc_bits
        acc |= code << acc_bits
        acc_bits += code_size
        while acc_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            acc_bits -= 8

    def emit_data(code):
        # decoder reads this code, then (from its 2nd read per
        # segment) inserts an entry and maybe widens — affecting how
        # it reads the NEXT code
        nonlocal seg_reads, dec_next, code_size
        emit_raw(code)
        seg_reads += 1
        if seg_reads >= 2 and dec_next < 4096:
            dec_next += 1
            if dec_next == (1 << code_size) and code_size < 12:
                code_size += 1

    emit_raw(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit_data(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        else:
            emit_raw(clear)  # decoder resets on read; no insert for it
            table = dict(base)
            next_code = end + 1
            dec_next = end + 1
            code_size = min_code_size + 1
            seg_reads = 0
        w = bytes([b])
    if w:
        emit_data(table[w])
    emit_raw(end)  # read at the width the last data-read set; no insert
    if acc_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes, pos: int):
    """Collect GIF sub-blocks from pos → (payload, next_pos)."""
    chunks = []
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF: unterminated sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        if pos + ln > n:
            raise ValueError("truncated GIF: sub-block past EOF")
        chunks.append(data[pos : pos + ln])
        pos += ln


def decode_gif(data: bytes):
    """GIF bytes → (width, height, channels, [HxWxC uint8 frames on
    the logical screen]). channels is 4 (RGBA) when any frame declares
    transparency, else 3."""
    import numpy as np

    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF (short screen descriptor)")
    w, h, packed, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if w == 0 or h == 0:
        raise ValueError(f"invalid GIF dimensions {w}x{h}")
    pos = 13
    gct = None
    if packed & 0x80:
        sz = 2 << (packed & 7)
        gct = np.frombuffer(data[pos : pos + 3 * sz], "u1").reshape(-1, 3)
        if len(gct) < sz:
            raise ValueError("truncated GIF (short global color table)")
        pos += 3 * sz

    frames = []  # (x, y, fw, fh, indices, palette, transparent_idx)
    transparent_any = False
    trans_idx = None
    n = len(data)
    while pos < n:
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= n:
                raise ValueError("truncated GIF: dangling extension")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                if body[0] & 1:
                    trans_idx = body[3]
                    transparent_any = True
                else:
                    trans_idx = None
        elif b == 0x2C:  # image descriptor
            if pos + 9 > n:
                raise ValueError("truncated GIF: short image descriptor")
            x, y, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            pal = gct
            if fpacked & 0x80:
                sz = 2 << (fpacked & 7)
                pal = np.frombuffer(data[pos : pos + 3 * sz], "u1").reshape(-1, 3)
                pos += 3 * sz
            if pal is None:
                raise ValueError("corrupt GIF: frame without any color table")
            if pos >= n:
                raise ValueError("truncated GIF: missing LZW code size")
            mcs = data[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"corrupt GIF: LZW min code size {mcs}")
            lzw, pos = _sub_blocks(data, pos)
            idx = _lzw_decode(lzw, mcs)
            if len(idx) < fw * fh:
                raise ValueError(
                    f"truncated GIF: frame has {len(idx)} of {fw * fh} pixels"
                )
            arr = np.frombuffer(bytes(idx[: fw * fh]), "u1").reshape(fh, fw)
            if fpacked & 0x40:  # interlaced: rows arrive pass-ordered
                order = _deinterlace_order(fh)
                fixed = np.empty_like(arr)
                fixed[order] = arr
                arr = fixed
            frames.append((x, y, fw, fh, arr, pal, trans_idx))
            trans_idx = None
        else:
            raise ValueError(f"corrupt GIF: unknown block 0x{b:02X}")
    if not frames:
        raise ValueError("GIF has no image frames")

    ch = 4 if transparent_any else 3
    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, "u1")
    )
    out = []
    for x, y, fw, fh, arr, pal, tix in frames:
        if arr.max() >= len(pal):
            raise ValueError("corrupt GIF: palette index out of range")
        screen = np.zeros((h, w, ch), "u1")
        if ch == 3:
            screen[:, :] = bg_rgb
        rgb = pal[arr]  # fh x fw x 3
        x2, y2 = min(x + fw, w), min(y + fh, h)
        if ch == 4:
            a = np.full((fh, fw, 1), 255, "u1")
            if tix is not None:
                a[arr == tix] = 0
            rgba = np.concatenate([rgb, a], axis=2)
            screen[y:y2, x:x2] = rgba[: y2 - y, : x2 - x]
        else:
            screen[y:y2, x:x2] = rgb[: y2 - y, : x2 - x]
        out.append(screen)
    return w, h, ch, out


def encode_gif(frames, interlace: bool = False) -> bytes:
    """One HxWx3 uint8 array or a list of same-shape arrays → GIF89a
    bytes. Palette formats are lossless: requires ≤256 distinct colors
    across all frames (raises otherwise — quantization is a modeling
    choice this deterministic codec refuses to make silently)."""
    import numpy as np

    if not isinstance(frames, (list, tuple)):
        frames = [frames]
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    arrs = []
    for f in frames:
        a = np.asarray(f)
        if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] != 3:
            raise ValueError(f"encode_gif needs HxWx3 uint8 frames, got {a.shape}")
        if a.shape[:2] != np.asarray(frames[0]).shape[:2]:
            raise ValueError("all frames must share one width/height")
        arrs.append(a)
    h, w = arrs[0].shape[:2]
    if h == 0 or w == 0:
        raise ValueError(f"invalid image dimensions {w}x{h}")

    flat = np.concatenate([a.reshape(-1, 3) for a in arrs])
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"encode_gif is lossless-palette only: {len(colors)} distinct "
            "colors > 256 (quantize upstream)"
        )
    depth = max(1, int(len(colors) - 1).bit_length())
    pal = np.zeros((2 << (depth - 1), 3), "u1")
    pal[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
    out += pal.tobytes()
    if len(arrs) > 1:  # NETSCAPE loop extension for animations
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, depth)
    per_frame = np.split(inverse.astype("u1"), len(arrs))
    for idx in per_frame:
        if len(arrs) > 1:  # graphic control: 4/100 s delay
            out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        grid = idx.reshape(h, w)
        if interlace:
            grid = grid[_deinterlace_order(h)]
        out.append(mcs)
        lzw = _lzw_encode(grid.tobytes(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


# ----------------------------------------------------------- seam kernels


def gif_decoder(payload: bytes, n_features: int = 8):
    """decode_media kernel: bytes → (w, h, channels, features) for the
    FIRST frame — same feature discipline as png/jpeg_decoder."""
    w, h, ch, frames = decode_gif(payload)
    a = frames[0].reshape(-1, ch).astype("float64")
    feats = [round(float(m) / 255.0, 6) for m in a.mean(axis=0)]
    feats += [round(float(s) / 255.0, 6) for s in a.std(axis=0)]
    feats = (feats + [0.0] * n_features)[:n_features]
    return w, h, ch, feats


def gif_frame_splitter(payload: bytes, every_n: int, max_frames: int):
    """sample_frames kernel: animated GIF → [(frame_no, png_bytes)] —
    every ``every_n``-th logical-screen frame re-encoded as standalone
    PNG (composable with decode_media(decoder='png'))."""
    from a2b_spark.operators.png import encode_png

    if every_n < 1 or max_frames < 1:
        raise ValueError(f"invalid every_n/max_frames {every_n}/{max_frames}")
    _w, _h, _ch, frames = decode_gif(payload)
    out = []
    for fno in range(0, len(frames), every_n):
        if len(out) >= max_frames:
            break
        out.append((fno, encode_png(frames[fno])))
    return out
