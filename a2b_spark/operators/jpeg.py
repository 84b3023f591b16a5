"""Stdlib-only baseline JPEG codec — the second "real decode" kernel
for the multimodal operators in an environment with no PIL/libjpeg.

JPEG is the dominant web-crawl image format, so a training-data
pipeline that can only fake-decode it has a hole where its most common
input lands (reference scope: the A2B multimodal seam,
`decode_media`/`resize_media`; this module is a pure extension, the
reference has no codec either). Baseline JFIF needs nothing beyond
``struct`` + numpy: marker segments, two quantization tables, four
canonical Huffman tables, an entropy-coded scan, and an 8×8 inverse
DCT. Supported (= what camera/libjpeg/web encoders emit for baseline):

- SOF0/SOF1 (baseline + extended sequential Huffman), 8-bit precision
- 1-component grayscale and 3-component YCbCr (JFIF)
- arbitrary integer chroma subsampling (4:4:4, 4:2:2, 4:2:0, 4:1:1)
- restart intervals (DRI / RSTn markers)
- byte stuffing (FF 00) inside the entropy-coded segment

Progressive (SOF2), arithmetic coding (SOF9+), 12-bit precision,
hierarchical, and CMYK raise with a clear message — the seam's safety
model is that an unsupported payload is an ERROR, never a silently
wrong decode.

The encoder exists so the codec is testable without any external
fixture (no image libraries OR sample JPEGs ship in this container):
standard Annex-K quantization tables scaled by the libjpeg quality
formula, standard Annex-K Huffman tables, 4:4:4 or 4:2:0. At
``quality=100`` every quantizer is 1, so a solid-color image — whose
blocks carry only the (integral) DC coefficient — roundtrips
bit-exactly; that identity is what lets q156 certify the full
Huffman → dequant → IDCT → color path under the driver's value hash,
the same exact-oracle trick as q146's PNG rollup.

Performance: the entropy decode is an inherently sequential bit
stream, so this kernel is per-payload Python (the IDCT and color
transform are whole-plane numpy). That is the right trade for a
*determinism-first test codec*; a production deployment plugs libjpeg
in through the same ``decode_media(decoder=callable)`` seam without
touching this module. Parallelism at 100 TB comes from partitioning —
one payload per task slot via Arrow-batched mapInPandas — not from
single-image speed.

Exported kernels match the multimodal injection contracts:

- :func:`jpeg_decoder`  ``bytes -> (w, h, channels, features)`` —
  per-channel mean then std (each /255, round 6), padded to 8,
  identical feature discipline to ``png_decoder``.
- :func:`jpeg_resizer`  ``(bytes, tw, th) -> (in_w, in_h, channels,
  jpeg_bytes)`` — nearest-neighbor resample re-encoded as JPEG
  (quality 95, 4:4:4).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- tables


def _zigzag():
    """Natural-order index for each zigzag position (length 64)."""
    out = []
    for d in range(15):
        rows = range(min(d, 7), -1, -1) if d % 2 == 0 else range(0, d + 1)
        for r in rows:
            c = d - r
            if r < 8 and c < 8:
                out.append(r * 8 + c)
    return out


_ZZ = _zigzag()

# Annex K base quantization tables (natural order, row-major).
_QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K Huffman tables: (bits[1..16], huffval).
_HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _canonical_codes(bits, vals):
    """(bits, huffval) → [(symbol, code, length)] in canonical order."""
    out, code, k = [], 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    return {(ln, code): sym for sym, code, ln in _canonical_codes(bits, vals)}


def _encode_table(bits, vals):
    return {sym: (code, ln) for sym, code, ln in _canonical_codes(bits, vals)}


def _dct_matrix():
    import numpy as np

    k = np.arange(8, dtype="float64")
    c = 0.5 * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0, :] = 1.0 / np.sqrt(8.0)
    return c


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF 00, stops LOUDLY on a
    real marker (a truncated scan must raise, not decode garbage), and
    resynchronizes on RSTn at restart boundaries."""

    __slots__ = ("d", "p", "acc", "cnt")

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.acc = 0
        self.cnt = 0

    def _fill(self):
        d, p = self.d, self.p
        if p >= len(d):
            raise ValueError("truncated JPEG: entropy data ran past EOF")
        byte = d[p]
        if byte == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt == 0x00:
                self.p = p + 2
            else:
                raise ValueError(
                    f"truncated JPEG: hit marker FF{nxt:02X} inside scan"
                    if nxt is not None
                    else "truncated JPEG: dangling FF at EOF"
                )
        else:
            self.p = p + 1
        self.acc = byte
        self.cnt = 8

    def bit(self) -> int:
        if self.cnt == 0:
            self._fill()
        self.cnt -= 1
        return (self.acc >> self.cnt) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self, seq: int):
        """Byte-align and consume the expected RSTn marker."""
        self.cnt = 0
        d, p = self.d, self.p
        if p + 2 > len(d) or d[p] != 0xFF or d[p + 1] != 0xD0 + (seq & 7):
            got = d[p : p + 2].hex() if p + 2 <= len(d) else "EOF"
            raise ValueError(
                f"JPEG restart-marker desync: expected RST{seq & 7}, got {got}"
            )
        self.p = p + 2


def _receive_extend(reader: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = reader.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(reader: _BitReader, table) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | reader.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG: invalid Huffman code (>16 bits)")


def decode_jpeg(data: bytes):
    """JPEG bytes → (width, height, channels, HxWxC uint8 numpy array).
    Baseline/extended-sequential Huffman only; see module docstring for
    the supported envelope. 3-component scans are JFIF YCbCr → RGB."""
    import numpy as np

    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos, n = 2, len(data)
    qts: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    dri = 0
    scan = None

    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / stray RST
            pos += 2
            continue
        if marker == 0xD9:  # EOI before any scan
            break
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG: segment declares bytes past EOF")
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    qts[tq] = list(seg[i : i + 64])
                    i += 64
                else:
                    qts[tq] = [
                        struct.unpack(">H", seg[i + 2 * j : i + 2 * j + 2])[0]
                        for j in range(64)
                    ]
                    i += 128
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec} (only 8)")
            if nc not in (1, 3):
                raise ValueError(
                    f"unsupported JPEG component count {nc} (gray or YCbCr)"
                )
            if w == 0 or h == 0:
                raise ValueError(f"invalid JPEG dimensions {w}x{h}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise ValueError(
                "progressive JPEG (SOF2) unsupported — baseline only; "
                "re-encode or inject a full codec via decode_media(decoder=...)"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} — baseline only"
            )
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise ValueError("unsupported JPEG: multi-scan frame")
            sel = {}
            for si in range(ns):
                cs, tt = seg[1 + 2 * si : 3 + 2 * si]
                sel[cs] = (tt >> 4, tt & 15)
            scan = {"sel": sel, "start": pos + 2 + seglen}
            break
        # APPn / COM / anything else with a length: skip
        pos += 2 + seglen

    if scan is None:
        raise ValueError("truncated JPEG (no SOS scan)")

    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or any(c["h"] < 1 or c["v"] < 1 for c in comps):
        raise ValueError("corrupt JPEG: zero sampling factor")
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError(
                "unsupported JPEG: non-integer chroma subsampling ratio"
            )
        if c["tq"] not in qts:
            raise ValueError(f"corrupt JPEG: missing quant table {c['tq']}")
        dc_id, ac_id = scan["sel"][c["id"]]
        if dc_id not in dc_tabs or ac_id not in ac_tabs:
            raise ValueError("corrupt JPEG: missing Huffman table")
        c["dc"] = dc_tabs[dc_id]
        c["ac"] = ac_tabs[ac_id]
        # dequant in ZIGZAG order (coefficients arrive zigzag)
        c["qt"] = np.array(qts[c["tq"]], dtype="float64")

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["coef"] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), "float64")

    reader = _BitReader(data, scan["start"])
    zz = np.array(_ZZ, dtype="int64")
    preds = [0] * len(comps)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_i and mcu_i % dri == 0:
                reader.restart(mcu_i // dri - 1)
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zcoef = np.zeros(64, "float64")
                        t = _huff_decode(reader, c["dc"])
                        if t > 11:
                            raise ValueError("corrupt JPEG: DC category > 11")
                        preds[ci] += _receive_extend(reader, t)
                        zcoef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, c["ac"])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG: AC run past block end"
                                )
                            zcoef[k] = _receive_extend(reader, s)
                            k += 1
                        blk = np.zeros(64, "float64")
                        blk[zz] = zcoef * c["qt"]
                        r0 = (my * c["v"] + by) * 8
                        c0 = (mx * c["h"] + bx) * 8
                        c["coef"][r0 : r0 + 8, c0 : c0 + 8] = blk.reshape(8, 8)
            mcu_i += 1

    # batched IDCT per component plane, then upsample + crop
    C = _dct_matrix()
    planes = []
    for c in comps:
        p = c["coef"]
        by, bx = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        pix = np.einsum("ux,ybuv,vz->ybxz", C, blocks, C, optimize=True)
        pix = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        sy, sx = vmax // c["v"], hmax // c["h"]
        if sy > 1 or sx > 1:
            pix = pix.repeat(sy, axis=0).repeat(sx, axis=1)
        planes.append(pix[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype("uint8")[:, :, None]
        return w, h, 1, out
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype("uint8")


# ---------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("out", "acc", "cnt")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.cnt = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.cnt += 1
            if self.cnt == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.cnt = 0

    def flush(self):
        if self.cnt:
            self.write((1 << (8 - self.cnt)) - 1, 8 - self.cnt)  # 1-pad

    def restart(self, seq: int):
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (seq & 7)])


def _scaled_qt(base, quality: int):
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (b * scale + 50) // 100)) for b in base]


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw, zq, pred, dc_tab, ac_tab):
    """zq: 64 zigzag-ordered quantized ints. Returns the new DC pred."""
    dc = int(zq[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_tab[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zq[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zq[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _block_split(plane):
    """Pad (edge-replicate) to 8-multiples and return zigzag-quantized
    coefficient blocks in raster block order: (by, bx, 64) float."""
    import numpy as np

    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) != (h, w):
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    C = _dct_matrix()
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,ybxz,vz->ybuv", C, blocks, C, optimize=True)
    return coef.reshape(by, bx, 64)[:, :, _ZZ]  # → zigzag order


def encode_jpeg(
    img,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """HxW or HxWx{1,3} uint8 numpy array → baseline JFIF bytes.
    3-channel input is RGB; ``subsampling`` is ``"4:4:4"`` or
    ``"4:2:0"`` (chroma = exact 2×2 mean). ``quality=100`` sets every
    quantizer to 1 (lossless-DC roundtrip for solid blocks — the q156
    oracle contract). ``restart_interval`` > 0 emits DRI + RSTn
    markers every that-many MCUs (exercises the decoder resync path)."""
    import numpy as np

    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_jpeg needs uint8 input, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError(f"encode_jpeg needs HxWx{{1,3}}, got {a.shape}")
    h, w, nc = a.shape
    if h == 0 or w == 0:
        raise ValueError(f"invalid image dimensions {w}x{h}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub = subsampling == "4:2:0" and nc == 3

    qt_l = _scaled_qt(_QT_LUM, quality)
    qt_c = _scaled_qt(_QT_CHR, quality)
    # _QT_* are natural order; DQT payload and quantization use zigzag
    zq_l = np.array([qt_l[i] for i in _ZZ], "float64")
    zq_c = np.array([qt_c[i] for i in _ZZ], "float64")

    f = a.astype("float64")
    if nc == 1:
        planes = [f[:, :, 0]]
        qts = [zq_l]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        if sub:
            eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
            def half(p):
                p = np.pad(p, ((0, eh - h), (0, ew - w)), mode="edge")
                return (
                    p.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
                )
            cb, cr = half(cb), half(cr)
        planes = [y, cb, cr]
        qts = [zq_l, zq_c, zq_c]

    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc
    coefs = [
        np.round(_block_split(p) / q) for p, q in zip(planes, qts)
    ]

    # ---- headers
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tq, nat):
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            nat[i] for i in _ZZ
        )

    out += dqt(0, qt_l)
    if nc == 3:
        out += dqt(1, qt_c)

    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, spec):
        bits, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, _HUFF_DC_LUM) + dht(1, 0, _HUFF_AC_LUM)
    if nc == 3:
        out += dht(0, 1, _HUFF_DC_CHR) + dht(1, 1, _HUFF_AC_CHR)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # ---- entropy-coded scan (MCU-interleaved)
    enc_dc = [_encode_table(*_HUFF_DC_LUM)] + [_encode_table(*_HUFF_DC_CHR)] * (
        nc - 1
    )
    enc_ac = [_encode_table(*_HUFF_AC_LUM)] + [_encode_table(*_HUFF_AC_CHR)] * (
        nc - 1
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    bw = _BitWriter()
    preds = [0] * nc
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.restart(mcu_i // restart_interval - 1)
                preds = [0] * nc
            mcu_i += 1
            for ci in range(nc):
                hs, vs = samp[ci]
                cbl = coefs[ci]
                for by in range(vs):
                    for bx in range(hs):
                        rb = min(my * vs + by, cbl.shape[0] - 1)
                        cb_ = min(mx * hs + bx, cbl.shape[1] - 1)
                        preds[ci] = _encode_block(
                            bw, cbl[rb, cb_], preds[ci], enc_dc[ci], enc_ac[ci]
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------------------------- seam kernels


def jpeg_decoder(payload: bytes, n_features: int = 8):
    """decode_media kernel: bytes → (w, h, channels, features).
    Same feature discipline as png_decoder: per-channel mean then
    per-channel std (each /255, round 6), zero-padded to n_features."""
    w, h, ch, img = decode_jpeg(payload)
    a = img.reshape(-1, ch).astype("float64")
    feats = [round(float(m) / 255.0, 6) for m in a.mean(axis=0)]
    feats += [round(float(s) / 255.0, 6) for s in a.std(axis=0)]
    feats = (feats + [0.0] * n_features)[:n_features]
    return w, h, ch, feats


def jpeg_resizer(payload: bytes, target_w: int, target_h: int):
    """resize_media kernel: (bytes, tw, th) → (in_w, in_h, channels,
    jpeg_bytes) — nearest-neighbor resample re-encoded as JPEG
    (quality 95, 4:4:4: re-encode loss stays visually negligible and
    deterministic)."""
    import numpy as np

    if target_w <= 0 or target_h <= 0:
        raise ValueError(f"invalid resize target {target_w}x{target_h}")
    w, h, ch, img = decode_jpeg(payload)
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    out = img[ys][:, xs]
    return w, h, ch, encode_jpeg(out, quality=95)
