"""Stdlib-only MJPEG-in-AVI video codec — the VIDEO leg of the
multimodal operators, completing the image/audio/video triple with
real byte-level parsing in an environment with no ffmpeg.

Motion-JPEG inside an AVI container is the one video format that
decomposes entirely into pieces this repo already parses: AVI is a
RIFF chunk walk (same as operators/wav.py) and every frame chunk is a
standalone baseline JPEG (operators/jpeg.py). So frame SAMPLING —
the operation a training-data pipeline actually runs over video at
100 TB scale (sample every Nth frame, featurize, filter) — works on
real bytes end-to-end: container walk → per-frame JPEG payloads →
``decode_media(decoder="jpeg")`` on the exploded frames.

Supported: 'vids'/MJPG single-video-stream AVIs, ``00dc``/``00db``
frame chunks (flat or inside ``rec `` LISTs), JUNK/padding skips.
Any other codec fourcc (XVID, H264, …) raises with a clear message —
real inter-frame codecs need ffmpeg, which plugs in through the same
splitter-callable seam. The writer emits a spec-shaped file (hdrl
with avih/strh/strf, movi, idx1) so the codec is testable with zero
external fixtures, and its output is playable by any AVI reader.

Exported kernels:

- :func:`avi_frames`  ``bytes -> (width, height, fps, [jpeg bytes])``
- :func:`encode_mjpeg_avi`  ``([HxWxC uint8 frames], fps) -> bytes``
- :func:`mjpeg_avi_splitter`  the ``sample_frames(splitter=...)``
  kernel: ``(payload, every_n, max_frames) -> [(frame_no, jpeg)]``.
"""

from __future__ import annotations

import struct


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for each RIFF chunk in
    [pos, end); LIST chunks yield their list-type as fourcc with the
    body positioned after the type tag."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        ln = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if pos + 8 + ln > end:
            raise ValueError(
                f"truncated AVI: chunk {cid!r} declares {ln} bytes past EOF"
            )
        yield cid, pos + 8, ln
        pos += 8 + ln + (ln & 1)  # word-aligned


def avi_frames(data: bytes):
    """AVI bytes → (width, height, fps, list of MJPEG frame payloads).
    Raises for non-MJPG streams and malformed containers."""
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    w = h = None
    fps = None
    handler = None
    frames: list[bytes] = []

    def walk_movi(pos, stop):
        for cid, body, ln in _walk(data, pos, stop):
            if cid == b"LIST" and data[body : body + 4] == b"rec ":
                walk_movi(body + 4, body + ln)
            elif cid[2:4] in (b"dc", b"db"):
                frames.append(data[body : body + ln])

    for cid, body, ln in _walk(data, 12, end):
        if cid != b"LIST":
            continue
        ltype = data[body : body + 4]
        if ltype == b"hdrl":
            for c2, b2, l2 in _walk(data, body + 4, body + ln):
                if c2 == b"avih":
                    us_pf, *_rest = struct.unpack("<I", data[b2 : b2 + 4])
                    aw, ah = struct.unpack("<II", data[b2 + 32 : b2 + 40])
                    w, h = w or aw, h or ah
                elif c2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    for c3, b3, l3 in _walk(data, b2 + 4, b2 + l2):
                        if c3 == b"strh" and data[b3 : b3 + 4] == b"vids":
                            handler = data[b3 + 4 : b3 + 8]
                            scale, rate = struct.unpack(
                                "<II", data[b3 + 20 : b3 + 28]
                            )
                            if scale:
                                fps = rate / scale
                        elif c3 == b"strf":
                            bw, bh = struct.unpack("<ii", data[b3 + 4 : b3 + 12])
                            w, h = bw, abs(bh)
        elif ltype == b"movi":
            walk_movi(body + 4, body + ln)

    if handler is None or w is None:
        raise ValueError("truncated AVI (no video stream header)")
    if handler not in (b"MJPG", b"mjpg"):
        raise ValueError(
            f"unsupported AVI codec {handler!r} — only MJPG decodes here; "
            "other codecs need ffmpeg (inject via the splitter callable)"
        )
    if not frames:
        raise ValueError("AVI has no frame chunks (empty movi)")
    return int(w), int(h), float(fps or 0.0), frames


def encode_mjpeg_avi(frames, fps: int = 25, quality: int = 90) -> bytes:
    """List of HxWx{1,3} uint8 arrays → MJPEG AVI bytes (each frame a
    baseline JPEG via operators/jpeg.py; quality=100 keeps the solid-
    block exactness contract)."""
    import numpy as np

    from a2b_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("encode_mjpeg_avi needs at least one frame")
    if fps < 1:
        raise ValueError(f"invalid fps {fps}")
    first = np.asarray(frames[0])
    h, w = first.shape[0], first.shape[1]
    payloads = []
    for f in frames:
        a = np.asarray(f)
        if a.shape[0] != h or a.shape[1] != w:
            raise ValueError("all frames must share one width/height")
        payloads.append(encode_jpeg(a, quality=quality))
    n = len(payloads)
    bufsize = max(len(p) for p in payloads)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        bufsize * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n, 0, 1, bufsize, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, bufsize, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b""
    idx = b""
    for p in payloads:
        # idx1 offsets are relative to the 'movi' list-type tag
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body), len(p))
        movi_body += chunk(b"00dc", p)
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def mjpeg_avi_splitter(payload: bytes, every_n: int, max_frames: int):
    """sample_frames kernel: AVI payload → [(frame_no, jpeg_bytes)] —
    every ``every_n``-th frame, at most ``max_frames``. frame_no is
    the index in the ORIGINAL stream (what a curation pipeline keys
    provenance on), not the sample ordinal."""
    if every_n < 1 or max_frames < 1:
        raise ValueError(f"invalid every_n/max_frames {every_n}/{max_frames}")
    _w, _h, _fps, frames = avi_frames(payload)
    out = []
    for fno in range(0, len(frames), every_n):
        if len(out) >= max_frames:
            break
        out.append((fno, frames[fno]))
    return out
