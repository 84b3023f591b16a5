"""Multimodal (image/audio/video) column plumbing.

Design (BASELINE.json north star; no counterpart in the reference —
A2B is scalar-row ETL): media rides as an opaque ``binary`` payload
column plus a typed metadata struct. Everything metadata-level
(sniffing, sizes, digests) is JVM built-ins at scan speed; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so each
Python batch amortizes interpreter cost and memory stays bounded by
(batch size × payload size), not partition size.

All three modalities have REAL stdlib codecs for their most common
uncompressed/baseline formats — PNG + baseline JPEG images
(operators/png.py, operators/jpeg.py), RIFF/PCM WAV audio
(operators/wav.py), MJPEG-AVI video (operators/video.py) — certified
under the driver hash by q146/q156-q159. Formats beyond those need
codec libraries (PIL, ffmpeg, torchaudio) that are NOT in this
container: ``decoder="fake"`` produces a deterministic synthetic
decode (hash-derived) for plumbing tests, ``decoder="real"`` raises
NotImplementedError at the import site, and passing a CALLABLE injects
an actual codec without editing this module (the callable rides to the
executors via cloudpickle; import codec libs inside its body).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes (hex) → format label; checked JVM-side
_MAGIC = [
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi container
    ("494433", "mp3"),
    ("664C6143", "flac"),
    ("000000", "mp4"),  # ftyp boxes start with size; loose
]

META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("format", T.StringType()),
    ]
)


def sniff_format(bin_col: Column) -> Column:
    """Magic-byte format sniff — pure built-ins (hex prefix compare)."""
    prefix = F.upper(F.hex(F.substring(bin_col, 1, 8)))
    expr = F.lit("unknown")
    for magic, label in reversed(_MAGIC):
        expr = F.when(prefix.startswith(magic), F.lit(label)).otherwise(expr)
    return expr


def media_metadata(bin_col: Column) -> Column:
    """Typed metadata struct for an opaque binary payload: byte size,
    md5 digest, sniffed container format. Scan-speed built-ins."""
    return F.struct(
        F.octet_length(bin_col).cast("long").alias("n_bytes"),
        F.md5(bin_col).alias("digest"),
        sniff_format(bin_col).alias("format"),
    )


def with_media_metadata(df: DataFrame, bin_col: str, out: str = "meta") -> DataFrame:
    return df.withColumn(out, media_metadata(F.col(bin_col)))


def _nonnull(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Drop NULL-payload/NULL-id rows before the Python kernels (the
    same null discipline as the knn/asof operators): a failed fetch
    leaves a null binary column, and bytes(None)/int(None) inside the
    kernel would abort the whole job instead of skipping the row."""
    return df.select(id_col, bin_col).filter(
        F.col(id_col).isNotNull() & F.col(bin_col).isNotNull()
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes, n_features: int = 8) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a codec: dimensions and features are
    a pure function of the payload bytes, so tests are reproducible."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    channels = 1 + h[2] % 3
    feats = [round(b / 255.0, 6) for b in h[3 : 3 + n_features]]
    return width, height, channels, feats


def decode_media(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    decoder: "str | Callable[[bytes], tuple]" = "fake",
    n_features: int = 8,
    batch_rows: int = 64,
) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched mapInPandas.

    ``decoder`` selects the codec kernel:

    - ``"fake"`` (default): deterministic synthetic decode — the full
      distributed plumbing with no codec libs.
    - ``"png"``: REAL decode for PNG payloads via the stdlib-only
      codec in operators/png.py (zlib + scanline unfiltering).
    - ``"jpeg"``: REAL decode for baseline JPEG via the stdlib+numpy
      codec in operators/jpeg.py (Huffman + dequant + IDCT + YCbCr).
    - ``"gif"``: REAL decode for GIF87a/89a via the stdlib LZW codec
      in operators/gif.py (first frame; RGBA when transparent).
    - ``"auto"``: per-payload magic-byte sniff between the three real
      codecs; any other format raises.
    - ``"real"``: the seam for PIL/ffmpeg (arbitrary formats) —
      NotImplementedError here because codec libs are not in this
      container; the message points PNG/JPEG payloads at the real
      stdlib codecs.
    - a CALLABLE ``bytes -> (width, height, channels, features)``:
      dependency injection of an actual codec. The callable is
      cloudpickled to the executors with the kernel, so it must be
      self-contained (import its libs inside the function body). This
      is the supported way to plug a real decoder in without editing
      this module, and what the injection test exercises.

    Memory bound: decoded output accumulates at most ``batch_rows``
    rows before each yield (sliced INSIDE the kernel — a session-conf
    toggle at plan-build time does not survive to lazy execution and
    was a no-op). The incoming Arrow batch is governed by the
    session's ``spark.sql.execution.arrow.maxRecordsPerBatch``; lower
    that session-wide when individual payloads are huge."""
    if callable(decoder):
        kernel = decoder
    elif decoder == "fake":
        kernel = lambda payload: _fake_decode(payload, n_features)  # noqa: E731
    elif decoder == "png":
        # REAL decode for a real format, stdlib-only: PNG is zlib +
        # scanline filters, implemented in operators/png.py
        from a2b_spark.operators.png import png_decoder

        kernel = lambda payload: png_decoder(payload, n_features)  # noqa: E731
    elif decoder == "jpeg":
        # REAL decode for baseline JPEG (stdlib+numpy Huffman/IDCT
        # codec, operators/jpeg.py); progressive/arithmetic raise
        from a2b_spark.operators.jpeg import jpeg_decoder

        kernel = lambda payload: jpeg_decoder(payload, n_features)  # noqa: E731
    elif decoder == "gif":
        # REAL decode for GIF87a/89a (stdlib LZW codec, operators/
        # gif.py); first frame of animations, RGBA when transparent
        from a2b_spark.operators.gif import gif_decoder

        kernel = lambda payload: gif_decoder(payload, n_features)  # noqa: E731
    elif decoder == "auto":
        # sniff per payload: PNG / baseline JPEG / GIF decode for
        # real, anything else raises (the seam's loud-error contract)
        from a2b_spark.operators.gif import gif_decoder
        from a2b_spark.operators.jpeg import jpeg_decoder
        from a2b_spark.operators.png import png_decoder

        def kernel(payload: bytes):
            if payload[:3] == b"\xff\xd8\xff":
                return jpeg_decoder(payload, n_features)
            if payload[:4] == b"\x89PNG":
                return png_decoder(payload, n_features)
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                return gif_decoder(payload, n_features)
            raise ValueError(
                f"decoder='auto' supports PNG, baseline JPEG, and GIF; "
                f"payload starts {bytes(payload[:4])!r} — inject a codec "
                "callable for other formats"
            )

    elif decoder == "real":
        raise NotImplementedError(
            "general media decode needs codec libraries (PIL/ffmpeg) not "
            "present in this environment; PNG and baseline JPEG payloads "
            "decode for real via decoder='png' / 'jpeg' / 'auto' (stdlib "
            "codecs, operators/png.py + operators/jpeg.py); for other "
            "formats pass a decoder callable (bytes -> (w, h, c, features)), "
            "or use decoder='fake' for plumbing tests"
        )
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s : s + batch_rows]
                rows = []
                for mid, payload in zip(chunk[id_col], chunk[bin_col]):
                    w, hgt, c, feats = kernel(bytes(payload))
                    rows.append(
                        (int(mid), int(w), int(hgt), int(c), [float(x) for x in feats])
                    )
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "width", "height", "channels", "features"],
                )

    return _nonnull(df, id_col, bin_col).mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def resize_media(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    target_w: int,
    target_h: int,
    resizer: "str | Callable[[bytes, int, int], tuple]" = "fake",
    max_out_bytes: int = 1 << 20,
    batch_rows: int = 64,
) -> DataFrame:
    """Resize plumbing for image payloads: (id, payload) → (media_id,
    width, height, channels, scale_x, scale_y, payload) with the
    payload re-encoded at the target size. Same seam discipline as
    decode_media: ``resizer="png"`` is a REAL nearest-neighbor resize
    for PNG payloads (stdlib codec, operators/png.py);
    ``resizer="real"`` is where PIL's ``Image.resize`` drops in for
    other formats (NotImplementedError here — no codecs in this
    container); ``"fake"`` produces a deterministic hash-derived
    payload of exactly target_w × target_h × channels bytes (capped at
    ``max_out_bytes``), with source dims from the same fake decode, so
    dims/scales/byte-counts are SQL-mirrorable for the oracle. A
    CALLABLE ``(payload, target_w, target_h) -> (in_w, in_h, channels,
    out_payload)`` injects an actual codec (self-contained, shipped by
    cloudpickle — same contract as decode_media's decoder callable).

    Scale: Arrow-batched mapInPandas; resized output accumulates at
    most ``batch_rows`` rows per yield (sliced inside the kernel —
    see decode_media's note on why a session-conf toggle would be a
    no-op); incoming batch size is the session's Arrow setting.
    Scales are single divisions of exact ints — bit-identical across
    engines, no rounding boundary."""
    if callable(resizer):
        kernel = resizer
    elif resizer == "fake":

        def kernel(b: bytes, tw: int, th: int):
            in_w, in_h, ch, _ = _fake_decode(b)
            n_out = min(tw * th * ch, max_out_bytes)
            seed = hashlib.sha256(b + b"resize").digest()
            return in_w, in_h, ch, (seed * (n_out // len(seed) + 1))[:n_out]

    elif resizer == "png":
        from a2b_spark.operators.png import png_resizer

        kernel = png_resizer
    elif resizer == "jpeg":
        from a2b_spark.operators.jpeg import jpeg_resizer

        kernel = jpeg_resizer
    elif resizer == "real":
        raise NotImplementedError(
            "general resize needs codec libraries (PIL) not present in this "
            "environment; PNG and baseline JPEG payloads resize for real via "
            "resizer='png' / 'jpeg' (stdlib codecs, nearest-neighbor, "
            "operators/png.py + operators/jpeg.py); for other formats pass "
            "a resizer callable ((payload, w, h) -> (in_w, in_h, channels, "
            "out_payload)), or use resizer='fake' for plumbing tests"
        )
    else:
        raise ValueError(f"unknown resizer {resizer!r}")

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("scale_x", T.DoubleType()),
            T.StructField("scale_y", T.DoubleType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def resize_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s : s + batch_rows]
                rows = []
                for mid, payload in zip(chunk[id_col], chunk[bin_col]):
                    in_w, in_h, ch, out = kernel(
                        bytes(payload), target_w, target_h
                    )
                    rows.append(
                        (
                            int(mid),
                            target_w,
                            target_h,
                            int(ch),
                            target_w / in_w,
                            target_h / in_h,
                            bytes(out),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id",
                        "width",
                        "height",
                        "channels",
                        "scale_x",
                        "scale_y",
                        "payload",
                    ],
                )

    return _nonnull(df, id_col, bin_col).mapInPandas(resize_batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    every_n: int = 10,
    max_frames: int = 8,
    splitter: "str | Callable[[bytes, int, int], list]" = "fake",
) -> DataFrame:
    """Frame-sampling for video payloads: emits one row per sampled
    frame (media_id, frame_no, frame binary).

    ``splitter`` selects the container kernel:

    - ``"fake"`` (default): deterministic payload slices — the
      distributed plumbing with no container parse.
    - ``"mjpeg_avi"``: REAL frame extraction from MJPEG AVI containers
      (stdlib RIFF walk, operators/video.py) — every ``every_n``-th
      frame as a standalone baseline-JPEG payload, composable with
      ``decode_media(decoder="jpeg")`` on the exploded rows; non-MJPG
      codecs raise (ffmpeg formats go through the callable seam).
    - ``"gif"``: REAL frame extraction from animated GIFs (stdlib LZW
      codec, operators/gif.py) — frames re-encoded as standalone PNG
      payloads, composable with ``decode_media(decoder="png")``.
    - a CALLABLE ``(payload, every_n, max_frames) ->
      [(frame_no, frame_bytes)]``: dependency injection of a real
      demuxer (cloudpickled; import its libs inside the body)."""
    if callable(splitter):
        kernel = splitter
    elif splitter == "mjpeg_avi":
        from a2b_spark.operators.video import mjpeg_avi_splitter

        kernel = mjpeg_avi_splitter
    elif splitter == "gif":
        # animated-GIF frames re-encoded as standalone PNGs (GIF
        # frames are palette slices, not self-contained payloads)
        from a2b_spark.operators.gif import gif_frame_splitter

        kernel = gif_frame_splitter
    elif splitter == "fake":

        def kernel(b: bytes, every: int, cap: int):
            n = max(1, len(b) // max(every, 1))
            return [
                (i, b[i * every : (i + 1) * every]) for i in range(min(n, cap))
            ]

    else:
        raise ValueError(f"unknown splitter {splitter!r}")

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def split_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                for fno, frame in kernel(bytes(payload), every_n, max_frames):
                    rows.append((int(mid), int(fno), bytes(frame)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return _nonnull(df, id_col, bin_col).mapInPandas(split_batches, schema=out_schema)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        # DoubleType (images use float32): the audio features include
        # exact integral counts (zero crossings) and dyadic-rational
        # amplitudes the oracle recomputes — float32 would destroy them
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_audio_decode(payload: bytes, n_features: int = 4):
    """Deterministic stand-in for an audio codec (plumbing tests)."""
    h = hashlib.sha256(payload).digest()
    sr = 8000 * (1 + h[0] % 6)
    ch = 1 + h[1] % 2
    n = 256 + int.from_bytes(h[2:4], "big") % 4096
    feats = [round(b / 255.0, 6) for b in h[4 : 4 + n_features]]
    return sr, ch, n, feats


def decode_audio(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    decoder: "str | Callable[[bytes], tuple]" = "fake",
    n_features: int = 4,
    batch_rows: int = 64,
) -> DataFrame:
    """Audio twin of :func:`decode_media`: decode + featurize audio
    payloads via Arrow-batched mapInPandas → (media_id, sample_rate,
    channels, n_samples, features).

    ``decoder``: ``"fake"`` (deterministic plumbing stand-in),
    ``"wav"`` (REAL RIFF/PCM decode, stdlib codec in operators/wav.py
    — features are [duration_s, rms, zero_crossings, peak] over the
    mono mixdown), ``"real"`` (the torchaudio/ffmpeg seam —
    NotImplementedError in this container), or a CALLABLE
    ``bytes -> (sample_rate, channels, n_samples, features)``
    (cloudpickled to executors; import libs inside the body).

    Same memory bound as decode_media: output accumulates at most
    ``batch_rows`` rows per yield inside the kernel."""
    if callable(decoder):
        kernel = decoder
    elif decoder == "fake":
        kernel = lambda p: _fake_audio_decode(p, n_features)  # noqa: E731
    elif decoder == "wav":
        from a2b_spark.operators.wav import wav_decoder

        kernel = lambda p: wav_decoder(p, n_features)  # noqa: E731
    elif decoder == "real":
        raise NotImplementedError(
            "general audio decode needs codec libraries (torchaudio/ffmpeg) "
            "not present in this environment; RIFF/PCM WAV payloads decode "
            "for real via decoder='wav' (stdlib codec, operators/wav.py); "
            "for other formats pass a decoder callable "
            "(bytes -> (sample_rate, channels, n_samples, features)), or "
            "use decoder='fake' for plumbing tests"
        )
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s : s + batch_rows]
                rows = []
                for mid, payload in zip(chunk[id_col], chunk[bin_col]):
                    sr, ch, n, feats = kernel(bytes(payload))
                    rows.append(
                        (int(mid), int(sr), int(ch), int(n), [float(x) for x in feats])
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id",
                        "sample_rate",
                        "channels",
                        "n_samples",
                        "features",
                    ],
                )

    return _nonnull(df, id_col, bin_col).mapInPandas(
        decode_batches, schema=AUDIO_SCHEMA
    )


def audio_windows(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    window: int,
    hop: int,
    decoder: "str | Callable[[bytes, int, int], list]" = "wav",
    batch_rows: int = 64,
) -> DataFrame:
    """Fixed-size analysis windows over audio payloads (the audio twin
    of sample_frames): one row per (media_id, window_idx) with
    start_sample, rms, peak over the mono mixdown. Partial tail
    windows are dropped (their stats aren't comparable to full ones).

    ``decoder="wav"`` is the real stdlib codec; a CALLABLE
    ``(payload, window, hop) -> [(idx, start, rms, peak), ...]``
    injects any other format."""
    if callable(decoder):
        kernel = decoder
    elif decoder == "wav":
        from a2b_spark.operators.wav import wav_window_kernel

        kernel = wav_window_kernel
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("window_idx", T.IntegerType()),
            T.StructField("start_sample", T.LongType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.DoubleType()),
        ]
    )

    def window_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s : s + batch_rows]
                rows = []
                for mid, payload in zip(chunk[id_col], chunk[bin_col]):
                    for idx, start, rms, peak in kernel(bytes(payload), window, hop):
                        rows.append((int(mid), int(idx), int(start), rms, peak))
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "window_idx", "start_sample", "rms", "peak"],
                )

    return _nonnull(df, id_col, bin_col).mapInPandas(
        window_batches, schema=out_schema
    )
