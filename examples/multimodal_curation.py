"""Runnable example: a multimodal curation pass with REAL codecs.

    python examples/multimodal_curation.py

Demonstrates the crawl-shaped pipeline end-to-end on synthesized
payloads (all four stdlib codecs — PNG, baseline JPEG, GIF, WAV — plus
MJPEG-AVI video, gzip+HTML ingest, and BPE tokenization):

1. gzip'd HTML records → visible text (extract_web_text)
2. BPE: train merges on the extracted text, tokenize, count tokens
3. mixed-format image payloads → decode_media(decoder='auto')
4. animated GIF + MJPEG-AVI clips → sample_frames → per-frame decode
5. WAV clips → decode_audio features + audio_windows

Everything runs as DataFrame maps (Arrow-batched mapInPandas) — at
100 TB the same code fans out over the payload table's partitions;
nothing here collects, loops on the driver, or shuffles except the
BPE trainer's per-round aggregation over the distinct-word table.
"""

import gzip
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from a2b_spark import get_spark  # noqa: E402
from a2b_spark.operators.bpe import bpe_encode, bpe_train
from a2b_spark.operators.gif import encode_gif
from a2b_spark.operators.jpeg import encode_jpeg
from a2b_spark.operators.multimodal import (
    audio_windows,
    decode_audio,
    decode_media,
    sample_frames,
    with_media_metadata,
)
from a2b_spark.operators.png import encode_png
from a2b_spark.operators.video import encode_mjpeg_avi
from a2b_spark.operators.wav import encode_wav
from a2b_spark.operators.web import extract_web_text


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. crawl ingest: gzip'd HTML → text
    pages = [
        (i, bytearray(gzip.compress(
            f"<html><head><style>p{{}}</style></head><body>"
            f"<h1>page {i}</h1><p>the quick brown fox {i} &amp; friends</p>"
            f"<script>tracking()</script></body></html>".encode())))
        for i in range(50)
    ]
    raw = spark.createDataFrame(pages, "doc_id long, payload binary")
    text = extract_web_text(raw, "payload", "doc_id")
    print("ingest:", text.select("doc_id", "text").first())

    # ---- 2. tokenizer: train on the corpus, then tokenize it
    merges = bpe_train(text, "text", n_merges=25)
    print(f"bpe: learned {len(merges)} merges, first 5: {merges[:5]}")
    toks = bpe_encode(text, "text", merges, "doc_id")
    toks.selectExpr("avg(n_tokens) as avg_tokens").show()

    # ---- 3. images: mixed formats through one auto-dispatch decode
    def img(i):
        a = np.full((8 + i % 5, 8, 3), (i * 37) % 256, np.uint8)
        return [encode_png(a), encode_jpeg(a, quality=95), encode_gif(a)][i % 3]

    images = spark.createDataFrame(
        [(i, bytearray(img(i))) for i in range(30)],
        "media_id long, payload binary",
    )
    with_media_metadata(images, "payload").select("media_id", "meta").show(3, False)
    decode_media(images, "payload", "media_id", decoder="auto").groupBy(
        "channels"
    ).count().show()

    # ---- 4. video: container walk → frame explode → real JPEG decode
    clips = spark.createDataFrame(
        [
            (i, bytearray(encode_mjpeg_avi(
                [np.full((16, 16, 3), (i * 9 + 11 * f) % 256, np.uint8)
                 for f in range(4)], fps=8, quality=95)))
            for i in range(10)
        ],
        "media_id long, payload binary",
    )
    frames = sample_frames(
        clips, "payload", "media_id", every_n=2, max_frames=2, splitter="mjpeg_avi"
    )
    decode_media(frames, "frame", "media_id", decoder="jpeg").groupBy().agg(
        {"width": "sum", "media_id": "count"}
    ).show()

    # ---- 5. audio: WAV features + fixed-size analysis windows
    def wav(i):
        t = np.arange(4000)
        sig = (3000 * np.sign(np.sin(2 * np.pi * t / (20 + i)))).astype(np.int16)
        return encode_wav(sig[:, None], 8000)

    audio = spark.createDataFrame(
        [(i, bytearray(wav(i))) for i in range(10)],
        "media_id long, payload binary",
    )
    decode_audio(audio, "payload", "media_id", decoder="wav").show(3, False)
    audio_windows(audio, "payload", "media_id", window=512, hop=256).groupBy(
        "media_id"
    ).count().show(3)

    print("multimodal curation example complete")


if __name__ == "__main__":
    main()
