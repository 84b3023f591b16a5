"""Web-crawl ingest operators: gzip member decompression and HTML →
text extraction — the first two steps of every crawl-derived training
corpus (WARC/WET records are gzip members wrapping HTML), stdlib-only.

Both are Arrow-batched ``mapInPandas`` kernels (1:N-safe: undecodable
payloads can be dropped or errored per policy) — the Python boundary
is unavoidable (Spark has no gzip/HTML built-ins) but stays
vectorized at the batch level with bounded output accumulation, the
same discipline as the codec operators.

HTML extraction uses ``html.parser`` (stdlib, tolerant of real-world
tag soup): script/style/template/head subtrees are dropped, character
and entity references resolve (convert_charrefs), text nodes join
with single spaces and whitespace collapses — a deterministic
transform both engines of an oracle can agree on when the INPUT is
rule-derived (q161 recomputes the expected text from the generation
rule, never by parsing in SQL — the PORTING.md regex lesson).

Scale: one payload per row, Arrow-batched; no shuffle is introduced —
extraction is a map, so it pipelines into whatever scan feeds it and
whatever dedup/quality stage follows. At 100 TB the parallelism is
the partition count of the payload table; nothing here collects,
sorts, or joins.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DROP_SUBTREES = frozenset({"script", "style", "template", "head"})
# void elements never get close tags; a naive depth counter would
# otherwise wedge the dropper open on e.g. <style><br></style>
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


def html_to_text(html: str) -> str:
    """Deterministic HTML → visible text: script/style/template/head
    subtrees dropped, charrefs resolved, whitespace collapsed to
    single spaces. Tolerant of tag soup (stdlib HTMLParser never
    raises on malformed markup)."""
    from html.parser import HTMLParser

    class _X(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.depth = 0
            self.parts: list[str] = []

        def handle_starttag(self, tag, attrs):
            if tag in _DROP_SUBTREES and tag not in _VOID:
                self.depth += 1

        def handle_endtag(self, tag):
            if tag in _DROP_SUBTREES and self.depth:
                self.depth -= 1

        def handle_data(self, data):
            if not self.depth and data:
                self.parts.append(data)

    p = _X()
    p.feed(html)
    p.close()
    return " ".join("".join(p.parts).split())


def gunzip_bytes(payload: bytes) -> bytes:
    """First gzip member → bytes (WARC convention: one record per
    member). Non-gzip input raises ValueError."""
    import gzip

    if bytes(payload[:2]) != b"\x1f\x8b":
        raise ValueError("not gzip (bad magic)")
    try:
        return gzip.decompress(payload)
    except (OSError, EOFError) as e:
        raise ValueError(f"corrupt gzip member: {e}") from e


def decompress_bytes(payload: bytes, codec: str = "auto") -> bytes:
    """Stdlib decompression for the dump formats crawls actually ship
    in: gzip (WARC/WET), bz2 (Wikipedia dumps), xz/lzma. ``"auto"``
    sniffs the magic bytes; unknown magic or a corrupt stream raises
    ValueError (the drop/fail policy upstream decides what that means
    for the row)."""
    payload = bytes(payload)
    if codec == "auto":
        if payload[:2] == b"\x1f\x8b":
            codec = "gzip"
        elif payload[:3] == b"BZh":
            codec = "bz2"
        elif payload[:6] == b"\xfd7zXZ\x00":
            codec = "xz"
        else:
            raise ValueError(
                f"unknown compression magic {payload[:4]!r} "
                "(auto knows gzip/bz2/xz)"
            )
    if codec == "gzip":
        return gunzip_bytes(payload)
    if codec == "bz2":
        import bz2

        try:
            return bz2.decompress(payload)
        except (OSError, ValueError, EOFError) as e:
            raise ValueError(f"corrupt bz2 stream: {e}") from e
    if codec == "xz":
        import lzma

        try:
            return lzma.decompress(payload)
        except (lzma.LZMAError, EOFError) as e:
            raise ValueError(f"corrupt xz stream: {e}") from e
    raise ValueError(f"unknown codec {codec!r} (gzip/bz2/xz/auto)")


def extract_web_text(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    gzipped: bool = True,
    encoding: str = "utf-8",
    on_error: str = "drop",
    batch_rows: int = 256,
) -> DataFrame:
    """The crawl-ingest map: (id, payload) → (doc_id, text, n_bytes,
    n_chars). ``gzipped=True`` decompresses each payload first
    (magic-sniffed gzip/bz2/xz — WARC/WET members, Wikipedia bz2
    dumps); bytes decode with ``encoding`` (errors='replace' — crawl
    charsets lie, and a hard failure on one page must not kill a
    100 TB job) and HTML reduces to visible text via html_to_text.

    ``on_error``: 'drop' skips undecodable payloads (the curation
    default — a bad record is data loss of one row, not a job abort);
    'fail' re-raises (the debugging mode)."""
    if on_error not in ("drop", "fail"):
        raise ValueError(f"unknown on_error {on_error!r}")

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s : s + batch_rows]
                rows = []
                for did, payload in zip(chunk[id_col], chunk[payload_col]):
                    try:
                        raw = bytes(payload)
                        if gzipped:
                            raw = decompress_bytes(raw, "auto")
                        text = html_to_text(raw.decode(encoding, errors="replace"))
                    except ValueError:
                        if on_error == "fail":
                            raise
                        continue
                    rows.append((int(did), text, len(raw), len(text)))
                yield pd.DataFrame(
                    rows, columns=["doc_id", "text", "n_bytes", "n_chars"]
                )

    return (
        df.select(id_col, payload_col)
        .filter(F.col(id_col).isNotNull() & F.col(payload_col).isNotNull())
        .mapInPandas(batches, schema=out_schema)
    )
