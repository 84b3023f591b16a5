"""Crawl-ingest operators (operators/web.py): HTML → text extraction
determinism (subtree drops, entities, tag soup, void elements), gzip
member handling, error policies, and the Spark e2e."""

import gzip

import pytest

from a2b_spark.operators.web import extract_web_text, gunzip_bytes, html_to_text


def test_html_to_text_basics():
    html = (
        "<html><head><title>T</title><style>p{x}</style></head>\n"
        "<body><h1>Doc 3</h1>\n<p>alpha &amp; beta</p>\n"
        "<script>var x = 'hidden';</script>\n<p>gamma</p></body></html>"
    )
    assert html_to_text(html) == "Doc 3 alpha & beta gamma"


def test_subtree_drop_survives_void_elements_and_nesting():
    # <br> inside <style> must not unbalance the depth counter
    assert html_to_text("<style>a<br>b</style>visible") == "visible"
    assert html_to_text("<head><script>x</script>y</head>z") == "z"
    # unclosed dropped tag swallows to EOF (tag-soup tolerance, no raise)
    assert html_to_text("<script>everything") == ""
    # stray close tags are ignored
    assert html_to_text("</style>ok</head>") == "ok"


def test_entities_and_whitespace_collapse():
    # &nbsp; resolves to \xa0, which str.split() treats as whitespace —
    # so it collapses like any other run (the desired normalization)
    assert html_to_text("a&nbsp;&lt;b&gt;   c\n\n\td") == "a <b> c d"
    assert html_to_text("x&#65;y") == "xAy"


def test_gunzip_contract():
    assert gunzip_bytes(gzip.compress(b"payload")) == b"payload"
    with pytest.raises(ValueError, match="bad magic"):
        gunzip_bytes(b"<html>plain</html>")
    with pytest.raises(ValueError, match="corrupt gzip"):
        gunzip_bytes(gzip.compress(b"payload")[:-3])


def test_decompress_auto_sniffs_all_stdlib_codecs():
    import bz2
    import lzma

    from a2b_spark.operators.web import decompress_bytes

    for blob in (
        gzip.compress(b"dump"),
        bz2.compress(b"dump"),
        lzma.compress(b"dump"),
    ):
        assert decompress_bytes(blob) == b"dump"
    assert decompress_bytes(bz2.compress(b"x"), codec="bz2") == b"x"
    with pytest.raises(ValueError, match="unknown compression magic"):
        decompress_bytes(b"ZSTD\x28\xb5")
    with pytest.raises(ValueError, match="corrupt bz2"):
        decompress_bytes(bz2.compress(b"dump")[:-4])
    with pytest.raises(ValueError, match="corrupt xz"):
        decompress_bytes(lzma.compress(b"dump")[:-4])
    with pytest.raises(ValueError, match="unknown codec"):
        decompress_bytes(b"", codec="zstd")


def test_extract_web_text_spark(spark):
    rows = []
    for i in range(12):
        html = f"<html><body>\n<p>doc {i} &amp; text</p>\n</body></html>"
        payload = gzip.compress(html.encode()) if i % 2 == 0 else b"\xff broken"
        rows.append((i, bytearray(payload)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    out = extract_web_text(df, "payload", "doc_id").collect()
    # on_error='drop': the 6 broken payloads vanish, the job survives
    assert sorted(r["doc_id"] for r in out) == [0, 2, 4, 6, 8, 10]
    for r in out:
        assert r["text"] == f"doc {r['doc_id']} & text"
        assert r["n_chars"] == len(r["text"])

    with pytest.raises(Exception, match="unknown compression magic"):
        extract_web_text(df, "payload", "doc_id", on_error="fail").collect()
    with pytest.raises(ValueError, match="unknown on_error"):
        extract_web_text(df, "payload", "doc_id", on_error="ignore")

    # ungzipped path + replacement decoding never aborts
    plain = spark.createDataFrame(
        [(1, bytearray("<p>caf\xe9</p>".encode("latin-1")))],
        "doc_id long, payload binary",
    )
    r = extract_web_text(plain, "payload", "doc_id", gzipped=False).collect()[0]
    assert r["text"] == "caf�"
