"""Unicode canonicalization — functions/unicode.py."""

import pytest
from pyspark.sql import functions as F

from a2b_spark.functions.unicode import nfc, unicode_normalize

CASES = [
    # (raw, nfc, nfkc)
    ("e\u0301", "é", "é"),  # combining acute composes
    ("u\u0308", "\u00fc", "\u00fc"),
    ("é", "é", "é"),  # already composed: stable
    ("\ufb01", "\ufb01", "fi"),  # fi ligature: NFKC-only fold
    ("\uff21", "\uff21", "A"),  # fullwidth A: NFKC-only fold
    ("ascii only", "ascii only", "ascii only"),
    ("", "", ""),
]


def test_nfc_and_nfkc(spark):
    df = spark.createDataFrame(
        [(i, r) for i, (r, _, _) in enumerate(CASES)], "i int, s string"
    )
    out = {
        r.i: (r.c, r.k)
        for r in df.select(
            "i",
            nfc("s").alias("c"),
            unicode_normalize("s", "NFKC").alias("k"),
        ).collect()
    }
    for i, (_, want_c, want_k) in enumerate(CASES):
        assert out[i] == (want_c, want_k), (i, CASES[i], out[i])


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "i int, s string")
    assert df.select(nfc("s").alias("c")).collect()[0].c is None


def test_idempotent(spark):
    df = spark.createDataFrame(
        [(i, r) for i, (r, _, _) in enumerate(CASES)], "i int, s string"
    )
    twice = df.select(nfc(nfc("s")).alias("a"), nfc("s").alias("b"))
    assert twice.filter(~F.col("a").eqNullSafe(F.col("b"))).count() == 0


def test_rejects_bad_form():
    with pytest.raises(ValueError, match="form"):
        unicode_normalize("s", "NFX")
