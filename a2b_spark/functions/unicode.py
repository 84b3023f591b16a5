"""Unicode canonicalization — the one text function that genuinely
cannot be a Catalyst expression (Spark has no NFC/NFKC builtin), kept
out of `functions/text.py` so that module's no-Python-UDF charter
stays true.

Every real crawl corpus mixes composed and decomposed forms of the
same grapheme ('é' vs 'e'+U+0301); exact dedup, fingerprinting, and
tokenization all silently fracture on the distinction, so curation
pipelines normalize to NFC (or NFKC for compatibility folding —
ligatures, fullwidth forms) before any hashing. Implemented as an
Arrow-batched pandas UDF (`unicodedata.normalize`, the stdlib's
table-driven implementation): the batch transfer is the cost, the
per-string normalization is C-speed, and ASCII-only batches are
near-free (NFC of ASCII is the identity). DuckDB oracle twin:
``nfc_normalize``.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def unicode_normalize(col, form: str = "NFC") -> Column:
    """Column expression: ``form``-normalized text (None passes
    through). Arrow-batched; see module docstring for why this is the
    sanctioned Python boundary."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm(col if isinstance(col, Column) else F.col(col))


def nfc(col) -> Column:
    """NFC canonicalization — the curation-pipeline default."""
    return unicode_normalize(col, "NFC")
