"""Line-level boilerplate detection and removal — the C4 move
(Raffel et al. 2020: lines repeated across documents — navbars, cookie
banners, license headers — are dropped from every document; C4 removed
any line occurring more than once in the corpus at three-sentence
granularity, Gopher and RefinedWeb run the same pass at line level).

Scale design (100 TB):
- One posexplode pass over the corpus: (doc, pos, line). The line
  STRING never rides the counting shuffle — only its md5 digest.
- Boilerplate = line digests whose DISTINCT-document count reaches
  ``min_docs``: one (digest, doc) distinct + one count agg — two hash
  shuffles on the digest, map-side combined, no windows.
- Removal = anti join of the exploded lines against the boilerplate
  digest set (tiny by definition — boilerplate is the head of the
  line-frequency distribution; AQE broadcasts it), then per-document
  reassembly via sort_array over (pos, line) structs — bounded by
  document length, never a hot-key window.
- Deterministic: exact string equality on lines, exact counts; no
  sampling, no hashing collisions beyond md5 (the repo-wide accepted
  128-bit space).

Reference parity: the reference engine has no text surface; this is
the training-data-pipeline extension tier (SURVEY §2 additions).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(df: DataFrame, text_col: str, id_col: str, sep: str) -> DataFrame:
    """(id, pos, line): the document split on the LITERAL ``sep``
    (escaped before it reaches split's regex parameter — reassembly
    joins with the same literal, so split/join must agree) with
    0-based positions. Empty/NULL text yields one empty line at pos 0
    (split never returns an empty array), so every input doc survives
    reassembly."""
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(sep))
        ).alias("pos", "line"),
    )


def boilerplate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """(line, n_docs) for every line appearing in at least ``min_docs``
    DISTINCT documents — the audit view (what WOULD be removed).
    Blank lines are structural, not boilerplate: excluded."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    lines = _lines(df, text_col, id_col, sep).filter(F.col("line") != "")
    # digest-keyed distinct + count: the line string crosses the
    # shuffle once (inside the struct distinct), the count agg runs on
    # digests; keep one representative string per digest for the audit
    per_doc = lines.select(
        F.md5("line").alias("lh"), F.col("line"), F.col(id_col)
    ).distinct()
    return (
        per_doc.groupBy("lh")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("line").alias("line"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select("line", "n_docs")
    )


def strip_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    boilerplate_df: DataFrame,
    line_col: str = "line",
    sep: str = "\n",
) -> DataFrame:
    """``df`` with ``text_col`` rebuilt minus every line that EXACTLY
    matches a ``boilerplate_df.line_col`` entry — the shared removal
    kernel: the batch operator derives the set from the corpus itself;
    the streaming twin ships a FROZEN set against every micro-batch.
    Documents whose every line is boilerplate survive with empty text
    — dropping documents is a separate policy decision (compose with
    a length filter). Line order and the separator are preserved
    exactly; empty boilerplate entries are ignored (blank lines are
    structure)."""
    lines = _lines(df, text_col, id_col, sep)
    bp = (
        boilerplate_df.filter(F.col(line_col) != "")
        .select(F.md5(line_col).alias("lh"))
        .distinct()
    )
    kept = lines.join(
        bp.hint("broadcast"),
        F.md5(F.col("line")) == F.col("lh"),
        "left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias("__rebuilt")
    )
    keep_cols = [c for c in df.columns if c != text_col]
    # LEFT join + coalesce: a doc whose EVERY line was boilerplate has
    # no kept rows at all — it must come back empty, not vanish (the
    # survive-with-empty-text contract above)
    return (
        df.select(*keep_cols)
        .join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col("__rebuilt"), F.lit("")))
        .drop("__rebuilt")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """``df`` with ``text_col`` rebuilt minus every line that appears
    in at least ``min_docs`` distinct documents (exact string match,
    blank lines never count as boilerplate) — the corpus-derived
    composition of :func:`boilerplate_lines` + :func:`strip_lines`."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    return strip_lines(
        df,
        text_col,
        id_col,
        boilerplate_lines(df, text_col, id_col, min_docs, sep),
        sep=sep,
    )
