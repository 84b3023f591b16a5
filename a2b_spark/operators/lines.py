"""Line-level boilerplate detection and removal — the C4 move
(Raffel et al. 2020: lines repeated across documents — navbars, cookie
banners, license headers — are dropped from every document; C4 removed
any line occurring more than once in the corpus at three-sentence
granularity, Gopher and RefinedWeb run the same pass at line level).

Scale design (100 TB):
- One posexplode pass over the corpus: (doc, pos, line). In the
  removal pipeline the line STRING never rides the counting shuffle —
  only its md5 digest (the audit view keeps one representative string
  per digest and pays for it; that is what ``representative=True``
  buys, and the pipeline never sets it).
- Boilerplate = line digests whose DISTINCT-document count reaches
  ``min_docs``: one (digest, doc) distinct + one count agg — two hash
  shuffles on the digest, map-side combined, no windows.
- Removal = anti join of the exploded lines against the boilerplate
  digest set. At C4's canonical ``min_docs=2`` over a crawl the set is
  NOT guaranteed tiny (billions of digests are possible), so the
  broadcast is count-gated: ``broadcast="auto"`` checkpoints the set,
  counts it, and hints broadcast only under ``broadcast_max_digests``;
  past the gate the anti join shuffles both sides on the digest.
  ``"force"`` (the streaming twin's frozen, known-small set) skips the
  count; ``"never"`` leaves the decision entirely to AQE. Reassembly
  is sort_array over (pos, line) structs — bounded by document length,
  never a hot-key window.
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
    representative: bool = True,
) -> DataFrame:
    """Lines appearing in at least ``min_docs`` DISTINCT documents.
    Blank lines are structural, not boilerplate: excluded.

    ``representative=True`` (the audit view — what WOULD be removed)
    returns (line, n_docs), carrying one representative string per
    digest through the counting shuffle. ``representative=False`` (the
    removal pipeline's counting path) returns (lh, n_docs) with only
    the 16-byte md5 digest ever riding a shuffle — at corpus scale
    that is the difference between shuffling digests and shuffling the
    corpus; feed it to :func:`strip_lines` via ``digest_col="lh"``."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    lines = _lines(df, text_col, id_col, sep).filter(F.col("line") != "")
    if not representative:
        per_doc = lines.select(
            F.md5("line").alias("lh"), F.col(id_col)
        ).distinct()
        return (
            per_doc.groupBy("lh")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs)
            .select("lh", "n_docs")
        )
    # audit path: the line string crosses the shuffle once (inside the
    # struct distinct) so the view can show WHAT matched, not just a hash
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
    digest_col: str | None = None,
    broadcast: str = "auto",
    broadcast_max_digests: int = 2_000_000,
) -> DataFrame:
    """``df`` with ``text_col`` rebuilt minus every line that EXACTLY
    matches a ``boilerplate_df`` entry — the shared removal kernel:
    the batch operator derives the set from the corpus itself; the
    streaming twin ships a FROZEN set against every micro-batch.
    Documents whose every line is boilerplate survive with empty text
    — dropping documents is a separate policy decision (compose with
    a length filter). Line order and the separator are preserved
    exactly; empty boilerplate entries are ignored (blank lines are
    structure).

    The set is matched by ``line_col`` strings unless ``digest_col``
    names a column of precomputed md5(line) digests (the counting path
    of :func:`boilerplate_lines` — keeps line strings off every
    shuffle). ``broadcast`` gates the anti join's build side: the set
    is corpus-derived and UNBOUNDED (C4's min_docs=2 on a crawl yields
    billions of digests), so ``"auto"`` checkpoints + counts it and
    hints broadcast only when it holds ≤ ``broadcast_max_digests``
    entries, falling back to a shuffled anti join past the gate;
    ``"force"`` hints unconditionally (for a set the CALLER knows is
    small, e.g. the streaming twin's frozen set — no counting job per
    micro-batch); ``"never"`` leaves the strategy to AQE's size
    estimate. All three produce identical output."""
    if broadcast not in ("auto", "force", "never"):
        raise ValueError(
            f"broadcast must be auto|force|never, got {broadcast!r}"
        )
    lines = _lines(df, text_col, id_col, sep)
    if digest_col is not None:
        bp = boilerplate_df.select(F.col(digest_col).alias("lh")).distinct()
    else:
        bp = (
            boilerplate_df.filter(F.col(line_col) != "")
            .select(F.md5(line_col).alias("lh"))
            .distinct()
        )
    if broadcast == "auto":
        # pin the (possibly corpus-derived) set so the gating count and
        # the join read the same materialization instead of recomputing
        # the counting aggregation twice
        bp = bp.localCheckpoint(eager=True)
        if bp.count() <= broadcast_max_digests:
            bp = bp.hint("broadcast")
    elif broadcast == "force":
        bp = bp.hint("broadcast")
    kept = lines.join(
        bp,
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
    composition of :func:`boilerplate_lines` + :func:`strip_lines`,
    wired digest-to-digest: line strings never ride the counting
    shuffle, and the broadcast stays count-gated."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    return strip_lines(
        df,
        text_col,
        id_col,
        boilerplate_lines(
            df, text_col, id_col, min_docs, sep, representative=False
        ),
        sep=sep,
        digest_col="lh",
    )
