"""Document chunking — the split step every LLM training pipeline runs
between curation and tokenization: long documents become fixed-width
overlapping windows sized to the model's context budget.

Scale shape: pure Catalyst — a staged start-offset array (``sequence``
behind a projection boundary, the engine's explode-inlining
discipline), one ``explode``, and a ``substr`` per chunk. No shuffle at
all: chunking is embarrassingly row-parallel, each output partition is
a function of one input partition, and the text payload is read once
per document (the substr runs against the same row's string — nothing
is replicated across the cluster). At 100 TB this runs at scan speed
and the output is ~``1/(1-overlap/size)``× the input bytes, which is
the user's explicit knob.

Reference parity: the reference has no chunker (row-at-a-time PHP
migrations move whole entities); this is part of the training-data
surface BASELINE.json scopes in ("documents/embeddings tables").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    size: int = 2048,
    overlap: int = 0,
) -> DataFrame:
    """Split ``text_col`` into windows of ``size`` characters starting
    every ``size - overlap`` characters. Emits one row per chunk:
    (``id_col``, chunk_id, chunk_start, chunk_text, chunk_chars), where
    chunk_start is the 0-based character offset and chunk_id its rank.

    Boundary contract (deterministic, engine-portable):

    - empty/null texts produce no chunks (there is nothing to train on,
      and ``sequence(0, -1)`` is undefined);
    - a trailing window is emitted only if it contains at least one
      character beyond the previous window's overlap region
      (``start = 0`` or ``start + overlap < length``) — otherwise it
      would be a strict suffix of the previous chunk and a pure
      duplicate in the training set.

    Character-based (not token-based) by design: offsets are exact,
    reproducible, and cheap at scan time; token-budget accounting is a
    separate concern (see ``functions.text.bpe_ish_tokens``).
    """
    if overlap < 0 or overlap >= size:
        raise ValueError(f"need 0 <= overlap < size, got size={size} overlap={overlap}")
    stride = size - overlap
    ln = F.length(F.col(text_col))
    # Stage the start array behind a projection, THEN explode: plain
    # explode over an inline sequence() gets the generator rewritten
    # with the sequence re-evaluated per generated row (the explode
    # pathology; see operators/dedup.py) — staging keeps it O(L).
    staged = df.filter(ln > 0).select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        ln.alias("__ln"),
        F.sequence(F.lit(0), ln - 1, F.lit(stride)).alias("__starts"),
    )
    # explode_OUTER: sidesteps the size-filter rewrite that inlines
    # the generator expression per output row (the engine's explode
    # pathology); arrays are non-empty by the ln > 0 filter, so outer
    # adds no rows and the null guard below is a no-op in practice.
    exploded = staged.select(
        id_col,
        "__text",
        "__ln",
        F.explode_outer("__starts").alias("__s"),
    ).filter(
        F.col("__s").isNotNull()
        & ((F.col("__s") == 0) | (F.col("__s") + overlap < F.col("__ln")))
    )
    chunk = F.col("__text").substr(F.col("__s") + 1, F.lit(size))
    return exploded.select(
        id_col,
        (F.col("__s") / stride).cast("int").alias("chunk_id"),
        F.col("__s").cast("long").alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_chars"),
    )
