"""BPE merge-table interop — the standard ``vocab.json`` +
``merges.txt`` file layout (the HuggingFace ``tokenizers``/subword-nmt
BPE model format, GPT-2 lineage), so a tokenizer trained by
``bpe_train`` drives an external training run and an externally
trained merge table drives ``bpe_encode`` here.

Layout written/read:

- ``merges.txt``: ``#version: 0.2`` header, then one merge per line
  as ``<first> <second>`` in RANK ORDER (line position = rank — the
  format's contract; ``bpe_encode``'s greedy loop consumes exactly
  this ordering).
- ``vocab.json``: ``{token: id}``. Ids are assigned
  deterministically: the base alphabet sorted (codepoint order, the
  ``</w>`` terminator included), then each merge's output token in
  rank order (first occurrence wins when two merges produce the same
  string, e.g. ``(a,bc)`` and ``(ab,c)``).

Pure driver-side file IO on a model-sized table (merge lists are
10⁴-10⁵ entries) — nothing here touches an executor; the distributed
halves are ``bpe_train``/``bpe_encode`` (operators/bpe.py).

Reference scope: pure extension (the A2B reference has no tokenizer);
format parity is with the public GPT-2/HuggingFace artifact layout.
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Sequence

from a2b_spark.operators.bpe import _EOW

_HEADER = "#version: 0.2"


def _validate_symbol(sym: str, where: str) -> None:
    if not sym or " " in sym or "\n" in sym or "\r" in sym:
        raise ValueError(
            f"{where}: symbol {sym!r} is empty or contains whitespace — "
            "unrepresentable in the space-separated merges.txt format"
        )


def bpe_vocab(
    merges: Sequence[tuple[str, str]], alphabet: Iterable[str]
) -> dict[str, int]:
    """The deterministic ``{token: id}`` table for a merge list: base
    alphabet (sorted) first, then merge outputs in rank order."""
    vocab: dict[str, int] = {}
    for sym in sorted(set(alphabet) | {_EOW}):
        _validate_symbol(sym, "alphabet")
        vocab[sym] = len(vocab)
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def bpe_export(
    merges: Sequence[tuple[str, str]],
    out_dir: str,
    alphabet: Iterable[str],
) -> dict[str, int]:
    """Write ``merges.txt`` + ``vocab.json`` under ``out_dir`` and
    return the vocab. ``alphabet``: every base symbol the tokenizer
    can emit (pass the corpus' character set, e.g.
    ``bpe_alphabet(df, "text")``); the ``</w>`` terminator is always
    included. Writes are atomic per file (tmp + rename) so a crashed
    export never leaves a half-written artifact a trainer might load.
    """
    for a, b in merges:
        _validate_symbol(a, "merges")
        _validate_symbol(b, "merges")
    vocab = bpe_vocab(merges, alphabet)
    os.makedirs(out_dir, exist_ok=True)
    mp = os.path.join(out_dir, "merges.txt")
    vp = os.path.join(out_dir, "vocab.json")
    tmp = mp + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(_HEADER + "\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    os.replace(tmp, mp)
    tmp = vp + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False, indent=0)
    os.replace(tmp, vp)
    return vocab


def bpe_import(in_dir: str) -> tuple[list[tuple[str, str]], dict[str, int]]:
    """Read ``merges.txt`` + ``vocab.json`` from ``in_dir``; returns
    ``(merges, vocab)`` with merges in rank order, ready for
    ``bpe_encode``. Validates the artifact pair is coherent: every
    merge output and every merge INPUT symbol must be in the vocab
    (inputs are either base alphabet or earlier merge outputs — a
    merges.txt referencing tokens the vocab lacks is a mismatched
    export and would silently mis-tokenize downstream)."""
    mp = os.path.join(in_dir, "merges.txt")
    vp = os.path.join(in_dir, "vocab.json")
    with open(vp, encoding="utf-8") as f:
        vocab = json.load(f)
    if not isinstance(vocab, dict):
        raise ValueError(f"{vp}: expected a token->id object")
    merges: list[tuple[str, str]] = []
    with open(mp, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line or (ln == 1 and line.startswith("#version")):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(
                    f"{mp}:{ln}: expected '<first> <second>', got {line!r}"
                )
            merges.append((parts[0], parts[1]))
    missing = sorted(
        {tok for pair in merges for tok in (*pair, pair[0] + pair[1])}
        - set(vocab)
    )
    if missing:
        raise ValueError(
            f"{mp} references symbols absent from vocab.json "
            f"(mismatched artifact pair): {missing[:5]}"
            + ("…" if len(missing) > 5 else "")
        )
    return merges, vocab


def bpe_alphabet(df, text_col: str) -> list[str]:
    """The corpus' distinct character set — one distributed pass
    (explode chars → distinct → bounded collect: an alphabet is
    KB-sized even for full Unicode corpora)."""
    from pyspark.sql import functions as F

    rows = (
        df.select(F.explode(F.split(F.col(text_col), "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    )
    return sorted(r.c for r in rows if r.c != " ")


def bpe_encode_ids(
    df,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    vocab: dict[str, int],
    id_col: str,
    unk_id: int | None = None,
):
    """(doc_id, token_ids array<int>, n_tokens): ``bpe_encode`` with
    the vocab applied — the integer stream a training run consumes.
    Tokens absent from the vocab (possible only when the alphabet
    passed at export time missed corpus characters) map to ``unk_id``
    when given, else raise AT EXECUTION with the offending token (a
    silent drop would desync token counts from packing budgets)."""
    from a2b_spark.operators.bpe import bpe_encode

    toks = bpe_encode(df, text_col, merges, id_col)

    # vocab rides the closure of one Arrow-batched map — same shape
    # as the encoder itself; ids are emitted as a primitive int array
    def to_ids(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for did, tk, n in zip(
                pdf["doc_id"], pdf["tokens"], pdf["n_tokens"]
            ):
                ids = []
                for t in tk:
                    i = vocab.get(t, unk_id)
                    if i is None:
                        raise ValueError(
                            f"token {t!r} not in vocab and no unk_id set "
                            "(was the export alphabet complete?)"
                        )
                    ids.append(i)
                rows.append((int(did), ids, int(n)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "token_ids", "n_tokens"]
            )

    return toks.mapInPandas(
        to_ids, schema="doc_id long, token_ids array<int>, n_tokens long"
    )
