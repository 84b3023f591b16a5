"""Train a BPE tokenizer on a parquet corpus and export the standard
vocab.json + merges.txt artifact pair (operators/bpe_io.py).

    python tools/train_bpe.py --input /data/documents.parquet \
        --out /data/tokenizer --merges 500 [--text-col text]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--merges", type=int, default=500)
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-pair-count", type=int, default=2)
    args = p.parse_args(argv)

    from a2b_spark.operators.bpe import bpe_train
    from a2b_spark.operators.bpe_io import bpe_alphabet, bpe_export
    from a2b_spark.session import get_spark

    spark = get_spark("bpe_train")
    docs = spark.read.parquet(args.input)
    merges = bpe_train(
        docs, args.text_col, args.merges, min_pair_count=args.min_pair_count
    )
    vocab = bpe_export(
        merges, args.out, bpe_alphabet(docs, args.text_col)
    )
    print(
        f"wrote {args.out}/merges.txt ({len(merges)} merges) and "
        f"vocab.json ({len(vocab)} tokens)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
