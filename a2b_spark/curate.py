"""``python -m a2b_spark.curate`` — the corpus-curation CLI.

The command-line face of the training-data pipeline (the analogue of
the reference's migrate command for its domain): point it at a
documents parquet, pick stages, get curated shards plus a stats JSON.

    python -m a2b_spark.curate \
        --input /data/documents.parquet --output /data/curated \
        --stages nfc,quality,perplexity,classifier,dedup,neardup,shard \
        --min-tokens 5 --ppl-margin 0.6 --shards 64 --salt export-v1

Stages (any subset, applied in canonical order regardless of the
order given):

- ``nfc``         Unicode NFC canonicalization (before any hashing)
- ``quality``     token-count floor (``--min-tokens``)
- ``perplexity``  corpus-trained trigram stupid-backoff LM; drop docs
                  whose per-token mean log10 prob falls ``--ppl-margin``
                  below the TOKEN-WEIGHTED corpus mean (CCNet shape);
                  the comparison is exact decimal arithmetic, so the
                  surviving set is engine- and partition-invariant
- ``classifier``  frozen bag-of-words linear quality model (pass
                  ``--clf-vocab``/``--clf-weights``; train one with
                  ``operators.classifier.bow_logreg_train``); keeps
                  docs with exact-decimal score z ≥ ``--clf-threshold``
- ``linedup``     C4-style cross-document line dedup: lines appearing
                  in ≥ ``--line-min-docs`` distinct documents (cookie
                  banners, navbars, license headers) are stripped from
                  every document; order/blank structure preserved
- ``decontam``    train/eval decontamination (the GPT-3 n-gram
                  overlap rule): drop every doc sharing a word
                  ``--decontam-n``-gram with the benchmark parquet at
                  ``--decontam-benchmark`` (normalized with the same
                  NFC pass when the nfc stage is enabled — grams must
                  compare like-with-like)
- ``dedup``       exact dedup on the normalized-text fingerprint
- ``neardup``     MinHash-LSH near-dup pairs; higher doc_id loses
- ``domaincap``   per-domain contribution cap (RefinedWeb/C4): keep at
                  most ``--domain-cap`` docs per ``--domain-col`` value
                  under the deterministic salted draw (runs after the
                  dedup stages so survivors, not duplicates, spend the
                  quota)
- ``shard``       deterministic shuffle-shard export (salted md5 —
                  reproducible on any cluster size)

Every stage is deterministic (salted hashes + exact decimals, no
``rand()``): re-running the command on the same input produces
byte-identical shard membership and order. Output:
``<output>/shard=N/*.parquet`` plus ``<output>/_curation_stats.json``
with per-stage surviving-document counts.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

STAGE_ORDER = (
    "nfc", "linedup", "quality", "perplexity", "classifier", "decontam",
    "dedup", "neardup", "domaincap", "shard",
)


def run_curation(
    spark,
    input_path: str,
    output_path: str,
    stages: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    ppl_margin: float = 0.6,
    lm_order: int = 3,
    n_shards: int = 16,
    salt: str = "export-v1",
    clf_vocab: Sequence[str] | None = None,
    clf_weights: Sequence[str] | None = None,
    clf_bias: str = "0",
    clf_threshold: str = "0",
    decontam_benchmark: Optional[str] = None,
    decontam_n: int = 8,
    line_min_docs: int = 16,
    domain_col: str = "source",
    domain_cap: int = 10_000,
) -> dict:
    """Programmatic entry — the CLI is a thin argparse wrapper. Returns
    the per-stage stats dict (also written next to the output)."""
    from pyspark.sql import functions as F

    unknown = set(stages) - set(STAGE_ORDER)
    if unknown:
        raise ValueError(
            f"unknown stage(s) {sorted(unknown)}; valid: {list(STAGE_ORDER)}"
        )
    # The overwrite-mode write would clobber the source while the lazy
    # pipeline may still need to scan it — corrupting the job with the
    # input destroyed. Resolve both paths and reject equal/nested.
    in_abs = os.path.abspath(input_path)
    out_abs = os.path.abspath(output_path)
    if (
        out_abs == in_abs
        or out_abs.startswith(in_abs + os.sep)
        or in_abs.startswith(out_abs + os.sep)
    ):
        raise ValueError(
            f"output path {output_path!r} overlaps input path "
            f"{input_path!r}; an overwrite write would destroy the "
            "source mid-job — choose a disjoint output directory"
        )
    docs = spark.read.parquet(input_path)
    for col in (id_col, text_col):
        if col not in docs.columns:
            raise ValueError(f"input lacks required column {col!r}")
    stats = {"input": docs.count()}

    if "nfc" in stages:
        from a2b_spark.functions.unicode import nfc

        docs = docs.withColumn(text_col, nfc(text_col))

    if "linedup" in stages:
        from a2b_spark.operators.lines import remove_boilerplate_lines

        # a REWRITE stage, not a filter: doc count is unchanged, but
        # every later stage (token floors, LM, fingerprints) must see
        # the cleaned text — hence its place right after nfc
        # lazy checkpoint + count: the count is the single
        # materializing action (no concurrent consumers until it
        # returns), so each stage pays ONE job, not a materialize job
        # plus a count job — the fan-out-frame discipline still holds
        # because everything after reads the pinned blocks
        docs = remove_boilerplate_lines(
            docs, text_col, id_col, min_docs=line_min_docs
        ).localCheckpoint(eager=False)
        stats["linedup"] = docs.count()

    if "quality" in stages:
        from a2b_spark.functions.text import quality_features

        qf = quality_features(F.col(text_col))
        # eager pin after each filtering stage (the repo's fan-out-
        # frame discipline): per-stage counts and every later stage
        # otherwise re-run the whole upstream lineage — NFC's Arrow
        # UDF and the LM join cascade once per remaining stage
        docs = docs.filter(qf["n_words"] >= min_tokens).localCheckpoint(
            eager=False
        )
        stats["quality"] = docs.count()

    if "perplexity" in stages:
        from decimal import Decimal

        from a2b_spark.operators.lm import ngram_lm_train, stupid_backoff_logp

        model = ngram_lm_train(docs, text_col, order=lm_order)
        scored = stupid_backoff_logp(
            docs.select(id_col, text_col),
            model,
            id_col,
            text_col,
            order=lm_order,
            broadcast_model=True,
        )
        # pin the scores: the scoring cascade (per-position explode +
        # `order` joins) is the chain's most expensive segment and has
        # TWO consumers — the corpus-total aggregate right below and
        # the keep semi-join. Unpinned it runs twice. The pinned rows
        # are tiny (id, sum_logp10, n_tok); the total aggregate is the
        # single materializing action.
        scored = scored.localCheckpoint(eager=False)
        # EXACT thresholding (round-12): the corpus reference is the
        # token-weighted mean T = Σ sum_logp10 / Σ n_tok, and a doc
        # survives iff its per-token mean s/n >= T - margin. Both
        # sides multiply through by the (positive) denominators —
        #   s_i * Σn  >=  (Σs - margin * Σn) * n_i
        # — so the whole decision is exact decimal×integer arithmetic:
        # no float mean-of-means whose summation order could flip a
        # boundary doc between engines or between runs. The 1-row agg
        # is the only driver pull.
        tot = scored.agg(
            F.sum("sum_logp10").alias("s"), F.sum("n_tok").alias("n")
        ).first()
        n_total = int(tot["n"] or 0)
        if n_total > 0:
            # Decimal(str(float)) pins the margin to its shortest-repr
            # literal — the same constant an SQL twin embeds
            rhs = Decimal(str(tot["s"])) - Decimal(str(ppl_margin)) * n_total
            # compare on the NATIVE decimal(28,6) — a downcast (the old
            # decimal(20,6)) could overflow to NULL past 14 integer
            # digits and silently drop the doc, violating never-drop;
            # both products land in decimal(38,6) (scale preserved by
            # Spark's precision-loss rule), integer capacity 1e32 —
            # far above any real corpus's s_i*Σn
            keep = scored.filter(
                (F.col("n_tok") == 0)
                | F.col("sum_logp10").isNull()
                | (
                    F.col("sum_logp10") * F.lit(n_total)
                    >= F.lit(str(rhs)).cast("decimal(28,6)")
                    * F.col("n_tok")
                )
            ).select(id_col)
            # NULL/zero-token docs were never judged by this criterion —
            # the operator's never-drop contract carries through
            docs = docs.join(keep, id_col, "left_semi")
        docs = docs.localCheckpoint(eager=False)
        stats["perplexity"] = docs.count()

    if "classifier" in stages:
        from decimal import Decimal

        from a2b_spark.operators.classifier import bow_linear_score

        if not clf_vocab or not clf_weights:
            raise ValueError(
                "the classifier stage needs a frozen model: pass "
                "clf_vocab and clf_weights (train one with "
                "operators.classifier.bow_logreg_train)"
            )
        scored = bow_linear_score(
            docs.select(id_col, text_col), text_col,
            list(clf_vocab), list(clf_weights), clf_bias,
        )
        # z is an exact decimal; NULL/empty text scores exactly the
        # bias (classifier.py's NULL-coalesce contract), so every doc
        # is judged — no never-drop escape needed here
        keep = scored.filter(
            F.col("z") >= F.lit(str(Decimal(str(clf_threshold)))).cast(
                "decimal(24,8)"
            )
        ).select(id_col)
        docs = docs.join(keep, id_col, "left_semi").localCheckpoint(
            eager=False
        )
        stats["classifier"] = docs.count()

    if "decontam" in stages:
        from a2b_spark.operators.dedup import ngram_decontaminate

        if not decontam_benchmark:
            raise ValueError(
                "the decontam stage needs a benchmark: pass "
                "decontam_benchmark (a parquet of eval documents with "
                f"a {text_col!r} column)"
            )
        bench = spark.read.parquet(decontam_benchmark)
        if text_col not in bench.columns:
            raise ValueError(
                f"benchmark parquet lacks required column {text_col!r}"
            )
        if "nfc" in stages:
            # grams must compare like-with-like: the corpus side was
            # canonicalized above, so the benchmark side gets the
            # identical pass
            from a2b_spark.functions.unicode import nfc

            bench = bench.withColumn(text_col, nfc(text_col))
        if id_col not in bench.columns:
            bench = bench.withColumn(id_col, F.monotonically_increasing_id())
        hits = ngram_decontaminate(
            docs.select(id_col, text_col), bench, text_col, id_col,
            n=decontam_n,
        )
        docs = docs.join(
            hits.select(id_col), id_col, "left_anti"
        ).localCheckpoint(eager=False)
        stats["decontam"] = docs.count()

    if "dedup" in stages:
        from a2b_spark.functions.text import fingerprint
        from a2b_spark.operators.dedup import exact_dedup

        docs = docs.withColumn("__fp", fingerprint(F.col(text_col)))
        docs = exact_dedup(docs, ["__fp"], order_by=[id_col]).drop("__fp")
        docs = docs.localCheckpoint(eager=False)
        stats["dedup"] = docs.count()

    if "neardup" in stages:
        from a2b_spark.operators.dedup import minhash_near_dup_pairs

        pairs = minhash_near_dup_pairs(
            docs, text_col, id_col, num_hashes=32, bands=8, threshold=0.8
        )
        losers = pairs.select(
            F.greatest("id_a", "id_b").alias(id_col)
        ).distinct()
        docs = docs.join(losers, id_col, "left_anti").localCheckpoint(
            eager=False
        )
        stats["neardup"] = docs.count()

    if "domaincap" in stages:
        from a2b_spark.operators.rangejoin import frequency_cap

        if domain_col not in docs.columns:
            raise ValueError(
                f"domaincap stage needs column {domain_col!r} (set "
                "domain_col to the domain/source column)"
            )
        docs = frequency_cap(
            docs, [domain_col], id_col, domain_cap, salt=f"{salt}-domaincap"
        ).drop("rk").localCheckpoint(eager=False)
        stats["domaincap"] = docs.count()

    if "shard" in stages:
        from a2b_spark.operators.shards import shuffle_shards

        sharded = shuffle_shards(docs, id_col, n_shards, salt=salt)
        sharded.write.mode("overwrite").partitionBy("shard").parquet(
            output_path
        )
        stats["shards"] = n_shards
    else:
        docs.write.mode("overwrite").parquet(output_path)
    try:
        stats["output"] = spark.read.parquet(output_path).count()
    except Exception:
        # every document filtered out: a partitioned write of an empty
        # frame leaves no readable files — an empty corpus is a valid
        # (if alarming) curation outcome, not a crash
        stats["output"] = 0

    with open(os.path.join(output_path, "_curation_stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    return stats


def main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="a2b-curate", description=__doc__.split("\n\n")[0]
    )
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="curated output dir")
    p.add_argument(
        "--stages",
        default="nfc,quality,perplexity,dedup,neardup,shard",
        help="comma-separated subset of: nfc, linedup, quality, "
        "perplexity, classifier, decontam, dedup, neardup, domaincap, "
        "shard (classifier additionally needs --clf-vocab/"
        "--clf-weights and decontam needs --decontam-benchmark; the "
        "default omits both because they need external inputs)",
    )
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--ppl-margin", type=float, default=0.6)
    p.add_argument("--lm-order", type=int, default=3)
    p.add_argument("--shards", type=int, default=16)
    p.add_argument("--salt", default="export-v1")
    p.add_argument(
        "--clf-vocab", default=None,
        help="comma-separated terms of a frozen bag-of-words model "
        "(required for the classifier stage)",
    )
    p.add_argument(
        "--clf-weights", default=None,
        help="comma-separated decimal weights, one per vocab term",
    )
    p.add_argument("--clf-bias", default="0")
    p.add_argument(
        "--clf-threshold", default="0",
        help="keep documents with linear score z >= this decimal",
    )
    p.add_argument(
        "--decontam-benchmark", default=None,
        help="parquet of eval/benchmark documents (required for the "
        "decontam stage); docs sharing any --decontam-n word n-gram "
        "with it are dropped",
    )
    p.add_argument("--decontam-n", type=int, default=8)
    p.add_argument(
        "--line-min-docs", type=int, default=16,
        help="linedup stage: strip lines appearing in at least this "
        "many distinct documents",
    )
    p.add_argument(
        "--domain-col", default="source",
        help="domaincap stage: the domain/source column to cap by",
    )
    p.add_argument(
        "--domain-cap", type=int, default=10_000,
        help="domaincap stage: max documents kept per domain value",
    )
    args = p.parse_args(argv)

    from a2b_spark.session import get_spark

    spark = get_spark("a2b_curate")
    stats = run_curation(
        spark,
        args.input,
        args.output,
        tuple(s.strip() for s in args.stages.split(",") if s.strip()),
        id_col=args.id_col,
        text_col=args.text_col,
        min_tokens=args.min_tokens,
        ppl_margin=args.ppl_margin,
        lm_order=args.lm_order,
        n_shards=args.shards,
        salt=args.salt,
        # strip whitespace and drop empty entries: a trailing comma in
        # a shell-quoted list is near-inevitable, and an empty vocab
        # term is a phantom-match trap (classifier._validate_vocab now
        # also rejects it loudly — this keeps the CLI ergonomic while
        # a mid-list empty still errors via the length-match check)
        clf_vocab=(
            [t.strip() for t in args.clf_vocab.split(",") if t.strip()]
            if args.clf_vocab
            else None
        ),
        clf_weights=(
            [w.strip() for w in args.clf_weights.split(",") if w.strip()]
            if args.clf_weights
            else None
        ),
        clf_bias=args.clf_bias,
        clf_threshold=args.clf_threshold,
        decontam_benchmark=args.decontam_benchmark,
        decontam_n=args.decontam_n,
        line_min_docs=args.line_min_docs,
        domain_col=args.domain_col,
        domain_cap=args.domain_cap,
    )
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
