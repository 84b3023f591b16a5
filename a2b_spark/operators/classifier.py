"""Bag-of-words quality classifier — the fastText-shaped supervised
filter every large LLM corpus pipeline runs (GPT-3's WebText-vs-crawl
logistic classifier, LLaMA's fastText quality filter): label a small
curated set positive, the raw crawl negative, train a linear model on
token counts, keep documents the model scores high.

Design for 100 TB:
- FEATURES ARE COLUMNS, NOT JOINS: the vocabulary is explicit and
  bounded (the realistic regime for a quality filter is 10^1-10^4
  terms; this implementation targets the low end where per-term
  columns stay codegen-friendly). Each term count is
  ``size(filter(tokens, t -> t = term))`` — whole-stage codegen, no
  explode, no shuffle to featurize.
- TRAINING is full-batch gradient descent: one narrow
  (doc × |vocab|) count frame is materialized ONCE (eager
  localCheckpoint — iterations never rescan the corpus), then each
  iteration is a single exact-decimal aggregation collecting
  |vocab|+1 gradient values to the driver (a bounded pull: the model
  itself, not data).
- DETERMINISM: per-document residuals are rounded to 12 decimals and
  accumulated as exact decimals, so gradients — and therefore the
  trained weights — are partition-invariant and bit-reproducible
  run-to-run (float-order effects cannot reach the model).
- SCORING is pure decimal arithmetic (weights are decimal literals ×
  integer counts): no transcendental functions, so any SQL engine
  reproduces scores bit-for-bit; the sigmoid is monotone, so
  thresholding/ranking on the linear score z is equivalent to
  thresholding on the probability.

Reference parity: the reference engine has no ML surface; this is
the training-data-pipeline extension tier (SURVEY §2 additions).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: residual rounding scale — makes gradient sums exact decimals
_ERR_SCALE = 12
#: weight literal scale used by scoring (fixed so the SQL twin can
#: embed identical decimal literals)
WEIGHT_SCALE = 8


def _validate_vocab(vocab: list[str]) -> None:
    """Shared vocab contract for featurize AND score paths.

    '' would spuriously match the [''] array a NULL/empty doc
    coalesces to; a space-containing term can never equal a
    space-split token — both are silent-zero/phantom-count traps, so
    every entry point that builds count columns must reject them
    (round-11 advice: bow_linear_score previously skipped this and a
    trailing comma in a CLI vocab list silently skewed every z).
    """
    if not vocab or len(set(vocab)) != len(vocab):
        raise ValueError("vocab must be non-empty and duplicate-free")
    bad = [t for t in vocab if t == "" or " " in t]
    if bad:
        raise ValueError(f"vocab terms must be non-empty, space-free: {bad}")


def _count_cols(text_col: str, vocab: list[str]):
    """One integer count column per vocab term, all codegen.

    NULL text is coalesced to '' BEFORE the split: split(NULL) is
    NULL, filter(NULL) is NULL, and size(NULL) is -1 under Spark's
    default ``spark.sql.legacy.sizeOfNull`` — a silent -1 per vocab
    term that would poison gradients and scores. With the coalesce a
    NULL/empty document contributes exact zero counts, matching the
    DuckDB oracle and lm.py's empty-doc sentinel discipline.
    """
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")

    def eq(term):
        # closure factory: a default-arg lambda would grow a second
        # parameter and pyspark would treat it as an (element, index)
        # higher-order-function signature
        return lambda t: t == F.lit(term)

    return [
        F.size(F.filter(toks, eq(term))).cast("int").alias(f"__x{j}")
        for j, term in enumerate(vocab)
    ]


def bow_features(df: DataFrame, text_col: str, vocab: list[str]) -> DataFrame:
    """(df columns minus text) + __x0..__x{V-1} term-count columns."""
    _validate_vocab(vocab)
    keep = [c for c in df.columns if c != text_col]
    clash = {f"__x{j}" for j in range(len(vocab))} & set(keep)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with the reserved "
            "feature columns; rename them first"
        )
    return df.select(*keep, *_count_cols(text_col, vocab))


def bow_logreg_train(
    df: DataFrame,
    text_col: str,
    label_col: str,
    vocab: list[str],
    iters: int = 20,
    lr: float = 0.5,
    materialize: bool = True,
) -> tuple[list[float], float]:
    """Full-batch logistic regression on term counts: returns
    (weights, bias) minimizing log-loss for ``label_col`` ∈ {0, 1}.

    Each iteration: z = w·x + b per doc (fixed-order codegen
    expression — deterministic), residual r = round(σ(z) − y, 12) as
    exact decimal, gradients = one aggregation of r·x (decimal ×
    int = exact), weight update on the driver. The only driver pull
    per iteration is the |vocab|+1 gradient row.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    feats = bow_features(
        df.select(F.col(label_col).cast("int").alias("__y"), text_col),
        text_col,
        vocab,
    )
    if materialize:
        feats = feats.localCheckpoint(eager=True)
    n = feats.count()
    if n == 0:
        raise ValueError("empty training frame")
    V = len(vocab)
    w = [0.0] * V
    b = 0.0
    for _ in range(iters):
        z = F.lit(b)
        for j in range(V):
            z = z + F.col(f"__x{j}") * F.lit(w[j])
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = F.round(p - F.col("__y"), _ERR_SCALE).cast(
            f"decimal(24,{_ERR_SCALE})"
        )
        aggs = [
            F.sum(r * F.col(f"__x{j}")).alias(f"g{j}") for j in range(V)
        ] + [F.sum(r).alias("gb")]
        row = feats.agg(*aggs).collect()[0]
        for j in range(V):
            g = row[f"g{j}"]
            w[j] -= lr * float(g if g is not None else 0) / n
        gb = row["gb"]
        b -= lr * float(gb if gb is not None else 0) / n
    return w, b


def bow_linear_score(
    df: DataFrame,
    text_col: str,
    vocab: list[str],
    weights: list[str | Decimal],
    bias: str | Decimal = "0",
):
    """Column: the linear score z = w·x + b as an EXACT
    decimal(24,WEIGHT_SCALE) — weights/bias are decimal strings
    quantized to WEIGHT_SCALE, counts are ints, so every engine
    computes identical values (σ is monotone: threshold on z, not p).
    Returns (frame_without_text, score_column) so callers compose."""
    _validate_vocab(vocab)
    if len(weights) != len(vocab):
        raise ValueError("one weight per vocab term required")
    if "z" in df.columns and text_col != "z":
        raise ValueError(
            "input column 'z' collides with the reserved score column; "
            "rename it first"
        )
    dt = f"decimal(24,{WEIGHT_SCALE})"

    def dlit(x):
        return F.lit(str(Decimal(str(x)))).cast(dt)

    counts = _count_cols(text_col, vocab)
    z = dlit(bias)
    for j in range(len(vocab)):
        z = (z + counts[j] * dlit(weights[j])).cast(dt)
    keep = [c for c in df.columns if c != text_col]
    return df.select(*keep, z.alias("z"))
