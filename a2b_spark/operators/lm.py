"""Distributed n-gram language model with stupid-backoff scoring —
the CCNet/KenLM curation step (Wenzek et al. 2020; Brants et al. 2007
"Large Language Models in Machine Translation" introduced stupid
backoff precisely because it trains on map-reduce counts with no
discounting state). `functions/text.py` already ships a UNIGRAM
surprisal approximation; this is the real thing: contexts up to
``order-1`` tokens, trained distributed, scored with the backoff
cascade.

Scale shape (100 TB):
- TRAINING is ONE corpus scan — every position emits its
  k = 1..min(order, pos) grams in a single generator expression
  (JVM-side `transform`/`slice`, no Python), then one hash
  aggregation keyed by (k, gram); context denominators come from a
  gram-keyed self-join of ADJACENT ORDERS (model-sized, never
  corpus-sized). With ``materialize=True`` (default) the gram counts
  are pinned with an eager localCheckpoint — the repo's
  fan-out-frame discipline — so the three downstream consumers
  (unigram base, denominator join, every scoring lookup) never
  re-derive the corpus scan: train once, score forever.
- SCORING is one pass over the documents and a CASCADE of per-order
  equi joins against the model (the same shape the SQL twin takes):
  one row per token carrying its k = 1..order gram strings, `order`
  left joins on (gram_k), highest resolved order wins. Broadcast
  joins when ``broadcast_model=True`` (vocab-bounded corpora);
  shuffle-hash otherwise. One shuffle total on the broadcast path
  (the per-document rollup) — no window, no per-position argmax
  aggregation, no driver collect, no per-row Python.

Float discipline (driver value-hash parity): the per-token log10
score is ROUNDed to 6 decimals and cast to DECIMAL(18,6) BEFORE the
per-document sum, so accumulation is exact and independent of either
engine's float-add order; `log10(alpha)` is passed as one double
literal shared with the SQL oracle. Only the final mean converts to
DOUBLE (one division of exact operands).

Reference parity note: the reference engine (row-at-a-time PHP
migration tool, /root/reference/src) has no LM surface; this operator
belongs to the training-data-pipeline extension tier alongside
dedup/ANN/tokenization.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log10 of the canonical stupid-backoff factor 0.4. Emitted as a
#: literal into both the Spark plan and any SQL oracle so the two
#: engines parse the identical double.
LOG10_BACKOFF_04 = math.log10(0.4)


def _tokens(text_col: str):
    """Whitespace tokens with empties dropped — `split` on an empty or
    multi-space string yields '' entries that would otherwise score as
    phantom OOV tokens."""
    return F.filter(
        F.split(F.col(text_col), " "), lambda t: F.length(t) > 0
    )


def _gram_arrays(toks, order: int) -> list:
    """Per-order gram arrays from a token array: result[k-1][i] is the
    k-gram STARTING at token i+1 (so len = L-k+1). Built iteratively —
    g_k = zip_with(g_{k-1} minus its tail, tokens shifted by k-1) —
    which is O(L) per order per document. The naive alternative
    (slice+concat per POSITION inside a transform) re-slices the token
    array L times and measured ~22x slower than a plain explode at
    sf0.1; this construction is the difference between the LM scoring
    pass costing ~1 corpus-scan and ~20."""
    sz = F.size(toks)
    grams = [toks]
    for k in range(2, order + 1):
        prev = grams[-1]
        n_k = sz - (k - 1)
        grams.append(
            F.when(
                n_k > 0,
                F.zip_with(
                    F.slice(prev, 1, n_k),
                    F.slice(toks, k, n_k),
                    lambda x, y: F.concat_ws(" ", x, y),
                ),
            ).otherwise(F.array().cast("array<string>"))
        )
    return grams


def _one_row_attach(df: DataFrame, one_row: DataFrame) -> DataFrame:
    """Attach a 1-row frame's columns to every row via a dummy-key
    BROADCAST HASH join — semantically a cross join, but it never
    plans as BroadcastNestedLoopJoin (the plan-audit red flag). The
    key must be COLUMN-DERIVED: a literal key constant-folds to a
    trivially-true condition and Catalyst falls back to BNLJ."""

    def zero_key(frame: DataFrame):
        first = frame.columns[0]
        # hash() is non-null even for null input; pmod(·, 1) pins the
        # value to 0 WITHOUT a simplification rule folding it (hash*0
        # folds to a literal and the join degrades to BNLJ)
        return frame.withColumn(
            "__zk", F.pmod(F.hash(F.col(first)), F.lit(1))
        )

    return (
        zero_key(df)
        .join(F.broadcast(zero_key(one_row)), "__zk")
        .drop("__zk")
    )


def ngram_lm_train(
    df: DataFrame, text_col: str, order: int = 3, materialize: bool = True
) -> DataFrame:
    """Train n-gram counts for stupid-backoff scoring.

    Returns the MODEL frame ``(k, gram, cnt, ctx_cnt)`` for
    k = 1..order: ``cnt`` is the corpus count of the k-gram, and
    ``ctx_cnt`` the denominator stupid backoff divides by — the count
    of the (k-1)-gram context for k >= 2, the total token count for
    k = 1. Whitespace tokenizer (the engine's corpus convention;
    compose with `operators/bpe.py` upstream for subword models).

    ``materialize=True`` (default) pins the gram counts AND the
    finished model with eager localCheckpoints, so the corpus is
    scanned exactly once no matter how many consumers the model fans
    out to (scoring joins it once per order). Pass ``False`` only for
    plan inspection or single-use lazy composition.

    Every k-gram's (k-1)-prefix occurs at least as often as the gram
    itself, so the denominator join never misses (inner join is
    lossless by construction).
    """
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    from a2b_spark.operators.dedup import spread

    # a small corpus scans as ONE split and the gram explode + map-side
    # count aggregation would serialize on a single core; spread is a
    # no-op once the scan has >= core-count splits (any real corpus)
    toked = spread(df.select(F.col(text_col))).select(
        _tokens(text_col).alias("__toks")
    )
    # stage the per-order gram arrays as REAL columns (projection
    # boundary) so each is computed once per document, then ONE
    # explode of the concatenated (k, gram, ctx) struct arrays — a
    # single corpus pass for every order
    ga = _gram_arrays(F.col("__toks"), order)
    staged = toked.select(
        *[g.alias(f"__g{k}") for k, g in enumerate(ga, start=1)]
    )

    def tagged(k):
        gk = F.col(f"__g{k}")
        if k == 1:
            return F.transform(
                gk,
                lambda g: F.struct(
                    F.lit(1).cast("int").alias("k"),
                    g.alias("gram"),
                    F.lit("").alias("ctx"),
                ),
            )
        n_k = F.size(gk)
        return F.when(
            n_k > 0,
            F.zip_with(
                gk,
                F.slice(F.col(f"__g{k-1}"), 1, n_k),
                lambda g, c: F.struct(
                    F.lit(k).cast("int").alias("k"),
                    g.alias("gram"),
                    c.alias("ctx"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<k:int,gram:string,ctx:string>>"))

    all_pairs = F.concat(*[tagged(k) for k in range(1, order + 1)])
    grams = (
        staged.select(F.explode(all_pairs).alias("p"))
        .select("p.k", "p.gram", "p.ctx")
        .filter(F.length("gram") > 0)
    )
    counts = grams.groupBy("k", "gram", "ctx").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    if materialize:
        # ONE corpus scan feeds every consumer below
        counts = counts.localCheckpoint(eager=True)
    uni = counts.filter(F.col("k") == 1)
    total = uni.agg(F.sum("cnt").cast("long").alias("__n"))
    base = _one_row_attach(uni, total).select(
        "k", "gram", "cnt", F.col("__n").alias("ctx_cnt")
    )
    if order == 1:
        model = base
    else:
        lower = counts.select(
            (F.col("k") + 1).alias("k"),
            F.col("gram").alias("ctx"),
            F.col("cnt").alias("ctx_cnt"),
        )
        higher = (
            counts.filter(F.col("k") > 1)
            .join(lower, ["k", "ctx"])
            .select("k", "gram", "cnt", "ctx_cnt")
        )
        model = base.unionByName(higher)
    if materialize:
        # model-sized job; scoring's per-order lookups and the OOV
        # total then read a pinned frame instead of re-planning the
        # adjacent-order join once per consumer
        model = model.localCheckpoint(eager=True)
    return model


def stupid_backoff_logp(
    docs: DataFrame,
    model: DataFrame,
    id_col: str,
    text_col: str,
    order: int = 3,
    alpha_log10: float = LOG10_BACKOFF_04,
    broadcast_model: bool = False,
    extra_cols: tuple = (),
) -> DataFrame:
    """Per-document stupid-backoff log10 score against a trained
    model (:func:`ngram_lm_train` output, same ``order``).

    Per token at position pos: the LONGEST k <= min(order, pos) whose
    k-gram the model has scores ``log10(cnt/ctx_cnt)`` discounted by
    ``alpha_log10`` once per backed-off level; a token absent even as
    a unigram (OOV) takes the floor ``log10(1/(N+1))`` under the full
    discount. Returns one row per document:
    (id_col, *extra_cols, n_tok, n_oov, hits_full, sum_logp10,
    avg_logp10) — ``hits_full`` counts tokens scored at the full
    available order, ``sum_logp10`` the EXACT decimal(28,6) token sum
    (downstream rollups re-aggregate it without float-order
    sensitivity), ``avg_logp10`` = sum/n_tok as double (perplexity
    = 10**-avg_logp10). Empty/whitespace-only docs yield n_tok = 0
    rows (never dropped — curation filters must see every doc).

    Plan shape: one row per token carrying its k = 1..min(order, pos)
    gram strings, then a cascade of ``order`` left equi joins against
    the model's per-order slices — broadcast when
    ``broadcast_model=True`` (then the ONLY shuffle is the
    per-document rollup), shuffle-hash joins otherwise (web-scale
    models).
    """
    reserved = (
        {"n_tok", "n_oov", "hits_full", "sum_logp10", "avg_logp10"}
        # internal staging columns of the scoring plan — a colliding
        # extra would otherwise die later as an ambiguous-column
        # AnalysisException instead of this actionable error
        | {"pos", "kmax"}
        | {f"g{k}" for k in range(1, order + 1)}
        | {f"__c{k}" for k in range(1, order + 1)}
        | {f"__x{k}" for k in range(1, order + 1)}
        | {"__id", "__zk", "__n_total", "__lp", "__hit", "__full", "__real"}
    ) & ({id_col} | set(extra_cols))
    if reserved:
        raise ValueError(
            f"id/extra columns {sorted(reserved)} collide with reserved "
            "output or internal columns; rename them first"
        )
    from a2b_spark.operators.dedup import spread

    toks = _tokens(text_col)
    # stage the per-order gram arrays once per document (projection
    # boundary — see _gram_arrays), then index them per position with
    # O(1) element_at: the k-gram ENDING at pos starts at pos-k+1.
    # spread first: scoring is the chain's per-row-heaviest segment
    # (per-position explode + `order` hash joins before the rollup
    # shuffle), and a single-file local scan would run it all on one
    # core — a no-op at real scan widths
    docs = spread(docs)
    ga = _gram_arrays(toks, order)
    staged = docs.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in extra_cols],
        *[g.alias(f"__g{k}") for k, g in enumerate(ga, start=1)],
    )
    sz = F.size(F.col("__g1"))

    def per_pos(pos):
        fields = [pos.cast("int").alias("pos")]
        for k in range(1, order + 1):
            fields.append(
                F.when(
                    pos >= k, F.element_at(F.col(f"__g{k}"), pos - k + 1)
                ).alias(f"g{k}")
            )
        return F.struct(*fields)

    # empty/whitespace-only docs emit one SENTINEL row (pos = 0, null
    # grams) instead of vanishing — re-deriving them from a second
    # docs read would cost a full extra text scan at 100 TB; the
    # rollup below excludes sentinels from every token statistic and
    # still emits the n_tok = 0 contract row
    sentinel = F.array(
        F.struct(
            F.lit(0).cast("int").alias("pos"),
            *[
                F.lit(None).cast("string").alias(f"g{k}")
                for k in range(1, order + 1)
            ],
        )
    )
    cand = staged.select(
        "__id",
        *extra_cols,
        F.explode(
            F.when(
                sz > 0, F.transform(F.sequence(F.lit(1), sz), per_pos)
            ).otherwise(sentinel)
        ).alias("g"),
    ).select(
        "__id",
        *extra_cols,
        "g.pos",
        F.least(F.lit(order), F.col("g.pos")).alias("kmax"),
        *[F.col(f"g.g{k}") for k in range(1, order + 1)],
    )
    n_total = model.filter(F.col("k") == 1).agg(
        F.max("ctx_cnt").alias("__n_total")
    )
    joined = cand
    for k in range(1, order + 1):
        slice_k = model.filter(F.col("k") == k).select(
            F.col("gram").alias(f"g{k}"),
            F.col("cnt").alias(f"__c{k}"),
            F.col("ctx_cnt").alias(f"__x{k}"),
        )
        if broadcast_model:
            slice_k = F.broadcast(slice_k)
        joined = joined.join(slice_k, [f"g{k}"], "left")
    joined = _one_row_attach(joined, n_total)
    # backoff cascade: highest resolved order wins (the SQL-twin CASE)
    logp = None
    full = None
    hit = F.lit(False)
    for k in range(order, 0, -1):
        ck, xk = F.col(f"__c{k}"), F.col(f"__x{k}")
        arm = (F.col("kmax") - k) * F.lit(alpha_log10) + F.log10(ck / xk)
        logp = F.when(ck.isNotNull(), arm) if logp is None else logp.when(
            ck.isNotNull(), arm
        )
        fk = F.when(ck.isNotNull(), (F.lit(k) == F.col("kmax")).cast("int"))
        full = fk if full is None else full.when(
            ck.isNotNull(), (F.lit(k) == F.col("kmax")).cast("int")
        )
        hit = hit | ck.isNotNull()
    oov_floor = (F.col("kmax") - 1) * F.lit(alpha_log10) + F.log10(
        F.lit(1.0) / (F.col("__n_total") + 1)
    )
    logp = logp.otherwise(oov_floor)
    full = full.otherwise(F.lit(0))
    real = F.col("pos") >= 1  # sentinel rows carry no token statistics
    tok_scores = joined.select(
        "__id",
        *extra_cols,
        F.when(real, F.round(logp, 6).cast("decimal(18,6)")).alias("__lp"),
        real.cast("int").alias("__real"),
        (real & hit).cast("int").alias("__hit"),
        F.when(real, full).otherwise(F.lit(0)).alias("__full"),
    )
    n_tok = F.sum("__real").cast("long")
    scored = tok_scores.groupBy("__id", *extra_cols).agg(
        n_tok.alias("n_tok"),
        (F.sum("__real") - F.sum("__hit")).cast("long").alias("n_oov"),
        F.sum("__full").cast("long").alias("hits_full"),
        F.sum("__lp").cast("decimal(28,6)").alias("sum_logp10"),
        F.when(
            n_tok > 0, F.sum("__lp").cast("double") / n_tok
        ).alias("avg_logp10"),
    )
    return scored.withColumnRenamed("__id", id_col)
