"""N-gram LM (stupid backoff) — operators/lm.py.

Training counts and the scoring cascade are pinned against an
independent brute-force Python reference (the same double arithmetic,
so float comparisons are exact); the backoff discount, OOV floor,
empty-doc contract, and broadcast/shuffle plan equivalence each get a
dedicated case.
"""

import decimal
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from a2b_spark.operators.lm import (
    LOG10_BACKOFF_04,
    ngram_lm_train,
    stupid_backoff_logp,
)

DOCS = [
    (1, "a b a b c"),
    (2, "a b c a b"),
    (3, "c c a"),
    (4, ""),
    (5, "   "),
    (6, "z a b"),
    (7, "b"),
]


def _ref_model(order):
    toks = {i: [w for w in t.split(" ") if w] for i, t in DOCS}
    cnt = Counter()
    for t in toks.values():
        for i in range(len(t)):
            for k in range(1, order + 1):
                if i - k + 1 >= 0:
                    cnt[(k, " ".join(t[i - k + 1 : i + 1]))] += 1
    n = sum(v for (k, _), v in cnt.items() if k == 1)
    ref = {}
    for (k, g), c in cnt.items():
        if k == 1:
            ref[(k, g)] = (c, n)
        else:
            ctx = " ".join(g.split()[:-1])
            ref[(k, g)] = (c, cnt[(k - 1, ctx)])
    return toks, ref, n


def _ref_score(t, ref, n, order):
    lps, oov, full = [], 0, 0
    for i in range(len(t)):
        kmax = min(order, i + 1)
        best = None
        for k in range(kmax, 0, -1):
            g = " ".join(t[i - k + 1 : i + 1])
            if (k, g) in ref:
                best = (k,) + ref[(k, g)]
                break
        if best is None:
            oov += 1
            lp = (kmax - 1) * LOG10_BACKOFF_04 + math.log10(1.0 / (n + 1))
        else:
            k, c, x = best
            if k == kmax:
                full += 1
            lp = (kmax - k) * LOG10_BACKOFF_04 + math.log10(c / x)
        lps.append(decimal.Decimal(str(round(lp, 6))))
    if not t:
        return (0, 0, 0, None)
    return (len(t), oov, full, float(sum(lps)) / len(t))


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "id int, text string")


def test_train_counts_match_bruteforce(spark, docs_df):
    for order in (1, 2, 3):
        m = ngram_lm_train(docs_df, "text", order)
        got = {(r.k, r.gram): (r.cnt, r.ctx_cnt) for r in m.collect()}
        _, ref, _ = _ref_model(order)
        assert got == ref, f"order={order}"


def test_train_rejects_bad_order(docs_df):
    with pytest.raises(ValueError, match="order"):
        ngram_lm_train(docs_df, "text", 0)


@pytest.mark.parametrize("broadcast", [True, False])
def test_score_matches_bruteforce(spark, docs_df, broadcast):
    toks, ref, n = _ref_model(3)
    m = ngram_lm_train(docs_df, "text", 3)
    s = stupid_backoff_logp(
        docs_df, m, "id", "text", 3, broadcast_model=broadcast
    )
    got = {r.id: (r.n_tok, r.n_oov, r.hits_full, r.avg_logp10) for r in s.collect()}
    assert set(got) == set(toks)  # empty docs included
    for i, t in toks.items():
        e = _ref_score(t, ref, n, 3)
        g = got[i]
        assert g[:3] == e[:3], (i, g, e)
        if e[3] is None:
            assert g[3] is None
        else:
            assert g[3] == pytest.approx(e[3], abs=1e-12)


def test_score_oov_floor_and_backoff(spark, docs_df):
    """Unseen words hit the discounted floor; seen words in unseen
    contexts back off level by level."""
    toks, ref, n = _ref_model(3)
    m = ngram_lm_train(docs_df, "text", 3)
    probe = spark.createDataFrame(
        [(9, "q a b q"), (10, "c b a")], "id int, text string"
    )
    s = {r.id: r for r in stupid_backoff_logp(
        probe, m, "id", "text", 3, broadcast_model=True
    ).collect()}
    e9 = _ref_score(["q", "a", "b", "q"], ref, n, 3)
    assert (s[9].n_tok, s[9].n_oov, s[9].hits_full) == e9[:3]
    assert s[9].n_oov == 2
    assert s[9].avg_logp10 == pytest.approx(e9[3], abs=1e-12)
    e10 = _ref_score(["c", "b", "a"], ref, n, 3)
    assert s[10].n_oov == 0
    assert s[10].avg_logp10 == pytest.approx(e10[3], abs=1e-12)


def test_sum_decimal_reaggregates_exactly(spark, docs_df):
    """sum_logp10 is exact decimal: regrouping per-doc sums equals
    scoring-then-summing at any grouping (the float-order trap the
    column exists to avoid)."""
    m = ngram_lm_train(docs_df, "text", 3)
    s = stupid_backoff_logp(docs_df, m, "id", "text", 3, broadcast_model=True)
    total = s.agg(F.sum("sum_logp10").alias("t")).collect()[0].t
    per = sum(r.sum_logp10 for r in s.collect() if r.sum_logp10 is not None)
    assert total == per


def test_extra_cols_ride_through(spark):
    df = spark.createDataFrame(
        [(1, "en", "a b"), (2, "fr", "b a")], "id int, lang string, text string"
    )
    m = ngram_lm_train(df, "text", 2)
    s = stupid_backoff_logp(
        df, m, "id", "text", 2, broadcast_model=True, extra_cols=("lang",)
    )
    got = {(r.id, r.lang) for r in s.collect()}
    assert got == {(1, "en"), (2, "fr")}


def test_reserved_output_collision_raises(spark, docs_df):
    m = ngram_lm_train(docs_df, "text", 2)
    bad = docs_df.withColumnRenamed("id", "n_tok")
    with pytest.raises(ValueError, match="reserved"):
        stupid_backoff_logp(bad, m, "n_tok", "text", 2)
    bad2 = docs_df.withColumn("avg_logp10", F.lit(1.0))
    with pytest.raises(ValueError, match="reserved"):
        stupid_backoff_logp(
            bad2, m, "id", "text", 2, extra_cols=("avg_logp10",)
        )


def test_one_row_attach_plans_hash_join(spark, docs_df):
    """The global-scalar attach must plan as BroadcastHashJoin: a
    foldable dummy key (lit, hash*0) constant-folds and degrades to
    BroadcastNestedLoopJoin — the plan-audit red flag this pins."""
    m = ngram_lm_train(docs_df, "text", 2)
    s = stupid_backoff_logp(docs_df, m, "id", "text", 2, broadcast_model=True)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_internal_column_collision_raises(spark, docs_df):
    m = ngram_lm_train(docs_df, "text", 2)
    bad = docs_df.withColumn("pos", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        stupid_backoff_logp(bad, m, "id", "text", 2, extra_cols=("pos",))
    bad2 = docs_df.withColumn("g1", F.lit("x"))
    with pytest.raises(ValueError, match="reserved"):
        stupid_backoff_logp(bad2, m, "id", "text", 2, extra_cols=("g1",))
