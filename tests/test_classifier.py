"""Bag-of-words logistic quality classifier — operators/classifier.py.

Training is pinned against an independent numpy/Decimal reference that
mirrors the operator's determinism contract (HALF_UP residual rounding
at 12 decimals, exact-decimal gradient sums, fixed-order z
accumulation); partition invariance must hold EXACTLY.
"""

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from a2b_spark.operators.classifier import (
    bow_features,
    bow_linear_score,
    bow_logreg_train,
)

VOCAB = ["table", "stream", "merge", "window"]

DOCS = [
    # label 1: "table-ish" docs; label 0: "stream-ish"
    (0, 1, "table table merge scan table"),
    (1, 1, "table window merge table"),
    (2, 1, "merge table table join"),
    (3, 0, "stream stream window batch"),
    (4, 0, "stream window stream stream"),
    (5, 0, "batch stream window dup"),
    (6, 1, "table merge"),
    (7, 0, "stream batch"),
]


def _ref_train(iters=15, lr=0.5):
    X = [
        [t.split(" ").count(term) for term in VOCAB] for _, _, t in DOCS
    ]
    y = [lab for _, lab, _ in DOCS]
    n, V = len(X), len(VOCAB)
    w, b = [0.0] * V, 0.0
    q = Decimal(1).scaleb(-12)
    for _ in range(iters):
        grads = [Decimal(0)] * V
        gb = Decimal(0)
        for i in range(n):
            z = b
            for j in range(V):
                z = z + X[i][j] * w[j]
            p = 1.0 / (1.0 + math.exp(-z))
            r = Decimal(p - y[i]).quantize(q, rounding=ROUND_HALF_UP)
            for j in range(V):
                grads[j] += r * X[i][j]
            gb += r
        for j in range(V):
            w[j] -= lr * float(grads[j]) / n
        b -= lr * float(gb) / n
    return w, b


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, "id int, label int, text string")


def test_features_count_terms(spark, df):
    row = {
        r["id"]: tuple(r[f"__x{j}"] for j in range(4))
        for r in bow_features(df, "text", VOCAB).collect()
    }
    assert row[0] == (3, 0, 1, 0)
    assert row[4] == (0, 3, 0, 1)


def test_train_matches_reference(spark, df):
    w, b = bow_logreg_train(df, "text", "label", VOCAB, iters=15, lr=0.5)
    rw, rb = _ref_train(iters=15, lr=0.5)
    assert b == pytest.approx(rb, rel=1e-12, abs=1e-12)
    for got, want in zip(w, rw):
        assert got == pytest.approx(want, rel=1e-12, abs=1e-12)
    # the model must actually separate the classes
    scored = bow_linear_score(
        df,
        "text",
        VOCAB,
        [str(Decimal(str(round(x, 8)))) for x in w],
        str(Decimal(str(round(b, 8)))),
    )
    got = {r.id: float(r.z) for r in scored.collect()}
    for i, lab, _ in DOCS:
        assert (got[i] > 0) == (lab == 1), (i, got[i], lab)


def test_train_partition_invariant(spark, df):
    a = bow_logreg_train(df, "text", "label", VOCAB, iters=8)
    b = bow_logreg_train(
        df.repartition(5, "text"), "text", "label", VOCAB, iters=8
    )
    assert a == b  # exact float equality — decimal gradients


def test_score_exact_decimal(spark, df):
    ws = ["0.75", "-0.5", "0.25", "-0.125"]
    scored = bow_linear_score(df, "text", VOCAB, ws, "-0.5")
    got = {r.id: r.z for r in scored.collect()}
    for i, _, t in DOCS:
        cnts = [t.split(" ").count(term) for term in VOCAB]
        want = Decimal("-0.5") + sum(
            c * Decimal(w) for c, w in zip(cnts, ws)
        )
        assert got[i] == want, (i, got[i], want)


def test_bad_inputs(spark, df):
    with pytest.raises(ValueError, match="vocab"):
        bow_features(df, "text", [])
    with pytest.raises(ValueError, match="vocab"):
        bow_features(df, "text", ["a", "a"])
    with pytest.raises(ValueError, match="iters"):
        bow_logreg_train(df, "text", "label", VOCAB, iters=0)
    with pytest.raises(ValueError, match="weight"):
        bow_linear_score(df, "text", VOCAB, ["0.1"])
    with pytest.raises(ValueError, match="empty"):
        bow_logreg_train(
            df.filter("id < 0"), "text", "label", VOCAB, iters=1
        )


def test_reserved_column_collisions(spark, df):
    bad = df.withColumnRenamed("id", "__x0")
    with pytest.raises(ValueError, match="reserved"):
        bow_features(bad, "text", VOCAB)
    badz = df.withColumnRenamed("id", "z")
    with pytest.raises(ValueError, match="reserved"):
        bow_linear_score(badz, "text", VOCAB, ["0.1"] * 4, "0")


def test_null_text_counts_as_zero_not_minus_one(spark):
    # NULL text: split(NULL)->NULL, size(NULL) = -1 under default
    # sizeOfNull — the coalesce guard must yield exact-zero counts so
    # scores/gradients match the SQL oracle (ADVICE r10, medium)
    df = spark.createDataFrame(
        [(0, 1, "table merge"), (1, 0, None), (2, 0, "")],
        "id int, label int, text string",
    )
    feats = {
        r["id"]: [r[f"__x{j}"] for j in range(len(VOCAB))]
        for r in bow_features(df, "text", VOCAB).collect()
    }
    assert feats[1] == [0, 0, 0, 0]
    assert feats[2] == [0, 0, 0, 0]
    assert feats[0] == [1, 0, 1, 0]
    # scoring: z for a NULL doc is exactly the bias, never poisoned
    zs = {
        r["id"]: r["z"]
        for r in bow_linear_score(
            df, "text", VOCAB, ["0.5", "0.25", "-0.5", "1"], "-0.125"
        ).collect()
    }
    assert zs[1] == Decimal("-0.125")
    assert zs[2] == Decimal("-0.125")
    # training with a NULL doc converges without -1 count corruption:
    # weights equal training on the same frame with '' instead of NULL
    df_empty = spark.createDataFrame(
        [(0, 1, "table merge"), (1, 0, ""), (2, 0, "")],
        "id int, label int, text string",
    )
    w_null, b_null = bow_logreg_train(df, "text", "label", VOCAB, iters=3)
    w_emp, b_emp = bow_logreg_train(
        df_empty, "text", "label", VOCAB, iters=3
    )
    assert w_null == w_emp and b_null == b_emp


def test_rejects_empty_or_space_vocab_terms(spark):
    df = spark.createDataFrame([(1, "a b")], "id int, text string")
    with pytest.raises(ValueError, match="space-free"):
        bow_features(df, "text", ["a", ""])
    with pytest.raises(ValueError, match="space-free"):
        bow_features(df, "text", ["a b"])


def test_score_path_enforces_same_vocab_contract(spark):
    """bow_linear_score must reject what bow_features rejects (round-11
    advice): an empty term — one trailing comma in a CLI vocab list —
    would spuriously match the [''] array NULL/empty docs coalesce to,
    silently skewing every z; space/duplicate terms silently miscount."""
    df = spark.createDataFrame([(1, "a b")], "id int, text string")
    with pytest.raises(ValueError, match="space-free"):
        bow_linear_score(df, "text", ["a", ""], ["0.1", "0.2"])
    with pytest.raises(ValueError, match="space-free"):
        bow_linear_score(df, "text", ["a b"], ["0.1"])
    with pytest.raises(ValueError, match="duplicate-free"):
        bow_linear_score(df, "text", ["a", "a"], ["0.1", "0.2"])
    with pytest.raises(ValueError, match="non-empty"):
        bow_linear_score(df, "text", [], [])
