"""Bloom n-gram membership (operators/bloom.py): one-sided error
contract — the flagged set is a SUPERSET of the exact join's, false
positives stay near the configured rate, and the build's driver pull
is bounded by filter size, not gram count."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from a2b_spark.operators.bloom import (
    NgramBloom,
    bloom_flag_contaminated,
    build_ngram_bloom,
)
from a2b_spark.operators.dedup import ngram_decontaminate


def test_bloom_superset_of_exact_join(spark, sf_dir):
    """On the real documents table with the q59 split: every doc the
    exact membership join flags must be Bloom-flagged with at least as
    many gram hits; extra flags are bounded by the FP budget."""
    from a2b_spark.operators.rangejoin import hash_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    bench = hash_sample(d, "doc_id", percent=20, salt="decon")
    rest = d.join(bench.select("doc_id"), "doc_id", "left_anti")

    exact = {
        r.doc_id: r.n_shared_ngrams
        for r in ngram_decontaminate(rest, bench, "text", "doc_id", n=5).collect()
    }
    bloom = build_ngram_bloom(bench, "text", "doc_id", n=5, fp_rate=0.01)
    assert bloom.n_grams > 0
    flagged = {
        r.doc_id: r.n_hit_ngrams
        for r in bloom_flag_contaminated(rest, bloom, "text", "doc_id").collect()
    }
    for doc, n_shared in exact.items():
        assert doc in flagged, f"exact-contaminated doc {doc} missed by bloom"
        assert flagged[doc] >= n_shared
    # one-sided error budget: docs carry ~hundreds of grams each, so a
    # 1% per-gram FP rate can flag extra docs — but the corpus-wide
    # extra-hit mass must stay near fp_rate * total corpus grams
    total_grams = (
        rest.select(F.explode(F.split("text", " "))).count()
    )  # upper bound on gram count
    extra_hits = sum(v for k, v in flagged.items() if k not in exact) + sum(
        flagged[k] - exact[k] for k in exact
    )
    assert extra_hits <= max(50, 0.05 * total_grams)


def test_bloom_deterministic_and_fp_rate(spark):
    """Disjoint vocabularies: zero true overlaps, so every hit is a
    false positive — measures the realized FP rate against the budget
    and pins determinism across two builds."""
    bench = spark.createDataFrame(
        [(i, " ".join(f"b{i}w{j}" for j in range(12))) for i in range(60)],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(i, " ".join(f"c{i}w{j}" for j in range(12))) for i in range(300)],
        "doc_id long, text string",
    )
    b1 = build_ngram_bloom(bench, "text", "doc_id", n=3, fp_rate=0.01)
    b2 = build_ngram_bloom(bench, "text", "doc_id", n=3, fp_rate=0.01)
    assert np.array_equal(b1.bits, b2.bits) and (b1.m, b1.k) == (b2.m, b2.k)
    hits = bloom_flag_contaminated(corpus, b1, "text", "doc_id").collect()
    n_corpus_grams = 300 * 10  # 12 words -> 10 distinct 3-grams per doc
    fp_hits = sum(r.n_hit_ngrams for r in hits)
    # expected ~1% of 3000 = 30; allow generous slack for hash luck
    assert fp_hits <= 0.05 * n_corpus_grams, f"fp rate blown: {fp_hits}/{n_corpus_grams}"


def test_bloom_empty_benchmark(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    corpus = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    b = build_ngram_bloom(empty, "text", "doc_id", n=3)
    assert b.n_grams == 0
    assert bloom_flag_contaminated(corpus, b, "text", "doc_id").count() == 0


def test_bloom_build_bounds_and_validation(spark):
    bench = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        "doc_id long, text string",
    )
    b = build_ngram_bloom(bench, "text", "doc_id", n=3, fp_rate=0.01)
    # optimal sizing: ~9.6 bits/gram at 1%, k ≈ 7
    assert b.m >= 9 * b.n_grams and b.k >= 5
    assert len(b.bits) == b.m >> 6
    with pytest.raises(ValueError):
        build_ngram_bloom(bench, "text", "doc_id", fp_rate=0)


def test_bloom_contains_batch_direct():
    """Unit math check without Spark: inserted positions always hit."""
    bits = np.zeros(16, dtype=np.uint64)  # m = 1024
    b = NgramBloom(bits, 1024, 3, 3, 0)
    h1 = np.array([5, 700], dtype=np.int64)
    h2 = np.array([11, 13], dtype=np.int64)
    for a, c in zip(h1, h2):
        for i in range(3):
            pos = (int(a) + i * int(c)) % 1024
            bits[pos >> 6] |= np.uint64(1) << np.uint64(pos & 63)
    assert b.contains_batch(h1, h2).all()
    assert not b.contains_batch(
        np.array([6], dtype=np.int64), np.array([11], dtype=np.int64)
    ).any()


def test_streaming_bloom_decontaminate(spark, tmp_path):
    """Streaming ingest with the Bloom blocklist: contaminated docs
    (sharing an n-gram with the static benchmark) never reach the
    table; clean docs land; full replay under a fresh checkpoint
    inserts nothing (idempotent keyed append)."""
    import os

    from a2b_spark.streaming.filters import run_bloom_decontaminate_stream
    from a2b_spark.storage.table import VersionedParquetTable

    bench = spark.createDataFrame(
        [(900, "s1 s2 s3 s4 s5 s6")], "doc_id long, text string"
    )
    bloom = build_ngram_bloom(bench, "text", "doc_id", n=5, fp_rate=0.001)

    src = str(tmp_path / "in")
    os.makedirs(src)
    table = VersionedParquetTable(str(tmp_path / "clean"), key_cols=("doc_id",))

    def run(ckpt):
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        run_bloom_decontaminate_stream(
            spark, stream, bloom, "text", "doc_id", table, str(tmp_path / ckpt)
        ).awaitTermination(120)

    clean_rows = [(i, f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f") for i in range(10)]
    dirty_rows = [(100, "x s1 s2 s3 s4 s5 y"), (101, "s1 s2 s3 s4 s5 s6")]
    spark.createDataFrame(clean_rows + dirty_rows, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)
    run("ck1")
    got = {r.doc_id for r in table.read(spark).collect()}
    assert got == {i for i, _ in clean_rows}

    # second delivery: more clean docs + replayed contamination
    spark.createDataFrame(
        [(20, "v1 v2 v3 v4 v5 v6"), (102, "z s2 s3 s4 s5 s6 w")],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    run("ck1")
    assert {r.doc_id for r in table.read(spark).collect()} == set(range(10)) | {20}

    # full replay, fresh checkpoint: keyed append inserts nothing new
    before = sorted(map(tuple, table.read(spark).collect()))
    run("ck_replay")
    assert sorted(map(tuple, table.read(spark).collect())) == before


def test_bloom_min_bits_rounded_and_m_capped(spark):
    """min_bits not a multiple of 64 must not produce an unaddressable
    tail (probe IndexError), and an over-2^31 m must raise loudly
    instead of silently blowing the fp contract (round-5 review)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    b = build_ngram_bloom(empty, "text", "doc_id", n=3, min_bits=1000)
    assert b.m % 64 == 0 and len(b.bits) == b.m >> 6
    # probes across the whole range must not crash
    h = np.arange(0, 2000, 7, dtype=np.int64)
    assert not b.contains_batch(h, (h | 1)).any()

    import a2b_spark.operators.bloom as BL

    class _Fake:
        def count(self):
            return 10**9
        def select(self, *a):
            return self
        def distinct(self):
            return self
    orig = BL._gram_hashes
    BL._gram_hashes = lambda *a, **k: _Fake()
    try:
        with pytest.raises(ValueError, match="2\\^31 addressing limit"):
            build_ngram_bloom(empty, "text", "doc_id", n=3, fp_rate=0.01)
    finally:
        BL._gram_hashes = orig


def test_bloom_broadcast_handle_reuse(spark):
    """bloom_flag_contaminated must accept a pre-broadcast handle (the
    once-per-stream discipline) and produce the same result."""
    from a2b_spark.operators.bloom import broadcast_bloom

    bench = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(10, "z a b c d y"), (11, "q r s t")], "doc_id long, text string"
    )
    b = build_ngram_bloom(bench, "text", "doc_id", n=3)
    bc = broadcast_bloom(spark, b)
    via_handle = sorted(
        map(tuple, bloom_flag_contaminated(corpus, bc, "text", "doc_id").collect())
    )
    direct = sorted(
        map(tuple, bloom_flag_contaminated(corpus, b, "text", "doc_id").collect())
    )
    assert via_handle == direct and via_handle


def test_streaming_embedding_decontaminate(spark, tmp_path):
    """Streaming embedding decontamination == the batch operator: docs
    whose nearest benchmark cosine >= threshold never land; null
    embeddings pass through; replay under a fresh checkpoint inserts
    nothing (idempotent keyed append)."""
    import os

    from a2b_spark.operators.similarity import nearest_in_set
    from a2b_spark.streaming.filters import run_embedding_decontaminate_stream
    from a2b_spark.storage.table import VersionedParquetTable

    bench = spark.createDataFrame(
        [(900, [1.0, 0.0, 0.0]), (901, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = [
        (1, [0.99, 0.1, 0.0]),   # ~bench 900 -> dropped
        (2, [0.0, 0.0, 1.0]),    # orthogonal -> kept
        (3, [0.1, 0.99, 0.0]),   # ~bench 901 -> dropped
        (4, [1.0, 1.0, 1.0]),    # cos ~0.577 < 0.9 -> kept
        (5, None),               # null embedding -> kept (unscored)
    ]
    src = str(tmp_path / "ein")
    os.makedirs(src)
    table = VersionedParquetTable(str(tmp_path / "eclean"), key_cols=("vec_id",))

    def run(ckpt):
        stream = spark.readStream.schema(
            "vec_id long, embedding array<double>"
        ).parquet(src)
        run_embedding_decontaminate_stream(
            spark, stream, bench, "embedding", "vec_id", 0.9,
            table, str(tmp_path / ckpt),
        ).awaitTermination(120)

    batch_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    batch_df.write.mode("append").parquet(src)
    run("eck1")
    got = {r.vec_id for r in table.read(spark).collect()}

    # batch twin: same threshold decision on the same rows
    nn = nearest_in_set(batch_df, bench, "embedding", "vec_id")
    hot = {r.vec_id for r in nn.collect() if r.cos >= 0.9}
    expect = {i for i, _ in rows} - hot
    assert got == expect == {2, 4, 5}

    # replay with a fresh checkpoint: nothing new inserted
    before = sorted(r.vec_id for r in table.read(spark).collect())
    run("eck_replay")
    assert sorted(r.vec_id for r in table.read(spark).collect()) == before


def test_streaming_line_cleanup(spark, tmp_path):
    """Streaming twin of the linedup stage: every arriving doc has the
    static boilerplate lines stripped (== the batch strip_lines twin),
    docs are cleaned never dropped, and full replay under a fresh
    checkpoint inserts nothing (idempotent keyed append)."""
    import os

    from a2b_spark.operators.lines import boilerplate_lines, strip_lines
    from a2b_spark.storage.table import VersionedParquetTable
    from a2b_spark.streaming.filters import run_line_cleanup_stream

    # reference corpus: banner shared by 3 docs -> frozen boilerplate set
    ref = spark.createDataFrame(
        [(900, "BANNER\nref a"), (901, "BANNER\nref b"), (902, "BANNER\nref c")],
        "doc_id long, text string",
    )
    bp = boilerplate_lines(ref, "text", "doc_id", min_docs=3)
    assert {r.line for r in bp.collect()} == {"BANNER"}

    src = str(tmp_path / "in")
    os.makedirs(src)
    table = VersionedParquetTable(str(tmp_path / "clean"), key_cols=("doc_id",))

    def run(ckpt):
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        run_line_cleanup_stream(
            spark, stream, bp, "text", "doc_id", table, str(tmp_path / ckpt)
        ).awaitTermination(120)

    rows = [
        (1, "BANNER\nbody one"),
        (2, "body two\nBANNER"),
        (3, "no banner here"),
        (4, "BANNER"),
    ]
    batch_in = spark.createDataFrame(rows, "doc_id long, text string")
    batch_in.write.mode("append").parquet(src)
    run("ck1")
    got = {r.doc_id: r.text for r in table.read(spark).collect()}
    want = {
        r.doc_id: r.text
        for r in strip_lines(batch_in, "text", "doc_id", bp).collect()
    }
    assert got == want == {
        1: "body one", 2: "body two", 3: "no banner here", 4: ""
    }

    # replay everything under a fresh checkpoint: nothing new lands
    v_before = table.current_version()
    run("ck2")
    assert {r.doc_id: r.text for r in table.read(spark).collect()} == want
