"""Scale-trajectory measurement for the dedup spine (round-5 brief
item: turn the 100 TB design argument into measured growth).

Times the banded-LSH + connected-components queries (q26 minhash
pairs, q44 dup clusters, q49 dedup apply) across sf0.01, sf0.1 and
synthesized 10×/100× sf0.1 documents tables (~50k / ~500k docs), then
fits the scaling exponent  t ∝ n^alpha  by least squares over the
log-log points. Expected ~linear (alpha ≈ 1) for banded LSH +
O(log n) CC; alpha ≈ 2 would betray a hidden all-pairs stage.

The synthesis replicates sf0.1 `mult` times with disjoint doc_ids and
a copy-specific suffix appended to EVERY token, so shingle sets
across copies share nothing: within-copy near-dup structure is
preserved exactly, cross-copy similarity is zero, and the true pair
count grows linearly with the data — the honest scale-up for a
similarity workload (naive replication would instead make every doc a
(mult-1)-way near-duplicate of its clones and inflate the candidate
stage quadratically). Synthetic data lives under /tmp (driver
testdata is read-only); other tables are symlinked from sf0.1 so any
registry query can run against the directory.

Usage: python tools/scale_trajectory.py [--runs 2] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    # the dedup spine (round 5)
    "q26_near_dup_minhash_lsh",
    "q44_dup_clusters",
    "q49_dedup_apply",
    # round 6: the next heaviest families — PPJoin exact jaccard (the
    # one super-linear 10x point before the PPJoin+ df-ordering),
    # span detect/remove, keep-best survivor, TF-IDF
    "q25_near_dup_exact_jaccard",
    "q67_dup_ngram_spans",
    "q70_remove_dup_spans",
    "q68_dedup_keep_best",
    "q47_tfidf_top_terms",
    # round 6b: the new documents-bound joins — source-level gram
    # overlap (distinct + gram-keyed self-join) and PMI bigrams
    # (two wordcount shuffles + vocabulary joins)
    "q114_source_overlap",
    "q115_pmi_bigrams",
    # round 7: the embeddings/lineitem tranches (scaled copies of
    # those tables are synthesized too) — SemDeDup with self-tuning
    # k (the cluster-bounded pair-search claim), the co-supply graph
    # census pair, and the join-skew report
    "q113_semantic_dedup",
    "q119_triangle_count",
    "q120_common_neighbors",
    "q121_join_skew_report",
    # round 7b: the Zipf top-200 (wordcount + salted top-k, expected
    # ≈ q47 tfidf). q137 decontam is deliberately NOT here: its
    # vec_id%50 stand-in grows the reference WITH the corpus, so a
    # trajectory would measure the stand-in's O(n²/50), not the
    # operator's contract (fixed benchmark ⇒ linear in corpus —
    # nearest_in_set is one broadcast + one map pass by construction).
    "q138_zipf_slope",
    # round 9: gram first-seen agg + gram-keyed join back — expected
    # ≈ the q114 source-overlap family (same gram-keyed shuffles)
    "q152_ngram_novelty_curve",
    # round 12: the new curation surfaces — line dedup (posexplode +
    # digest count + rebuild), per-domain cap (salted two-phase
    # top-k), and the 6-stage CLI chain whose LM retrains on the
    # growing corpus (the one expected super-constant term)
    "q174_boilerplate_line_removal",
    "q172_domain_frequency_cap",
    "q171_curation_cli_full",
]


def build_scaled(spark, mult: int) -> str:
    """mult× sf0.1 documents with disjoint ids and token-disjoint
    copies; sibling tables symlinked from sf0.1."""
    from pyspark.sql import functions as F

    out_dir = f"/tmp/a2b_scale_{mult}x"
    if not os.path.exists(os.path.join(out_dir, "documents.parquet", "_SUCCESS")):
        os.makedirs(out_dir, exist_ok=True)
        base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        n = base.agg(F.max("doc_id")).first()[0] + 1
        # one generator pass instead of a mult-way union: explode a
        # per-row copy index, then rewrite ids/tokens per copy. The
        # replacement string is built per row ("$1cK"), so every token
        # gets the copy suffix and shingles never collide across copies.
        out = base.withColumn(
            "k", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
        ).select(
            (F.col("doc_id") + F.col("k") * n).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1c"), F.col("k").cast("string")),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, "documents.parquet")
        )
    # embeddings: mult disjoint-id copies; each copy's vectors are
    # dimension-ROLLED by (k mod 64) and sign-flipped past 64 rolls —
    # norms and within-copy geometry are preserved exactly while
    # cross-copy cosine structure decorrelates, so semantic-dup pair
    # counts grow linearly (naive replication would make every vector
    # a (mult-1)-way exact duplicate and inflate the pair stage
    # quadratically). 128 distinct transforms cover mult <= 128.
    emb_dst = os.path.join(out_dir, "embeddings.parquet")
    if os.path.islink(emb_dst):
        os.unlink(emb_dst)  # replace a symlink from an older layout
    if not os.path.exists(os.path.join(emb_dst, "_SUCCESS")):
        base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        n = base.agg(F.max("vec_id")).first()[0] + 1
        dim = 64
        rolled = F.expr(
            f"concat(slice(embedding, pmod(k, {dim}) + 1, {dim} - pmod(k, {dim})), "
            f"slice(embedding, 1, pmod(k, {dim})))"
        )
        out = (
            base.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
            .select(
                (F.col("vec_id") + F.col("k") * n).alias("vec_id"),
                F.when(F.col("embedding").isNull(), F.lit(None))
                .otherwise(
                    F.transform(
                        rolled,
                        lambda x: (
                            x
                            * F.when(F.col("k") >= 64, F.lit(-1.0)).otherwise(F.lit(1.0))
                        ).cast("float"),
                    )
                )
                .alias("embedding"),
                # keep the full schema: label rides unchanged per copy
                # (q136 cluster purity reads it; distribution preserved)
                F.col("label"),
            )
        )
        out.repartition(32).write.mode("overwrite").parquet(emb_dst)
    # lineitem: mult copies with ALL three FK spaces shifted per copy
    # (orders, parts and suppliers all scale with a real SF increase),
    # so the co-supply graph becomes mult disjoint copies — vertices
    # and edges grow linearly, per-key row counts stay flat.
    li_dst = os.path.join(out_dir, "lineitem.parquet")
    if os.path.islink(li_dst):
        os.unlink(li_dst)
    if not os.path.exists(os.path.join(li_dst, "_SUCCESS")):
        base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        maxes = base.agg(
            F.max("l_orderkey").alias("o"),
            F.max("l_partkey").alias("p"),
            F.max("l_suppkey").alias("s"),
        ).first()
        out = base.withColumn(
            "k", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
        )
        out = out.select(
            *[
                (
                    (F.col(c) + F.col("k") * (maxes["o"] + 1)).alias(c)
                    if c == "l_orderkey"
                    else (F.col(c) + F.col("k") * (maxes["p"] + 1)).alias(c)
                    if c == "l_partkey"
                    else (F.col(c) + F.col("k") * (maxes["s"] + 1)).alias(c)
                    if c == "l_suppkey"
                    else F.col(c)
                )
                for c in base.columns
            ]
        )
        out.repartition(32).write.mode("overwrite").parquet(li_dst)
    for t in (
        "region nation customer supplier part orders events"
    ).split():
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.lexists(dst):  # exists() follows (dangling) links
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    return out_dir


def storage_probes(spark) -> dict:
    """Round-9 brief item: the dedup spine has measured alphas — the
    lakehouse paths get the same treatment. Times (a) stats-sidecar
    prune PLANNING at 10k/100k entries via the PRODUCTION path
    (load + keep_files — not the introspection helper that
    materializes every dropped rel), (b) the appends-stream drain
    (planning + vectorized pyarrow read, no Spark jobs) over 24- vs
    192-commit windows of one epoch-partitioned history, (c) the
    changes-source drain over the EARLY 24 vs the LATE 72 commits of
    one 96-commit CDF history, and (d) TableChangesStream's
    per-commit diff cost over the same early/late windows (one Spark
    join per commit — the early-vs-late per-commit ratio must stay
    ≈ 1; a ratio growing with commit index would betray an
    O(history) per-diff cost)."""
    import shutil as _sh
    import tempfile
    import time as _time

    from pyspark.sql import functions as F

    from a2b_spark.storage import stats as _stats
    from a2b_spark.storage.cdf import (
        TableChangesStream,
        _AppendsStreamReader,
        _ChangesStreamReader,
    )
    from a2b_spark.storage.table import VersionedParquetTable

    out: dict = {}

    # (a) prune planning vs sidecar size — pure driver cost; the
    # 10k→100k→1M decades give the planning alpha at a 100× file count
    for n in (10_000, 100_000, 1_000_000):
        stats = {
            "version": _stats.STATS_FORMAT_VERSION,
            "files": {
                f"part-{i:07d}.parquet": {
                    "rows": 1000,
                    "cols": {
                        "k": {
                            "t": "i",
                            "min": i * 1000,
                            "max": i * 1000 + 999,
                            "nulls": 0,
                        }
                    },
                }
                for i in range(n)
            },
        }
        d = tempfile.mkdtemp(prefix="a2b_stats_probe_")
        _stats.write_stats(d, stats)
        all_files = [f"part-{i:07d}.parquet" for i in range(n)]
        best = math.inf
        kept = []
        for _ in range(3):
            t0 = _time.perf_counter()
            tbl = _stats.load_stats_arrow(d)
            preds = _stats.normalize_predicates(
                [("k", "between", (n * 500, n * 500 + 10_000))]
            )
            kept = _stats.keep_files(tbl, all_files, preds)
            best = min(best, _time.perf_counter() - t0)
        _sh.rmtree(d, ignore_errors=True)
        out[f"stats_prune_plan_{n}_files"] = {
            "sec": round(best, 4),
            "kept": len(kept),
        }

    # (b) appends drain: one 192-commit epoch history, windowed drains
    ap_dir = tempfile.mkdtemp(prefix="a2b_appends_probe_")
    _sh.rmtree(ap_dir)
    t = VersionedParquetTable(
        ap_dir,
        key_cols=("k",),
        partition_by=("epoch",),
        partitions_derived_from_keys=True,
        retention=300,
    )
    one = spark.createDataFrame([(i, 0, float(i)) for i in range(64)],
                                "k long, epoch int, x double")
    for e in range(192):
        t.append(one.withColumn("epoch", F.lit(e).cast("int")))
    r = _AppendsStreamReader({"path": ap_dir})

    def _drain_appends(hi: int) -> float:
        best = math.inf
        for _ in range(3):
            t0 = _time.perf_counter()
            rows = 0
            for p in r.partitions({"version": 0}, {"version": hi}):
                for b in r.read(p):
                    rows += b.num_rows
            assert rows == 64 * hi
            best = min(best, _time.perf_counter() - t0)
        return best

    lo_s, hi_s = _drain_appends(24), _drain_appends(192)
    out["appends_drain"] = {
        "sec_24_commits": round(lo_s, 4),
        "sec_192_commits": round(hi_s, 4),
        "time_ratio_vs_8x_commits": round(hi_s / lo_s, 2),
    }

    # (c)+(d) EARLY vs LATE windows of one growing CDF history: build
    # 24 merges, measure both consumers, extend to 96, measure the
    # late-72 continuation — a per-commit cost that grows with commit
    # index shows up as late/early per-commit ratio > 1
    cd_dir = tempfile.mkdtemp(prefix="a2b_changes_probe_")
    _sh.rmtree(cd_dir)
    tc = VersionedParquetTable(cd_dir, key_cols=("k",), retention=300)
    tc.overwrite(one.select("k", "x"))
    tc.enable_cdf()

    def _merge_upto(n_from: int, n_to: int) -> None:
        for i in range(n_from, n_to):
            # +0.5 keeps the update a REAL change (x starts at float(k))
            tc.merge(
                spark.createDataFrame([(i % 64, i + 0.5), (1000 + i, 1.0)],
                                      "k long, x double")
            )

    rc = _ChangesStreamReader({"path": cd_dir})

    def _drain_changes(lo_v: int, hi_v: int, want_rows: int) -> float:
        best = math.inf
        for _ in range(3):
            t0 = _time.perf_counter()
            rows = 0
            for p in rc.partitions({"version": lo_v}, {"version": hi_v}):
                for b in rc.read(p):
                    rows += b.num_rows
            assert rows == want_rows
            best = min(best, _time.perf_counter() - t0)
        return best

    ck = tempfile.mkdtemp(prefix="a2b_tcs_ck_")
    s = TableChangesStream(tc, spark, ck, start_version=2)

    def _stream_drain() -> tuple[float, int]:
        seen = []
        t0 = _time.perf_counter()
        s.process_available(lambda df, v: seen.append(df.count()))
        return _time.perf_counter() - t0, len(seen)

    _merge_upto(0, 24)          # commits v3..v26
    early_c = _drain_changes(2, 26, 2 * 24)
    early_s, early_n = _stream_drain()
    _merge_upto(24, 96)         # commits v27..v98
    late_c = _drain_changes(26, 98, 2 * 72)
    late_s, late_n = _stream_drain()

    out["changes_source_drain"] = {
        "sec_early_24_commits": round(early_c, 4),
        "sec_late_72_commits": round(late_c, 4),
        "per_commit_late_vs_early": round(
            (late_c / 72) / (early_c / 24), 2
        ),
    }
    out["table_changes_stream"] = {
        "sec_per_commit_early": round(early_s / max(1, early_n), 3),
        "sec_per_commit_late": round(late_s / max(1, late_n), 3),
        "per_commit_late_vs_early": round(
            (late_s / max(1, late_n)) / (early_s / max(1, early_n)), 2
        ),
        "commits": early_n + late_n,
    }
    _sh.rmtree(ck, ignore_errors=True)
    _sh.rmtree(ap_dir, ignore_errors=True)
    _sh.rmtree(cd_dir, ignore_errors=True)

    # (e)+(f) 100× commit histories, FABRICATED driver-side (2400 real
    # Spark commits would take an hour and measure the writer, not the
    # reader): every artifact the planners consume is production-shaped
    # — real parquet data/change files (hardlinked template), per-
    # version _COMMIT_INFO/_ADDED/_STATS/_SCHEMA. Windows at 24/240/
    # 2400 commits give the drain alpha across two decades; the
    # _ADDED-based planner should hold time_ratio ≈ commit ratio
    # (linear), where the pre-round-10 full-map diff was quadratic in
    # sidecar entries.
    out["appends_drain_100x"] = _appends_drain_100x(_time, _sh)
    out["changes_drain_100x"] = _changes_drain_100x(_time, _sh)
    return out


def _fab_schema_json() -> str:
    from pyspark.sql import types as T

    return json.dumps(
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("x", T.DoubleType()),
                T.StructField("epoch", T.IntegerType()),
            ]
        ).jsonValue()
    )


def _fabricate_appends_history(root: str, commits: int, rows: int = 64) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from a2b_spark.storage import stats as _stats

    os.makedirs(root)
    tpl = os.path.join(root, ".template.parquet")
    pq.write_table(
        pa.table(
            {"k": list(range(rows)), "x": [float(i) for i in range(rows)]}
        ),
        tpl,
    )
    schema_json = _fab_schema_json()
    files_map: dict = {}
    info = json.dumps({"op": "append", "ts": "2026-01-01T00:00:00+00:00"})
    v1info = json.dumps({"op": "overwrite", "ts": "2026-01-01T00:00:00+00:00"})
    for n in range(1, commits + 1):
        vdir = os.path.join(root, f"v_{n:010d}")
        rel = f"epoch={n - 1}/part-00000.parquet"
        os.makedirs(os.path.join(vdir, f"epoch={n - 1}"))
        os.link(tpl, os.path.join(vdir, rel))
        files_map[rel] = {"rows": rows, "cols": {}}
        _stats.write_stats(
            vdir, {"version": _stats.STATS_FORMAT_VERSION, "files": dict(files_map)}
        )
        with open(os.path.join(vdir, "_ADDED"), "w") as f:
            f.write(json.dumps([rel]))
        with open(os.path.join(vdir, "_SCHEMA"), "w") as f:
            f.write(schema_json)
        with open(os.path.join(vdir, "_COMMIT_INFO"), "w") as f:
            f.write(v1info if n == 1 else info)
    with open(os.path.join(root, "_CURRENT"), "w") as f:
        f.write(f"v_{commits:010d}")


def _appends_drain_100x(_time, _sh) -> dict:
    import tempfile

    from a2b_spark.storage.cdf import _AppendsStreamReader

    root = tempfile.mkdtemp(prefix="a2b_appends_100x_")
    _sh.rmtree(root)
    t0 = _time.perf_counter()
    _fabricate_appends_history(root, 2400)
    build = _time.perf_counter() - t0
    r = _AppendsStreamReader({"path": root})

    def _drain(hi: int, repeats: int) -> float:
        best = math.inf
        for _ in range(repeats):
            t0 = _time.perf_counter()
            rows = 0
            for p in r.partitions({"version": 0}, {"version": hi}):
                for b in r.read(p):
                    rows += b.num_rows
            assert rows == 64 * hi
            best = min(best, _time.perf_counter() - t0)
        return best

    s24, s240, s2400 = _drain(24, 3), _drain(240, 3), _drain(2400, 2)
    _sh.rmtree(root, ignore_errors=True)
    return {
        "build_sec": round(build, 2),
        "sec_24": round(s24, 4),
        "sec_240": round(s240, 4),
        "sec_2400": round(s2400, 4),
        "ratio_10x": round(s240 / s24, 2),
        "ratio_100x": round(s2400 / s24, 2),
        "alpha_top_decade": round(math.log(s2400 / s240) / math.log(10), 3),
    }


def _changes_drain_100x(_time, _sh) -> dict:
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from a2b_spark.storage.cdf import _ChangesStreamReader

    root = tempfile.mkdtemp(prefix="a2b_changes_100x_")
    _sh.rmtree(root)
    os.makedirs(root)
    data_tpl = os.path.join(root, ".data.parquet")
    pq.write_table(
        pa.table({"k": list(range(64)), "x": [float(i) for i in range(64)]}),
        data_tpl,
    )
    cdf_tpl = os.path.join(root, ".cdf.parquet")
    pq.write_table(
        pa.table({"k": [0, 1], "x": [1.0, 2.0], "change": ["update", "insert"]}),
        cdf_tpl,
    )
    from pyspark.sql import types as T

    schema_json = json.dumps(
        T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("x", T.DoubleType())]
        ).jsonValue()
    )
    commits = 2400
    t0 = _time.perf_counter()
    for n in range(1, commits + 1):
        vdir = os.path.join(root, f"v_{n:010d}")
        os.makedirs(vdir)
        with open(os.path.join(vdir, "_SCHEMA"), "w") as f:
            f.write(schema_json)
        with open(os.path.join(vdir, "_COMMIT_INFO"), "w") as f:
            f.write(
                json.dumps(
                    {
                        "op": "overwrite" if n == 1 else "merge",
                        "ts": "2026-01-01T00:00:00+00:00",
                    }
                )
            )
        if n == 1:
            os.link(data_tpl, os.path.join(vdir, "part-00000.parquet"))
        else:
            os.makedirs(os.path.join(vdir, "_cdf"))
            os.link(cdf_tpl, os.path.join(vdir, "_cdf", "part-00000.parquet"))
    with open(os.path.join(root, "_CURRENT"), "w") as f:
        f.write(f"v_{commits:010d}")
    build = _time.perf_counter() - t0
    r = _ChangesStreamReader({"path": root})

    def _drain(hi: int, repeats: int) -> float:
        best = math.inf
        for _ in range(repeats):
            t0 = _time.perf_counter()
            rows = 0
            for p in r.partitions({"version": 0}, {"version": hi}):
                for b in r.read(p):
                    rows += b.num_rows
            assert rows == 64 + 2 * (hi - 1)
            best = min(best, _time.perf_counter() - t0)
        return best

    s24, s240, s2400 = _drain(24, 3), _drain(240, 3), _drain(2400, 2)
    _sh.rmtree(root, ignore_errors=True)
    return {
        "build_sec": round(build, 2),
        "sec_24": round(s24, 4),
        "sec_240": round(s240, 4),
        "sec_2400": round(s2400, 4),
        "ratio_10x": round(s240 / s24, 2),
        "ratio_100x": round(s2400 / s24, 2),
        "alpha_top_decade": round(math.log(s2400 / s240) / math.log(10), 3),
    }


def bpe_probe(spark) -> dict:
    """Scale trajectory for the BPE tokenizer (round-10 operator):
    train cost per merge round is one aggregation over the DISTINCT-
    word table, so the growth axis that matters is vocabulary, not
    corpus rows — the token-disjoint 10× corpus grows vocab ~10×
    (every token gets a copy suffix), the honest worst case. Encode
    is a pure map and must track corpus size ~linearly."""
    import time as _t

    from pyspark.sql import functions as F

    from a2b_spark.operators.bpe import bpe_encode, bpe_train, _word_freqs

    out: dict = {}
    scales = [
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        ("10x", build_scaled(spark, 10)),
    ]
    for label, d in scales:
        docs = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text"
        )
        vocab = _word_freqs(docs, "text").count()
        t0 = _t.time()
        merges = bpe_train(docs, "text", n_merges=15)
        t_train = round(_t.time() - t0, 2)
        t0 = _t.time()
        n_tok = bpe_encode(docs, "text", merges, "doc_id").agg(
            F.sum("n_tokens")
        ).first()[0]
        t_encode = round(_t.time() - t0, 2)
        out[label] = {
            "vocab": int(vocab),
            "n_merges": len(merges),
            "train_s": t_train,
            "encode_s": t_encode,
            "tokens": int(n_tok),
        }
    # growth ratios on the top decade (sf0.1 → 10×): vocab grows ~10×,
    # so train per-round cost should grow sublinearly in CORPUS bytes
    # (the corpus is scanned once; rounds see only the word table).
    # Encode is normalized PER OUTPUT TOKEN: the token-disjoint corpus
    # inflates token counts (suffixes lengthen every word and change
    # the learned merges), so raw wall ratio over-counts the growth —
    # per-token cost is the honest linearity measure for a pure map.
    out["train_ratio_10x"] = round(out["10x"]["train_s"] / out["sf0.1"]["train_s"], 2)
    out["encode_ratio_10x"] = round(
        out["10x"]["encode_s"] / out["sf0.1"]["encode_s"], 2
    )
    out["encode_us_per_token"] = {
        k: round(1e6 * out[k]["encode_s"] / out[k]["tokens"], 3)
        for k in ("sf0.01", "sf0.1", "10x")
    }
    out["encode_per_token_ratio_10x"] = round(
        out["encode_us_per_token"]["10x"] / out["encode_us_per_token"]["sf0.1"], 2
    )
    # the realistic-parameterization leg (round-12 verdict item 4): a
    # production tokenizer is 30k-50k merges, so wall must be
    # SUB-LINEAR in merges — merge batching packs many merges into one
    # aggregation round. The sf docs have a 31-word vocabulary (they
    # cannot support 1000 merges), so train on a synthetic
    # Zipf-frequency corpus of 20k distinct md5-hex words — the
    # distinct-count regime a real crawl's word table lives in.
    # Record rounds (the actual Spark-job count) and the wall ratio
    # 1000-vs-100 merges (linear cost would be ~10×).
    zipf = (
        spark.range(20000)
        .select(
            F.substring(F.md5(F.col("id").cast("string")), 1, 10).alias(
                "word"
            ),
            F.explode(
                F.sequence(
                    F.lit(1), (F.lit(20000) / (F.col("id") + 1)).cast("int")
                )
            ).alias("rep"),
        )
        .select(F.col("word").alias("text"))
        .localCheckpoint()
    )
    batched = {}
    for n in (100, 1000):
        stats: dict = {}
        t0 = _t.time()
        merges = bpe_train(
            zipf, "text", n_merges=n, min_pair_count=2, stats_out=stats,
            local_word_cap=0,  # measure the DISTRIBUTED tier
        )
        batched[n] = {
            "wall_s": round(_t.time() - t0, 2),
            "merges": len(merges),
            "rounds": stats["rounds"],
        }
    out["batched_1000"] = {
        **batched[1000],
        "wall_100_s": batched[100]["wall_s"],
        "rounds_100": batched[100]["rounds"],
        "wall_ratio_1000_vs_100": round(
            batched[1000]["wall_s"] / batched[100]["wall_s"], 2
        ),
        "merges_per_round": round(
            batched[1000]["merges"] / max(batched[1000]["rounds"], 1), 1
        ),
    }
    # the LOCAL tier on the same corpus and merge budget (the round-13
    # production path: one distributed word-count pass, then exact
    # in-memory training) — wall should be seconds where the
    # distributed loop takes minutes, with an identical merge list.
    loc_stats: dict = {}
    t0 = _t.time()
    loc = bpe_train(
        zipf, "text", n_merges=1000, min_pair_count=2, stats_out=loc_stats
    )
    loc_wall = _t.time() - t0
    out["local_1000"] = {
        "wall_s": round(loc_wall, 2),
        "merges": len(loc),
        "mode": loc_stats["mode"],
        "identical_to_distributed": loc == merges,
        "speedup_vs_distributed": round(
            batched[1000]["wall_s"] / max(loc_wall, 1e-9), 1
        ),
    }
    return out


def dv_partitioned_probe(spark) -> dict:
    """Deletion-vector win on a PARTITIONED table: wall of a 5-key
    delete via the vector path (hardlink every file + key list) vs the
    partition-rewrite path on an identical table, across partition
    counts. The vector wall must stay ~flat while the rewrite wall
    tracks the touched partitions' bytes — the claim behind routing
    partitioned deletes through the DV branch first."""
    import shutil as _sh
    import time as _t

    from pyspark.sql import functions as F

    from a2b_spark.storage.table import VersionedParquetTable

    def mk_rows(n_parts):
        # ~600 MB logical: big enough that rewriting a partition
        # costs real I/O — at toy sizes the DV path's fixed job
        # overhead (pin + vector write + stats) exceeds a tiny
        # rewrite and the probe would measure the wrong regime
        return spark.range(1_500_000).select(
            F.col("id").alias("k"),
            (F.col("id") % n_parts).cast("int").alias("p"),
            F.repeat(F.md5(F.col("id").cast("string")), 12).alias("payload"),
        )

    def timed_delete(n_parts, mode, flag, tag):
        root = f"/tmp/a2b_dvprobe_{n_parts}_{mode}_{tag}"
        _sh.rmtree(root, ignore_errors=True)
        t = VersionedParquetTable(
            root, key_cols=("k",), partition_by=("p",), retention=3,
            deletion_vectors=flag,
        )
        t.overwrite(mk_rows(n_parts))
        keys = spark.createDataFrame([(i * 101,) for i in range(5)], "k long")
        t0 = _t.time()
        t.delete_keys(keys)
        dt = round(_t.time() - t0, 2)
        _sh.rmtree(root, ignore_errors=True)
        return dt

    # warm-up: the session's first delete pays JIT/codegen — measured
    # runs must not (the dv-first ordering otherwise penalizes dv)
    for mode, flag in (("dv", True), ("rewrite", False)):
        timed_delete(8, mode, flag, "warm")

    out: dict = {}
    for n_parts in (8, 64):
        res: dict = {}
        for mode, flag in (("dv", True), ("rewrite", False)):
            res[f"{mode}_s"] = min(
                timed_delete(n_parts, mode, flag, i) for i in range(2)
            )
        res["speedup"] = round(res["rewrite_s"] / max(res["dv_s"], 1e-9), 1)
        out[f"parts_{n_parts}"] = res
    return out


def lm_probe(spark) -> dict:
    """Scale trajectory for the stupid-backoff n-gram LM (round-10
    operator). Training is one corpus scan + one (k, gram) agg; the
    token-disjoint 10× corpus is the WORST case for the model table
    (every copy's grams are distinct, so the model grows ~10× with the
    corpus — real corpora saturate). Scoring is measured on BOTH join
    strategies: broadcast (vocab-bounded regime) and shuffle-hash (the
    web-scale path where the model outgrows a broadcast); per-token µs
    is the honest linearity measure for both."""
    import time as _t

    from pyspark.sql import functions as F

    from a2b_spark.operators.lm import ngram_lm_train, stupid_backoff_logp

    out: dict = {}
    scales = [
        ("sf0.01", "/root/testdata/sf0.01"),
        ("sf0.1", "/root/testdata/sf0.1"),
        ("10x", build_scaled(spark, 10)),
    ]
    for label, d in scales:
        docs = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text"
        )
        t0 = _t.time()
        model = ngram_lm_train(docs, "text", order=3)
        n_grams = model.count()  # checkpointed: count is metadata-cheap
        t_train = round(_t.time() - t0, 2)
        entry = {"model_grams": int(n_grams), "train_s": t_train}
        for mode, bc in (("bcast", True), ("shuffle", False)):
            t0 = _t.time()
            n_tok = (
                stupid_backoff_logp(
                    docs, model, "doc_id", "text", 3, broadcast_model=bc
                )
                .agg(F.sum("n_tok"))
                .first()[0]
            )
            entry[f"score_{mode}_s"] = round(_t.time() - t0, 2)
            entry["tokens"] = int(n_tok)
        out[label] = entry
    for mode in ("bcast", "shuffle"):
        out[f"score_{mode}_us_per_token"] = {
            k: round(1e6 * out[k][f"score_{mode}_s"] / out[k]["tokens"], 3)
            for k in ("sf0.01", "sf0.1", "10x")
        }
        out[f"score_{mode}_per_token_ratio_10x"] = round(
            out[f"score_{mode}_us_per_token"]["10x"]
            / out[f"score_{mode}_us_per_token"]["sf0.1"],
            2,
        )
    out["train_ratio_10x"] = round(
        out["10x"]["train_s"] / out["sf0.1"]["train_s"], 2
    )
    return out


def skew_probe(spark) -> dict:
    """The 100-TB argument's previously-unmeasured leg (round-11
    verdict item 7): how the LSH near-dup surface behaves when the
    corpus is deliberately SKEWED — shared boilerplate shingles
    inflating band-bucket sizes (the hub-bucket case), plus a 90%-hot
    exact-dedup key (the boilerplate-URL case the map-side-combine
    formulation exists for).

    Corpora (2000 docs each — constant-size so the probe measures
    skew, not scale):
    - uniform: sf0.1 docs as-is
    - mild:    every doc prefixed with the SAME 10-token boilerplate
    - heavy:   every doc prefixed with the SAME 120-token boilerplate
               (pairwise jaccard pushed toward the LSH threshold — the
               regime where banding selectivity genuinely decays)
    - hotkey (exact-dedup only): 90% of docs share ONE text

    Recorded per corpus: band-bucket distribution (buckets, max, p99),
    candidate pairs, verified pairs, near-dup-pipeline wall
    (q26 shape), connected-components wall over the verified pairs
    (q44 shape), exact-dedup wall (q49 shape), and ratios vs uniform.
    Interpretation contract: candidate growth must track TRUE pair
    growth (boilerplate pushes real jaccard up — a quadratic true-pair
    set is the workload's property, not a blocking defect); the red
    flag is wall growing faster than candidates."""
    from pyspark.sql import functions as F

    from a2b_spark.operators.dedup import (
        _minhash_sigs,
        banded_signatures,
        exact_dedup,
        kgram_hash_docs,
        lsh_candidate_pairs,
        minhash_near_dup_pairs,
    )
    from a2b_spark.operators.graph import connected_components

    base = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .filter(F.col("doc_id") < 2000)
        .select("doc_id", "text")
        .localCheckpoint()
    )

    def boiler(n):
        return " ".join(f"bp{i}" for i in range(n))

    variants = {
        "uniform": base,
        "mild": base.select(
            "doc_id", F.concat(F.lit(boiler(10) + " "), "text").alias("text")
        ),
        "heavy": base.select(
            "doc_id", F.concat(F.lit(boiler(120) + " "), "text").alias("text")
        ),
    }
    out: dict = {}
    for tag, docs in variants.items():
        docs = docs.localCheckpoint()
        sh = kgram_hash_docs(docs, "text", "doc_id", 3).localCheckpoint()
        sigs = _minhash_sigs(sh, "doc_id", 64)
        buckets = (
            banded_signatures(sigs, "doc_id", 16, 4)
            .groupBy("band", "bh")
            .count()
        )
        bs = buckets.agg(
            F.count(F.lit(1)).alias("n"),
            F.max("count").alias("mx"),
            F.expr("percentile_approx(count, 0.99)").alias("p99"),
        ).first()
        n_cands = lsh_candidate_pairs(sigs, "doc_id", 16, 4, packable=True).count()
        t0 = time.perf_counter()
        n_pairs = minhash_near_dup_pairs(docs, "text", "doc_id", 0.8).count()
        w_pairs = time.perf_counter() - t0
        pairs = minhash_near_dup_pairs(docs, "text", "doc_id", 0.8)
        t0 = time.perf_counter()
        n_comp = (
            connected_components(pairs, "id_a", "id_b")
            .select("component")
            .distinct()
            .count()
            if n_pairs
            else 0
        )
        w_cc = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_kept = exact_dedup(
            docs.withColumn("fp", F.md5("text")), ["fp"], ["doc_id"]
        ).count()
        w_dedup = time.perf_counter() - t0
        out[tag] = {
            "buckets": int(bs["n"]),
            "max_bucket": int(bs["mx"]),
            "p99_bucket": int(bs["p99"]),
            "candidates": int(n_cands),
            "pairs": int(n_pairs),
            "components": int(n_comp),
            "dedup_survivors": int(n_kept),
            "wall_pairs_s": round(w_pairs, 2),
            "wall_cc_s": round(w_cc, 2),
            "wall_dedup_s": round(w_dedup, 2),
        }
        spark.catalog.clearCache()
    # hot exact-dedup key: 90% of docs collapse to one fingerprint
    hot = base.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 > 0, F.lit("the same boilerplate page"))
        .otherwise(F.col("text"))
        .alias("text"),
    ).localCheckpoint()
    t0 = time.perf_counter()
    n_kept = exact_dedup(
        hot.withColumn("fp", F.md5("text")), ["fp"], ["doc_id"]
    ).count()
    out["hotkey_dedup"] = {
        "survivors": int(n_kept),
        "wall_s": round(time.perf_counter() - t0, 2),
    }
    u = out["uniform"]
    for tag in ("mild", "heavy"):
        v = out[tag]
        v["ratios_vs_uniform"] = {
            "max_bucket": round(v["max_bucket"] / u["max_bucket"], 2),
            "candidates": round(v["candidates"] / max(u["candidates"], 1), 2),
            "wall_pairs": round(v["wall_pairs_s"] / u["wall_pairs_s"], 2),
            "wall_per_candidate": round(
                (v["wall_pairs_s"] / max(v["candidates"], 1))
                / (u["wall_pairs_s"] / max(u["candidates"], 1)),
                2,
            ),
        }
    return out


def orc_stats_probe(spark) -> dict:
    """ORC commit cost vs parquet (round-13 ORC fast paths): the ORC
    ``_STATS`` harvest is ONE distributed aggregation over the
    commit's NEW files (pyarrow exposes no ORC footer statistics),
    where parquet pays driver-side footer-only reads. Measured at 1M
    rows / 16 range-clustered files:

    - overwrite commit wall per format (the delta bounds the harvest
      overhead — both formats also pay their own encode costs),
    - a one-partition merge on a 16-partition table (hardlink stats
      reuse: only the touched partition's new files are harvested, so
      the ORC premium must NOT scale with table size),
    - prune parity: the two sidecars must make IDENTICAL skip
      decisions on the same band predicate.
    """
    import shutil
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from a2b_spark.storage.table import VersionedParquetTable

    base = tempfile.mkdtemp(prefix="orc_probe_")
    out: dict = {}
    try:
        df = spark.range(1_000_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 16).cast("int").alias("p"),
            (F.col("id") * 2).alias("v"),
            F.md5(F.col("id").cast("string")).alias("s"),
        )
        preds = [("k", "between", (0, 62_500))]
        # JIT/codegen warmup outside the measured walls (the first
        # format measured would otherwise absorb it)
        for fmt in ("parquet", "orc"):
            w = VersionedParquetTable(
                f"{base}/warm_{fmt}", key_cols=("k",), fmt=fmt
            )
            w.overwrite(df.limit(10_000).repartitionByRange(2, "k"))
        for fmt in ("parquet", "orc"):
            t = VersionedParquetTable(
                f"{base}/flat_{fmt}", key_cols=("k",), fmt=fmt
            )
            t0 = _t.time()
            t.overwrite(df.repartitionByRange(16, "k"))
            w_over = _t.time() - t0
            kept, total = t.prune_files(preds)
            # partitioned table: merge touches ONE partition
            tp = VersionedParquetTable(
                f"{base}/part_{fmt}", key_cols=("k",),
                partition_by=("p",), fmt=fmt,
            )
            tp.overwrite(df)
            t0 = _t.time()
            tp.merge(
                spark.createDataFrame(
                    [(0, 0, 999, "x")], "k long, p int, v long, s string"
                )
            )
            w_merge = _t.time() - t0
            out[fmt] = {
                "overwrite_s": round(w_over, 2),
                "merge_1part_s": round(w_merge, 2),
                "pruned_kept": len(kept),
                "pruned_total": total,
            }
        out["overwrite_orc_vs_parquet"] = round(
            out["orc"]["overwrite_s"] / out["parquet"]["overwrite_s"], 2
        )
        out["merge_orc_vs_parquet"] = round(
            out["orc"]["merge_1part_s"] / out["parquet"]["merge_1part_s"], 2
        )
        out["prune_parity"] = (
            out["orc"]["pruned_kept"] == out["parquet"]["pruned_kept"]
            and out["orc"]["pruned_total"] == out["parquet"]["pruned_total"]
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def linedup_probe(spark) -> dict:
    """The strip_lines broadcast-gate question (round-12 verdict item
    2): at C4's canonical min_docs=2 a duplicate-heavy corpus makes
    the boilerplate digest set corpus-sized, so the anti join's
    forced broadcast was a 100-TB OOM hazard. The operator now
    count-gates the hint; this probe builds exactly that corpus
    (every even-id doc duplicated under a shifted id — half the
    corpus's distinct lines become boilerplate), shows the shuffled
    fallback ENGAGE at an over-gate threshold, and records both
    paths' wall + an output checksum proving they agree."""
    from pyspark.sql import functions as F

    from a2b_spark.operators.lines import boilerplate_lines, strip_lines

    # the sf0.1 docs are single-line; rechunk each into 4-token lines
    # so the corpus has a real line structure (one line per 4-gram)
    toks = F.split("text", " ")
    base = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.floor((F.size(toks) - 1) / 4).cast("int"),
                    ),
                    lambda i: F.array_join(
                        F.slice(toks, i * 4 + 1, 4), " "
                    ),
                ),
                "\n",
            ).alias("text"),
        )
        .localCheckpoint()
    )
    corpus = base.unionByName(
        base.filter(F.col("doc_id") % 2 == 0).withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )
    ).localCheckpoint()
    n_docs = corpus.count()
    bpd = boilerplate_lines(
        corpus, "text", "doc_id", min_docs=2, representative=False
    ).localCheckpoint(eager=True)
    n_dig = bpd.count()
    gate = 5_000  # deliberately under the set size: fallback must engage

    def run(mode, **kw):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        out = strip_lines(
            corpus, "text", "doc_id", bpd, digest_col="lh",
            broadcast=mode, **kw
        )
        chk = out.agg(
            F.count(F.lit(1)).alias("n"),
            # 31-bit mask before the sum: raw xxhash64 overflows long
            # under ANSI (verify-skill round-6 note)
            F.sum(
                F.pmod(F.xxhash64("doc_id", "text"), F.lit(2 ** 31))
            ).alias("h"),
        ).first()
        return round(time.perf_counter() - t0, 2), (
            int(chk["n"]), int(chk["h"])
        )

    w_shuffle, c_shuffle = run("auto", broadcast_max_digests=gate)
    w_bcast, c_bcast = run("force")
    return {
        "corpus_docs": int(n_docs),
        "min_docs": 2,
        "bp_digests": int(n_dig),
        "gate": gate,
        "fallback_engaged": bool(n_dig > gate),
        "default_gate_2m_would_broadcast": bool(n_dig <= 2_000_000),
        "wall_shuffled_s": w_shuffle,
        "wall_broadcast_s": w_bcast,
        "outputs_equal": c_shuffle == c_bcast,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--lm",
        action="store_true",
        help="run ONLY the n-gram LM probe (train/score growth across "
        "sf0.01 / sf0.1 / token-disjoint 10x, broadcast AND "
        "shuffle-join scoring) and merge it into the out file",
    )
    ap.add_argument(
        "--dv",
        action="store_true",
        help="run ONLY the partitioned deletion-vector probe (vector "
        "vs partition-rewrite delete wall) and merge it into the "
        "out file",
    )
    ap.add_argument(
        "--storage",
        action="store_true",
        help="run ONLY the lakehouse storage probes (stats-prune "
        "planning, appends/changes stream drains, TableChangesStream "
        "per-commit cost) and merge them into the out file",
    )
    ap.add_argument(
        "--bpe",
        action="store_true",
        help="run ONLY the BPE tokenizer probe (train/encode growth "
        "across sf0.01 / sf0.1 / token-disjoint 10x) and merge it "
        "into the out file",
    )
    ap.add_argument(
        "--skew",
        action="store_true",
        help="run ONLY the LSH/dedup skew stress probe (boilerplate-"
        "shingle bucket inflation + hot exact-dedup key) and merge it "
        "into the out file",
    )
    ap.add_argument(
        "--linedup",
        action="store_true",
        help="run ONLY the strip_lines broadcast-gate probe (min_docs=2 "
        "duplicate-heavy corpus: shuffled fallback engages, both "
        "paths agree) and merge it into the out file",
    )
    ap.add_argument(
        "--orc",
        action="store_true",
        help="run ONLY the ORC commit-cost probe (distributed stats "
        "harvest vs parquet footer reads, prune parity) and merge it "
        "into the out file",
    )
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_TRAJECTORY.json"))
    ap.add_argument(
        "--only",
        nargs="*",
        default=None,
        help="sweep only these queries and MERGE into the existing out "
        "file (other entries kept) — for measuring a new tranche "
        "without the full ~35-min resweep",
    )
    args = ap.parse_args()
    if args.linedup:
        from a2b_spark.session import get_spark

        spark = get_spark("scale_trajectory_linedup")
        spark.sparkContext.setLogLevel("ERROR")
        doc = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["linedup"] = linedup_probe(spark)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({"linedup": doc["linedup"]}))
        return 0
    if args.skew:
        from a2b_spark.session import get_spark

        spark = get_spark("scale_trajectory_skew")
        spark.sparkContext.setLogLevel("ERROR")
        doc = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["skew"] = skew_probe(spark)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({"skew": doc["skew"]}))
        return 0
    if args.orc:
        from a2b_spark.session import get_spark

        spark = get_spark("scale_trajectory_orc")
        spark.sparkContext.setLogLevel("ERROR")
        doc = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["orc_stats"] = orc_stats_probe(spark)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({"orc_stats": doc["orc_stats"]}))
        return 0
    if args.dv:
        from a2b_spark.session import get_spark

        spark = get_spark("scale_trajectory_dv")
        spark.sparkContext.setLogLevel("ERROR")
        doc = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["dv_partitioned"] = dv_partitioned_probe(spark)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({"dv_partitioned": doc["dv_partitioned"]}))
        return 0
    if args.lm:
        from a2b_spark.session import get_spark

        spark = get_spark("scale_trajectory_lm")
        spark.sparkContext.setLogLevel("ERROR")
        doc = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["lm"] = lm_probe(spark)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({"lm": doc["lm"]}))
        return 0
    if args.bpe:
        from a2b_spark.session import get_spark

        spark = get_spark("scale_trajectory_bpe")
        spark.sparkContext.setLogLevel("ERROR")
        doc = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["bpe"] = bpe_probe(spark)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({"bpe": doc["bpe"]}))
        return 0
    if args.storage:
        from a2b_spark.session import get_spark

        spark = get_spark("scale_trajectory_storage")
        spark.sparkContext.setLogLevel("ERROR")
        doc = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["storage"] = storage_probes(spark)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(json.dumps({"storage": doc["storage"]}))
        return 0
    sweep = QUERIES if args.only is None else args.only
    unknown = set(sweep) - set(QUERIES)
    if unknown:
        raise SystemExit(f"--only names not in the sweep list: {sorted(unknown)}")

    from a2b_spark.session import get_spark
    from a2b_spark.queries import QUERIES as REGISTRY

    spark = get_spark("scale_trajectory")
    spark.sparkContext.setLogLevel("ERROR")

    # docs-count scale axis, sf0.1 = 1.0
    scales = [
        (0.1, "/root/testdata/sf0.01"),
        (1.0, "/root/testdata/sf0.1"),
        (10.0, build_scaled(spark, 10)),
        (100.0, build_scaled(spark, 100)),
    ]
    # warm: JVM, parquet reader, python workers
    from pyspark.sql import functions as F

    spark.range(1_000_000).select(F.sum("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict = {}
    if args.only is not None and os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get("queries", {})
    for name in sweep:
        fn = REGISTRY[name]
        per_scale = {}
        for mult, d in scales:
            best = math.inf
            for _ in range(args.runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            per_scale[mult] = round(best, 3)
            print(f"# {name} x{mult}: {per_scale[mult]}s", file=sys.stderr)
        # least-squares slope of log(t) on log(n)
        xs = [math.log(m) for m, _ in scales]
        ys = [math.log(per_scale[m]) for m, _ in scales]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        # the small end sits on the fixed-overhead floor (~2s job/
        # planning/Python-pool cost), which biases the 4-point fit
        # low; the top-decade exponent (10× -> 100×) is the
        # scale-relevant number
        alpha_top = math.log(per_scale[100.0] / per_scale[10.0]) / math.log(10)
        results[name] = {
            "sec_by_mult_of_sf01": per_scale,
            "alpha_fit": round(alpha, 3),
            "alpha_top_decade": round(alpha_top, 3),
        }

    # MERGE into the existing document: the out file also carries the
    # probe sections (skew, lm, dv_partitioned, storage, bpe,
    # fuzzy_blocking_100x) — a sweep must never clobber them (it did
    # in round 12: the --only path rebuilt the doc from 'queries'
    # alone and silently dropped every other section)
    doc = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            doc = json.load(f)
    doc["queries"] = results
    doc["runs"] = args.runs
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"queries": results, "runs": args.runs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
