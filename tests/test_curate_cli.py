"""Curation CLI (a2b_spark/curate.py) — end-to-end on the driver
testdata, plus the determinism contract (same input → byte-identical
shard membership) and the error paths."""

import json
import os

import pytest

from a2b_spark.curate import STAGE_ORDER, run_curation


def test_full_pipeline_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    bench = str(tmp_path / "bench")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # a tiny benchmark that exists in the corpus: the decontam stage
    # must drop at least its own members
    docs.filter(docs.doc_id % 97 == 0).write.parquet(bench)
    stats = run_curation(
        spark,
        f"{sf_dir}/documents.parquet",
        out,
        STAGE_ORDER,
        n_shards=8,
        salt="t1",
        clf_vocab=["the", "data"],
        clf_weights=["0.25", "0.5"],
        clf_bias="-0.125",
        clf_threshold="-10",  # permissive demo model: judges, keeps most
        decontam_benchmark=bench,
        decontam_n=5,
    )
    # monotone survivor counts, every stage recorded
    assert (
        stats["input"]
        == stats["linedup"]  # rewrite stage: cleans, never drops
        >= stats["quality"]
        >= stats["perplexity"]
        >= stats["classifier"]
        > stats["decontam"]  # strict: the benchmark's members must go
        >= stats["dedup"]
        >= stats["neardup"]
        >= stats["domaincap"]
        == stats["output"]
        > 0
    )
    assert stats["shards"] == 8
    # hive-sharded layout + stats file
    assert os.path.isfile(os.path.join(out, "_curation_stats.json"))
    shards = {
        d for d in os.listdir(out) if d.startswith("shard=")
    }
    assert len(shards) == 8
    with open(os.path.join(out, "_curation_stats.json")) as f:
        assert json.load(f) == stats


def test_deterministic_across_runs(spark, sf_dir, tmp_path):
    outs = []
    for tag in ("a", "b"):
        out = str(tmp_path / tag)
        run_curation(
            spark,
            f"{sf_dir}/documents.parquet",
            out,
            ("quality", "dedup", "shard"),
            n_shards=4,
            salt="t2",
        )
        rows = {
            (r.doc_id, r.shard, r.pos)
            for r in spark.read.parquet(out).select(
                "doc_id", "shard", "pos"
            ).collect()
        }
        outs.append(rows)
    assert outs[0] == outs[1]


def test_stage_subset_and_errors(spark, sf_dir, tmp_path):
    out = str(tmp_path / "subset")
    stats = run_curation(
        spark, f"{sf_dir}/documents.parquet", out, ("quality",), min_tokens=1
    )
    assert "perplexity" not in stats and "shards" not in stats
    assert stats["output"] == stats["quality"]
    with pytest.raises(ValueError, match="unknown stage"):
        run_curation(
            spark, f"{sf_dir}/documents.parquet", out, ("bogus",)
        )
    with pytest.raises(ValueError, match="required column"):
        run_curation(
            spark,
            f"{sf_dir}/documents.parquet",
            out,
            ("quality",),
            id_col="nope",
        )


def test_cli_main(spark, sf_dir, tmp_path, capsys):
    """argparse wrapper end-to-end (reuses the session fixture's JVM
    via getOrCreate)."""
    from a2b_spark.curate import main

    out = str(tmp_path / "cli_out")
    rc = main(
        [
            "--input", f"{sf_dir}/documents.parquet",
            "--output", out,
            "--stages", "quality,shard",
            "--shards", "4",
        ]
    )
    assert rc == 0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed["shards"] == 4 and printed["output"] > 0


def test_empty_survivor_set(spark, sf_dir, tmp_path):
    """min_tokens high enough to kill every doc: stats report 0, no
    crash on the unreadable empty output."""
    out = str(tmp_path / "empty")
    stats = run_curation(
        spark,
        f"{sf_dir}/documents.parquet",
        out,
        ("quality", "shard"),
        min_tokens=10**6,
        n_shards=2,
    )
    assert stats["quality"] == 0 and stats["output"] == 0


def test_perplexity_never_drops_unjudged_docs(spark, tmp_path):
    """Zero-token docs get NULL LM scores — the perplexity stage must
    pass them through (never-drop contract), not let a NULL comparison
    silently discard them."""
    src = str(tmp_path / "in.parquet")
    spark.createDataFrame(
        [(1, "a b a b c d e f"), (2, ""), (3, "   "), (4, "a b c d e f g")],
        "doc_id int, text string",
    ).write.parquet(src)
    out = str(tmp_path / "out")
    stats = run_curation(
        spark, src, out, ("perplexity",), ppl_margin=100.0
    )
    assert stats["perplexity"] == 4  # empty docs survive


def test_output_overlapping_input_rejected(spark, sf_dir, tmp_path):
    # overwrite-mode write into the input would destroy the source
    # mid-job (ADVICE r10) — equal and nested paths both refuse
    src = f"{sf_dir}/documents.parquet"
    with pytest.raises(ValueError, match="overlaps input"):
        run_curation(spark, src, src, ("quality",))
    with pytest.raises(ValueError, match="overlaps input"):
        run_curation(spark, src, f"{src}/part", ("quality",))
    with pytest.raises(ValueError, match="overlaps input"):
        run_curation(
            spark, f"{tmp_path}/in/documents.parquet", f"{tmp_path}/in",
            ("quality",),
        )


def test_classifier_stage_filters_and_requires_model(spark, sf_dir, tmp_path):
    src = f"{sf_dir}/documents.parquet"
    with pytest.raises(ValueError, match="frozen model"):
        run_curation(spark, src, str(tmp_path / "o1"), ("classifier",))
    # a threshold above every achievable z empties the corpus; one
    # below keeps everything — the stage genuinely gates on z
    lo = run_curation(
        spark, src, str(tmp_path / "o2"), ("classifier",),
        clf_vocab=["the"], clf_weights=["0.5"], clf_threshold="-100",
    )
    hi = run_curation(
        spark, src, str(tmp_path / "o3"), ("classifier",),
        clf_vocab=["the"], clf_weights=["0.5"], clf_threshold="1000000",
    )
    assert lo["classifier"] == lo["input"] and lo["output"] == lo["input"]
    assert hi["classifier"] == 0 and hi["output"] == 0


def test_cli_trailing_comma_vocab_stripped(spark, sf_dir, tmp_path, capsys):
    """A trailing comma in --clf-vocab/--clf-weights (near-inevitable
    in shell-quoted lists) must not inject the empty term that
    spuriously matches NULL/empty docs' [''] array (round-11 advice):
    main() strips empties, and the result matches the clean spelling."""
    from a2b_spark.curate import main

    outs = []
    for vocab, weights in (("the,", "0.5,"), ("the", "0.5")):
        out = str(tmp_path / f"tc{len(outs)}")
        rc = main(
            [
                "--input", f"{sf_dir}/documents.parquet",
                "--output", out,
                "--stages", "classifier",
                "--clf-vocab", vocab,
                "--clf-weights", weights,
                "--clf-threshold", "-100",
            ]
        )
        assert rc == 0
        outs.append(json.loads(capsys.readouterr().out.strip().splitlines()[-1]))
    assert outs[0] == outs[1] and outs[0]["output"] == outs[0]["input"]


def test_stages_help_lists_classifier(capsys):
    """--help must surface every accepted stage (round-11 advice: the
    classifier stage was accepted by STAGE_ORDER but undiscoverable)."""
    from a2b_spark.curate import STAGE_ORDER, main

    with pytest.raises(SystemExit):
        main(["--help"])
    text = capsys.readouterr().out
    for stage in STAGE_ORDER:
        assert stage in text


def test_decontam_stage(spark, sf_dir, tmp_path):
    """The decontam stage drops exactly the docs sharing an n-gram
    with the benchmark (here: the benchmark IS a slice of the corpus,
    so every benchmark doc self-decontaminates), requires the
    benchmark path, and validates its schema."""
    src = f"{sf_dir}/documents.parquet"
    with pytest.raises(ValueError, match="benchmark"):
        run_curation(spark, src, str(tmp_path / "d0"), ("decontam",))

    bench = str(tmp_path / "bench")
    docs = spark.read.parquet(src)
    docs.filter(docs.doc_id % 5 == 0).write.parquet(bench)
    stats = run_curation(
        spark, src, str(tmp_path / "d1"), ("decontam",),
        decontam_benchmark=bench, decontam_n=5,
    )
    n_bench = docs.filter(docs.doc_id % 5 == 0).count()
    # every benchmark doc is in the corpus and shares all its grams
    # with itself; leaked near-dups may drop more
    assert stats["decontam"] <= stats["input"] - n_bench
    assert stats["decontam"] > 0

    bad = str(tmp_path / "badbench")
    docs.select("doc_id").write.parquet(bad)
    with pytest.raises(ValueError, match="lacks required column"):
        run_curation(
            spark, src, str(tmp_path / "d2"), ("decontam",),
            decontam_benchmark=bad,
        )


def test_linedup_stage(spark, tmp_path):
    """The linedup stage strips cross-document boilerplate lines from
    every doc's text without dropping documents; later stages see the
    cleaned text (the shared banner no longer reaches the output)."""
    src = str(tmp_path / "src")
    rows = [(i, f"BANNER LINE\nunique body {i} with enough tokens "
                + " ".join(f"w{j}" for j in range(10))) for i in range(20)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "out")
    stats = run_curation(
        spark, src, out, ("linedup", "quality", "shard"),
        min_tokens=3, n_shards=2, line_min_docs=10,
    )
    assert stats["linedup"] == 20 and stats["output"] == 20  # rewrite, no drops
    texts = [r.text for r in spark.read.parquet(out).collect()]
    assert all("BANNER LINE" not in t for t in texts)
    assert all("unique body" in t for t in texts)


def test_domaincap_stage(spark, sf_dir, tmp_path):
    """domaincap keeps at most --domain-cap docs per domain value,
    deterministically; missing domain column errors loudly."""
    src = f"{sf_dir}/documents.parquet"
    stats = run_curation(
        spark, src, str(tmp_path / "dc1"), ("domaincap",),
        domain_col="lang", domain_cap=7,
    )
    out = spark.read.parquet(str(tmp_path / "dc1"))
    per = {r.lang: r.n for r in out.groupBy("lang").count()
           .withColumnRenamed("count", "n").collect()}
    assert per and all(n <= 7 for n in per.values())
    assert stats["domaincap"] == stats["output"] == sum(per.values())
    # deterministic: a second run keeps the identical doc set
    run_curation(
        spark, src, str(tmp_path / "dc2"), ("domaincap",),
        domain_col="lang", domain_cap=7,
    )
    ids1 = {r.doc_id for r in out.select("doc_id").collect()}
    ids2 = {r.doc_id for r in
            spark.read.parquet(str(tmp_path / "dc2")).select("doc_id").collect()}
    assert ids1 == ids2
    with pytest.raises(ValueError, match="domaincap stage needs column"):
        run_curation(
            spark, src, str(tmp_path / "dc3"), ("domaincap",),
            domain_col="nope",
        )
