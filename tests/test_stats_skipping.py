"""File-skipping statistics (_STATS sidecar) for VersionedParquetTable:
prune correctness (never a wrong skip), exactness of read_pruned vs a
filtered full read, hardlink stats reuse across partitioned commits,
and the safe fallbacks (missing stats, truncated strings, all-null
columns, pre-stats versions, non-parquet formats)."""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from a2b_spark.storage.stats import (
    STATS_FILE,
    file_may_match,
    load_stats,
    normalize_predicates,
)
from a2b_spark.storage.table import VersionedParquetTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def ranged_table(spark, tmp_path):
    """3 files with DISJOINT k-ranges (repartitionByRange sorts before
    writing), so value predicates provably skip files."""
    t = VersionedParquetTable(str(tmp_path / "t"), key_cols=("k",))
    df = spark.range(0, 300).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("name_"), F.col("id")).alias("s"),
    )
    t.overwrite(df.repartitionByRange(3, "k"))
    return t


def test_stats_sidecar_written_and_covers_every_file(ranged_table):
    vdir = os.path.join(ranged_table.path, ranged_table.current_version())
    s = load_stats(vdir)
    assert s is not None and len(s["files"]) == 3
    for entry in s["files"].values():
        assert entry["rows"] > 0
        assert set(entry["cols"]) == {"k", "v", "s"}
        k = entry["cols"]["k"]
        assert k["t"] == "i" and k["min"] is not None and k["max"] is not None
        assert k["nulls"] == 0


def test_prune_skips_disjoint_ranges_and_read_is_exact(spark, ranged_table):
    t = ranged_table
    kept, total = t.prune_files([("k", "=", 5)])
    assert total == 3 and len(kept) == 1
    for preds in (
        [("k", "=", 5)],
        [("k", "<", 10)],
        [("k", ">=", 290)],
        [("k", "between", (95, 105))],
        [("k", ">", 100), ("v", "<=", 250)],  # conjunction
        [("s", "=", "name_7")],  # string stats
    ):
        got = _rows(t.read_pruned(spark, preds))
        from a2b_spark.storage.stats import predicates_to_column

        want = _rows(t.read(spark).filter(predicates_to_column(normalize_predicates(preds))))
        assert got == want, preds
    # the range predicates actually skip scans, not just filter
    assert len(t.prune_files([("k", "<", 10)])[0]) == 1
    assert len(t.prune_files([("k", "between", (95, 105))])[0]) <= 2


def test_prune_empty_result_keeps_schema(spark, ranged_table):
    out = ranged_table.read_pruned(spark, [("k", "=", -1)])
    assert out.count() == 0
    assert out.columns == ["k", "v", "s"]
    assert len(ranged_table.prune_files([("k", "=", -1)])[0]) == 0


def test_partitioned_merge_reuses_hardlinked_stats(spark, tmp_path):
    t = VersionedParquetTable(
        str(tmp_path / "p"), key_cols=("k",), partition_by=("p",)
    )
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(90)], "k long, p int, x double"
    )
    t.overwrite(df)
    v1 = t.current_version()
    s1 = load_stats(os.path.join(t.path, v1))
    # merge touches ONLY partition p=0
    t.merge(spark.createDataFrame([(0, 0, 999.0)], "k long, p int, x double"))
    v2 = t.current_version()
    s2 = load_stats(os.path.join(t.path, v2))
    assert s2 is not None
    # every data file of v2 has a stats entry
    data_files = {
        os.path.relpath(os.path.join(r, f), os.path.join(t.path, v2))
        for r, _, fs in os.walk(os.path.join(t.path, v2))
        for f in fs
        if not f.startswith(("_", "."))
    }
    assert set(s2["files"]) == data_files
    # untouched partitions: identical entries carried by inode, and the
    # files really are hardlinks
    for rel, entry in s2["files"].items():
        if "/p=1/" in rel or rel.startswith("p=1/"):
            assert entry == s1["files"][rel]
            st = os.stat(os.path.join(t.path, v2, rel))
            assert st.st_nlink > 1
    # pruning on the rewritten value finds it; exactness holds
    # (partition column lands last in the read schema, same as read())
    got = _rows(t.read_pruned(spark, [("x", ">=", 999.0)]))
    assert got == [(0, 999.0, 0)]
    assert _rows(t.read(spark).filter(F.col("x") >= 999.0)) == got


def test_all_null_column_file_is_skipped(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "n"), key_cols=("k",))
    a = spark.createDataFrame([(1, None), (2, None)], "k long, x double")
    b = spark.createDataFrame([(3, 1.5), (4, 2.5)], "k long, x double")
    t.overwrite(a.repartition(1).unionByName(b.repartition(1)).repartitionByRange(2, "k"))
    kept, total = t.prune_files([("x", "=", 1.5)])
    assert total == 2 and len(kept) == 1
    assert _rows(t.read_pruned(spark, [("x", "=", 1.5)])) == [(3, 1.5)]


def test_long_string_max_is_unbounded_never_wrong_skip(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "s"), key_cols=("k",))
    long_a = "a" * 100
    long_z = "z" * 100
    t.overwrite(
        spark.createDataFrame([(1, long_a), (2, long_z)], "k long, s string")
    )
    vdir = os.path.join(t.path, t.current_version())
    entry = next(iter(load_stats(vdir)["files"].values()))
    # Spark omits footer stats for oversized binary values entirely, so
    # max is unknown (our own truncation path would also yield None);
    # min may be None (omitted) or a 64-char prefix (truncated)
    assert entry["cols"]["s"]["max"] is None
    assert entry["cols"]["s"]["min"] is None or len(entry["cols"]["s"]["min"]) == 64
    # an out-of-prefix-range probe must still read the file (max unknown)
    assert _rows(t.read_pruned(spark, [("s", "=", long_z)])) == [(2, long_z)]


def test_timestamp_predicates_accept_iso_strings(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "ts"), key_cols=("k",))
    rows = [(i, dt.datetime(2026, 1, 1) + dt.timedelta(days=i)) for i in range(20)]
    t.overwrite(
        spark.createDataFrame(rows, "k long, ts timestamp").repartitionByRange(2, "ts")
    )
    kept, total = t.prune_files([("ts", "<", "2026-01-03T00:00:00")])
    assert total == 2 and len(kept) == 1
    got = _rows(
        t.read_pruned(spark, [("ts", "<", dt.datetime(2026, 1, 3))])
    )
    assert got == _rows(
        t.read(spark).filter(F.col("ts") < F.lit(dt.datetime(2026, 1, 3)))
    )
    assert len(got) == 2


def test_pre_stats_version_keeps_everything(spark, ranged_table):
    vdir = os.path.join(ranged_table.path, ranged_table.current_version())
    os.remove(os.path.join(vdir, STATS_FILE))
    kept, total = ranged_table.prune_files([("k", "=", 5)])
    assert len(kept) == total == 3  # no stats -> nothing skipped
    assert _rows(ranged_table.read_pruned(spark, [("k", "=", 5)])) == [
        (5, 10, "name_5")
    ]


def test_compact_regenerates_stats(spark, tmp_path):
    t = VersionedParquetTable(str(tmp_path / "c"), key_cols=("k",))
    df = spark.range(0, 50).select(F.col("id").alias("k"), F.col("id").alias("v"))
    t.overwrite(df.repartition(8))
    t.compact(spark, target_file_bytes=1 << 30, min_files=2)
    vdir = os.path.join(t.path, t.current_version())
    s = load_stats(vdir)
    assert s is not None and len(s["files"]) >= 1
    assert _rows(t.read_pruned(spark, [("k", "=", 7)])) == [(7, 7)]


def test_stats_not_carried_forward_and_formats_fall_back(spark, tmp_path):
    # jsonl table: no _STATS written, read_pruned = filtered full read
    t = VersionedParquetTable(str(tmp_path / "j"), key_cols=("k",), fmt="json")
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string"))
    vdir = os.path.join(t.path, t.current_version())
    assert not os.path.exists(os.path.join(vdir, STATS_FILE))
    assert _rows(t.read_pruned(spark, [("k", "=", 2)])) == [(2, "b")]
    # a stale _STATS in the base version must NOT be inherited
    with open(os.path.join(vdir, STATS_FILE), "w") as f:
        json.dump({"version": 1, "files": {"bogus": {}}}, f)
    t.overwrite(spark.createDataFrame([(3, "c")], "k long, s string"))
    v2 = os.path.join(t.path, t.current_version())
    assert not os.path.exists(os.path.join(v2, STATS_FILE))


def test_bad_ops_raise_and_missing_column_keeps(ranged_table):
    with pytest.raises(ValueError, match="unsupported predicate op"):
        ranged_table.prune_files([("k", "!=", 5)])
    with pytest.raises(ValueError, match="non-empty"):
        ranged_table.prune_files([])
    # unknown column: no stats -> keep everything
    kept, total = ranged_table.prune_files([("nope", "=", 1)])
    assert len(kept) == total
    # unit: entry without the column keeps
    assert file_may_match({"rows": 5, "cols": {}}, normalize_predicates([("x", "=", 1)]))


def test_cluster_by_makes_pruning_effective_unpartitioned(spark, tmp_path):
    """Before clustering every file spans the full k-range (hash
    layout) so nothing can be skipped; compact(cluster_by=['k'])
    produces disjoint ranges and a point predicate prunes to one
    file. Content identical."""
    t = VersionedParquetTable(str(tmp_path / "z"), key_cols=("k",))
    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    t.overwrite(df.repartition(4, "k"))  # hash layout: full range per file
    kept, total = t.prune_files([("k", "=", 200)])
    assert total == 4 and len(kept) == 4  # nothing skippable
    before = _rows(t.read(spark))

    vdir = os.path.join(t.path, t.current_version())
    sizes = sum(
        os.path.getsize(os.path.join(vdir, f))
        for f in os.listdir(vdir)
        if not f.startswith(("_", "."))
    )
    res = t.compact(spark, target_file_bytes=max(1, sizes // 4), cluster_by=["k"])
    assert res["partitions_rewritten"] == 1 and res["files_after"] >= 2
    assert _rows(t.read(spark)) == before  # re-layout, same content
    kept2, total2 = t.prune_files([("k", "=", 200)])
    assert total2 >= 2 and len(kept2) == 1  # disjoint ranges now skip
    assert _rows(t.read_pruned(spark, [("k", "=", 200)])) == [(200, 200 % 7)]


def test_cluster_by_partitioned_and_validation(spark, tmp_path):
    t = VersionedParquetTable(
        str(tmp_path / "zp"), key_cols=("k",), partition_by=("p",)
    )
    df = spark.createDataFrame(
        [(i, i % 2, i * 10) for i in range(200)], "k long, p int, x long"
    )
    t.overwrite(df.repartition(3, "k"))
    before = _rows(t.read(spark))
    vdir = os.path.join(t.path, t.current_version())
    total_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(vdir)
        for f in fs
        if not f.startswith(("_", "."))
    )
    res = t.compact(spark, target_file_bytes=max(1, total_bytes // 6), cluster_by=["x"])
    assert res["partitions_rewritten"] == 2
    assert _rows(t.read(spark)) == before
    # x ranges are now disjoint-ish: a narrow range keeps a strict subset
    kept, total = t.prune_files([("x", "between", (0, 100))])
    assert len(kept) < total
    got = _rows(t.read_pruned(spark, [("x", "between", (0, 100))]))
    want = _rows(t.read(spark).filter(F.col("x").between(0, 100)))
    assert got == want
    with pytest.raises(ValueError, match="cluster_by columns not in table"):
        t.compact(spark, cluster_by=["nope"])


def test_read_pruned_timestamps_under_non_utc_session(spark, tmp_path):
    """REGRESSION: the sidecar stores naive-UTC instants while Spark
    evaluates timestamp literals in the SESSION timezone — pruning
    used to compare them raw, silently skipping files whose rows the
    real filter matches under a non-UTC session."""
    key = "spark.sql.session.timeZone"
    old = spark.conf.get(key)
    t = VersionedParquetTable(str(tmp_path / "tz"), key_cols=("k",))
    try:
        spark.conf.set(key, "America/Los_Angeles")  # UTC-8 in January
        rows = [
            (i, dt.datetime(2026, 1, 1) + dt.timedelta(hours=6 * i))
            for i in range(16)
        ]
        t.overwrite(
            spark.createDataFrame(rows, "k long, ts timestamp")
            .repartitionByRange(4, "ts")
        )
        # boundary cut: rows strictly before Jan 2 00:00 SESSION time
        lit = "2026-01-02T00:00:00"
        got = _rows(t.read_pruned(spark, [("ts", "<", lit)]))
        want = _rows(t.read(spark).filter(F.col("ts") < lit))
        assert got == want and len(got) > 0
        # and a range probe across a file boundary
        got2 = _rows(t.read_pruned(spark, [("ts", "between",
                                            ("2026-01-01T12:00:00", lit))]))
        want2 = _rows(t.read(spark).filter(
            F.col("ts").between("2026-01-01T12:00:00", lit)))
        assert got2 == want2 and len(got2) > 0
    finally:
        spark.conf.set(key, old)


def test_vectorized_prune_matches_file_may_match():
    """The arrow fast path and the dict-based file_may_match are the
    same decision procedure — randomized entries exercising missing
    stats, null bounds, all-null columns, and every op."""
    import random

    from a2b_spark.storage.stats import (
        STATS_FORMAT_VERSION,
        file_may_match,
        normalize_predicates,
        pruned_out_rels,
        stats_to_arrow,
    )

    rnd = random.Random(11)
    files = {}
    for i in range(300):
        cols = {}
        if rnd.random() < 0.9:
            lo = rnd.randrange(0, 100)
            hi = lo + rnd.randrange(0, 50)
            cols["x"] = {
                "t": "i",
                "min": lo if rnd.random() < 0.9 else None,
                "max": hi if rnd.random() < 0.9 else None,
                "nulls": rnd.choice([0, 3, 10, None]),
            }
        if rnd.random() < 0.8:
            cols["s"] = {
                "t": "s",
                "min": "a",
                "max": rnd.choice(["m", "z", None]),
                "nulls": 0,
            }
        files[f"f{i}.parquet"] = {"rows": 10, "cols": cols}
    stats = {"version": STATS_FORMAT_VERSION, "files": files}
    tbl = stats_to_arrow(stats)
    for raw in [
        [("x", "=", 25)],
        [("x", "<", 10)],
        [("x", "<=", 10)],
        [("x", ">", 80)],
        [("x", ">=", 80)],
        [("x", "between", (20, 30))],
        [("x", "=", 25), ("s", "<", "c")],
        [("s", ">=", "n")],
        [("nosuchcol", "=", 1)],
    ]:
        preds = normalize_predicates(raw)
        dropped = pruned_out_rels(tbl, preds)
        for rel, e in files.items():
            assert (rel not in dropped) == file_may_match(e, preds), (rel, raw)


def test_stats_sidecar_round_trips_dict_form(tmp_path):
    """write_stats (parquet v2) -> load_stats returns the same dict,
    including timestamp/date ISO encoding and files with no stats."""
    import datetime as dt

    from a2b_spark.storage.stats import (
        STATS_FORMAT_VERSION,
        load_stats,
        write_stats,
    )

    stats = {
        "version": STATS_FORMAT_VERSION,
        "files": {
            "a.parquet": {
                "rows": 5,
                "cols": {
                    "x": {"t": "i", "min": -3, "max": 7, "nulls": 0},
                    "ts": {
                        "t": "ts",
                        "min": dt.datetime(2024, 1, 1, 12, 30).isoformat(),
                        "max": dt.datetime(2024, 6, 1).isoformat(),
                        "nulls": 1,
                    },
                    "d": {"t": "d", "min": "2024-01-01", "max": "2024-06-01", "nulls": None},
                },
            },
            "b.parquet": {"rows": None, "cols": {}},
        },
    }
    d = str(tmp_path)
    write_stats(d, stats)
    assert load_stats(d) == stats


def test_v1_json_sidecar_still_readable(tmp_path):
    """A pre-round-8 JSON sidecar loads through both APIs."""
    import json as _json

    from a2b_spark.storage.stats import (
        STATS_FILE,
        STATS_FORMAT_VERSION,
        load_stats,
        load_stats_arrow,
        normalize_predicates,
        pruned_out_rels,
    )

    stats = {
        "version": STATS_FORMAT_VERSION,
        "files": {
            "a.parquet": {
                "rows": 5,
                "cols": {"x": {"t": "i", "min": 0, "max": 9, "nulls": 0}},
            },
            "b.parquet": {
                "rows": 5,
                "cols": {"x": {"t": "i", "min": 100, "max": 200, "nulls": 0}},
            },
        },
    }
    with open(tmp_path / STATS_FILE, "w") as f:
        _json.dump(stats, f)
    assert load_stats(str(tmp_path)) == stats
    tbl = load_stats_arrow(str(tmp_path))
    dropped = pruned_out_rels(tbl, normalize_predicates([("x", "=", 50)]))
    assert dropped == {"a.parquet", "b.parquet"}


def test_zorder_prunes_on_second_cluster_column(spark, tmp_path):
    """cluster_mode="zorder": each file covers a hyper-rectangle in
    (a, b), so a point predicate on the SECOND clustered column skips
    files — the case lexicographic range clustering cannot prune.
    Content identical, read_pruned exact."""
    import random

    rnd = random.Random(5)
    rows = [(i, rnd.randrange(4096), rnd.randrange(4096)) for i in range(40_000)]
    t = VersionedParquetTable(str(tmp_path / "zz"), key_cols=("k",), retention=5)
    t.overwrite(
        spark.createDataFrame(rows, "k long, a int, b int").repartition(4, "k")
    )
    before = _rows(t.read(spark))
    vdir = os.path.join(t.path, t.current_version())
    total_bytes = sum(
        os.path.getsize(os.path.join(vdir, f))
        for f in os.listdir(vdir)
        if not f.startswith(("_", "."))
    )
    res = t.compact(
        spark,
        target_file_bytes=max(1, total_bytes // 16),
        cluster_by=["a", "b"],
        cluster_mode="zorder",
    )
    assert res["files_after"] >= 8
    assert _rows(t.read(spark)) == before  # re-layout only

    pred_b = [("b", "between", (2000, 2100))]
    kept_b, total = t.prune_files(pred_b)
    assert len(kept_b) < total  # second column prunes
    # and the first column still prunes too
    kept_a, _ = t.prune_files([("a", "between", (100, 200))])
    assert len(kept_a) < total
    # conjunctive point-ish predicate: strictly fewer than either alone
    kept_ab, _ = t.prune_files(
        [("a", "between", (100, 200)), ("b", "between", (2000, 2100))]
    )
    assert len(kept_ab) <= min(len(kept_a), len(kept_b))
    # exactness of the pruned read
    got = _rows(t.read_pruned(spark, pred_b))
    want = _rows(t.read(spark).filter(F.col("b").between(2000, 2100)))
    assert got == want
    with pytest.raises(ValueError, match="cluster_mode"):
        t.compact(spark, cluster_by=["a"], cluster_mode="hilbert")


def test_zorder_partitioned_and_mixed_types(spark, tmp_path):
    """zorder on a partitioned table (partition columns lead the
    layout) and on a string+numeric column pair."""
    t = VersionedParquetTable(
        str(tmp_path / "zp2"), key_cols=("k",), partition_by=("p",), retention=5
    )
    rows = [
        (i, i % 2, f"w{i % 50:03d}", (i * 37) % 1000) for i in range(5000)
    ]
    t.overwrite(
        spark.createDataFrame(rows, "k long, p int, s string, x int").repartition(4, "k")
    )
    before = _rows(t.read(spark))
    res = t.compact(
        spark,
        target_file_bytes=1 << 14,
        cluster_by=["s", "x"],
        cluster_mode="zorder",
    )
    assert res["partitions_rewritten"] == 2
    assert _rows(t.read(spark)) == before
    kept, total = t.prune_files([("x", "between", (0, 100))])
    assert len(kept) < total
    got = _rows(t.read_pruned(spark, [("s", ">=", "w040"), ("x", "<", 500)]))
    want = _rows(
        t.read(spark).filter((F.col("s") >= "w040") & (F.col("x") < 500))
    )
    assert got == want


def test_int_column_float_and_huge_literals_never_over_prune():
    """Round-8 review regression: pa.scalar(2.5, int64) TRUNCATES to 2,
    so the naive arrow cast over-pruned (x < 2.5 dropped a file with
    min=2). Integer-stats predicates now translate literals exactly
    (ceil/floor per op, int64 saturation) — checked against the
    ground truth 'does any integer in [min, max] satisfy it'."""
    from fractions import Fraction

    from a2b_spark.storage.stats import (
        STATS_FORMAT_VERSION,
        normalize_predicates,
        pruned_out_rels,
        stats_to_arrow,
    )

    files = {
        f"f{lo}_{hi}.parquet": {
            "rows": 5,
            "cols": {"x": {"t": "i", "min": lo, "max": hi, "nulls": 0}},
        }
        for lo, hi in [(2, 10), (-10, -3), (0, 0), (100, 200)]
    }
    stats = {"version": STATS_FORMAT_VERSION, "files": files}
    tbl = stats_to_arrow(stats)

    def satisfiable(lo, hi, op, v):
        """Is there an integer x in [lo, hi] with (x op v)? Exact
        rational arithmetic, no floats."""
        import math

        if isinstance(v, float):
            if v != v:
                return False
            v = Fraction(v) if v not in (float("inf"), float("-inf")) else v
        if op == "between":
            a, b = v
            a = Fraction(a) if isinstance(a, float) else a
            b = Fraction(b) if isinstance(b, float) else b
            lo2, hi2 = max(lo, math.ceil(a)), min(hi, math.floor(b))
            return lo2 <= hi2
        if op == "=":
            return lo <= v <= hi and Fraction(v).denominator == 1
        if op == "<":
            return lo < v
        if op == "<=":
            return lo <= v
        if op == ">":
            return hi > v
        return hi >= v  # >=

    cases = [
        ("<", 2.5), ("<", 1.5), ("<", 2), ("<=", 1.9), ("<=", 2.0),
        (">", 9.5), (">", 10.0), (">", 10.5), (">=", 10.2), (">=", -3.5),
        ("=", 2.5), ("=", 2.0), ("=", -7), ("=", 150),
        ("between", (2.2, 2.8)), ("between", (1.5, 2.5)),
        ("between", (-9.5, -8.5)), ("between", (10.5, 11.5)),
        ("<", 2**63), (">", 2**63), ("=", 2**64), ("<", -(2**63) - 5),
        (">", -(2**63) - 5), ("between", (-(2**70), 2**70)),
        ("<", float("inf")), ("<", float("-inf")), (">", float("nan")),
    ]
    for op, v in cases:
        preds = normalize_predicates([("x", op, v)])
        dropped = pruned_out_rels(tbl, preds)
        for rel, e in files.items():
            c = e["cols"]["x"]
            sat = satisfiable(c["min"], c["max"], op, v)
            if rel in dropped:
                # NEVER a wrong skip: a pruned file must be provably
                # unsatisfiable
                assert not sat, (rel, op, v)
            elif not sat and not (isinstance(v, float) and v != v):
                # and (except for NaN, where we stay conservative)
                # unsatisfiable files should actually be pruned
                assert rel in dropped or True  # informational only
        # the two canonical review repros, asserted tightly:
    d = pruned_out_rels(tbl, normalize_predicates([("x", "<", 2.5)]))
    assert "f2_10.parquet" not in d  # x=2 satisfies x<2.5
    d = pruned_out_rels(tbl, normalize_predicates([("x", "<", 1.5)]))
    assert "f2_10.parquet" in d  # no int in [2,10] is < 1.5
    d = pruned_out_rels(tbl, normalize_predicates([("x", "=", 2.5)]))
    assert d == set(files)  # no integer equals 2.5 anywhere
    d = pruned_out_rels(tbl, normalize_predicates([("x", "<", 2**63)]))
    assert d == set()  # huge bound: every file may match, no crash
    d = pruned_out_rels(tbl, normalize_predicates([("x", ">", 2**63)]))
    assert d == set(files)  # nothing exceeds int64 max


def test_unknown_stat_tag_degrades_per_column(tmp_path):
    """A sidecar entry with an unrecognized tag disables pruning for
    THAT column only — the healthy column still prunes (v1's loop
    semantics, not all-or-nothing)."""
    import json as _json

    from a2b_spark.storage.stats import (
        STATS_FILE,
        STATS_FORMAT_VERSION,
        load_stats_arrow,
        normalize_predicates,
        pruned_out_rels,
    )

    stats = {
        "version": STATS_FORMAT_VERSION,
        "files": {
            "a.parquet": {
                "rows": 5,
                "cols": {
                    "x": {"t": "i", "min": 0, "max": 9, "nulls": 0},
                    "weird": {"t": "zzz", "min": 0, "max": 1, "nulls": 0},
                },
            },
        },
    }
    with open(tmp_path / STATS_FILE, "w") as f:
        _json.dump(stats, f)
    tbl = load_stats_arrow(str(tmp_path))
    assert tbl is not None
    assert pruned_out_rels(tbl, normalize_predicates([("x", ">", 50)])) == {
        "a.parquet"
    }
    assert pruned_out_rels(tbl, normalize_predicates([("weird", "=", 0)])) == set()


def test_read_pruned_float_literal_on_int_column_exact(spark, ranged_table):
    t = ranged_table
    got = _rows(t.read_pruned(spark, [("k", "<", 0.5)]))
    want = _rows(t.read(spark).filter(F.col("k") < 0.5))
    assert got == want and len(got) == 1


def test_zorder_string_projection_preserves_prefix_order(spark):
    """Round-8 review: variable-length strings must project
    order-preservingly ('b' > 'aaaa' lexicographically, so its
    projected value must be larger too — the unpadded byte value
    inverted that), and the prefix is 4 BYTES of UTF-8, not 4
    characters (non-ASCII stays within conv/double range)."""
    from a2b_spark.storage.zorder import _monotone_double

    vals = ["", "a", "aaaa", "ab", "b", "ba", "zz", "é", "日本語です"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    proj = {
        r.s: r.p
        for r in df.select("s", _monotone_double(df, "s").alias("p")).collect()
    }
    for x in vals:
        for y in vals:
            if x.encode()[:4] < y.encode()[:4]:
                assert proj[x] < proj[y], (x, y, proj[x], proj[y])
    assert all(0 <= proj[v] < 2**32 for v in vals)


def test_float_stats_huge_int_between_and_allnull_parity():
    """Second review pass: (a) a between bound past 2^53 on a FLOAT
    column must degrade to the usable half, never raise; (b) the
    all-null fast skip applies even when the value bound is unusable
    (x < inf), matching file_may_match."""
    from a2b_spark.storage.stats import (
        STATS_FORMAT_VERSION,
        file_may_match,
        keep_files,
        normalize_predicates,
        pruned_out_rels,
        stats_to_arrow,
    )

    files = {
        "f.parquet": {
            "rows": 5,
            "cols": {"x": {"t": "f", "min": 0.0, "max": 100.0, "nulls": 0}},
        },
        "hi.parquet": {
            "rows": 5,
            "cols": {"x": {"t": "f", "min": 1e18, "max": 2e18, "nulls": 0}},
        },
        "nulls.parquet": {
            "rows": 5,
            "cols": {"y": {"t": "i", "min": None, "max": None, "nulls": 5}},
        },
    }
    stats = {"version": STATS_FORMAT_VERSION, "files": files}
    tbl = stats_to_arrow(stats)
    # (a) used to raise TypeError via pa.scalar(2**53+1, float64)
    preds = normalize_predicates([("x", "between", (0, 2**53 + 1))])
    kept = set(keep_files(tbl, list(files), preds))
    assert "f.parquet" in kept  # in range
    # hi.parquet: lower bound 0 usable -> mx < 0 never fails; upper
    # bound unusable -> dropped; conservative KEEP
    assert "hi.parquet" in kept
    # single-op huge literal on float column: conservative keep, no crash
    preds2 = normalize_predicates([("x", "<", 2**53 + 1)])
    assert set(keep_files(tbl, list(files), preds2)) >= {"f.parquet", "hi.parquet"}
    # (b) all-null column prunes even for a never-prune bound
    preds3 = normalize_predicates([("y", "<", float("inf"))])
    dropped = pruned_out_rels(tbl, preds3)
    assert "nulls.parquet" in dropped
    assert not file_may_match(files["nulls.parquet"], preds3)


def test_zorder_timestamp_ntz_and_user_z_column(spark, tmp_path):
    """Second review pass: TIMESTAMP_NTZ cluster columns must project
    legally (no direct double cast exists), and a user column named
    __z must survive a zorder rewrite byte-identically."""
    import datetime as dt

    t = VersionedParquetTable(str(tmp_path / "ntz"), key_cols=("k",), retention=5)
    rows = [
        (i, dt.datetime(2024, 1 + (i % 12), 1), float(i % 97), f"z{i}")
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "k long, tn timestamp_ntz, x double, __z string")
    t.overwrite(df.repartition(4, "k"))
    before = _rows(t.read(spark))
    res = t.compact(
        spark,
        target_file_bytes=1 << 14,
        cluster_by=["tn", "x"],
        cluster_mode="zorder",
    )
    assert res["files_after"] >= 2
    after = t.read(spark)
    assert "__z" in after.columns
    assert _rows(after) == before
    # an out-of-range band proves the NTZ stats bind and prune
    kept, total = t.prune_files(
        [("tn", "between", ("2030-01-01T00:00:00", "2030-02-01T00:00:00"))]
    )
    assert total >= 2 and len(kept) == 0
    got = _rows(
        t.read_pruned(
            spark,
            [("tn", "between", ("2024-03-01T00:00:00", "2024-04-30T00:00:00"))],
        )
    )
    want = _rows(
        t.read(spark).filter(
            F.col("tn").between("2024-03-01T00:00:00", "2024-04-30T00:00:00")
        )
    )
    assert got == want and got


def test_truncated_sidecar_spec_degrades_per_column(tmp_path):
    """A foreign/truncated sidecar carrying only SOME of the three kind
    columns for a stats column must degrade to 'no stats for that
    column' (never pruned) instead of a KeyError at prune time, while
    complete columns still prune (round-8 advice)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from a2b_spark.storage.stats import (
        STATS_FILE,
        STATS_PARQUET_VERSION,
        load_stats_arrow,
        normalize_predicates,
        pruned_out_rels,
    )

    tbl = pa.table(
        {
            "rel": ["a.parquet", "b.parquet"],
            "rows": pa.array([5, 5], pa.int64()),
            # complete spec for y
            "min:i:y": pa.array([0, 100], pa.int64()),
            "max:i:y": pa.array([9, 200], pa.int64()),
            "nulls:i:y": pa.array([0, 0], pa.int64()),
            # truncated spec for x: min only
            "min:i:x": pa.array([0, 100], pa.int64()),
        }
    ).replace_schema_metadata({b"a2b_stats_version": str(STATS_PARQUET_VERSION).encode()})
    pq.write_table(tbl, str(tmp_path / STATS_FILE))
    loaded = load_stats_arrow(str(tmp_path))
    # x is unusable -> nothing pruned on it
    assert pruned_out_rels(loaded, normalize_predicates([("x", "=", 50)])) == set()
    # y is complete -> still prunes
    assert pruned_out_rels(loaded, normalize_predicates([("y", "=", 50)])) == {
        "a.parquet",
        "b.parquet",
    }


def test_corrupt_sidecar_warns_and_disables_pruning(tmp_path):
    """Corrupt INPUT (bad parquet magic tail / mangled v1 dict) warns
    and returns None instead of raising or silently passing; a clean
    absent file stays silent (round-8 advice)."""
    import warnings as _w

    from a2b_spark.storage.stats import (
        STATS_FILE,
        STATS_FORMAT_VERSION,
        load_stats_arrow,
    )

    # garbage bytes with parquet magic -> ArrowInvalid -> warn + None
    with open(tmp_path / STATS_FILE, "wb") as f:
        f.write(b"PAR1garbage-not-a-footer")
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        assert load_stats_arrow(str(tmp_path)) is None
    assert any("pruning disabled" in str(r.message) for r in rec)

    # v1 dict with mangled shape -> warn + None
    import json as _json

    with open(tmp_path / STATS_FILE, "w") as f:
        _json.dump(
            {"version": STATS_FORMAT_VERSION, "files": {"a.parquet": {"rows": 1, "cols": {"x": "oops"}}}},
            f,
        )
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        assert load_stats_arrow(str(tmp_path)) is None
    assert any("pruning disabled" in str(r.message) for r in rec)


def test_merge_file_pruning_links_unmatched_files(spark, tmp_path):
    """Delta-style MERGE file pruning: a small-batch merge into a
    key-clustered unpartitioned table rewrites ONLY the files whose
    key range may hold matches — every other file hard-links (zero
    bytes), and the result is row-identical to a full-rewrite merge
    on a twin table."""
    from a2b_spark.storage.table import VersionedParquetTable

    rows = [(i, f"v{i}") for i in range(2000)]
    batch = [(5, "UP5"), (7, "UP7"), (2500, "NEW")]  # narrow band + insert

    t = VersionedParquetTable(str(tmp_path / "t"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame(rows, "k long, v string"))
    t.compact(spark, target_file_bytes=4 << 10, min_files=1, cluster_by=["k"])
    pre_dir = os.path.join(t.path, t.current_version())
    n_files = len([f for f in os.listdir(pre_dir) if not f.startswith(("_", "."))])
    assert n_files >= 4  # clustered into several key-ranged files

    twin = VersionedParquetTable(str(tmp_path / "w"), key_cols=("k",), retention=10)
    twin.overwrite(spark.createDataFrame(rows, "k long, v string"))

    b = spark.createDataFrame(batch, "k long, v string")
    t.merge(b)
    twin.merge(b)
    assert _rows(t.read(spark)) == _rows(twin.read(spark))

    vdir = os.path.join(t.path, t.current_version())
    files = [f for f in os.listdir(vdir) if not f.startswith(("_", "."))]
    linked = [f for f in files if os.stat(os.path.join(vdir, f)).st_nlink > 1]
    fresh = [f for f in files if os.stat(os.path.join(vdir, f)).st_nlink == 1]
    # most clustered files cannot hold keys 5/7/2500: they hard-link
    assert len(linked) >= n_files - 3
    assert fresh  # the touched band was rewritten
    # stats sidecar stays consistent: pruned reads still exact
    got = _rows(t.read_pruned(spark, [("k", "between", (0, 10))]))
    want = _rows(t.read(spark).filter(F.col("k").between(0, 10)))
    assert got == want


def test_merge_file_pruning_null_key_falls_back_correct(spark, tmp_path):
    """A batch holding a NULL key must take the full path (NULL never
    falls in a [min,max] band but DOES merge under eqNullSafe) — and
    either way the merged content is exact."""
    from a2b_spark.storage.table import VersionedParquetTable

    t = VersionedParquetTable(str(tmp_path / "n"), key_cols=("k",), retention=10)
    t.overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (None, "nul")], "k long, v string"
        )
    )
    t.compact(spark, target_file_bytes=1 << 10, min_files=1, cluster_by=["k"])
    t.merge(spark.createDataFrame([(None, "NUL2"), (9, "i")], "k long, v string"))
    got = {(r.k, r.v) for r in t.read(spark).collect()}
    assert got == {(1, "a"), (2, "b"), (None, "NUL2"), (9, "i")}


def test_merge_file_pruning_cdf_and_constraints_ride_along(spark, tmp_path):
    """The pruned-merge commit stages change files from the touched
    subset (identical to the full diff) and still enforces CHECK
    constraints on the written rows."""
    from a2b_spark.storage.cdf import table_changes
    from a2b_spark.storage.table import ConstraintViolation, VersionedParquetTable

    t = VersionedParquetTable(str(tmp_path / "c"), key_cols=("k",), retention=10)
    t.overwrite(
        spark.createDataFrame([(i, float(i)) for i in range(200)], "k long, x double")
    )
    t.compact(spark, target_file_bytes=1 << 10, min_files=1, cluster_by=["k"])
    t.enable_cdf()
    t.add_constraint(spark, "x_nonneg", "x >= 0")
    t.merge(spark.createDataFrame([(3, 333.0), (500, 5.0)], "k long, x double"))
    vdir = os.path.join(t.path, t.current_version())
    assert os.path.isdir(os.path.join(vdir, "_cdf"))
    d = {
        (r.k, r.change)
        for r in table_changes(
            t, spark, from_version=t.versions()[-2], to_version=t.versions()[-1]
        ).collect()
    }
    assert d == {(3, "update"), (500, "insert")}
    pre = t.current_version()
    with pytest.raises(ConstraintViolation, match="x_nonneg"):
        t.merge(spark.createDataFrame([(4, -1.0)], "k long, x double"))
    assert t.current_version() == pre
    assert not [f for f in os.listdir(t.path) if f.startswith(".tmp-")]


def test_datetime_literal_on_date_column_never_over_prunes(spark, tmp_path):
    """Round-9 review finding: a DATETIME literal on a DATE column
    truncated to .date(), so 'd < 2020-01-02 12:00' pruned a file
    holding d = 2020-01-02 — which Spark's promoted-to-timestamp
    filter MATCHES (midnight < noon). The rewrite must keep it; exact
    results via read_pruned either way; tz-aware literals are unusable
    bounds (keep everything)."""
    import datetime as dt

    from a2b_spark.storage.stats import (
        file_may_match,
        normalize_predicates,
    )
    from a2b_spark.storage.table import VersionedParquetTable

    entry = {
        "rows": 5,
        "cols": {"d": {"t": "d", "min": "2020-01-02", "max": "2020-01-05", "nulls": 0}},
    }
    noon = dt.datetime(2020, 1, 2, 12, 0)
    # '<' noon must KEEP the file (d = 2020-01-02 matches in Spark)
    assert file_may_match(entry, normalize_predicates([("d", "<", noon)]))
    # midnight keeps the strict semantics: min >= bound -> prune
    mid = dt.datetime(2020, 1, 2)
    assert not file_may_match(entry, normalize_predicates([("d", "<", mid)]))
    # tz-aware literal: unusable bound, file kept
    aware = noon.replace(tzinfo=dt.timezone.utc)
    assert file_may_match(entry, normalize_predicates([("d", "<", aware)]))

    # end-to-end: pruned read == plain filtered read
    t = VersionedParquetTable(str(tmp_path / "d"), key_cols=("k",), retention=5)
    rows = [(i, dt.date(2020, 1, 1) + dt.timedelta(days=i)) for i in range(10)]
    t.overwrite(spark.createDataFrame(rows, "k long, d date"))
    t.compact(spark, target_file_bytes=1 << 10, min_files=1, cluster_by=["d"])
    got = _rows(t.read_pruned(spark, [("d", "<", noon)]))
    want = _rows(t.read(spark).filter(F.col("d") < F.lit(noon)))
    assert got == want and got


def test_delete_file_pruning_links_unmatched_files(spark, tmp_path):
    """delete_keys on a key-clustered unpartitioned table: files that
    cannot hold any deleted key hard-link; content matches a full-path
    twin; CDF delete rows come from the semi join (NULL payload)."""
    from a2b_spark.storage.cdf import table_changes
    from a2b_spark.storage.table import VersionedParquetTable

    rows = [(i, f"v{i}") for i in range(2000)]
    t = VersionedParquetTable(str(tmp_path / "dl"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame(rows, "k long, v string"))
    t.compact(spark, target_file_bytes=4 << 10, min_files=1, cluster_by=["k"])
    t.enable_cdf()
    n_files = len(
        [f for f in os.listdir(os.path.join(t.path, t.current_version()))
         if not f.startswith(("_", "."))]
    )
    assert n_files >= 4
    # low-band keys only: most clustered files untouched
    t.delete_keys(spark.createDataFrame([(3,), (7,), (11,)], "k long"))
    vdir = os.path.join(t.path, t.current_version())
    files = [f for f in os.listdir(vdir) if not f.startswith(("_", "."))]
    linked = [f for f in files if os.stat(os.path.join(vdir, f)).st_nlink > 1]
    assert linked and len(linked) >= n_files - 2
    assert t.read(spark).count() == 1997
    assert t.read(spark).filter(F.col("k").isin(3, 7, 11)).count() == 0
    # semi-join CDF: exactly the three deletes, NULL payload — read
    # from the WRITTEN change files (batch table_changes recomputes
    # diffs and would pass even if the _cdf staging were wrong)
    cdf_files = spark.read.parquet(os.path.join(vdir, "_cdf"))
    got = {(r.k, r.change, r.v) for r in cdf_files.collect()}
    assert got == {(3, "delete", None), (7, "delete", None), (11, "delete", None)}
    # and the batch walk agrees
    d = table_changes(t, spark, from_version=t.versions()[-2],
                      to_version=t.versions()[-1], with_rows=True)
    assert {(r.k, r.change, r.v) for r in d.collect()} == got


def test_merge_file_pruning_with_added_column(spark, tmp_path):
    """File-pruned merge × ADD-COLUMN evolution: the widened batch
    merges into a clustered table, untouched files hard-link WITHOUT
    the new column physically — the evolved sidecar schema must
    null-fill their rows while touched rows carry the batch values."""
    from a2b_spark.storage.table import VersionedParquetTable

    rows = [(i, f"v{i}") for i in range(2000)]
    t = VersionedParquetTable(str(tmp_path / "ev"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame(rows, "k long, v string"))
    t.compact(spark, target_file_bytes=4 << 10, min_files=1, cluster_by=["k"])
    n_files = len(
        [f for f in os.listdir(os.path.join(t.path, t.current_version()))
         if not f.startswith(("_", "."))]
    )
    assert n_files >= 4
    # widened batch in a narrow key band
    t.merge(
        spark.createDataFrame(
            [(5, "V5", 1.5), (9, "V9", 9.9)], "k long, v string, w double"
        )
    )
    vdir = os.path.join(t.path, t.current_version())
    files = [f for f in os.listdir(vdir) if not f.startswith(("_", "."))]
    linked = [f for f in files if os.stat(os.path.join(vdir, f)).st_nlink > 1]
    assert linked and len(linked) >= n_files - 2  # pruning engaged
    cur = t.read(spark)
    assert set(cur.columns) == {"k", "v", "w"}
    got = {(r.k, r.v, r.w) for r in cur.filter(F.col("k").isin(5, 9, 100)).collect()}
    assert got == {(5, "V5", 1.5), (9, "V9", 9.9), (100, "v100", None)}
    assert cur.count() == 2000
    # evolved-column predicate over hardlinked (column-less) files
    assert cur.filter(F.col("w").isNull()).count() == 1998


def test_merge_file_pruning_blocked_by_drop_tombstone(spark, tmp_path):
    """Re-introducing a DROPPED column must take the FULL rewrite even
    on a clustered (otherwise prunable) table — hard-linking files
    that physically hold the pre-drop values would resurface them."""
    from a2b_spark.storage.table import VersionedParquetTable

    rows = [(i, f"v{i}", float(i)) for i in range(2000)]
    t = VersionedParquetTable(str(tmp_path / "tb"), key_cols=("k",), retention=10)
    t.overwrite(spark.createDataFrame(rows, "k long, v string, w double"))
    t.compact(spark, target_file_bytes=4 << 10, min_files=1, cluster_by=["k"])
    t.drop_columns(spark, "w")
    # batch re-adds w with a narrow key band: pruning would engage if
    # the tombstone guard were missing
    t.merge(spark.createDataFrame([(5, "V5", 55.5)], "k long, v string, w double"))
    vdir = os.path.join(t.path, t.current_version())
    files = [f for f in os.listdir(vdir) if not f.startswith(("_", "."))]
    linked = [f for f in files if os.stat(os.path.join(vdir, f)).st_nlink > 1]
    assert not linked  # full rewrite: nothing hard-linked
    got = {(r.k, r.w) for r in t.read(spark).filter(F.col("k").isin(5, 100)).collect()}
    assert got == {(5, 55.5), (100, None)}  # no pre-drop value resurfaces
    assert t._dropped_tombstones(t.current_version()) == set()


def test_merge_file_pruning_after_key_widening(spark, tmp_path):
    """widen_column(key, bigint) then a bigint-keyed batch: the old
    int32 file stats must still prune (python int comparison is
    width-agnostic) and hardlinked narrow files read upcast."""
    from a2b_spark.storage.table import VersionedParquetTable

    rows = [(i, f"v{i}") for i in range(2000)]
    t = VersionedParquetTable(str(tmp_path / "wk"), key_cols=("k",), retention=10)
    t.overwrite(
        spark.createDataFrame(rows, "k int, v string")
    )
    t.compact(spark, target_file_bytes=4 << 10, min_files=1, cluster_by=["k"])
    n_files = len(
        [f for f in os.listdir(os.path.join(t.path, t.current_version()))
         if not f.startswith(("_", "."))]
    )
    assert n_files >= 4
    t.widen_column(spark, "k", "bigint")
    t.merge(spark.createDataFrame([(7, "V7")], "k long, v string"))
    vdir = os.path.join(t.path, t.current_version())
    files = [f for f in os.listdir(vdir) if not f.startswith(("_", "."))]
    linked = [f for f in files if os.stat(os.path.join(vdir, f)).st_nlink > 1]
    assert linked and len(linked) >= n_files - 1
    cur = t.read(spark)
    assert dict(cur.dtypes)["k"] == "bigint"
    assert {r.v for r in cur.filter("k = 7").collect()} == {"V7"}
    assert cur.count() == 2000


def test_v1_sidecar_corrupt_values_degrade_not_raise(tmp_path):
    """REGRESSION (round-10 advice): a structurally-valid v1 sidecar
    whose VALUES are corrupt — non-ISO ts/date min/max (ValueError in
    _decode) or mistyped scalars (pyarrow ArrowInvalid from pa.array)
    — must disable pruning with a warning, not crash every
    read_pruned/merge/delete on the table."""
    import json as _json

    from a2b_spark.storage.stats import (
        STATS_FILE,
        STATS_FORMAT_VERSION,
        load_stats_arrow,
    )

    def _write(d, cols):
        os.makedirs(d, exist_ok=True)
        stats = {
            "version": STATS_FORMAT_VERSION,
            "files": {"a.parquet": {"rows": 5, "cols": cols}},
        }
        with open(os.path.join(d, STATS_FILE), "w") as f:
            _json.dump(stats, f)

    d1 = str(tmp_path / "bad_ts")
    _write(d1, {"x": {"t": "ts", "min": "not-a-timestamp", "max": "nope", "nulls": 0}})
    with pytest.warns(UserWarning, match="pruning disabled"):
        assert load_stats_arrow(d1) is None

    d2 = str(tmp_path / "bad_int")
    _write(d2, {"x": {"t": "i", "min": "abc", "max": 9, "nulls": 0}})
    with pytest.warns(UserWarning, match="pruning disabled"):
        assert load_stats_arrow(d2) is None
