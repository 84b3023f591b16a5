"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its
``oracle_sql()`` twin on the same parquet tables, compares row count,
column-name set, NUMERIC TYPE CATEGORY (int vs float vs decimal — the
driver's value hash is type-sensitive, and DuckDB silently promotes
window SUMs to HUGEINT which Arrow-exports as decimal128; that exact
divergence kept q76 red for three rounds while pandas ``.eq`` said
``0 == 0.0``), and exact sorted values. Stricter than the driver's
value-hash (exact equality incl. float bits + type categories), so a
PASS here should be a PASS there.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def make_duckdb_con(sf_dir: str):
    """DuckDB connection with every base table registered as a view —
    THE one place the table list is wired (tests/test_registry.py's
    binder check imports this; a second copy would drift)."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


NUMERIC_CATEGORIES = {"int", "float", "decimal"}


def arrow_category(t) -> str:
    """Collapse an Arrow type into the categories the driver hash
    distinguishes. DuckDB HUGEINT exports as decimal128(38,0)."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_temporal(t):
        return "ts"
    return "other"


def spark_category(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("decimal"):
        return "decimal"
    if s == "boolean":
        return "bool"
    if s == "string" or s.startswith(("varchar", "char")):
        return "str"
    if s in ("date", "timestamp", "timestamp_ntz"):
        return "ts"
    return "other"


def type_gate(spark_schema, oracle_arrow_schema) -> list[str]:
    """Cross-engine type divergence check: an integer Spark column whose
    oracle twin Arrow-exports as decimal/float (or vice versa) WILL
    hash-mismatch on the driver even when every value is numerically
    equal. pandas value comparison is blind to it (0 == 0.0), so this
    runs BEFORE value comparison."""
    problems = []
    otypes = {f.name: arrow_category(f.type) for f in oracle_arrow_schema}
    for f in spark_schema.fields:
        sc = spark_category(f.dataType)
        oc = otypes.get(f.name)
        if oc is None:
            continue
        # ANY category divergence between KNOWN categories is a driver
        # hash risk — not just int-vs-float/decimal: a bool oracle twin
        # of an int Spark column value-compares equal (1 == True) but
        # hashes differently, the q76 failure class in another coat
        if sc != oc and sc != "other" and oc != "other":
            problems.append(
                f"column {f.name!r}: TYPE divergence spark={f.dataType.simpleString()}"
                f" ({sc}) vs oracle arrow ({oc}) — driver hash will mismatch;"
                f" cast the oracle (DuckDB window SUM promotes to HUGEINT/decimal128)"
            )
    return problems


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("string")
        elif s.dtype == object:
            df[c] = s.apply(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(by=sort_cols, kind="mergesort")
    except TypeError:
        df = df.sort_values(by=sort_cols, key=lambda s: s.astype(str), kind="mergesort")
    return df.reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    a, b = normalize(sdf), normalize(odf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
                eq = np.allclose(av.fillna(np.nan), bv.fillna(np.nan), rtol=0, atol=0, equal_nan=True)
                if not eq:
                    diff = (av - bv).abs()
                    problems.append(
                        f"column {c!r}: {int((~np.isclose(av, bv, rtol=0, atol=0, equal_nan=True)).sum())} "
                        f"value diffs, max abs diff {diff.max():.3e}"
                    )
                else:
                    # allclose equates -0.0 with +0.0; a hash over the
                    # raw 8 bytes does not — compare bit patterns (NULLs
                    # became the one canonical NaN via fillna above)
                    abits = av.fillna(np.nan).to_numpy(dtype="float64").view(np.int64)
                    bbits = bv.fillna(np.nan).to_numpy(dtype="float64").view(np.int64)
                    nbit = abits != bbits
                    if nbit.any():
                        i = int(np.argmax(nbit))
                        problems.append(
                            f"column {c!r}: {int(nbit.sum())} float BIT diffs "
                            f"(e.g. -0.0 vs 0.0), first at row {i}: "
                            f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
                        )
            else:
                # NA-mismatch must be explicit: pandas eq yields <NA>
                # wherever a side is NA and .any() SKIPS NA — the old
                # ~(eq | both-na) form silently passed NULL-vs-value
                # divergences (verified with pandas 2.2)
                na_a, na_b = av.isna(), bv.isna()
                neq = (na_a != na_b) | (av.ne(bv) & ~na_a & ~na_b)
                neq = neq.fillna(False).astype(bool)
                if neq.any():
                    i = int(neq.idxmax())
                    problems.append(
                        f"column {c!r}: {int(neq.sum())} value diffs, first at row {i}: "
                        f"spark={av[i]!r} oracle={bv[i]!r}"
                    )
    return problems


def main():
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    rest = args[1:] if args and os.path.isdir(args[0]) else args
    stray_dirs = [a for a in rest if os.path.isdir(a)]
    if stray_dirs:
        # only args[0] can be the sf dir; silently dropping a misplaced
        # dir would validate queries against the WRONG scale factor
        raise SystemExit(
            f"directory argument(s) {stray_dirs} must come first (sf_dir); "
            f"got sf_dir={sf_dir!r}"
        )
    only = set(rest)

    import __spark_entry__ as entry

    if vanilla:
        # driver-config robustness mode: the external harness builds its
        # OWN session (Spark 4 defaults: ANSI on, 200 shuffle
        # partitions, none of get_spark's tuning). Round 4's only red
        # mark was a config-sensitivity bug local runs never saw; this
        # flag replicates the gate under unfamiliar defaults. Must run
        # in a fresh process (getOrCreate reuses an existing JVM conf).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
            .appName("oracle_check_vanilla")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "48g")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from a2b_spark import get_spark

        spark = get_spark("oracle_check")
    con = make_duckdb_con(sf_dir)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd filter must not produce a green no-op gate
        raise SystemExit(f"unknown query name(s): {sorted(unknown)}")
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, sf_dir)
            sdf = spark_df.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows={len(sdf)}) [{time.time()-t0:.1f}s]")
            continue
        try:
            # .arrow() (not .df()) so HUGEINT/decimal promotion is
            # visible — pandas export flattens decimal128 to float64
            # and hides exactly the divergence the driver hash catches.
            otab = con.sql(sql).arrow()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(exc).__name__}: {exc}")
            failed.append(name)
            continue
        problems = type_gate(spark_df.schema, otab.schema)
        odf = otab.to_pandas()
        problems += compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
            failed.append(name)
        else:
            print(f"PASS {name} rows={len(sdf)} [{time.time()-t0:.1f}s]")
    missing = [k for k in oracles if k not in qs]
    if missing:
        print(f"WARN oracle_sql keys without queries(): {missing}")
    n_run = len(only) if only else len(qs)
    print(f"\n{n_run - len(failed)}/{n_run} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
