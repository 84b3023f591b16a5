"""Replay a PENDING query tranche (default: a2b_spark/queries/round10.py)
under STOCK Spark defaults — the external driver builds its own
session (ANSI on, 200 shuffle partitions), and config sensitivity the
tuned session never sees was round 4's only failure class — with
check_oracle's driver-grade comparison (type gate + exact values).

Usage: python tools/check_pending_vanilla.py [sf_dir] [module=round10]
Run BEFORE registering a tranche in queries/__init__.py.
"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("vanilla-pending")
    .config("spark.sql.ansi.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import importlib
from tools.check_oracle import compare, make_duckdb_con, type_gate

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
mod = importlib.import_module(
    "a2b_spark.queries." + (sys.argv[2] if len(sys.argv) > 2 else "round10")
)
con = make_duckdb_con(sf)
fails = 0
for name in sorted(mod.QUERIES):
    try:
        sdf = mod.QUERIES[name](spark, sf)
        arrow = con.sql(mod.ORACLES[name]).arrow()
        probs = type_gate(sdf.schema, arrow.schema) or compare(
            name, sdf.toPandas(), arrow.to_pandas()
        )
        if probs:
            fails += 1
            print(f"FAIL {name}: {probs}")
        else:
            print(f"PASS {name}")
    except Exception as e:
        fails += 1
        print(f"ERROR {name}: {type(e).__name__}: {str(e)[:200]}")
print(f"{len(mod.QUERIES) - fails}/{len(mod.QUERIES)} pending queries pass vanilla at {sf}")
sys.exit(1 if fails else 0)
