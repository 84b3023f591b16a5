"""Replay the PENDING round-9 tranche (a2b_spark/queries/round9.py)
under STOCK Spark defaults — the external driver builds its own
session (ANSI on, 200 shuffle partitions), and config sensitivity the
tuned session never sees was round 4's only failure class — with
check_oracle's driver-grade comparison (type gate + exact values).

Usage: python tools/check_pending_vanilla.py [sf_dir]
Run BEFORE registering the tranche in queries/__init__.py (round 9).
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
from a2b_spark.queries import round9
from tools.check_oracle import compare, make_duckdb_con, type_gate

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = make_duckdb_con(sf)
fails = 0
for name in sorted(round9.QUERIES):
    try:
        sdf = round9.QUERIES[name](spark, sf)
        arrow = con.sql(round9.ORACLES[name]).arrow()
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
print(f"{len(round9.QUERIES) - fails}/{len(round9.QUERIES)} pending queries pass vanilla at {sf}")
sys.exit(1 if fails else 0)
