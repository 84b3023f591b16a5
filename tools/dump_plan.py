"""Dump a query's explain("formatted") output to a file — the plan
evidence the optimization-round deliverables require (guide §7.2).

Usage: python tools/dump_plan.py <out_dir> <suffix> <query> [query ...]
Writes <out_dir>/<qNN>_<suffix>.txt per query (short name prefix).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    from a2b_spark.session import get_spark
    from a2b_spark.queries import QUERIES

    spark = get_spark("dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        short = name.split("_")[0]
        path = os.path.join(out_dir, f"{short}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(path, flush=True)


if __name__ == "__main__":
    main()
