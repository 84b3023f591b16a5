"""Per-query execution profile: wall seconds, Spark JOB count, stage
count, task count — the driver-sync/overhead signal the optimization
round targets (guide §1: measure first; §2.6: sequential actions
serialize the driver).

At bench scale (sf0.1, tables of 5k-600k rows) per-job scheduling
latency dominates wall time, so `jobs` is the first number to shrink;
at 100 TB the same count is the number of driver round-trips a chain
forces between its distributed phases.

Usage: python tools/profile_queries.py [query ...]   (default: all)
Output: one line per query to stdout; TSV.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from a2b_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from a2b_spark.queries import QUERIES

    names = sys.argv[1:] or list(QUERIES)

    # warm the JVM/Python channels like bench.py does
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(1_000_000).select(F.sum("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(10_000).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).select(
        F.sum(F.lit(1).cast("decimal(18,2)"))
    ).write.format("noop").mode("overwrite").save()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(0, cpus * 4, 1, cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    store = spark.sparkContext._jsc.sc().statusStore()

    def counters():
        jobs = store.jobsList(None)
        n_jobs = jobs.size()
        n_stages = 0
        n_tasks = 0
        it = jobs.iterator()
        while it.hasNext():
            j = it.next()
            n_stages += j.stageIds().size()
            n_tasks += j.numTasks()
        return n_jobs, n_stages, n_tasks

    print("query\twall_s\tjobs\tstages\ttasks")
    for name in sorted(names):
        fn = QUERIES[name]
        spark.catalog.clearCache()
        j0, s0, t0 = counters()
        t_start = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t_start
        j1, s1, t1 = counters()
        print(
            f"{name}\t{wall:.3f}\t{j1 - j0}\t{s1 - s0}\t{t1 - t0}",
            flush=True,
        )


if __name__ == "__main__":
    main()
