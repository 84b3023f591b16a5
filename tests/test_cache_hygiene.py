"""Library-hygiene sweep (round-4 advice): no registry query may leave
an entry in the session cache manager after it has fully executed.

Operators that pin fan-out intermediates do so with an eager
``localCheckpoint`` (blocks freed on driver-side GC, nothing in the
cache manager) rather than ``persist`` — a long-lived session calling
queries repeatedly must not accumulate cached plans. Internal
persist/unpersist pairs (exec/references.py, exec/executor.py) release
before returning, so they pass this sweep too.
"""

from tests.conftest import SF_DIR


def test_registry_queries_leave_no_catalog_cache(spark):
    from a2b_spark.queries import QUERIES

    jcm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    dirty = []
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        if not jcm.isEmpty():
            dirty.append(name)
            spark.catalog.clearCache()  # isolate: report every offender
    assert not dirty, f"queries leaving cached plans behind: {dirty}"
