"""JDBC sink SQL generation (no driver jars in the container, so the
server round-trip is untested; the statement construction is the part
we own and it is exercised here)."""

import pytest

from a2b_spark.sinks.jdbc import ANSI_MERGE_SQL, POSTGRES_UPSERT_SQL, JdbcDestination


def _dest(template):
    return JdbcDestination(
        "jdbc:postgresql://db/x", "tgt", ["k1", "k2"], merge_sql_template=template
    )


def test_ansi_merge_sql():
    sql = _dest(ANSI_MERGE_SQL).build_merge_sql(["k1", "k2", "a", "b"])
    assert sql == (
        'MERGE INTO tgt t USING tgt__a2b_stage s '
        'ON t."k1" = s."k1" AND t."k2" = s."k2" '
        'WHEN MATCHED THEN UPDATE SET "a" = s."a", "b" = s."b" '
        'WHEN NOT MATCHED THEN INSERT ("k1", "k2", "a", "b") '
        'VALUES (s."k1", s."k2", s."a", s."b")'
    )


def test_postgres_upsert_sql():
    sql = _dest(POSTGRES_UPSERT_SQL).build_merge_sql(["k1", "k2", "a"])
    assert sql == (
        'INSERT INTO tgt ("k1", "k2", "a") SELECT "k1", "k2", "a" FROM tgt__a2b_stage '
        'ON CONFLICT ("k1", "k2") DO UPDATE SET "a" = EXCLUDED."a"'
    )


def test_column_order_preserved():
    # batch column order drives insert order so the staged table and
    # statement always agree, regardless of key position
    sql = _dest(ANSI_MERGE_SQL).build_merge_sql(["b", "k2", "a", "k1"])
    assert 'INSERT ("b", "k2", "a", "k1") VALUES (s."b", s."k2", s."a", s."k1")' in sql


def test_missing_key_raises():
    with pytest.raises(ValueError, match="missing key columns"):
        _dest(ANSI_MERGE_SQL).build_merge_sql(["k1", "a"])


def test_no_template_raises():
    d = JdbcDestination("jdbc:x", "t", ["k"])
    with pytest.raises(ValueError, match="not configured"):
        d.build_merge_sql(["k", "a"])


def test_custom_staging_table():
    d = JdbcDestination(
        "jdbc:x", "t", ["k"], merge_sql_template=ANSI_MERGE_SQL, staging_table="my_stage"
    )
    assert "USING my_stage s" in d.build_merge_sql(["k", "v"])


def test_staged_merge_live_derby(spark, tmp_path):
    """End-to-end staged merge against embedded Derby (the one JDBC
    engine whose jars ship with PySpark): stage + one server-side ANSI
    MERGE, then verify upsert semantics by reading the table back."""
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    dest = JdbcDestination(
        url, "tgt", ["k"], properties=props, merge_sql_template=ANSI_MERGE_SQL
    )

    base = spark.createDataFrame([(1, 10), (2, 20)], "k bigint, v bigint")
    # create the target with the initial rows (plain jdbc write)
    base.write.format("jdbc").option("url", url).option("dbtable", "tgt").options(
        **props
    ).mode("overwrite").save()

    batch = spark.createDataFrame([(2, 99), (3, 30)], "k bigint, v bigint")
    dest.merge(batch)

    got = {
        r.k: r.v
        for r in spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "tgt")
        .options(**props)
        .load()
        .collect()
    }
    assert got == {1: 10, 2: 99, 3: 30}, "MERGE must update matched + insert new"

    # staged delete: one server-side DELETE WHERE EXISTS
    dest.delete_keys(spark.createDataFrame([(1,)], "k bigint"))
    got = {
        r.k: r.v
        for r in dest.read_snapshot(spark).collect()
    }
    assert got == {2: 99, 3: 30}


def test_pure_key_table_merge_sql():
    """Every-column-is-a-key (link-table shape): the templates would
    render an empty update-set clause; build_merge_sql must emit an
    insert-only NOT EXISTS statement instead (round-5 review)."""
    sql = _dest(ANSI_MERGE_SQL).build_merge_sql(["k1", "k2"])
    assert "UPDATE SET" not in sql and "NOT EXISTS" in sql
    assert sql.startswith('INSERT INTO tgt ("k1", "k2")')
    # same for the postgres template — the shape is template-independent
    assert "UPDATE" not in _dest(POSTGRES_UPSERT_SQL).build_merge_sql(["k1", "k2"])


def test_rewrite_fallback_merge_and_delete_live_derby(spark, tmp_path):
    """The NO-template fallback path (truncate+rewrite) used to read
    the target lazily AFTER truncation — merge lost all pre-existing
    rows and delete wiped the whole table (round-5 review). Verified
    against live embedded Derby."""
    url = f"jdbc:derby:{tmp_path}/db2;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    dest = JdbcDestination(url, "tgt2", ["k"], properties=props)  # no template

    spark.createDataFrame([(1, 10), (2, 20)], "k bigint, v bigint").write.format(
        "jdbc"
    ).option("url", url).option("dbtable", "tgt2").options(**props).mode(
        "overwrite"
    ).save()

    dest.merge(spark.createDataFrame([(2, 99), (3, 30)], "k bigint, v bigint"))
    got = {r.k: r.v for r in dest.read_snapshot(spark).collect()}
    assert got == {1: 10, 2: 99, 3: 30}, "fallback merge lost pre-existing rows"

    dest.delete_keys(spark.createDataFrame([(1,)], "k bigint"))
    got = {r.k: r.v for r in dest.read_snapshot(spark).collect()}
    assert got == {2: 99, 3: 30}, "fallback delete must remove only the keys"
