"""Per-dialect JDBC coverage for the three engines the reference
proxies (MySQL / PostgreSQL / MSSQL; reference
``yaml/sql_proxy_mysql_deployment.yaml:48``,
``yaml/sql_proxy_postgresql_deployment_with_sa.yaml:57``,
``dags/mssql_to_bigquery.py:2``): URL assembly, identifier quoting,
catalog-scan scoping, injection rejection, and the per-engine type
names feeding the op-C 5-type collapse.  The Derby dialect is
exercised live against an embedded database."""

from __future__ import annotations

import pytest

from gcp_cloudsql_airflow_bigquery_spark.sources.dialects import (
    DERBY,
    DIALECTS,
    MSSQL,
    MYSQL,
    POSTGRESQL,
    dialect_for_url,
    validate_ident,
)


@pytest.mark.parametrize(
    ("dialect", "want"),
    [
        (MYSQL, "jdbc:mysql://db.example:3306/dvh"),
        (POSTGRESQL, "jdbc:postgresql://db.example:5432/dvh"),
        (MSSQL, "jdbc:sqlserver://db.example:1433;databaseName=dvh"),
        (DERBY, "jdbc:derby://db.example:1527/dvh"),
    ],
)
def test_url_assembly_default_port(dialect, want):
    assert dialect.url("db.example", "dvh") == want


def test_url_assembly_params_and_port():
    assert (
        MYSQL.url("h", "d", port=3307, params={"useSSL": "false"})
        == "jdbc:mysql://h:3307/d?useSSL=false"
    )
    assert (
        MSSQL.url("h", "d", params={"encrypt": "true"})
        == "jdbc:sqlserver://h:1433;databaseName=d;encrypt=true"
    )


@pytest.mark.parametrize(
    ("dialect", "want"),
    [(MYSQL, "`person`"), (POSTGRESQL, '"person"'), (MSSQL, "[person]"), (DERBY, '"person"')],
)
def test_identifier_quoting(dialect, want):
    assert dialect.quote("person") == want


@pytest.mark.parametrize(
    "bad", ["per son", "t;drop table x", "t'--", 'a"b', "sch.tab", "", "1tab"]
)
def test_identifier_validation_rejects(bad):
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        validate_ident(bad)
    for d in DIALECTS.values():
        with pytest.raises(ValueError, match="invalid SQL identifier"):
            d.schema_query(bad)


def test_schema_query_scoping_mysql():
    """MySQL: TABLE_SCHEMA *is* the database — the reference's own
    predicate shape (``dags/cloudsql_to_bigquery.py:141``)."""
    q = MYSQL.schema_query("FactPerson", database="dvh")
    assert "TABLE_NAME = 'FactPerson'" in q
    assert "TABLE_SCHEMA = 'dvh'" in q
    assert "ORDER BY ORDINAL_POSITION" in q
    # without a database the scan is (documented) unscoped
    assert "TABLE_SCHEMA" not in MYSQL.schema_query("FactPerson")


def test_schema_query_scoping_postgresql_mssql():
    q = POSTGRESQL.schema_query("factperson", database="dvh")
    assert "TABLE_CATALOG = 'dvh'" in q
    assert "TABLE_SCHEMA = 'public'" in q  # namespace default
    q2 = MSSQL.schema_query("FactPerson", database="dvh", schema="sales")
    assert "TABLE_CATALOG = 'dvh'" in q2
    assert "TABLE_SCHEMA = 'sales'" in q2
    q3 = MSSQL.schema_query("FactPerson")
    assert "TABLE_SCHEMA = 'dbo'" in q3  # mssql_to_bigquery.py:2 dbo default


def test_dialect_for_url():
    assert dialect_for_url("jdbc:mysql://h/d") is MYSQL
    assert dialect_for_url("jdbc:postgresql://h/d") is POSTGRESQL
    assert dialect_for_url("jdbc:sqlserver://h;databaseName=d") is MSSQL
    assert dialect_for_url("jdbc:derby:memory:x") is DERBY
    assert dialect_for_url("not-a-jdbc-url") is None


# engine-specific catalog type names → the reference's 5-type collapse
_MYSQL_TYPES = [
    ("tinyint", "INTEGER"),
    ("smallint", "INTEGER"),
    ("int", "INTEGER"),
    ("bigint", "INTEGER"),
    ("int unsigned", "INTEGER"),
    ("decimal(10,2)", "FLOAT"),  # the documented lossy branch
    ("double", "FLOAT"),
    ("float", "FLOAT"),
    ("datetime", "DATETIME"),
    ("timestamp", "DATETIME"),
    ("date", "DATE"),
    ("year", "INTEGER"),  # dialect override
    ("time", "STRING"),  # dialect override
    ("varchar(255)", "STRING"),
    ("text", "STRING"),
    ("json", "STRING"),
]

_PG_TYPES = [
    ("integer", "INTEGER"),
    ("bigint", "INTEGER"),
    ("smallint", "INTEGER"),
    ("serial", "INTEGER"),
    ("numeric", "FLOAT"),
    ("double precision", "FLOAT"),
    ("real", "FLOAT"),  # dialect override (no substring hit)
    ("timestamp without time zone", "DATETIME"),
    ("timestamp with time zone", "DATETIME"),
    ("date", "DATE"),
    ("interval", "STRING"),  # would collapse to INTEGER without override
    ("character varying", "STRING"),
    ("text", "STRING"),
    ("uuid", "STRING"),
    ("jsonb", "STRING"),
]

_MSSQL_TYPES = [
    ("tinyint", "INTEGER"),
    ("smallint", "INTEGER"),
    ("int", "INTEGER"),
    ("bigint", "INTEGER"),
    ("decimal(18,4)", "FLOAT"),
    ("numeric(10,2)", "FLOAT"),
    ("float", "FLOAT"),
    ("real", "FLOAT"),  # dialect override
    ("money", "FLOAT"),  # dialect override
    ("datetime", "DATETIME"),
    ("datetime2", "DATETIME"),
    ("smalldatetime", "DATETIME"),
    ("datetimeoffset", "DATETIME"),  # dialect override
    ("date", "DATE"),
    ("nvarchar(100)", "STRING"),
    ("uniqueidentifier", "STRING"),
]


@pytest.mark.parametrize(
    ("dialect", "cases"),
    [(MYSQL, _MYSQL_TYPES), (POSTGRESQL, _PG_TYPES), (MSSQL, _MSSQL_TYPES)],
    ids=["mysql", "postgresql", "mssql"],
)
def test_type_collapse_per_engine(dialect, cases):
    for src_type, want in cases:
        got = dialect.bq_type(src_type)
        assert got == want, f"{dialect.name}: {src_type} -> {got}, want {want}"


def test_derby_schema_scan_via_dialect(spark):
    """scan_schema with no explicit query: the dialect inferred from
    the URL must build a working catalog scan (live embedded Derby)."""
    from gcp_cloudsql_airflow_bigquery_spark.config import SourceSpec
    from gcp_cloudsql_airflow_bigquery_spark.sources import jdbc

    url = "jdbc:derby:memory:t_dialects;create=true"
    _seed_derby(spark, url)
    spec = SourceSpec(
        kind="jdbc",
        url="jdbc:derby:memory:t_dialects",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    rows = jdbc.scan_schema(spark, spec, "DPEOPLE").collect()
    assert [r.COLUMN_NAME for r in rows] == ["ID", "NAME", "SCORE"]
    with pytest.raises(ValueError, match="invalid SQL identifier"):
        jdbc.scan_schema(spark, spec, "DPEOPLE'; DROP TABLE X --")


def _seed_derby(spark, url):
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    try:
        st.execute(
            "CREATE TABLE DPEOPLE (ID INT, NAME VARCHAR(20), SCORE DOUBLE)"
        )
    except Exception:  # table exists from a prior run  # noqa: BLE001
        pass
    st.close()
    conn.close()
