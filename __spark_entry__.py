"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gcp_cloudsql_airflow_bigquery_spark.plans import (
    advanced,
    curation,
    dq,
    events,
    llmdata,
    quality,
    relational,
    scale,
    temporal,
    tpch,
    tpch2,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship star-join (the reference's declared-but-never-wired
    ``stage_final_query`` join-merge step, reference
    ``dags/cloudsql_to_bigquery.py:11``) on /root/testdata/sf0.001."""
    return relational.flagship_revenue_by_region_nation(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(advanced.QUERIES)
    out.update(curation.QUERIES)
    out.update(dq.QUERIES)
    out.update(quality.QUERIES)
    out.update(llmdata.QUERIES)
    out.update(events.QUERIES)
    out.update(temporal.QUERIES)
    out.update(scale.QUERIES)
    out.update(tpch.QUERIES)
    out.update(tpch2.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLE)
    out.update(advanced.ORACLE)
    out.update(curation.ORACLE)
    out.update(dq.ORACLE)
    out.update(quality.ORACLE)
    out.update(llmdata.ORACLE)
    out.update(events.ORACLE)
    out.update(temporal.ORACLE)
    out.update(scale.ORACLE)
    out.update(tpch.ORACLE)
    out.update(tpch2.ORACLE)
    return out
