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
    search,
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


# The driver hard-verifies the first 50 queries() entries in dict
# insertion order.  Rounds 1-3 always led with relational+advanced, so
# those have deep green history; this round leads with the modules that
# have never had driver signal (events/llmdata/temporal/tpch/tpch2 = 47
# entries) and lets relational/advanced rest on replica coverage.
_MODULES = (
    events,
    llmdata,
    temporal,
    tpch,
    tpch2,
    quality,
    curation,
    dq,
    scale,
    search,
    relational,
    advanced,
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
