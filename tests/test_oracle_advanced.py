"""Oracle-differential tests for the extended SQL-surface plans."""

from __future__ import annotations

import pytest

from gcp_cloudsql_airflow_bigquery_spark.plans import advanced
from gcp_cloudsql_airflow_bigquery_spark.testing import compare_spark_duckdb


@pytest.mark.parametrize("name", sorted(advanced.QUERIES))
def test_advanced_matches_oracle(spark, duck, sf_dir, name):
    df = advanced.QUERIES[name](spark, sf_dir)
    mismatch = compare_spark_duckdb(df, duck, advanced.ORACLE[name])
    assert mismatch is None, f"{name}: {mismatch}"


def test_registry_keys_align():
    assert set(advanced.QUERIES) == set(advanced.ORACLE)
