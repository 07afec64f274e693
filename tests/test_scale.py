"""Skew-mitigation plans: salted variants must be row-identical to the
naive formulations (checked via the DuckDB oracle)."""

from __future__ import annotations

import pytest

from gcp_cloudsql_airflow_bigquery_spark.plans import scale
from gcp_cloudsql_airflow_bigquery_spark.testing import compare_spark_duckdb


@pytest.mark.parametrize("name", sorted(scale.QUERIES))
def test_scale_matches_oracle(spark, duck, sf_dir, name):
    df = scale.QUERIES[name](spark, sf_dir)
    mismatch = compare_spark_duckdb(df, duck, scale.ORACLE[name])
    assert mismatch is None, f"{name}: {mismatch}"


def test_registry_keys_align():
    assert set(scale.QUERIES) == set(scale.ORACLE)
