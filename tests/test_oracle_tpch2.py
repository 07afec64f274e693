"""Oracle-differential tests for the TPC-H completion suite
(Q8/Q9/Q11/Q12/Q16/Q17/Q20/Q22 shapes)."""

from __future__ import annotations

import pytest

from gcp_cloudsql_airflow_bigquery_spark.plans import tpch2
from gcp_cloudsql_airflow_bigquery_spark.testing import compare_spark_duckdb


@pytest.mark.parametrize("name", sorted(tpch2.QUERIES))
def test_tpch2_matches_oracle(spark, duck, sf_dir, name):
    df = tpch2.QUERIES[name](spark, sf_dir)
    mismatch = compare_spark_duckdb(df, duck, tpch2.ORACLE[name])
    assert mismatch is None, f"{name}: {mismatch}"


def test_registry_keys_align():
    assert set(tpch2.QUERIES) == set(tpch2.ORACLE)


def test_q22_nonempty(spark, sf_dir):
    # guard against the anti-join degenerating to an empty (vacuously
    # matching) result on fixture data
    assert tpch2.q22_global_sales_opportunity(spark, sf_dir).count() > 0
