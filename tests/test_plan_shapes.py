"""Plan-shape regression guards: the scale properties SCALE.md claims
(broadcast star joins, single-shuffle aggs, partial aggregation, pushed
filters) are asserted against the actual physical plans so a refactor
can't silently regress them."""

from __future__ import annotations

import pytest

from gcp_cloudsql_airflow_bigquery_spark.plans import relational


def _plan(spark, sf_dir, name):
    df = relational.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_star_join_broadcasts_all_dims(spark, sf_dir):
    p = _plan(spark, sf_dir, "flagship_revenue_by_region_nation")
    assert p.count("BroadcastHashJoin") == 4, p
    assert p.count("SortMergeJoin") == 0, p
    # exactly one data shuffle: the final aggregation
    assert p.count("Exchange hashpartitioning") == 1, p


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    p = _plan(spark, sf_dir, "pricing_summary")
    # map-side combine before the single exchange
    assert "HashAggregate" in p
    assert p.count("Exchange hashpartitioning") == 1, p


def test_incremental_filter_pushed_to_scan(spark, sf_dir):
    p = _plan(spark, sf_dir, "filter_incremental")
    assert "PushedFilters: [" in p
    # no shuffle at all for a pushed filter + projection
    assert "Exchange hashpartitioning" not in p, p


def test_scan_prunes_columns(spark, sf_dir):
    p = _plan(spark, sf_dir, "pricing_summary")
    # lineitem has 11 columns; the Q1 scan must read only the 7 used
    scan = p.split("ReadSchema: ")[1].splitlines()[0]
    n_cols = scan.count(":")
    assert n_cols <= 7, scan


@pytest.mark.parametrize(
    "name", ["join_broadcast", "topk_per_group", "dedup_exact"]
)
def test_no_cartesian_anywhere(spark, sf_dir, name):
    p = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
