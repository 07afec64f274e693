"""Round-9 wave differentials: closed-form EWMA vs the iterative
recursion, entropy bounds, stratified-sample determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_ewma_closed_form_matches_iterative_recursion(spark):
    """events_ewma_daily computes s_t = 0.3*x_t + 0.7*s_(t-1) (s_1=x_1)
    in closed form; replay the recursion in python on the same daily
    counts and compare at the emitted rounding."""
    from gcp_cloudsql_airflow_bigquery_spark.plans.events import (
        _events,
        events_ewma_daily,
    )

    daily = (
        _events(spark, SF_DIR)
        .filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[int]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(r.x)
    got = {r.event_type: r for r in events_ewma_daily(spark, SF_DIR).collect()}
    assert sorted(got) == sorted(series)
    for et, xs in series.items():
        s = float(xs[0])
        for x in xs[1:]:
            s = 0.3 * x + 0.7 * s
        assert abs(got[et].ewma - s) < 1e-4, (et, got[et].ewma, s)
        assert got[et].n_days == len(xs)
        assert got[et].last_count == xs[-1]


def test_user_entropy_bounds_and_uniform_case(spark):
    from gcp_cloudsql_airflow_bigquery_spark.plans.events import (
        events_user_entropy,
    )

    rows = events_user_entropy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.entropy <= math.log(r.n_types) + 1e-9
        assert 0.0 <= r.norm_entropy <= 1.0 + 1e-9
        if r.n_types == 1:
            assert r.entropy == 0.0 and r.norm_entropy == 0.0


def test_stratified_sample_is_deterministic_and_rate_shaped(spark):
    from gcp_cloudsql_airflow_bigquery_spark.plans.events import (
        _STRATA_RATES,
        events_stratified_sample,
    )

    a = {r.event_type: r for r in events_stratified_sample(spark, SF_DIR).collect()}
    b = {r.event_type: r for r in events_stratified_sample(spark, SF_DIR).collect()}
    assert a.keys() == b.keys()
    for et in a:
        assert a[et].n_kept == b[et].n_kept  # pure function of ids
        assert a[et].target_pct == _STRATA_RATES.get(et, 100)
        assert 0 <= a[et].n_kept <= a[et].n_total
        if a[et].target_pct == 100:
            assert a[et].n_kept == a[et].n_total


def test_markov_stationary_is_fixed_point_and_sums_to_one(spark):
    """After 12 rounds the distribution should (a) sum to ~1 and (b) be
    near-invariant under one more application of P — the defining
    property, checked against an independent python replay of the
    chain."""
    from gcp_cloudsql_airflow_bigquery_spark.plans.events import (
        events_markov_stationary,
        events_transition_matrix,
    )

    pi = {
        r.event_type: r.stationary
        for r in events_markov_stationary(spark, SF_DIR).collect()
    }
    assert abs(sum(pi.values()) - 1.0) < 1e-4
    P: dict[tuple[str, str], float] = {}
    for r in events_transition_matrix(spark, SF_DIR).collect():
        P[(r.from_type, r.to_type)] = r.n
    rowsum: dict[str, float] = {}
    for (a, _), n in P.items():
        rowsum[a] = rowsum.get(a, 0) + n
    nxt = {s: 0.0 for s in pi}
    for (a, b), n in P.items():
        nxt[b] += pi[a] * (n / rowsum[a])
    for s in pi:
        assert abs(nxt[s] - pi[s]) < 5e-3, (s, nxt[s], pi[s])


def test_daily_decomposition_seasonal_sums_near_zero(spark):
    """Additive seasonal indices over a full week of a detrended series
    must roughly cancel per type (the decomposition identity)."""
    from gcp_cloudsql_airflow_bigquery_spark.plans.events import (
        events_daily_decomposition,
    )

    rows = events_daily_decomposition(spark, SF_DIR).collect()
    per_type: dict[str, list] = {}
    for r in rows:
        per_type.setdefault(r.event_type, []).append(r)
    for et, rs in per_type.items():
        assert len(rs) == 7, et  # every weekday present on the dense grid
        mean_abs = sum(abs(r.seasonal) for r in rs) / 7
        weighted = sum(r.seasonal * r.n_days for r in rs) / sum(r.n_days for r in rs)
        assert abs(weighted) <= max(0.2, 0.2 * mean_abs), (et, weighted)
