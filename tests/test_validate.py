"""operators/validate.py — declarative single-pass DQ checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_cloudsql_airflow_bigquery_spark.operators import validate as V


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "F", 10.0, "a@x.com"),
            (2, "O", -5.0, "bad-email"),
            (2, "Z", 75.0, None),
            (None, "F", None, "c@y.org"),
        ],
        "id INT, status STRING, amount DOUBLE, email STRING",
    )


def _report(df, **kw):
    return {
        r.check_name: (r.violations, r.n_rows)
        for r in V.report(df, **kw).collect()
    }


def test_single_pass_checks(spark):
    got = _report(
        _frame(spark),
        checks=[
            V.not_null("id"),
            V.in_set("status", ["F", "O"]),
            V.in_range("amount", 0, 50),
            V.matches("email", r"^[^@]+@[^@]+\.[^@]+$"),
        ],
        unique=[["id"]],
    )
    assert got["id_not_null"] == (1, 4)
    assert got["status_domain"] == (1, 4)  # only 'Z'
    assert got["amount_range"] == (2, 4)  # -5 and 75; NULL passes
    assert got["email_format"] == (1, 4)  # NULL passes
    # 4 rows, 2 distinct non-null ids -> 2 "duplicates" (the NULL id
    # counts as a row but not a distinct combo, as documented)
    assert got["id_unique"] == (2, 4)


def test_null_values_do_not_violate_value_checks(spark):
    df = _frame(spark).select("id", "amount")
    got = _report(df, checks=[V.in_range("amount", 0, 100)])
    assert got["amount_range"] == (1, 4)  # only -5


def test_clean_frame_reports_zero(spark):
    df = _frame(spark).filter(F.col("id") == 1)
    got = _report(
        df,
        checks=[V.not_null("id"), V.in_set("status", ["F", "O"])],
        unique=[["id"]],
    )
    assert all(v == 0 for v, _ in got.values())


def test_report_is_one_aggregate(spark):
    """The whole report must stay one aggregate over one scan — no
    per-check subplans (at 100 TB, N checks must not mean N passes)."""
    df = _frame(spark)
    plan = (
        V.report(
            df,
            checks=[V.not_null("id"), V.in_range("amount", 0, 50)],
            unique=[["id"]],
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("LocalRelation") + plan.count("LogicalRDD") == 1


def test_quarantine_split_routes_and_annotates(spark):
    from gcp_cloudsql_airflow_bigquery_spark.operators.validate import (
        in_range,
        in_set,
        not_null,
        quarantine_split,
    )

    df = spark.createDataFrame(
        [
            (1, "F", 10.0),       # clean
            (2, None, 5.0),       # null status
            (3, "X", 5.0),        # bad domain
            (4, "O", -7.0),       # bad range
            (5, None, 999.0),     # two failures
        ],
        "id long, status string, amt double",
    )
    checks = [
        not_null("status"),
        in_set("status", ["F", "O", "P"]),
        in_range("amt", 0.0, 100.0),
    ]
    clean, quarantined = quarantine_split(df, checks)
    assert [r.id for r in clean.collect()] == [1]
    q = {r.id: r.failed_checks for r in quarantined.collect()}
    assert q[2] == "status_not_null"
    assert q[3] == "status_domain"
    assert q[4] == "amt_range"
    assert q[5] == "status_not_null,amt_range"
    # row conservation: nothing silently dropped
    assert clean.count() + quarantined.count() == df.count()


def test_events_ts_bounds_constants_match_fixture():
    """``plans/dq._EVENTS_TS_LO/_HI`` are FIXTURE-COUPLED by design
    (the ts_bounds gate reports violations outside that calendar
    window).  A regenerated fixture with a different year would turn
    the gate itself into the violation (VERDICT r7 #6) — this guard
    makes that fail fast here instead of as phantom driver hash
    mismatches.  DuckDB parquet min/max, no Spark session needed."""
    import datetime as dt
    import os

    import duckdb

    from gcp_cloudsql_airflow_bigquery_spark.plans.dq import (
        _EVENTS_TS_HI,
        _EVENTS_TS_LO,
    )

    lo = dt.datetime.fromisoformat(_EVENTS_TS_LO)
    hi = dt.datetime.fromisoformat(_EVENTS_TS_HI)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/events.parquet"
        if not os.path.exists(path):
            continue
        tmin, tmax = duckdb.sql(
            f"SELECT MIN(ts), MAX(ts) FROM read_parquet('{path}')"
        ).fetchone()
        assert lo <= tmin and tmax < hi, (
            f"{sf}: events ts span [{tmin}, {tmax}] escapes the "
            f"_EVENTS_TS_LO/_HI window [{lo}, {hi}) — the fixture was "
            "regenerated; update the constants in plans/dq.py"
        )
