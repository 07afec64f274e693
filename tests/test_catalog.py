"""Fixture-drift guard for the events loader.

Round 2/3 regression: the driver regenerated ``events.parquet`` with
``ts`` as plain TIMESTAMP(MICROS) while ``catalog.load_table`` still
assumed legacy int64-nanos, turning every events query red with no
localized signal.  These tests construct BOTH encodings in-test and
assert the loader normalizes each to ``ts: timestamp`` — so a future
fixture re-encode fails here first, with an exact message.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table

_TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 1, 0, 5, 30, 123456),
    datetime.datetime(2024, 1, 2, 12, 0, 0, 999999),
]
_US = [int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000) for t in _TS]


def _write_events(path, ts_array):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 10, 20], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(['{"a":1}', '{"a":2}', '{"a":3}']),
        }
    )
    pq.write_table(tbl, str(path))


@pytest.fixture()
def micros_dir(tmp_path):
    d = tmp_path / "micros"
    d.mkdir()
    _write_events(d / "events.parquet", pa.array(_TS, pa.timestamp("us")))
    return str(d)


@pytest.fixture()
def nanos_dir(tmp_path):
    d = tmp_path / "nanos"
    d.mkdir()
    # Legacy encoding: raw int64 epoch-nanoseconds, the shape Spark sees
    # for TIMESTAMP(NANOS) parquet under nanosAsLong.
    _write_events(d / "events.parquet", pa.array([u * 1000 for u in _US], pa.int64()))
    return str(d)


def test_loader_micros_encoding(spark, micros_dir):
    df = load_table(spark, micros_dir, "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts"].startswith("timestamp"), dtypes
    assert df.count() == 3


def test_loader_nanos_encoding(spark, nanos_dir):
    df = load_table(spark, nanos_dir, "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts"].startswith("timestamp"), dtypes
    assert df.count() == 3


def test_loader_encodings_agree(spark, micros_dir, nanos_dir):
    from pyspark.sql import functions as F

    a = load_table(spark, micros_dir, "events").select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    b = load_table(spark, nanos_dir, "events").select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    assert sorted(a.collect()) == sorted(b.collect())


def test_real_fixture_loads(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    assert df.count() > 0
