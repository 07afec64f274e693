"""Event-time window plans, batch form, over ``events`` (SURVEY.md §7
M3).  Same Catalyst expressions the streaming pipelines use; DuckDB
oracles reproduce the window semantics (time_bucket for fixed windows,
gaps-and-islands for sessions).

Timestamp-precision note: ``events.ts`` is nanosecond-precision parquet;
Spark reads microseconds, DuckDB keeps nanos.  Oracle-checked outputs
therefore only expose bucket boundaries (exact at any precision) or
millisecond-truncated session bounds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..streaming import windows


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.tumbling_counts(_events(spark, sf_dir), "1 hour")


_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS w_start,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS w_end,
       event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM events GROUP BY 1, 2, 3
"""


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.sliding_counts(_events(spark, sf_dir), "1 hour", "30 minutes")


_SLIDING_SQL = """
WITH starts AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w_start, event_type FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type
  FROM events
)
SELECT w_start, event_type, COUNT(*) AS n_events
FROM starts GROUP BY 1, 2
"""


def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = windows.session_stats(_events(spark, sf_dir), "5 minutes")
    return df.select(
        "user_id",
        F.date_trunc("millisecond", "session_start").alias("session_start"),
        F.date_trunc("millisecond", "session_end").alias("session_end"),
        "n_events",
        "sum_value",
    )


_SESSION_SQL = """
WITH o AS (
  SELECT user_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), f AS (
  SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '5 minutes'
                 THEN 1 ELSE 0 END AS new_s
  FROM o
), g AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT user_id,
       date_trunc('ms', MIN(ts)) AS session_start,
       date_trunc('ms', MAX(ts) + INTERVAL '5 minutes') AS session_end,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM g GROUP BY user_id, sid
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_tumbling": events_tumbling,
    "events_sliding": events_sliding,
    "events_session": events_session,
}

ORACLE: dict[str, str] = {
    "events_tumbling": _TUMBLING_SQL,
    "events_sliding": _SLIDING_SQL,
    "events_session": _SESSION_SQL,
}
