"""Event-time windows, batch form.

``window``/``session_window`` are the same Catalyst expressions in batch
and streaming — these functions are reused by :mod:`.streams` with a
watermark on top, and checked against the DuckDB oracle here in batch
mode (SURVEY.md §7 M3 "batch-equivalent versions stay oracle-checkable").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling event-time window per event_type: count + value sum.
    Partial aggregation happens map-side; the shuffle key
    (window, event_type) is low-cardinality and uniform in time."""
    return (
        events.groupBy(F.window(ts_col, width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
                "sum_value"
            ),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding window: each event lands in width/slide windows."""
    return (
        events.groupBy(F.window(ts_col, width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
        )
    )


def session_stats(
    events: DataFrame, gap: str = "5 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Per-user session windows (gap-merged): session = maximal chain of
    events with inter-arrival < gap; end = last event + gap."""
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias(
                "sum_value"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
