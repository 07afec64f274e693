"""Single-pass table profiling: per-column null counts, distinct
counts, and min/max.

The reference introspects only *schema* (INFORMATION_SCHEMA names and
types, ``dags/cloudsql_to_bigquery.py:141``); an engine that owns the
data should also profile *values* — the first thing run against a
newly landed extract to validate it before downstream queries.

One global aggregate → one reduce to a single row, then the row is
pivoted to per-column records driver-free via an array-of-structs
explode.  No joins, no per-column jobs.

Scale note: multiple **exact** ``count_distinct`` in one aggregate make
Catalyst Expand the input (one duplicated stream per distinct agg) —
fine at validation scale, wrong for a 100-column 100 TB table.  Default
``exact_distinct=False`` uses HyperLogLog ``approx_count_distinct``
(single Expand-free pass); flip it on only when an oracle-grade number
is required.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Render = Callable[[Column], Column]


def _as_string(c: Column) -> Column:
    return c.cast("string")


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = False,
    render: dict[str, Render] | None = None,
) -> DataFrame:
    """Profile ``cols`` (default: all) into one row per column:
    ``(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)``.
    ``render`` overrides the min/max → string rendering per column
    (e.g. a fixed-scale decimal cast for doubles, so the output is
    engine-portable)."""
    cols = list(cols or df.columns)
    render = render or {}
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        to_str = render.get(c, _as_string)
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct(F.col(c)).alias(f"{c}__distinct"),
            to_str(F.min(c)).alias(f"{c}__min"),
            to_str(F.max(c)).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    records = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(records).alias("p")).select("p.*")
