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


def psi_drift(
    df: DataFrame,
    group_col: str,
    bin_col: Column,
    n_bins: int = 10,
    threshold: float = 0.2,
) -> DataFrame:
    """Population Stability Index of a pre-binned feature, per group
    vs the whole frame: ``PSI = Σ_b (p_g,b − p_ref,b) · ln(p_g,b /
    p_ref,b)`` with +0.5 Laplace smoothing on every bin count so empty
    bins contribute finite mass on both sides.  The standard
    model-monitoring drift score (>0.2 = action) applied to corpus
    curation: a source whose feature distribution drifts from the
    corpus reference gets flagged before it skews a training mix.

    ``bin_col`` must already be a deterministic integer in
    ``[0, n_bins)`` — binning by comparison against computed quantile
    boundaries is NOT cross-engine stable (FP boundary ties flip
    rows), fixed integer binning is.

    Scale shape: one hash aggregation per group computes every bin's
    count in a single pass (``n_bins`` conditional sums folded into an
    array-of-structs, exploded after — no bins×groups nested-loop
    scaffold join, no second scan); the reference distribution is the
    same aggregation with no key, a ≤``n_bins``-row frame broadcast
    into the final join.  Raw rows are touched exactly once."""
    binned = df.select(F.col(group_col).alias("g"), bin_col.alias("b"))
    per_bin = [
        F.struct(
            F.lit(b).alias("bin"),
            F.sum(F.when(F.col("b") == b, 1).otherwise(0))
            .cast("long")
            .alias("cnt"),
        )
        for b in range(n_bins)
    ]
    src = (
        binned.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.array(*per_bin).alias("bins"))
        .select("g", "n", F.explode("bins").alias("t"))
        .select("g", "n", F.col("t.bin").alias("bin"), F.col("t.cnt").alias("cnt"))
    )
    ref = (
        binned.groupBy()
        .agg(F.count(F.lit(1)).alias("n_ref"), F.array(*per_bin).alias("bins"))
        .select("n_ref", F.explode("bins").alias("t"))
        .select("n_ref", F.col("t.bin").alias("bin"), F.col("t.cnt").alias("cnt_ref"))
    )
    smooth = float(n_bins) * 0.5
    p = (F.col("cnt") + 0.5) / (F.col("n") + smooth)
    q = (F.col("cnt_ref") + 0.5) / (F.col("n_ref") + smooth)
    per_group = (
        src.join(F.broadcast(ref), "bin")
        .groupBy("g")
        .agg(
            F.max("n").alias("n_rows"),
            F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
        )
    )
    return per_group.select(
        F.col("g").alias(group_col),
        F.col("n_rows").alias("n_rows"),
        "psi",
        (F.col("psi") > threshold).alias("drift_flag"),
    )
