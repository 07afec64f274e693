"""Mergeable Datasketches state over event/metric columns: KLL
quantile sketches and Theta set sketches (all via Spark's built-in
``kll_*`` / ``theta_*`` expressions — JVM-side, binary, mergeable).

Shared scale shape with the HLL rollup (``frequency.py``): build
sketch state at the finest grain (per source per day) by touching only
that grain's rows; every coarser question — a p99 over a quarter, the
overlap of two audiences — is then answered by merging kilobyte
sketches, never rescanning raw history.  At 100 TB this is the
difference between an incremental dashboard and a nightly full scan.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_sketch_build(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 200
) -> DataFrame:
    """Per-group KLL(k) sketches of a double column — fixed-size
    mergeable state with a provable rank-error bound (~1.65/sqrt(k))."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(value_col, F.lit(k)).alias("kll")
    )


def quantile_sketch_rollup(
    sketches: DataFrame,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Merge stored KLL sketches to a coarser grain and read off
    quantiles — one aggregation over sketch bytes."""
    merged = sketches.groupBy(*group_cols).agg(
        F.kll_merge_agg_double("kll").alias("kll")
    )
    cols = [
        F.round(
            F.kll_sketch_get_quantile_double("kll", F.lit(q)), 6
        ).alias(f"p{int(q * 100)}")
        for q in quantiles
    ]
    return merged.select(*group_cols, *cols)


def theta_sketch_build(
    df: DataFrame, group_col: str, id_col: str
) -> DataFrame:
    """Per-group Theta sketches of an id column.  Unlike HLL, Theta
    state supports set ALGEBRA — intersection and difference — so
    stored per-segment sketches answer audience-overlap questions."""
    return df.groupBy(group_col).agg(
        F.theta_sketch_agg(id_col).alias("theta")
    )


def audience_overlap_matrix(sketches: DataFrame, group_col: str) -> DataFrame:
    """All-pairs audience algebra from stored Theta sketches:
    ``(a, b, n_a, n_b, n_both, n_only_a, n_only_b)`` for every pair of
    groups.  The self-join is sketch-count x sketch-count rows of
    kilobyte payloads — trivially broadcastable however large the
    underlying id sets were."""
    a = sketches.select(
        F.col(group_col).alias("a"), F.col("theta").alias("sa")
    )
    b = sketches.select(
        F.col(group_col).alias("b"), F.col("theta").alias("sb")
    )
    return (
        a.join(F.broadcast(b), F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.theta_sketch_estimate("sa").alias("n_a"),
            F.theta_sketch_estimate("sb").alias("n_b"),
            F.theta_sketch_estimate(
                F.theta_intersection("sa", "sb")
            ).alias("n_both"),
            F.theta_sketch_estimate(
                F.theta_difference("sa", "sb")
            ).alias("n_only_a"),
            F.theta_sketch_estimate(
                F.theta_difference("sb", "sa")
            ).alias("n_only_b"),
        )
    )
