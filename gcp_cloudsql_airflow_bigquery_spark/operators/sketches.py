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


def join_key_overlap_estimate(
    left: DataFrame, left_key: str, right: DataFrame, right_key: str
) -> DataFrame:
    """Pre-join cardinality estimate from Theta sketches of both key
    columns: ``(n_left_keys, n_right_keys, n_shared_keys,
    left_match_frac, right_match_frac)`` — the planner-style question
    ("will this join drop most of my rows? is a pre-join semi-filter
    worth it?") answered with two single-pass sketch builds and a
    driver-side kilobyte intersection, never a real join.

    Pairs with :func:`~..skew.skew_report`: skew_report sizes the
    hottest key, this sizes the MATCH RATE; together they pick the
    join strategy before any shuffle is paid."""
    ls = left.agg(F.theta_sketch_agg(left_key).alias("s")).select(
        F.col("s").alias("sl")
    )
    rs = right.agg(F.theta_sketch_agg(right_key).alias("s")).select(
        F.col("s").alias("sr")
    )
    both = ls.crossJoin(F.broadcast(rs))
    n_l = F.theta_sketch_estimate(F.col("sl"))
    n_r = F.theta_sketch_estimate(F.col("sr"))
    n_shared = F.theta_sketch_estimate(F.theta_intersection(F.col("sl"), F.col("sr")))
    return both.select(
        n_l.alias("n_left_keys"),
        n_r.alias("n_right_keys"),
        n_shared.alias("n_shared_keys"),
        F.round(n_shared / n_l, 4).alias("left_match_frac"),
        F.round(n_shared / n_r, 4).alias("right_match_frac"),
    )
