"""Exact heavy-hitter mining via two-pass candidate generation.

The reference's analytics surface answers "which keys dominate the
table" with a full GROUP BY (delegated SQL, reference
``dags/cloudsql_to_bigquery.py:70`` ``stage_final_query``).  That is
fine when the key cardinality fits a shuffle; at 100 TB with a
billion-key column the full aggregate materializes a billion groups to
discard all but a handful.  This operator keeps the *exact* semantics
while bounding the shuffle to the answer size:

Pass 1 — candidate generation.  ``DataFrame.stat.freqItems`` runs the
Karp/Shenker/Papadimitriou one-pass frequent-items algorithm per
partition and merges the bounded summaries JVM-side (no shuffle of the
data; the merged summary is at most ``1/support`` entries — model-sized,
so collecting it to the driver is legitimate).  Its guarantee: every key
with frequency > support*n is in the output (a superset; false
positives possible, false negatives not).

Pass 2 — exact verification.  Re-scan with an ``isin`` filter on the
candidate set (pushed into the parquet scan as an IN filter) and count
exactly.  The groupBy now shuffles only rows belonging to at most
``1/support`` keys.  Keys failing the real threshold are dropped, so the
result is exactly the keys with count > min_frac*n — bit-identical to
the naive full GROUP BY ... HAVING, which is what the oracle runs.

``support`` is set to ``min_frac/2`` so the pass-1 guarantee strictly
covers the pass-2 threshold even at the boundary (freqItems promises
only *strictly greater than* support*n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# freqItems' documented floor for the support parameter.
_MIN_SUPPORT = 1e-4

# Above this many candidates, an ``isin`` literal list stops being a
# win: the parquet IN-filter pushdown saturates and Janino has to
# compile a thousands-branch In expression (measured ~1 s of codegen at
# 2.7k literals).  A broadcast semi-join ships the same keys once as a
# hashed relation instead.
_ISIN_MAX = 64


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_frac: float,
    count_alias: str = "n_rows",
) -> DataFrame:
    """Exactly the keys occurring in strictly more than ``min_frac`` of
    the rows, with their exact counts.

    Equivalent SQL (the oracle):
    ``SELECT key, COUNT(*) FROM t GROUP BY key
    HAVING COUNT(*) > min_frac * (SELECT COUNT(*) FROM t)``.
    """
    if not 0.0 < min_frac < 1.0:
        raise ValueError(f"min_frac must be in (0, 1), got {min_frac}")
    support = max(min_frac / 2.0, _MIN_SUPPORT)
    # Pass 1: bounded one-pass summary, superset of the true answer.
    # The returned frame is a single row holding one array — collecting
    # it moves <= 1/support keys, never data.
    [candidates] = (
        df.select(key_col).stat.freqItems([key_col], support).first()
    )
    # count(*) on parquet resolves from footer metadata — no data scan.
    total = df.count()
    threshold = min_frac * total
    candidates = list(candidates)
    if len(candidates) <= _ISIN_MAX:
        narrowed = df.filter(F.col(key_col).isin(candidates))
    else:
        cand_df = df.sparkSession.createDataFrame(
            [(c,) for c in candidates], df.select(key_col).schema
        )
        narrowed = df.join(F.broadcast(cand_df), key_col, "left_semi")
    return (
        narrowed.groupBy(key_col)
        .agg(F.count("*").alias(count_alias))
        .filter(F.col(count_alias) > threshold)
    )


def _cms_cells(key, depth: int, width: int):
    """One (row, hash-function) struct per depth level: independent
    buckets via xxhash64 salted with the level index."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.pmod(F.xxhash64(key, F.lit(d)), F.lit(width)).alias(
                        "bucket"
                    ),
                )
                for d in range(depth)
            ]
        )
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of a key column as a tiny ``(d, bucket, cnt)``
    frame (at most ``depth*width`` rows, independent of input
    cardinality).  Classic guarantees: estimates never under-count, and
    over-count by more than ``2N/width`` with probability at most
    ``2^-depth``.

    This is the mergeable-state complement of ``heavy_hitters``: build
    per partition/day/source, union + re-aggregate to combine
    (``cms_merge``), probe any time later — no raw data retained.  The
    build is one partial-aggregated shuffle of ``depth`` 8-byte cells
    per row; the sketch itself is broadcast-sized by construction.
    """
    return (
        df.select(_cms_cells(F.col(key_col), depth, width).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Combine sketches built with identical (depth, width): cell-wise
    sum.  union + one aggregation over <= depth*width rows per input."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for each row of ``keys``: min over the
    ``depth`` probed cells.  The sketch side is broadcast (bounded at
    ``depth*width`` rows); absent cells count zero."""
    probes = keys.select(
        F.col(key_col), _cms_cells(F.col(key_col), depth, width).alias("c")
    ).select(key_col, F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def distinct_sketch_build(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """Per-group HyperLogLog sketches (Datasketches HLL via the
    built-in ``hll_sketch_agg`` — JVM-side, mergeable binary state,
    ~2^lgk bytes per group regardless of cardinality).  Build these at
    the finest rollup grain (e.g. per source per day); coarser distinct
    counts then come from ``distinct_sketch_rollup`` over the stored
    sketches — no rescan of the raw data, the pattern that keeps a
    100-TB distinct-users dashboard incremental."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch")
    )


def distinct_sketch_rollup(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Merge stored sketches up to a coarser grain and estimate:
    cell-wise ``hll_union_agg`` then ``hll_sketch_estimate`` — one
    aggregation over sketch-sized rows, never the raw data."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "approx_distinct"
        )
    )
