"""Temporal join operators: as-of join and interval (range) join.

The reference delegates its whole query surface to the source database
and BigQuery (``export_query`` / ``stage_final_query`` hooks, reference
``dags/cloudsql_to_bigquery.py:66,70``); a native engine serving the
same time-stamped workloads (the ``events`` fixture) needs the two
time-series join primitives SQL engines ship as extensions (DuckDB
``ASOF JOIN``, range joins):

- **as-of join** — for each left row, the latest right row at-or-before
  (or earliest at-or-after) its timestamp, per partition key. Implemented
  as a *union + one window pass*: both sides are tagged and unioned, a
  single ``Window.partitionBy(by).orderBy(ts, tag)`` carries the last
  seen right-side values forward, then left rows are filtered back out.
  Exactly ONE shuffle (on ``by``); no point-vs-range explosion; scales
  linearly in rows and is AQE-skew-splittable, so it survives a 100 TB
  events table where a naive ``join + max-filter`` would cross-product.

- **interval join** — match points to [start, end] intervals per key.
  Implemented as a *bucketed equi-join*: each interval explodes to the
  fixed-width buckets it covers, each point hashes to exactly one
  bucket, and the join runs as an equi-join on ``(key, bucket)`` with an
  exact range refine after. A point's single bucket guarantees no
  duplicate pairs. Shuffle volume is O(rows x avg_span/bucket_width),
  tunable; Catalyst never sees a non-equi theta join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

_ASOF_ON = "_asof_on"
_TAG = "_tag"
_BUCKET = "_bucket"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    value_cols: list[str],
    *,
    direction: str = "backward",
    inclusive: bool = True,
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: left rows + ``value_cols`` from the nearest right
    row per ``by`` group, plus ``_asof_on`` (the matched right ``on``).

    ``on`` must be an orderable numeric/timestamp column present in both
    sides. ``direction='backward'`` matches right.on <= left.on (the
    DuckDB ``ASOF JOIN`` default); ``'forward'`` matches right.on >=
    left.on. ``inclusive=False`` makes the comparison strict. If several
    right rows share one ``on`` value within a group the carried values
    come from an arbitrary one — pre-aggregate the right side to unique
    ``(by, on)`` for deterministic output. ``tolerance`` (same units as
    ``on``) nulls out matches farther than the given distance.
    """
    by = [by] if isinstance(by, str) else list(by)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")

    left_payload = [c for c in left.columns if c not in by and c != on]
    carried = list(value_cols) + [_ASOF_ON]

    l_part = left.select(
        *by,
        on,
        F.lit(1).alias(_TAG),
        *left_payload,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        F.lit(None).cast(right.schema[on].dataType).alias(_ASOF_ON),
    )
    r_part = right.select(
        *by,
        on,
        F.lit(0).alias(_TAG),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *value_cols,
        F.col(on).alias(_ASOF_ON),
    )
    unioned = l_part.unionByName(r_part)

    # Order so the window "sees" exactly the right rows that qualify:
    # backward+inclusive → right rows sort before left rows at equal ts.
    if direction == "backward":
        order = [F.col(on).asc(), F.col(_TAG).asc() if inclusive else F.col(_TAG).desc()]
    else:
        order = [F.col(on).desc(), F.col(_TAG).asc() if inclusive else F.col(_TAG).desc()]
    w = Window.partitionBy(*by).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)

    filled = unioned.select(
        *by,
        on,
        _TAG,
        *left_payload,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
    )
    out = filled.filter(F.col(_TAG) == 1).drop(_TAG)

    if tolerance is not None:
        dist = (
            F.col(on) - F.col(_ASOF_ON)
            if direction == "backward"
            else F.col(_ASOF_ON) - F.col(on)
        )
        in_tol = F.col(_ASOF_ON).isNotNull() & (dist <= F.lit(tolerance))
        out = out.select(
            *by,
            on,
            *left_payload,
            *[F.when(in_tol, F.col(c)).alias(c) for c in carried],
        )
    return out


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start: str,
    end: str,
    by: list[str] | None = None,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to every [start, end] interval (inclusive bounds)
    that covers them, optionally also matching on equi-keys ``by``.

    ``point_ts``/``start``/``end`` must be integral (e.g. epoch nanos).
    ``bucket_width`` trades shuffle volume (intervals replicate to
    span/width buckets) against refine selectivity; set it near the
    typical interval span. Output columns = intervals' ++ points'
    (caller pre-aliases collisions). Only inner joins are supported —
    anti/semi variants compose from the result.
    """
    if how != "inner":
        raise ValueError("interval_point_join supports how='inner' only")
    by = list(by or [])
    w = int(bucket_width)
    iv = intervals.withColumn(
        _BUCKET, F.explode(F.expr(f"sequence({start} div {w}, {end} div {w})"))
    )
    pt = points.withColumn(_BUCKET, F.expr(f"{point_ts} div {w}"))
    cond = [pt[_BUCKET] == iv[_BUCKET]] + [pt[k] == iv[k] for k in by]
    joined = pt.join(iv, cond, "inner").filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end))
    )
    keep = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in by
    ]
    return joined.select(*keep)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: list[str] | None = None,
    bucket_width: int,
) -> DataFrame:
    """Interval×interval overlap join (inclusive bounds): one output row
    per (left, right) pair whose [start, end] ranges intersect,
    optionally equi-matched on ``by`` first.

    Same bucketed-equi-join shape as :func:`interval_point_join` — both
    sides explode to the fixed-width buckets they cover and Catalyst
    runs a plain shuffle join on ``(by, bucket)`` — but pair dedup is
    free: a pair is emitted ONLY from the bucket containing the overlap
    start ``greatest(l.start, r.start)``, which every overlapping pair
    covers exactly once.  No ``distinct`` pass, so the only shuffle is
    the equi-join itself; at 100 TB shuffle volume stays
    O(rows × span/width) and the planner never sees a theta join.
    Bounds must be integral (e.g. epoch micros); output columns =
    left's ++ right's minus ``by`` duplicates (caller pre-aliases any
    other collisions)."""
    by = list(by or [])
    w = int(bucket_width)
    lv = left.withColumn(
        _BUCKET,
        F.explode(F.expr(f"sequence({left_start} div {w}, {left_end} div {w})")),
    )
    rv = right.withColumn(
        _BUCKET,
        F.explode(
            F.expr(f"sequence({right_start} div {w}, {right_end} div {w})")
        ),
    )
    cond = [lv[_BUCKET] == rv[_BUCKET]] + [lv[k] == rv[k] for k in by]
    joined = lv.join(rv, cond, "inner").filter(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (
            lv[_BUCKET]
            == F.floor(
                F.greatest(F.col(left_start), F.col(right_start)) / F.lit(w)
            )
        )
    )
    keep = [lv[c] for c in left.columns] + [
        rv[c] for c in right.columns if c not in by
    ]
    return joined.select(*keep)


def time_weighted_avg(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    by: list[str] | str,
) -> DataFrame:
    """Per-key time-weighted average over irregularly-sampled values
    (the timeseries-DB ``time_weight('locf')`` aggregate): each sample
    holds until the next one, so its weight is the gap to its
    successor; the last sample carries no weight.  Keys whose samples
    span zero time are dropped (the weighting is undefined).  Samples
    must be unique per ``(by, ts)`` — with duplicate timestamps the
    zero-width gaps make the weighting order-dependent; pre-aggregate
    duplicates first (same contract as :func:`asof_join`).

    One window pass + one aggregation — both shuffle on ``by`` only,
    the same single-exchange shape as any grouped aggregate.  The
    weighted sum accumulates in DECIMAL so the result is
    order-independent and engine-exact (double summation would make
    the oracle hash flap with partitioning)."""
    by = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*by).orderBy(ts_col)
    nxt = F.lead(ts_col).over(w)
    weighted = df.select(
        *by,
        F.col(ts_col),
        (
            F.col(value_col).cast("decimal(18,6)")
            * (nxt - F.col(ts_col)).cast("decimal(18,0)")
        ).alias("_wv"),
    )
    return (
        weighted.groupBy(*by)
        .agg(
            F.min(ts_col).alias("_t0"),
            F.max(ts_col).alias("_t1"),
            F.sum("_wv").alias("_sum"),
        )
        .filter(F.col("_t1") > F.col("_t0"))
        .select(
            *by,
            # cast the EXACT decimal sum to double before dividing —
            # decimal division picks engine-specific result scales and
            # rounds there, which would flap the 6th decimal vs DuckDB
            F.round(
                F.col("_sum").cast("double")
                / (F.col("_t1") - F.col("_t0")).cast("double"),
                6,
            ).alias("twa"),
            (F.col("_t1") - F.col("_t0")).alias("span"),
        )
    )


def gap_fill_locf(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    by: list[str] | str,
    step: int,
) -> DataFrame:
    """Regularize an irregular series: per key, emit one row per
    ``step``-aligned grid point between the key's first and last sample
    with the value carried forward from the latest sample at-or-before
    it (LOCF — the timeseries-DB gap-fill/interpolate surface).

    Grid points are generated from per-key bounds (an aggregate, not a
    calendar cross-join, so empty keys cost nothing and the row count
    is span/step per key), then filled with ONE window pass over the
    union of samples and grid markers — ``last(value, ignoreNulls)``
    ordered by (ts, marker-after-sample) — instead of an as-of join of
    grid×samples.  Shuffles: one on ``by`` for the bounds, one on
    ``by`` for the fill window.  The grid starts at the first aligned
    point ≥ the key's first sample, so every emitted row is filled."""
    by = [by] if isinstance(by, str) else list(by)
    bounds = df.groupBy(*by).agg(
        F.expr(f"(min({ts_col}) + {step} - 1) div {step}").alias("_lo"),
        F.expr(f"max({ts_col}) div {step}").alias("_hi"),
    )
    grid = (
        bounds.filter(F.col("_lo") <= F.col("_hi"))
        .select(*by, F.explode(F.expr("sequence(_lo, _hi)")).alias("_g"))
        .select(
            *by,
            (F.col("_g") * step).alias(ts_col),
            F.lit(None).cast(df.schema[value_col].dataType).alias(value_col),
            F.lit(1).alias("_marker"),
        )
    )
    samples = df.select(*by, ts_col, value_col, F.lit(0).alias("_marker"))
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_col, "_marker")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = samples.unionByName(grid).withColumn(
        "_fill", F.last(value_col, ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_marker") == 1).select(
        *by, F.col(ts_col), F.col("_fill").alias(value_col)
    )


def sessionize_capped(
    events: DataFrame,
    gap_s: int,
    max_duration_s: int,
    ts_col: str = "ts_us",
    key_col: str = "user_id",
) -> DataFrame:
    """Sessionization with BOTH an inactivity gap and a maximum session
    duration: a new session starts when the gap to the previous event
    exceeds ``gap_s`` OR the event would stretch the session past
    ``max_duration_s`` from its first event.  Timestamps are int64
    epoch microseconds (``ts_us``).

    The duration cap makes the break condition depend on the running
    session START — a sequential per-key recurrence that windowed SQL
    cannot express (gaps-and-islands only handles the gap rule), so
    this is the textbook ``applyInPandas`` case: one shuffle on the
    session key, then an Arrow-batched linear pass per key.  Per-key
    event counts are bounded in practice (a "user-day" style key at
    100 TB); a pathological hot key would be pre-split by date before
    calling this.

    Returns one row per session: (key, session_start, session_end,
    n_events, duration_us).
    """
    import pandas as pd

    gap_us = gap_s * 1_000_000
    max_us = max_duration_s * 1_000_000

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts = pdf[ts_col].to_numpy()
        out = []
        start = prev = None
        n = 0
        for t in ts:
            if start is None:
                start, prev, n = t, t, 1
                continue
            if (t - prev > gap_us) or (t - start > max_us):
                out.append((start, prev, n, prev - start))
                start, prev, n = t, t, 1
            else:
                prev, n = t, n + 1
        if start is not None:
            out.append((start, prev, n, prev - start))
        key = pdf[key_col].iloc[0]
        return pd.DataFrame(
            [(key, s, e, c, d) for s, e, c, d in out],
            columns=[key_col, "session_start", "session_end", "n_events", "duration_us"],
        )

    schema = (
        f"{key_col} long, session_start long, session_end long, "
        "n_events long, duration_us long"
    )
    return (
        events.select(key_col, ts_col)
        .groupBy(key_col)
        .applyInPandas(kernel, schema)
    )


def merge_intervals(
    intervals: DataFrame,
    start: str = "lo",
    end: str = "hi",
    by: list[str] | None = None,
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key into maximal
    disjoint spans (gaps-and-islands): an island starts where the
    interval's start exceeds the running max end of everything before
    it.  One shuffle on the key (the sort rides the window), two
    window passes, one aggregation — no self-join, no recursion.
    Returns (keys..., lo, hi, n_merged)."""
    keys = by or []
    w_order = Window.partitionBy(*keys).orderBy(F.col(start), F.col(end))
    prev_max_end = F.max(F.col(end)).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = intervals.withColumn(
        "_new_island",
        (prev_max_end.isNull() | (F.col(start) > prev_max_end)).cast("long"),
    )
    island = F.sum("_new_island").over(
        w_order.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("_island", island)
        .groupBy(*keys, "_island")
        .agg(
            F.min(start).alias(start),
            F.max(end).alias(end),
            F.count("*").alias("n_merged"),
        )
        .drop("_island")
    )
