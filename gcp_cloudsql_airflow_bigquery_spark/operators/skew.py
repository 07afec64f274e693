"""Skew-mitigation operators: salted aggregation and salted join.

At 100 TB a handful of hot keys (one giant customer, one dominant
``event_type``) can pin a whole stage on one task. AQE's skew-join
splitting (`spark.sql.adaptive.skewJoin`, on in :mod:`..session`)
handles sort-merge joins; these operators cover the remaining cases —
hot-key *aggregation* and joins AQE can't split — with explicit salting
that produces bit-identical results to the unsalted plan (both are
oracle-checked in ``plans/``).

- ``salted_agg``: two-stage aggregation. Stage 1 groups on
  ``(key, salt)`` so a hot key fans out over ``n_salts`` reducers;
  stage 2 re-combines per key. Only works for algebraic aggregates
  (sum/count/min/max) — exposed as an explicit (partial, merge) spec.
- ``salted_join``: replicate the small side ``n_salts`` times with an
  explicit salt column, salt the big side randomly-but-deterministically
  (hash of a unique key, not ``rand()``, so retries and oracle
  comparisons are stable), and equi-join on ``(key, salt)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    *,
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-stage (salted) aggregation.

    ``aggs`` maps output column name -> (partial_agg_expr, merge_fn)
    where ``partial_agg_expr`` runs per (key, salt) and ``merge_fn`` is a
    Column expression over the partial column re-aggregating per key,
    e.g. ``{"n": (F.count("*"), F.sum), "total": (F.sum("x"), F.sum)}``.
    ``salt_on`` picks the column whose hash spreads rows (default: a
    per-partition monotonic id — fully uniform).
    """
    salt = (
        F.pmod(F.xxhash64(salt_on), F.lit(n_salts))
        if salt_on
        else F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = (
        df.withColumn(_SALT, salt)
        .groupBy(*keys, _SALT)
        .agg(*[expr.alias(f"_p_{name}") for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[
            merge(F.col(f"_p_{name}")).alias(name)
            for name, (_, merge) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    n_salts: int = 16,
    big_salt_on: str,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: ``small`` is replicated ``n_salts`` times,
    ``big`` rows are salted by ``xxhash64(big_salt_on) % n_salts`` (a
    deterministic spread column — use a high-cardinality unique key),
    and the join runs on ``on + [salt]``. Result is row-identical to
    ``big.join(small, on, how)`` for inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left only")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    small_rep = small.withColumn(_SALT, salts)
    big_salted = big.withColumn(
        _SALT, F.pmod(F.xxhash64(big_salt_on), F.lit(n_salts)).cast("int")
    )
    return big_salted.join(small_rep, on + [_SALT], how).drop(_SALT)


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Z-order (Morton) key for two non-negative int columns: bit i of
    each input lands at bit 2i / 2i+1 of the key.  Sorting a table by
    this key before writing clusters rows that are close in BOTH
    dimensions into the same parquet row groups, so min/max statistics
    prune scans for 2-D predicates (date × customer, region × price) —
    the poor-man's Delta ZORDER, pure expressions, no shuffle beyond
    the write-time sort.

    Inputs are clamped to ``bits`` bits (callers bucket/scale first —
    rank or quantile-bucket skewed columns for a balanced curve)."""
    mask = (1 << bits) - 1
    ca = F.shiftrightunsigned(a.bitwiseAND(F.lit(mask)), 0).cast("long")
    cb = F.shiftrightunsigned(b.bitwiseAND(F.lit(mask)), 0).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(ca, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(cb, i).bitwiseAND(F.lit(1))
        key = (
            key
            + bit_a * F.lit(1 << (2 * i)).cast("long")
            + bit_b * F.lit(1 << (2 * i + 1)).cast("long")
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Morton curve of
    ``(col_a, col_b)``: range-partition by the z-key (one contiguous
    curve segment per output file) and sort within each file, so every
    file's min/max footer statistics cover a tight box in BOTH
    dimensions.  A reader with a 2-D box predicate then skips the
    files/row-groups whose stats don't intersect the box — multi-dim
    data skipping from plain parquet, no table format required.

    The z-key is computed JVM-side (`zorder_key`) and dropped before
    the write; the only shuffle is the range partitioning that the
    clustered layout inherently requires."""
    keyed = df.withColumn(
        "_zkey", zorder_key(F.col(col_a), F.col(col_b), bits)
    )
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def grouped_topk_salted(
    df: DataFrame,
    group_cols: list[str],
    rank_struct: Column,
    k: int,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe top-k per group: two bounded aggregations instead of a
    rank window.  ``rank_struct`` is a struct column whose ASCENDING
    lexicographic sort defines the ranking (put negated numeric keys
    first for descending order; carry payload fields after the keys).

    Why not ``row_number() over (partition by g order by ...)``:
    the window sorts every row of a group on one task, so one hot group
    pins a stage at 100 TB.  Here phase 1 computes per-(group, salt)
    top-k (``sort_array`` + ``slice`` over a ``collect_list`` bounded
    to that salt's share of the group), phase 2 merges the at most
    ``n_salts * k`` survivors per group — no task ever holds more than
    ``group_size / n_salts`` rows, and the final per-group state is
    O(k).  Output: ``group_cols``, ``item`` (the struct), ``rn``
    (1-based) — identical rows to the window form, oracle-checked.
    """
    keyed = df.withColumn("_r", rank_struct).withColumn(
        "_s",
        F.pmod(F.xxhash64(F.col("_r")), F.lit(n_salts)).cast("int"),
    )
    phase1 = keyed.groupBy(*group_cols, "_s").agg(
        F.slice(F.sort_array(F.collect_list("_r")), 1, k).alias("_top")
    )
    phase2 = (
        phase1.select(*group_cols, F.explode("_top").alias("_it"))
        .groupBy(*group_cols)
        .agg(F.slice(F.sort_array(F.collect_list("_it")), 1, k).alias("_top"))
    )
    return (
        phase2.select(
            *group_cols, F.posexplode("_top").alias("_pos", "item")
        )
        .withColumn("rn", (F.col("_pos") + F.lit(1)).cast("int"))
        .drop("_pos")
    )


def skew_report(
    df, key_cols: list[str], *, top_k: int = 5
):
    """One-row join-key skew diagnostic: the pre-flight check that
    decides between a plain shuffle join, a broadcast, salting
    (:func:`salted_agg`/:func:`salted_join`), or AQE skew handling.

    Reports row count, distinct keys, mean/max rows per key, the skew
    factor (max/mean — how much the hottest task exceeds the average if
    nothing intervenes), p99 rows-per-key, and the share of all rows
    held by the ``top_k`` hottest keys.  Cost: one partial-agged
    key-count pass + one ≤keys-sized reduce — safe to run on a 100 TB
    fact before committing to a join strategy."""
    from pyspark.sql import functions as F

    per_key = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    top_share = (
        per_key.orderBy(F.col("n").desc(), *key_cols)
        .limit(top_k)
        .agg(F.sum("n").alias("top_n"))
    )
    return (
        per_key.agg(
            F.sum("n").alias("n_rows"),
            F.count("*").alias("n_keys"),
            F.round(F.avg("n"), 4).alias("mean_per_key"),
            F.max("n").alias("max_per_key"),
            F.round(F.max("n") / F.avg("n"), 4).alias("skew_factor"),
            F.percentile_approx("n", 0.99).alias("p99_per_key"),
        )
        .crossJoin(F.broadcast(top_share))
        .select(
            "*",
            F.round(F.col("top_n") / F.col("n_rows"), 6).alias("topk_share"),
        )
        .drop("top_n")
    )
