"""Data-layout optimization: space-filling-curve (Z-order) clustering.

The 100 TB storage-side lever the query-side operators assume: parquet
data skipping works off per-file column min/max, so a table queried by
BOTH ``user_id`` and time only prunes well if files are narrow in both
dimensions at once.  Writing in a single-column sort order makes one
dimension perfectly clustered and the other useless; interleaving the
bits of equal-width bucket ids (Morton / Z-order — the curve behind
Delta Lake's ``OPTIMIZE ZORDER BY`` and ClickHouse's
``mortonEncode``) gives every file a bounded span in every indexed
dimension, so multi-dimensional point/range scans prune by
~(span/domain) per dimension.

Everything here is pure Catalyst integer arithmetic (shifts, masks,
integer division) — no UDFs, zero shuffles for the z-value itself; the
only shuffle an actual re-layout pays is the final
``repartitionByRange(zvalue)`` write, which is exactly the shuffle any
clustering rewrite must pay.  The arithmetic is engine-portable, so the
DuckDB oracle replays it bit-for-bit (``plans/scale.py``
``events_zorder_layout``).

Reference scope note: the reference pipeline delegates physical layout
to BigQuery (``bq load`` into date-sharded tables,
``dags/cloudsql_to_bigquery.py:209-236``); this module implements the
layout step natively for the parquet lake the Spark engine owns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_bucket(col: Column, vmin: int, vmax: int, n_buckets: int) -> Column:
    """Equal-width bucket id in ``[0, n_buckets)`` for an integer-valued
    column with known (driver-collected, model-sized) bounds:
    ``((v - vmin) * n_buckets) div (vmax - vmin + 1)``.  Pure integer
    arithmetic — exact and identical in any engine, unlike float
    ``width_bucket`` variants.  Values outside the bounds are clamped
    into the edge buckets (late data after the bounds were sampled)."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    span = max(int(vmax) - int(vmin) + 1, 1)
    v = F.greatest(
        F.least(col.cast("long"), F.lit(int(vmax))), F.lit(int(vmin))
    )
    num = (v - F.lit(int(vmin))) * F.lit(int(n_buckets))
    # exact integer division without an expr-string div: num - num%span
    # is exactly divisible, so the double division is exact (results
    # stay far below 2^53)
    return ((num - num % F.lit(span)) / F.lit(span)).cast("int")


def zorder_value(buckets: list[Column], bits: int) -> Column:
    """Morton/Z-order value: bit-interleave ``len(buckets)`` bucket ids
    (each in ``[0, 2**bits)``) into one long — bucket i's bit b lands
    at output position ``b * n + i``.  Unrolled into ``bits × n``
    shift/mask/or terms: a constant-size Catalyst expression that
    whole-stage-codegens to straight-line JVM integer ops (no UDF, no
    per-row allocation)."""
    n = len(buckets)
    if not n:
        raise ValueError("need at least one bucket column")
    z: Column = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(buckets):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_layout(
    df: DataFrame,
    dims: list[tuple[Column, int, int]],
    bits: int = 8,
    n_files: int = 64,
) -> DataFrame:
    """Assign each row its z-value and target file: ``dims`` is a list
    of ``(integer column, vmin, vmax)`` (bounds from one tiny min/max
    aggregate — kilobytes to the driver, the same model-sized collect
    every clustering rewrite needs), each dimension is bucketed to
    ``2**bits`` equal-width cells, the cells are bit-interleaved, and
    the curve is cut into ``n_files`` equal z-ranges.  Appends
    ``zvalue`` and ``file_id``.

    To actually rewrite the table:
    ``out.repartitionByRange(n_files, "zvalue").sortWithinPartitions(
    "zvalue").write...`` — one range shuffle, after which per-file
    min/max is narrow in EVERY dim (asserted vs a single-column layout
    in tests/test_layout.py)."""
    bucketed = [
        range_bucket(col, vmin, vmax, 2**bits) for col, vmin, vmax in dims
    ]
    z = zorder_value(bucketed, bits)
    z_domain = 2 ** (bits * len(dims))
    files = max(min(n_files, z_domain), 1)
    out = df.withColumn("zvalue", z)
    num = F.col("zvalue") * F.lit(files)
    return out.withColumn(
        "file_id",
        ((num - num % F.lit(z_domain)) / F.lit(z_domain)).cast("int"),
    )
