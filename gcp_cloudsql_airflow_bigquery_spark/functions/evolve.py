"""Schema-drift alignment for multi-snapshot loads.

The reference re-syncs full tables daily (reference ``README.md:8``);
over weeks the source schema drifts — columns appear/disappear, ints
widen, dates become timestamps.  Loading a range of snapshots then
requires aligning their schemas before a union.  ``union_evolved``
computes the widened union schema and unions any number of snapshot
frames: missing columns become typed NULLs, compatible types widen
along a lossless lattice, irreconcilable pairs fall back to STRING
(the reference's own fallback, op C ``cloudsql_to_bigquery.py:165``).

All casts are Catalyst expressions — alignment adds zero shuffles and
zero Python to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# lossless-ish widening lattice: order matters
_NUM_ORDER = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
]


def widen_type(a: T.DataType, b: T.DataType) -> T.DataType:
    """Narrowest type both inputs convert to without data loss;
    STRING when no such type exists (matching the reference's
    everything-else-is-STRING fallback)."""
    if a == b:
        return a
    ints = {t: i for i, t in enumerate(_NUM_ORDER)}
    if a in ints and b in ints:
        return _NUM_ORDER[max(ints[a], ints[b])]
    frac = (T.FloatType(), T.DoubleType())
    if a in frac and b in frac:
        return T.DoubleType()
    # int ⊎ fractional: double holds every 32-bit int exactly; a LONG
    # does NOT fit a double losslessly, but double is the conventional
    # widened type (and what Spark's own coercion picks)
    if (a in ints and b in frac) or (b in ints and a in frac):
        return T.DoubleType()
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        scale = max(a.scale, b.scale)
        intd = max(a.precision - a.scale, b.precision - b.scale)
        return T.DecimalType(min(intd + scale, 38), scale)
    if isinstance(a, T.DecimalType) and b in ints:
        return widen_type(a, T.DecimalType(20, 0))
    if isinstance(b, T.DecimalType) and a in ints:
        return widen_type(b, T.DecimalType(20, 0))
    dt = (T.DateType(), T.TimestampType())
    if a in dt and b in dt:
        return T.TimestampType()
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(widen_type(a.elementType, b.elementType), True)
    return T.StringType()


def evolve_schema(schemas: list[T.StructType]) -> T.StructType:
    """Union schema over snapshots: field order = first appearance;
    every field nullable (a column absent from any snapshot is NULL
    there — same force-NULLABLE stance as the reference's schema
    codegen, op D ``cloudsql_to_bigquery.py:189``)."""
    out: dict[str, T.DataType] = {}
    for sch in schemas:
        for f in sch.fields:
            out[f.name] = (
                widen_type(out[f.name], f.dataType) if f.name in out else f.dataType
            )
    return T.StructType([T.StructField(n, t, True) for n, t in out.items()])


def align_to(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto the target schema: cast present columns,
    NULL-fill absent ones, in target order."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            c = F.col(f.name)
            if have[f.name] != f.dataType:
                c = c.cast(f.dataType)
        else:
            c = F.lit(None).cast(f.dataType)
        cols.append(c.alias(f.name))
    return df.select(*cols)


def union_evolved(dfs: list[DataFrame]) -> DataFrame:
    """Union snapshot frames under the widened union schema."""
    if not dfs:
        raise ValueError("union_evolved: no frames")
    target = evolve_schema([d.schema for d in dfs])
    out = align_to(dfs[0], target)
    for d in dfs[1:]:
        out = out.unionByName(align_to(d, target))
    return out
