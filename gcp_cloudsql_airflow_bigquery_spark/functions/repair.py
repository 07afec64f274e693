r"""CSV NULL / carriage-return repair (op E).

The reference streams exported CSV through a sed chain (reference
``dags/cloudsql_to_bigquery.py:258-261``, workaround for Google issue
64579566) that rewrites the broken NULL marker ``"N`` to an empty quoted
field in its three positional variants (mid-row — applied twice so
adjacent markers both match — row start, row end) and patches a trailing
``\r"`` into ``\r``.

In this engine the defect never occurs (no gcloud CSV export in the
path), but we keep two parity operators for defective inputs:

- :func:`repair_broken_nulls` — line-level repair on a DataFrame of raw
  CSV lines (``spark.read.text``), the exact sed-equivalent, fully
  distributed (regexp_replace is JVM-side, whole-stage codegen).
- :func:`repair_csv_columns` — column-level repair after a normal
  ``spark.read.csv``: the marker becomes NULL, stray ``\r`` at
  end-of-value is escaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROKEN_NULL = '"N'


def repair_broken_nulls(lines: DataFrame, column: str = "value") -> DataFrame:
    """sed-chain parity on raw CSV lines.

    Mirrors, in order: ``s/,"N,/,"",/g`` (twice — the second pass catches
    markers made adjacent by the first), ``s/^"N,/"",/g``, ``s/,"N$/,""/g``,
    ``s/\\r"$/\\\\r/``.
    """
    c = F.col(column)
    # ,"N, → ,"", (run twice: overlapping matches like ,"N,"N, need 2 passes)
    c = F.regexp_replace(c, r',"N,', ',"",')
    c = F.regexp_replace(c, r',"N,', ',"",')
    c = F.regexp_replace(c, r'^"N,', '"",')
    c = F.regexp_replace(c, r',"N$', ',""')
    c = F.regexp_replace(c, r'\r"$', r'\\r')
    return lines.withColumn(column, c)


def repair_csv_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Post-parse repair: the literal broken marker ``"N`` (or bare
    ``N`` left after CSV unquoting) in a string column becomes NULL; a
    trailing raw carriage return is escaped to a literal ``\\r``."""
    cols = columns or [c for c, t in df.dtypes if t == "string"]
    out = df
    for name in cols:
        c = F.col(name)
        c = F.when(c.isin(BROKEN_NULL, "N"), F.lit(None)).otherwise(c)
        c = F.regexp_replace(c, "\r$", r"\\r")
        out = out.withColumn(name, c)
    return out
