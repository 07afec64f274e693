"""Type mapping: source-catalog type string → engine type (op C).

The reference collapses every source type to one of 5 BigQuery types by
substring match with a STRING fallback (reference
``dags/cloudsql_to_bigquery.py:152-165``), which is lossy for DECIMAL
(→ FLOAT, ``:163-164``).  We reproduce that as ``legacy`` mode and add a
``fidelity`` mode that keeps DECIMAL exact — the lossiness switch the
survey calls out (SURVEY.md §7 "What's hard" (1)).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    TimestampNTZType,
)

# match-order parity with the reference's if/elif chain
# (DATETIME before DATE, INT before the float family, STRING fallback)
_LEGACY_ORDER: tuple[tuple[str, str], ...] = (
    ("DATETIME", "DATETIME"),
    ("TIMESTAMP", "DATETIME"),
    ("DATE", "DATE"),
    ("INT", "INTEGER"),  # tinyint/smallint/mediumint/int/bigint → widened
    ("FLOAT", "FLOAT"),
    ("DOUBLE", "FLOAT"),
    ("DECIMAL", "FLOAT"),  # lossy in legacy mode
    ("NUMERIC", "FLOAT"),
)

_BQ_TO_SPARK: dict[str, DataType] = {
    # naive wall-clock DATETIME → TimestampNTZ is the semantic match
    "DATETIME": TimestampNTZType(),
    "DATE": DateType(),
    "INTEGER": LongType(),
    "FLOAT": DoubleType(),
    "STRING": StringType(),
}

_DECIMAL_RE = re.compile(r"(?:DECIMAL|NUMERIC)\s*\((\d+)\s*,\s*(\d+)\)", re.I)


def bq_type_for(datatype: str) -> str:
    """Source type string → BigQuery type name (legacy 5-type collapse)."""
    up = datatype.upper()
    for needle, bq in _LEGACY_ORDER:
        if needle in up:
            return bq
    return "STRING"


def spark_type_for(datatype: str, mode: str = "legacy") -> DataType:
    """Source type string → Spark type.

    ``legacy``  — the reference's 5-type collapse (DECIMAL → double).
    ``fidelity`` — DECIMAL(p,s) kept exact as ``DecimalType(p, s)``.
    """
    if mode == "fidelity":
        m = _DECIMAL_RE.search(datatype)
        if m:
            return DecimalType(int(m.group(1)), int(m.group(2)))
        if datatype.upper().strip() in {"DECIMAL", "NUMERIC"}:
            return DecimalType(38, 9)
    return _BQ_TO_SPARK[bq_type_for(datatype)]


def map_types(
    df: DataFrame, source_types: dict[str, str], mode: str = "legacy"
) -> DataFrame:
    """Cast ``df`` columns according to a source-catalog type listing
    (the ``INFORMATION_SCHEMA.COLUMNS`` output of op B, reference
    ``dags/cloudsql_to_bigquery.py:141``).  Columns absent from the
    listing pass through unchanged."""
    exprs = []
    for c in df.columns:
        if c in source_types:
            exprs.append(F.col(c).cast(spark_type_for(source_types[c], mode)).alias(c))
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)
