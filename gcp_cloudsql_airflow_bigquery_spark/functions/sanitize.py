"""Column-name sanitization (op D).

Parity with the reference's schema codegen (reference
``dags/cloudsql_to_bigquery.py:187``): spaces → ``_``, ``/`` → ``_and_``,
double-quotes stripped.  Every column is treated as nullable, matching
the force-NULLABLE schema emission (``:189``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sanitize_column_name(name: str) -> str:
    return name.replace('"', "").replace(" ", "_").replace("/", "_and_")


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Rename all columns through the sanitizer (no data movement —
    a metadata-only projection)."""
    return df.toDF(*[sanitize_column_name(c) for c in df.columns])
