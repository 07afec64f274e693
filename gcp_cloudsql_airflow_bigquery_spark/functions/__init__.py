"""Scalar/utility functions reproducing the reference's ETL transforms:
type mapping (op C), name sanitization (op D), CSV repair (op E)."""

from .repair import repair_broken_nulls, repair_csv_columns  # noqa: F401
from .sanitize import sanitize_column_name, sanitize_columns  # noqa: F401
from .typemap import (  # noqa: F401
    bq_type_for,
    map_types,
    spark_type_for,
)
