"""Extract-side sources: JDBC (ops A/G) and file formats (CSV/NDJSON/
parquet — the reference's GCS interchange formats)."""

from .files import read_csv, read_ndjson, read_parquet  # noqa: F401
from .jdbc import read_jdbc  # noqa: F401
