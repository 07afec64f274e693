"""File sources: the reference's GCS interchange formats as Spark reads.

- CSV (v1 export format, reference ``dags/cloudsql_to_bigquery.py:108-110``)
  with ``nullValue`` handling replacing the sed NULL hack at parse time.
- NDJSON (v2, ``source_format="NEWLINE_DELIMITED_JSON"``, reference
  ``dags/copy_cloudsql_to_bigquery_v2.py:109``); v2's chunked
  ``filename_{}`` wildcard load (``:102-103``) is Spark's native
  directory read — one file per partition.
- Parquet: the engine's staging format of choice.
- ORC: Spark-native columnar alternative for interchange with
  Hive/Trino-era warehouses (built into the distribution, same
  predicate-pushdown + column-pruning story as parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = False,
    null_value: str | None = '"N',
    options: dict[str, str] | None = None,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if null_value is not None:
        # parse-time replacement for the reference's sed NULL hack
        reader = reader.option("nullValue", null_value)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    reader = spark.read
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_ndjson(
    df: DataFrame,
    path: str,
    chunk_rows: int | None = None,
    mode: str = "overwrite",
) -> None:
    """NDJSON export (op G).  ``chunk_rows`` caps rows per output file —
    the Spark-native form of v2's ``filename_{}`` counter-suffixed chunk
    convention (reference ``dags/copy_cloudsql_to_bigquery_v2.py:88``):
    the Airflow operator cuts a new chunk file every N rows; here
    ``maxRecordsPerFile`` makes each task roll to a new part file at the
    same bound, and the directory read (``read_ndjson``) is the wildcard
    reload (``:102-103``).  Unlike a fixed chunk count, the bound holds
    at any scale — 1000 executors each roll their own files with zero
    coordination."""
    writer = df.write.mode(mode)
    if chunk_rows is not None:
        if chunk_rows <= 0:
            raise ValueError("chunk_rows must be positive")
        writer = writer.option("maxRecordsPerFile", str(chunk_rows))
    writer.json(path)
