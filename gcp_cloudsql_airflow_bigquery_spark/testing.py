"""Oracle-differential test helpers (SURVEY.md §5).

Replicates the driver's check: run a plan on Spark and its oracle SQL on
DuckDB over the same parquet fixtures; compare row count, column names
(sorted), and order-insensitive values.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame


def norm_value(v: Any) -> str:
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # absorb representation noise only, not computation noise
        return repr(round(v, 9))
    return repr(v)


def canon(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def register_duckdb_views(con, sf_dir: str, tables) -> None:
    for t in tables:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def compare_spark_duckdb(df: DataFrame, con, sql: str) -> str | None:
    """Return None if the Spark result matches the DuckDB result, else a
    human-readable mismatch description."""
    scols = df.columns
    srows = [tuple(r) for r in df.collect()]
    cur = con.execute(sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    if sorted(scols) != sorted(ocols):
        return f"columns {sorted(scols)} vs {sorted(ocols)}"
    if len(srows) != len(orows):
        return f"rowcount {len(srows)} vs {len(orows)}"
    a, b = canon(srows, scols), canon(orows, ocols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return f"values differ; first diffs {diffs}"
    return None
