"""Corpus-curation query plans over ``documents``: chunking for model
windows, per-source balanced sampling, train/val/test split assignment.
All three are oracle-checked (md5 is hex-identical across engines;
chunk windows replicate with ``generate_series``)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import curation


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 120-char chunks at stride 100, one row per chunk."""
    return curation.chunk_text(
        _docs(spark, sf_dir), size=120, stride=100
    ).select("doc_id", "chunk_idx", "chunk", "chunk_len")


_CHUNKS_SQL = """
SELECT doc_id,
       CAST(start // 100 AS INT) AS chunk_idx,
       substr(text, CAST(start AS INT) + 1, 120) AS chunk,
       length(substr(text, CAST(start AS INT) + 1, 120)) AS chunk_len
FROM documents,
     UNNEST(generate_series(0, greatest(length(text) - 1, 0), 100)) AS t(start)
"""


def doc_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 docs per source, picked by smallest md5(doc_id) — the
    deterministic rebalancing pass for over-represented sources."""
    return curation.balanced_sample(
        _docs(spark, sf_dir), per_group=10
    ).select("doc_id", "source", "n_chars")


_BALANCED_SQL = """
SELECT doc_id, source, n_chars
FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) t WHERE rk <= 10
"""


def doc_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source × split histogram of the stable hash-based
    train/val/test assignment (the leak-free split audit query)."""
    return (
        curation.assign_splits(_docs(spark, sf_dir))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "split")
    )


_SPLITS_SQL = """
SELECT source,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN
                 ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       SUM(n_chars) AS total_chars
FROM documents
GROUP BY 1, 2 ORDER BY source, split
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "doc_chunks": doc_chunks,
    "doc_balanced_sample": doc_balanced_sample,
    "doc_split_counts": doc_split_counts,
}

ORACLE: dict[str, str] = {
    "doc_chunks": _CHUNKS_SQL,
    "doc_balanced_sample": _BALANCED_SQL,
    "doc_split_counts": _SPLITS_SQL,
}
