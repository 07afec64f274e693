r"""Ranked full-text retrieval plans over ``documents`` (north-star
extension, same family as the ANN stack): BM25 top-k for a fixed query
batch, oracle-checked against a DuckDB SQL replay of the identical
index build + scoring formula.

Cross-engine exactness: tokenization is the shared whitespace-split on
normalized text (``textstats.normalize_text``), per-term BM25
contributions are computed in double in the same written order on both
engines, then decimal-cast before the per-doc sum (order-independent
addition) and rounded to 4 decimals — so ranks, not just scores, are
comparable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.textsearch import bm25_topk

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

# the fixed query batch (terms drawn from the fixture vocabulary)
_QUERY_BATCH = [
    (1, "spark join performance"),
    (2, "hash table scan"),
    (3, "window agg batch data"),
]
_K = 5
_K1 = 1.2
_B = 0.75


def doc_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    queries = spark.createDataFrame(_QUERY_BATCH, ["query_id", "query_text"])
    return bm25_topk(docs, queries, k=_K, k1=_K1, b=_B)


_QUERY_VALUES = ", ".join(f"({i}, '{q}')" for i, q in _QUERY_BATCH)

_BM25_SQL = f"""
WITH queries(query_id, query_text) AS (VALUES {_QUERY_VALUES}),
qterms AS (
  SELECT DISTINCT query_id, unnest(string_split(
    trim(regexp_replace(lower(query_text), '\\s+', ' ', 'g')), ' ')) AS term
  FROM queries
),
toks AS (
  SELECT doc_id, unnest(string_split(
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
  FROM documents
),
postings AS (
  SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
doc_lens AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
consts AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT AVG(dl) FROM doc_lens) AS avgdl
),
matched AS (
  SELECT q.query_id, p.term, p.doc_id, p.tf
  FROM postings p JOIN qterms q ON p.term = q.term
),
dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM matched GROUP BY 1
),
scored AS (
  SELECT m.query_id, m.doc_id,
         CAST(ROUND(SUM(CAST(
           ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (m.tf * ({_K1} + 1)) / (m.tf + {_K1} * (1 - {_B} + {_B} * l.dl / c.avgdl))
         AS DECIMAL(28,10))), 4) AS DOUBLE) AS score
  FROM matched m
  JOIN dfreq d ON m.term = d.term
  JOIN doc_lens l ON m.doc_id = l.doc_id
  CROSS JOIN consts c
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_K}
"""

QUERIES["doc_bm25_search"] = doc_bm25_search
ORACLE["doc_bm25_search"] = _BM25_SQL
