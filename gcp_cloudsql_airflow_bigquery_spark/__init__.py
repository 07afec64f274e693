"""PySpark-native analytics engine with the capabilities of
``ael-computas/gcp_cloudsql_airflow_bigquery``.

The reference is an Airflow orchestration layer that delegates all query
execution to MySQL/MSSQL (extract) and BigQuery (load/finalize); its
capability surface is (a) the ETL operators it materializes
(reference ``dags/cloudsql_to_bigquery.py``, ``dags/copy_cloudsql_to_bigquery_v2.py``)
and (b) the arbitrary-SQL hooks it exposes (``export_query``,
``stage_final_query``).  This package provides both natively on Spark:

- :mod:`.session` / :mod:`.catalog` — SparkSession factory and table registry.
- :mod:`.pipeline` — the reference's ETL surface as a library
  (``PipelineSpec`` ≈ ``TableConfig``, extract/transform/load/finalize).
- :mod:`.functions` — type mapping, name sanitization, CSV repair.
- :mod:`.plans` — the delegated SQL surface as named DataFrame plans.
- :mod:`.operators` — LLM-data-pipeline extensions (dedup, similarity
  search, text analysis, multimodal plumbing).
- :mod:`.streaming` — Structured Streaming windows/watermark/dedup.
- :mod:`.sources` — JDBC / CSV / NDJSON / parquet readers.
"""

__version__ = "0.1.0"
