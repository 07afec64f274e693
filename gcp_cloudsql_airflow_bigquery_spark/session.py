"""SparkSession factory tuned for the analytics engine.

Scale notes (the settings matter more on a real cluster than on local[*]):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace hand-tuned shuffle counts.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE
  coalesces.  On a 1000-executor cluster you'd raise it (e.g. 2000-4000)
  and let AQE shrink per-stage.
- Arrow enabled for the Pandas-UDF paths (similarity / multimodal ops).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "gcp_cloudsql_airflow_bigquery_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # The text/hash operators are CPU-dense per shuffle byte (64-bit
        # gram hashes, md5 digests), so AQE's byte-based 1 MB floor
        # under-parallelizes them at small SF (measured one-task stages).
        # A 256 KB floor restores width there (corpus_funnel ~2.7s->2.4s,
        # doc_dup_clusters ~2.6s->2.3s at sf0.1) and is invisible at
        # cluster scale, where every healthy stage clears either floor.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource V2 filter pushdown (sources/pysource.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Whole-stage-codegen class cache (static conf, default 100
        # entries).  A long-lived session running the full registry
        # (300+ plans; the 150-query bench runs each twice) EVICTS and
        # RECOMPILES hot generated classes once the distinct-plan count
        # passes the cache size — measured 2-2.6x slowdowns on the
        # codegen-heavy unrolled queries (pagerank 5.1->13.2 s,
        # kcenter 3.7->12.6 s) in a 150-query session vs solo.  2000
        # entries ≈ tens of MB of class metadata — cheap on any driver.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
