"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gcp_cloudsql_airflow_bigquery_spark.plans import (
    advanced,
    curation,
    dq,
    events,
    llmdata,
    quality,
    relational,
    scale,
    search,
    temporal,
    tpch,
    tpch2,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship star-join (the reference's declared-but-never-wired
    ``stage_final_query`` join-merge step, reference
    ``dags/cloudsql_to_bigquery.py:11``) on /root/testdata/sf0.001."""
    return relational.flagship_revenue_by_region_nation(
        spark, "/root/testdata/sf0.001"
    )


_MODULES = (
    tpch,
    tpch2,
    temporal,
    quality,
    curation,
    dq,
    search,
    scale,
    llmdata,
    events,
    relational,
    advanced,
)

# The driver hard-verifies the FIRST 50 queries() entries in dict
# insertion order.  Rounds 1-3 spent the window on relational+advanced;
# round 4 on events+llmdata; round 5 on the TPC-H shape suite,
# temporal, quality, curation, dq, search, and scale (50/50
# hash-green, CORRECTNESS_r05.json).
#
# ROUND 6 rotation: the 45 oracle-paired queries never present in any
# CORRECTNESS_r0{1..5}.json (they take the slots — zero driver signal
# of any kind so far), plus 5 of the 9 round-5 oracle conversions
# whose only driver signal was r4 rows-only
# (knn_lsh/knn_ivf/doc_dedup_simhash/doc_topic_clusters/
# event_type_pagerank).  After this window every registered query has
# had SOME driver signal, and every oracle-paired query has had hash
# signal EXCEPT the four r5 conversions that did not fit (doc_bpe_vocab,
# doc_bpe_tokens, doc_winnow_candidates, embedding_semantic_dedup —
# r4 rows-only, hash-green in the local sf0.01 replica) and the
# round-6 additions below.
#
# ROUND 7 PLAN (hash slots, in priority order): the four r5
# conversions left over above (doc_bpe_vocab, doc_bpe_tokens,
# doc_winnow_candidates, embedding_semantic_dedup), then the round-6
# oracle additions (doc_quality_classifier — Newton-replay oracle —
# doc_perplexity_bigram, events_value_quantiles_rollup_exactmode,
# hybrid_search_rrf, embedding_knn_label_eval, dq_documents_report —
# all five already in the bench headline with min-of-3 baselines;
# dq_events_report landed after the baseline runs — add it to the
# headline with a min-of-3 baseline next round),
# then json_funcs (driver-red in r1 on the DuckDB HUGEINT dtype
# mismatch, fixed since and replica-green, but the driver never
# re-recorded it: its r2/r3 slots errored on the events encoding
# drift that r4's catalog dtype guard closed);
# spend rows-only slots on the unpaired residue
# (embedding_pca_projected, events_value_quantiles_rollup,
# agg_approx_sketch, media_resized), and re-check a sample of
# earlier-round slots for regression signal.
_WINDOW = (
    # relational residue (17)
    "agg_corr",
    "agg_grouping_id",
    "array_funcs",
    "date_funcs2",
    "explode_outer_words",
    "forward_fill",
    "math_funcs2",
    "posexplode_words",
    "regexp_funcs",
    "sample_hash",
    "sentences_udtf",
    "set_except_all",
    "set_intersect_all",
    "string_funcs2",
    "url_funcs",
    "window_analytics",
    "snapshot_cdc_diff",
    # advanced residue (17)
    "custdist",
    "customer_entity_clusters",
    "customer_name_neardup",
    "customer_sorted_neighborhood",
    "geomean_prices",
    "large_volume_orders",
    "lone_late_supplier",
    "order_price_outliers",
    "orders_price_mad_outliers",
    "part_affinity_pmi",
    "part_cooccurrence_triangles",
    "price_histogram_bits",
    "scd2_customer_history",
    "supplier_best_balance",
    "supplier_fulfillment_latency",
    "top_revenue_suppliers",
    "weekly_revenue_growth",
    # events rollups / sketch joins / dim join (5)
    "events_audience_overlap",
    "events_distinct_users_rollup",
    "events_distinct_users_rollup_exact",
    "orders_customer_join_estimate",
    "events_user_rollup",
    # llmdata never-checked (6)
    "doc_dedup_keep_best_quality",
    "doc_dedup_minhash_portable",
    "doc_langid_confusion",
    "doc_source_overlap",
    "doc_token_budget_selection",
    "embedding_standardized",
    # round-5 oracle conversions, rows-only in r4 → hash slots now (5)
    "knn_lsh",
    "knn_ivf",
    "doc_dedup_simhash",
    "doc_topic_clusters",
    "event_type_pagerank",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    allq: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        allq.update(mod.QUERIES)
    out = {name: allq[name] for name in _WINDOW}
    out.update(allq)
    return out


def oracle_sql() -> dict[str, str]:
    allo: dict[str, str] = {}
    for mod in _MODULES:
        allo.update(mod.ORACLE)
    out = {name: allo[name] for name in _WINDOW if name in allo}
    out.update(allo)
    return out
