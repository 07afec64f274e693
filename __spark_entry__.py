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
# ROUND 7 window (this round): burn the hash slots on (a) the 12
# oracle-paired queries with no driver hash signal yet — the four r5
# conversions, the seven r6 additions, and json_funcs (the only
# historical hash-fail, r1 DuckDB HUGEINT dtype; fixed, replica-green,
# never driver-re-recorded) — (b) the new r7 query
# embedding_knn_label_eval_ivf (persisted-IVF-index label eval, VERDICT
# r6 #2/#7), (c) re-confirmation of the four queries whose shared
# prefix-sum helper changed this round (curation._offset_frame:
# create_map literal → broadcast-joined offsets frame, ADVICE r6) plus
# hybrid_search_rrf whose candidate-depth asymmetry fix changed its
# results, (d) the six never-driver-green rows-only residue slots, and
# (e) a 27-query regression sample of the r1–r3 hash-green
# relational/tpch slots that have not been driver-re-checked since r3
# while their shared helpers (catalog dtype guard, session defaults)
# kept evolving (VERDICT r6 #5).
#
# ROUND 8 window (this round): (a) all 45 r7-wave queries that landed
# after the r7 window froze — the only oracle-paired queries with zero
# driver signal (VERDICT r7 task 1; every one judge-replica-green at
# sf0.01) — plus (b) the first 5 of the stale r1–r3 rotation
# (dedup_exact, join_left, set_intersect, agg_cube,
# sql_exists_subquery).  After this window every oracle-paired query
# in the registry has driver hash signal.
#
# ROUND 9 PLAN: rotate the remaining ~21 r1–r3-stale slots into the
# window (VERDICT r7 task 2): agg_basic, agg_having, agg_stats,
# array_agg_sorted, between_like_in, case_expr, conditional_agg,
# join_cross, join_right, join_semi, late_shipment_orders,
# nation_trade_volume, null_funcs, pivot_status, set_except,
# set_union_distinct, sort_limit, split_explode, sql_in_subquery,
# unpivot_part, window_lag_lead — then the r8-wave additions that
# landed after this window froze (they take priority over
# re-confirmation slots, same rule as r8): wave 1
# events_weekly_counts_streamed (the registered end-to-end stream),
# wave 2 part_adamic_adar, events_decay_value,
# doc_quality_calibration, search_prf_expansion, wave 3
# events_ks_drift, doc_collocations_llr, customer_t_closeness,
# media_image_ahash (the media family's first oracle-paired query),
# wave 4 customer_scd2_history, nation_mann_kendall,
# doc_lang_confusion, wave 5 events_mad_outliers,
# events_weekday_chi2, nation_weighted_median_price, wave 6
# part_price_index — all replica-green at sf0.001+sf0.01 when they
# landed (16 queries; with the 21 stale slots that fills 37 of 50) —
# then fill remaining slots with a rotating sample of the r4–r6
# windows (oldest-signal-first).
_WINDOW = (
    # (a) the 45 r7-wave additions that landed after the r7 window
    # froze (VERDICT r7 task 1) — every one oracle-paired,
    # judge-replica-green at sf0.01, zero driver signal so far.
    # Waves in landing order (3, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    # 16, 17, 18, 19).
    "event_state_communities",
    "map_struct_funcs",
    "doc_source_token_drift",
    "doc_minhash_recall_eval",
    "embedding_ann_recall_eval",
    "doc_leakage_safe_splits",
    "part_cooccurrence_kcore",
    "events_attribution_linear",
    "events_hourly_autocorr",
    "events_seasonal_anomaly",
    "part_association_rules",
    "events_user_rfm_segments",
    "nation_revenue_trend",
    "events_ab_significance",
    "orders_open_backlog",
    "events_changepoint_cusum",
    "events_frequent_sequences",
    "events_sliding_distinct_users",
    "customer_survival_km",
    "doc_quality_auc_eval",
    "customer_linkage_scores",
    "events_forecast_eval",
    "doc_ngram_novelty",
    "orders_benford_screen",
    "customer_revenue_gini",
    "doc_readability",
    "embedding_outlier_score",
    "doc_zipf_fit",
    "customer_k_anonymity",
    "events_bot_regularity",
    "doc_source_psi_drift",
    "embedding_pq_codes",
    "embedding_mmr_diverse",
    "events_prequential_zscore",
    "knn_pq_adc",
    "doc_backoff_lm_eval",
    "events_duplicate_purchases",
    "search_ndcg_eval",
    "embedding_kcenter_coreset",
    "knn_ivfpq",
    "doc_tokenizer_fertility",
    "doc_rake_keyphrases",
    "events_transition_conformance",
    "doc_textrank_sentence",
    "nation_revenue_theilsen",
    # (b) 5 slots on the stale r1–r3 set (last driver-checked 4+
    # rounds ago while catalog/session helpers evolved — VERDICT r7
    # task 1 names these five to start the rotation).
    "dedup_exact",
    "join_left",
    "set_intersect",
    "agg_cube",
    "sql_exists_subquery",
)

# Deliberate rows-only slots inside the window (VERDICT r6 #3
# mechanism).  Round 8: EMPTY — all six rows-only residue queries got
# their first driver rows-only record in r7 (CORRECTNESS_r07.json) and
# every r8 window entry is oracle-paired.
# tests/test_entry_contract.py permits unpaired window entries ONLY
# when they are listed here — an unpaired entry NOT in this set is
# still a wasted-slot bug.
_WINDOW_ROWS_ONLY: frozenset[str] = frozenset()


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
