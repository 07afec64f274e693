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
# ROUND 8 PLAN: after this window, every oracle-paired query has
# driver hash signal and ~28 of the 49 r1-r3-only slots are
# re-confirmed.  The r8 window MUST include the fifteen r7-wave-3
# additions that landed after this window was frozen
# (event_state_communities, map_struct_funcs, doc_source_token_drift,
# doc_minhash_recall_eval, embedding_ann_recall_eval,
# doc_leakage_safe_splits, part_cooccurrence_kcore,
# events_attribution_linear, events_hourly_autocorr,
# events_seasonal_anomaly, part_association_rules,
# events_user_rfm_segments, nation_revenue_trend,
# events_ab_significance, orders_open_backlog — all
# replica-green at sf0.001+sf0.01), plus the five r7-wave-7 additions
# (events_changepoint_cusum, events_frequent_sequences,
# events_sliding_distinct_users, customer_survival_km,
# doc_quality_auc_eval), the three r7-wave-8 additions
# (customer_linkage_scores, events_forecast_eval, doc_ngram_novelty)
# the three r7-wave-9 additions (orders_benford_screen,
# customer_revenue_gini, doc_readability) and the two r7-wave-10
# additions (embedding_outlier_score, doc_zipf_fit), the three
# r7-wave-11 additions (customer_k_anonymity, events_bot_regularity,
# doc_source_psi_drift) and the r7-wave-12 additions
# (embedding_pq_codes, embedding_mmr_diverse), the r7-wave-13
# addition (events_prequential_zscore, whose Welford GroupState
# streaming twin is stream≡batch-tested) and the r7-wave-14 additions
# (knn_pq_adc, doc_backoff_lm_eval), the r7-wave-15 addition
# (events_duplicate_purchases) and the r7-wave-16 additions
# (search_ndcg_eval, embedding_kcenter_coreset, knn_ivfpq,
# doc_tokenizer_fertility), the r7-wave-17 addition
# (doc_rake_keyphrases) and the r7-wave-18 additions
# (events_transition_conformance, doc_textrank_sentence) and the
# r7-wave-19 addition (nation_revenue_theilsen)
# — all replica-green at sf0.001+sf0.01,
# then rotate the remaining early
# slots (agg_basic, agg_cube, agg_having, join_left/right/semi/cross,
# window_lag_lead, set_union_distinct, set_except, set_intersect,
# window-* residue, case_expr, split_explode, array_agg_sorted,
# null_funcs, between_like_in, conditional_agg, late_shipment_orders,
# nation_trade_volume, sql_in_subquery, sql_exists_subquery,
# string/date/math residue) into the sample slots, plus a rotating
# sample of the r4-r6 windows.
_WINDOW = (
    # (a) oracle-paired, no driver hash signal yet (12)
    "doc_bpe_vocab",
    "doc_bpe_tokens",
    "doc_winnow_candidates",
    "embedding_semantic_dedup",
    "doc_quality_classifier",
    "doc_perplexity_bigram",
    "events_value_quantiles_rollup_exactmode",
    "hybrid_search_rrf",
    "embedding_knn_label_eval",
    "dq_documents_report",
    "dq_events_report",
    "json_funcs",
    # (b) new this round (5)
    "embedding_knn_label_eval_ivf",
    "embedding_semantic_dedup_indexed",
    "events_zorder_layout",
    "doc_containment_pairs",
    "doc_tfidf_knn",
    # (c) helper/semantics changed this round — re-confirm (4)
    "doc_token_budget_selection",
    "doc_curriculum_buckets",
    "doc_kfold_assignment",
    "customer_sorted_neighborhood",
    # (d) rows-only residue, never driver-green (6)
    "embedding_pca_projected",
    "media_resized",
    "agg_approx_sketch",
    "events_value_quantiles_rollup",
    "media_features",
    "media_codec_features",
    # (e) r1-r3 regression sample (23)
    "flagship_revenue_by_region_nation",
    "pricing_summary",
    "agg_count_distinct",
    "agg_rollup",
    "agg_grouping_sets",
    "filter_incremental",
    "join_inner",
    "join_full",
    "join_anti",
    "join_broadcast",
    "scalar_subquery",
    "window_rank",
    "window_running",
    "window_ntile",
    "window_range_frame",
    "topk_per_group",
    "set_union_all",
    "string_funcs",
    "date_funcs",
    "math_funcs",
    "cast_types",
    "dedup_last_write_wins",
    "agg_percentiles",
)

# Deliberate rows-only slots inside the r7 window (VERDICT r6 #3):
# these six unpaired queries have NEVER had a driver-green rows-only
# record (their r4 slots predated the driver's rows-only handling or
# errored), so six hash slots are spent converting them this round.
# tests/test_entry_contract.py permits unpaired window entries ONLY
# when they are listed here — an unpaired entry NOT in this set is
# still a wasted-slot bug.
_WINDOW_ROWS_ONLY = frozenset(
    {
        "embedding_pca_projected",
        "media_resized",
        "agg_approx_sketch",
        "events_value_quantiles_rollup",
        "media_features",
        "media_codec_features",
    }
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
