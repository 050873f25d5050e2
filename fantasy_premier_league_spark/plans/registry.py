"""Registry wiring operators to the driver's correctness contract.

Every operator module registers (name, spark_fn, oracle_sql) pairs; the
repo-root ``__spark_entry__.py`` re-exports the collected dicts. The
oracle SQL is ANSI SQL runnable by DuckDB over the same parquet tables,
so each registration is a self-contained differential test.

Convention (driver compares by column NAME, sorted, then value-hash):
- alias every computed column identically in Spark and SQL;
- round floating aggregates on BOTH sides (helpers in
  ``fantasy_premier_league_spark.functions``) so summation-order
  nondeterminism across engines cannot flip a hash;
- cast integer aggregates to BIGINT in DuckDB (its sum(int) is
  HUGEINT, Spark's is LONG).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# The driver's correctness gate checks the FIRST 50 registered queries
# (CORRECTNESS_r01/r02 are exactly the head of the registry in insertion
# order). With >50 registered, rotate: queries listed here are emitted
# first so the least-recently-driver-verified ones get checked each
# round; everything else follows in module-import order.
#
# The rotation rule (enforced by tests/test_sample_rotation.py against
# the CORRECTNESS_r*.json artifacts):
#   1. any query whose implementation changed since its last driver row
#      (CHANGED_THIS_ROUND, hand-maintained per round) goes first;
#   2. any NEW query (no driver row yet) goes in the head;
#   3. any query whose last green driver row is more than two rounds
#      old goes in the head;
#   4. remaining slots fill with the least-recently-verified tail.

# Queries whose implementing code changed this round AFTER their last
# driver check -- update this list whenever a registered query's
# implementation or oracle changes. Round 6: the two r5 perf-rewrites
# that missed the r5 sample (VERDICT #1), plus the five ADVICE-fix
# rewrites (byte-based audio oracle, running-total units, integer-grid
# pagerank, winnowing overflow guard -> also its pairs consumer).
CHANGED_THIS_ROUND: list[str] = [
    "dedup_cluster_components",
    "dedup_embedding_cosine",  # sorted-neighborhood equi-band (sf10 sweep fix)
    "q2_min_cost_supplier",
    "dedup_simhash_pairs",
    "dedup_simhash",
    "mm_audio_energy",
    "sql_frontend_running_total",
    "graph_pagerank",
    "text_winnowing",
    "dedup_winnowing_pairs",
]

# Queries first registered this round (no driver row exists yet).
NEW_THIS_ROUND: list[str] = [
    "aqe_skew_join",
    "t11_socket_roundtrip",
    "fpl_chem_blocked_pairs",
    "t12_stream_outer_join",
    "cdc_latest_state",
    "w5_range_frame",
    "docs_source_mix",
    "graph_triangle_counts",
    "graph_triangle_doulion",
    "events_gapfill_daily",
    "text_bm25_rank",
    "docs_decontaminate",
    "knn_classify_vote",
    "grouping_sets_revenue",
    "stats_corr_matrix",
    "bucketed_colocated_join",
    "t13_stream_cdc_upsert",
    "s8_python_datasource_feed",
    "text_repetition_stats",
    "dedup_prefix_filter_pairs",
    "mm_image_resize",
    "c13_variant_json",
    "dedup_chunk_spans",
    "docs_unigram_logprob",
    "docs_temperature_mix",
    "w6_lag_lead_delta",
    "stats_mode_per_key",
    "unpivot_priority_measures",
    "t14_stream_dedup_within_watermark",
    "sketch_kmv_setops",
    "text_nb_lang_confusion",
    "ann_sq8_recall",
    "stats_mad_outliers",
    "sql_frontend_recursive_spine",
    "dq_constraint_checks",
    "s9_python_stream_feed",
    "events_transition_matrix",
    "customer_rfm_segments",
    "t15_sliding_window_stream",
    "text_tfidf_keywords",
    "orders_revenue_concentration",
    "events_trailing_distinct_users",
    "fuzzy_name_search",
    "w7_rank_family",
    "sql_frontend_lateral_topn",
    "mm_shot_boundaries",
    "dedup_containment_pairs",
    "dedup_cluster_keep_best",
    "part_skyline",
    "zorder_layout_buckets",
    "ann_pq_recall",
    "docs_dsir_weights",
    "stats_chi2_independence",
]

SAMPLE_PRIORITY: list[str] = [
    # --- implementation changed since last driver check (rule 1) ---
    "dedup_cluster_components",
    "dedup_embedding_cosine",
    "q2_min_cost_supplier",
    "mm_audio_energy",
    "sql_frontend_running_total",
    "graph_pagerank",
    "text_winnowing",
    "dedup_winnowing_pairs",
    "dedup_simhash",  # 32-bit widening (also r2-stale)
    "dedup_simhash_pairs",  # r5 materialization + r6 32-bit widening
    # --- new this round, never driver-sampled (rule 2) ---
    "aqe_skew_join",
    "t11_socket_roundtrip",
    "fpl_chem_blocked_pairs",
    "t12_stream_outer_join",
    "cdc_latest_state",
    "w5_range_frame",
    "docs_source_mix",
    "graph_triangle_counts",
    "graph_triangle_doulion",
    "events_gapfill_daily",
    "text_bm25_rank",
    "docs_decontaminate",
    "knn_classify_vote",
    "grouping_sets_revenue",
    "stats_corr_matrix",
    "bucketed_colocated_join",
    "t13_stream_cdc_upsert",
    "s8_python_datasource_feed",
    "text_repetition_stats",
    "dedup_prefix_filter_pairs",
    "mm_image_resize",
    "c13_variant_json",
    "dedup_chunk_spans",
    "docs_unigram_logprob",
    "docs_temperature_mix",
    "w6_lag_lead_delta",
    "stats_mode_per_key",
    "unpivot_priority_measures",
    "t14_stream_dedup_within_watermark",
    "sketch_kmv_setops",
    "text_nb_lang_confusion",
    "ann_sq8_recall",
    "stats_mad_outliers",
    "sql_frontend_recursive_spine",
    "dq_constraint_checks",
    "s9_python_stream_feed",
    "events_transition_matrix",
    "customer_rfm_segments",
    "t15_sliding_window_stream",
    "text_tfidf_keywords",
    "orders_revenue_concentration",
    "events_trailing_distinct_users",
    "fuzzy_name_search",
    "w7_rank_family",
    "sql_frontend_lateral_topn",
    "mm_shot_boundaries",
    "dedup_containment_pairs",
    "dedup_cluster_keep_best",
    "part_skyline",
    "zorder_layout_buckets",
    "ann_pq_recall",
    "docs_dsir_weights",
    "stats_chi2_independence",
    # --- last driver row is r2: four rounds stale (rule 3) ---
    "fpl_a7_final_rating",
    "fpl_a4_profile",
    "fpl_a6_chemistry",
    "fpl_req2_player_profile",
    "fpl_req3_match_details",
    "dedup_exact",
    "dedup_minhash_signatures",
    "a1_metric_vector",
    "a2_keyed_counters",
    "a3_final_metrics",
    "a4_profile",
    "a6_chemistry_pairs",
    "ml_kmeans_profiles",
    "ml_quadratic_fit",
    "mm_binary_metadata",
    "mm_decode_stats",
    "mm_frame_sample",
    "a5_rating_recurrence",
    "a2a3_pricing_summary",
    "f3_point_lookup",
    "f4_predicate_search",
    "f5_key_filter",
    "j1_broadcast_dim_join",
    "j2_stream_static_join",
    "j4_pair_generation",
    # NOTE round 7: the round-6 changed+new queries OVERFLOW the head:
    # 10 changed + 53 new = 63 candidates for 50 slots, so the last
    # thirteen entries of the new section (orders_revenue_concentration,
    # events_trailing_distinct_users, fuzzy_name_search,
    # w7_rank_family, sql_frontend_lateral_topn, mm_shot_boundaries,
    # dedup_containment_pairs, dedup_cluster_keep_best, part_skyline,
    # zorder_layout_buckets, ann_pq_recall, docs_dsir_weights,
    # stats_chi2_independence)
    # ship with NO driver row and MUST be first in the round-7 head,
    # before even the displaced stale tail below.
    # Original displacement note: the round-6-new queries filled the head past 50
    # (9 changed + 37 new + the first 4 stale rows fit; everything from
    # dedup_exact onward is displaced — new-query verification outranks
    # staleness, rule 2 > rule 3). The displaced r2-stale rows
    # (dedup_exact, dedup_minhash_signatures, a1-a6, ml_*, mm_*, a5,
    # a2a3 — the last also covered every round by the entry() smoke —
    # f3, f4, f5, j1, j2, j4) MUST lead the round-7 head, ahead of any
    # round-7 additions; the r4-vintage tail follows them.
    # --- fill: least-recently-verified r4 tail (rule 4) ---
    "fpl_req1_win_prediction",
    "fpl_t5_stateful_stream",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh_candidates",
    "ann_cosine_topk",
    "ann_lsh_buckets",
    "dedup_embedding_cosine",
    "ann_ivf_topk",
    "sketch_hll_distinct",
    "text_token_stats",
    "text_quality_filter",
    "text_lang_id",
    "text_fingerprint",
]


def _prioritized(d: dict) -> dict:
    head = {n: d[n] for n in SAMPLE_PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame operator.

    ``oracle`` is the DuckDB twin; None marks a genuinely
    non-SQL-expressible op (driver falls back to a rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module for its registration side effects."""
    from fantasy_premier_league_spark.operators import (  # noqa: F401
        advanced,
        analytics,
        api,
        dedup,
        fpl_events,
        graph,
        ml,
        multimodal,
        pipeline,
        ranking,
        rating,
        relational,
        similarity,
        sketches,
        sql_frontend,
        textstats,
        tpch,
    )
    from fantasy_premier_league_spark.sources import py_datasource  # noqa: F401
    from fantasy_premier_league_spark.streaming import queries as streaming_queries  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return _prioritized(QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return _prioritized(ORACLES)
