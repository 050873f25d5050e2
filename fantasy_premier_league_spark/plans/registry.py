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
# round; everything else follows in module-import order. Round 3 head =
# the 40 queries absent from CORRECTNESS_r01+r02, the 5 whose
# implementation changed after the r02 run (dedup trio reworked in
# 87768e7, kmeans-embeddings oracle added, fpl_req1 single-plan), and
# the queries newly added this round.
SAMPLE_PRIORITY: list[str] = [
    # --- never driver-verified (registered after the r01/r02 cutoff) ---
    "a8_composition_count",
    "a10_win_chance",
    "a11_max_per_key",
    "o2_topk_orders",
    "o1_sorted_scan",
    "u1_union_distinct",
    "w1_topk_per_group",
    "c1_json_extract",
    "c5_string_date_funcs",
    "c8_safe_division",
    "q3_shipping_priority",
    "j7_semi_anti_join",
    "ann_cosine_topk",
    "ann_lsh_buckets",
    "dedup_embedding_cosine",
    "ann_ivf_topk",
    "sketch_hll_distinct",
    "text_token_stats",
    "text_quality_filter",
    "text_lang_id",
    "text_fingerprint",
    "sample_hash_split",
    "text_vocab_topk",
    "q4_order_priority",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q12_late_shipments",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q21_waiting_supplier",
    "q22_idle_customers",
    "t4_windowed_stream_agg",
    "t6_stream_dedup",
    "t7_stream_stream_join",
    "fpl_t5_stateful_stream",
    # --- implementation or oracle changed since their last green row ---
    "dedup_cluster_components",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh_candidates",
    "ml_kmeans_embeddings",
    "fpl_req1_win_prediction",
    # --- new this round (tail past position 50 rotates next round) ---
    "q13_customer_distribution",
    "q2_min_cost_supplier",
    "q16_supplier_counts",
    "q9_product_profit",
    "w3_cumulative_users",
    "q11_important_parts",
    "q20_excess_suppliers",
    "docs_clean_pipeline",
    "t9_session_window_stream",
    "sketch_quantile_hist",
    "sql_frontend_topday",
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
        ml,
        multimodal,
        pipeline,
        rating,
        relational,
        similarity,
        sketches,
        sql_frontend,
        textstats,
        tpch,
    )
    from fantasy_premier_league_spark.streaming import queries as streaming_queries  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return _prioritized(QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return _prioritized(ORACLES)
