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
# implementation or oracle changes. Round 7: the s9 stream reader now
# reads only the row groups overlapping the partition's row range
# (VERDICT r6 #5, the round's one `weak` mark), and the embedding
# kmeans was refactored into shared Lloyd's helpers so the semantic
# dedup gate verifies the identical clustering. (ann_pq_recall's
# codebook training was refactored too, but it has no driver row yet,
# so its head slot comes from the never-sampled rule.)
CHANGED_THIS_ROUND: list[str] = [
    "s9_python_stream_feed",
    "ml_kmeans_embeddings",
    "dedup_prefix_filter_pairs",  # exact-dup class collapse (sf10 disk fix)
]

# Queries first registered this round (no driver row exists yet).
# Round 7 registers FEW new queries by design: the head must first
# drain the 13 r6-overflow queries (registered last round, never
# driver-checked) and the 25 r2-stale rows. Registration is throttled
# to the verification budget -- tests/test_sample_rotation.py now FAILS
# (no grace branch) when changed + never-sampled > 50.
NEW_THIS_ROUND: list[str] = [
    "ann_ivfpq_recall",
    "fpl_req1_invalid_team_quirk",
    "t16_fpl_pipeline_roundtrip",
    "dedup_semantic_clusters",
    "dedup_simhash_accuracy",
    "sample_reservoir_per_key",
    "corpus_source_overlap",
    "c14_corrupt_record_audit",
]

# NOTE round 8: the r7 head is exactly full (3 changed + 21 new + 25
# r2-stale + 1 r4 fill), so these r7 decisions are QUEUED for the r8
# head: (a) apply the exact-dup class collapse (_shingle_classes,
# operators/dedup.py) to the remaining posting-join family --
# dedup_ngram_jaccard (sf10 exp 0.91), dedup_winnowing_pairs,
# dedup_minhash_lsh_candidates -- whose r4/r6 driver rows left no
# change budget this round; (b) rotate the r4-stale tail (43 entries
# after fpl_req1_win_prediction rides this head) per rule 3.
SAMPLE_PRIORITY: list[str] = [
    # --- implementation changed since last driver check (rule 1) ---
    "s9_python_stream_feed",  # row-group-bounded stream read (r6 weak fix)
    "ml_kmeans_embeddings",  # Lloyd's helpers shared with semantic dedup
    "dedup_prefix_filter_pairs",  # exact-dup class collapse (sf10 disk fix)
    # --- registered r6, never driver-sampled: the 13-query overflow
    # --- the r6 verdict ordered drained FIRST this round (rule 2) ---
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
    # --- new this round (rule 2) ---
    "ann_ivfpq_recall",
    "fpl_req1_invalid_team_quirk",
    "t16_fpl_pipeline_roundtrip",
    "dedup_semantic_clusters",
    "dedup_simhash_accuracy",
    "sample_reservoir_per_key",
    "corpus_source_overlap",
    "c14_corrupt_record_audit",
    # --- last driver row is r2: five rounds stale (rule 3) ---
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
    # --- fill: least-recently-verified r4 tail (rule 3/4; 44 r4 rows
    # --- exist, more than the 3 remaining slots -- the stale-overflow
    # --- branch of the rotation test applies; the rest lead round 8) ---
    "fpl_req1_win_prediction",
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
