"""Relational operator library (SURVEY.md section 2 -> driver queries).

One named query per operator family in the reference inventory,
expressed over the driver's synthetic star schema. Every query is a
declarative DataFrame plan (Catalyst handles pushdown, pruning, join
strategy, AQE) with a DuckDB oracle twin for differential testing.

Scale notes are per-query; the shared principles:
- dimension joins (nation/region/supplier/customer at 100 TB are still
  tiny relative to facts) are explicitly ``F.broadcast`` so no shuffle
  of the fact side ever happens for a lookup;
- aggregates go partial (map-side combine) for free via groupBy.agg;
- filters are literal predicates on scan columns -> parquet pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fantasy_premier_league_spark.functions import fixed_units, rounded, safe_div
from fantasy_premier_league_spark.plans.registry import register
from fantasy_premier_league_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# Flagship: pricing summary (TPC-H-Q1 shape).
# Exercises scan -> pushed filter -> hash agg (8 aggregates) -> sort: the
# batch analogue of the reference's metric counters + derived metrics
# (A2 master.py:140-175 + A3 master.py:177-212) in one plan.
# At scale: single shuffle on low-cardinality keys, partial aggregation
# does almost all the work map-side; filter + 7-column pruning reach the
# parquet scan.
# ---------------------------------------------------------------------------


@register(
    "a2a3_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0, 2)
             AS sum_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 2)
             AS sum_base_price,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                 AS BIGINT) / 10000.0, 2) AS sum_disc_price,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000)
                 AS BIGINT)) AS BIGINT) / 1000000.0, 2) AS sum_charge,
           round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                 / 100.0 / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 / 100.0 / count(*), 6) AS avg_price,
           round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                 / 100.0 / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 2-dp decimal inputs are summed as exact integer units (cents /
    # 1e-4 / 1e-6) so totals are order-independent and the derived
    # doubles agree bit-for-bit with any other engine (see fixed_units).
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    qty_c = fixed_units(F.col("l_quantity"))
    price_c = fixed_units(F.col("l_extendedprice"))
    disc_c = fixed_units(F.col("l_discount"))
    disc_price_u = fixed_units(disc_price, 10_000)
    charge_u = fixed_units(disc_price * (1 + F.col("l_tax")), 1_000_000)
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rounded(F.sum(qty_c) / 100.0, 2).alias("sum_qty"),
            rounded(F.sum(price_c) / 100.0, 2).alias("sum_base_price"),
            rounded(F.sum(disc_price_u) / 10_000.0, 2).alias("sum_disc_price"),
            rounded(F.sum(charge_u) / 1_000_000.0, 2).alias("sum_charge"),
            rounded(F.sum(qty_c) / 100.0 / n, 6).alias("avg_qty"),
            rounded(F.sum(price_c) / 100.0 / n, 6).alias("avg_price"),
            rounded(F.sum(disc_c) / 100.0 / n, 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# F3: equality point lookup (reference ui.py:41-42,80 -- players_df.filter
# (name == x).first()). At scale a point lookup is a pushed-down predicate
# on the scan; no shuffle.
# ---------------------------------------------------------------------------


@register(
    "f3_point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS acctbal, c_mktsegment
    FROM customer WHERE c_name = 'Customer#000000042'
    """,
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_name") == "Customer#000000042").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        rounded(F.col("c_acctbal"), 2).alias("acctbal"),
        "c_mktsegment",
    )


# ---------------------------------------------------------------------------
# F4: compound predicate search (reference ui.py:121-122 -- linear scan for
# date == d AND label == l). Rebuilt as conjunctive pushed filters.
# ---------------------------------------------------------------------------


@register(
    "f4_predicate_search",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice, o_orderpriority
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-02-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-03-01 00:00:00'
      AND o_orderstatus = 'F'
    ORDER BY o_orderkey
    """,
)
def predicate_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-02-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-03-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderstatus") == "F")
        )
        .select(
            "o_orderkey",
            "o_custkey",
            rounded(F.col("o_totalprice"), 2).alias("totalprice"),
            "o_orderpriority",
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# F5: per-key filter scan (reference ui.py:92-98 -- profile part-file scan
# for one playerId). Keyed filter over the events analogue table.
# ---------------------------------------------------------------------------


@register(
    "f5_key_filter",
    oracle="""
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM events WHERE user_id = 7 ORDER BY event_id
    """,
)
def key_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") == 7)
        .select("event_id", "user_id", "event_type", rounded(F.col("value"), 2).alias("value"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# J1/J5: fact -> dim broadcast joins (reference master.py:364 metrics |x| team;
# ui.py:129,142,149 repeated .first() dim lookups -> rebuilt as ONE broadcast
# hash join per dim, no per-row driver roundtrips). TPC-H-Q5 shape.
# At 100 TB: nation/region/supplier broadcast (no fact shuffle); only the
# final groupBy shuffles, on a 25-key space.
# ---------------------------------------------------------------------------


@register(
    "j1_broadcast_dim_join",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
                 AS BIGINT) / 10000.0, 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    ORDER BY nation, region
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            rounded(
                F.sum(fixed_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000))
                / 10_000.0,
                2,
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("nation", "region")
    )


# ---------------------------------------------------------------------------
# J2: keyed equi-join of the event stream against a static table (reference
# master.py:367 metrics |x| substitutions on playerId). events.user_id maps
# to customer.c_custkey (FIXTURES.md section 7). Customer is broadcast: the
# event side -- the 100 TB side -- never shuffles.
# ---------------------------------------------------------------------------


@register(
    "j2_stream_static_join",
    oracle="""
    SELECT e.user_id, c.c_mktsegment AS segment, count(*) AS n_events,
           round(CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) / 100.0, 2)
             AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.user_id, c.c_mktsegment
    ORDER BY e.user_id
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("user_id", F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_events"),
            rounded(F.sum(fixed_units(F.col("value"))) / 100.0, 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# J4: all-pairs generation (reference metrics.py:26-49 -- the O(n^2) nested
# Python loop over player pairs). Rebuilt as a self cross-join with a
# canonical p1 < p2 ordering. At 650 players this is 211k pairs; at larger n
# the pair space must be block-partitioned -- see operators/chemistry.py for
# the production variant; this query pins the pair-generation semantics on
# the 25-row nation dim (300 unordered pairs).
# ---------------------------------------------------------------------------


@register(
    "j4_pair_generation",
    oracle="""
    SELECT a.n_nationkey AS p1, b.n_nationkey AS p2,
           a.n_name AS p1_name, b.n_name AS p2_name,
           CASE WHEN a.n_regionkey = b.n_regionkey THEN 1 ELSE 0 END AS same_region
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    ORDER BY p1, p2
    """,
)
def pair_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    a = nat.alias("a")
    b = nat.alias("b")
    return (
        a.join(b, F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            F.col("a.n_nationkey").alias("p1"),
            F.col("b.n_nationkey").alias("p2"),
            F.col("a.n_name").alias("p1_name"),
            F.col("b.n_name").alias("p2_name"),
            F.when(F.col("a.n_regionkey") == F.col("b.n_regionkey"), 1)
            .otherwise(0)
            .alias("same_region"),
        )
        .orderBy("p1", "p2")
    )


# ---------------------------------------------------------------------------
# J3 + A5-join shape: aggregated stream joined back to dims (reference
# master.py:372 rating |x| team). Shuffle only the pre-aggregated (small)
# side; dims broadcast.
# ---------------------------------------------------------------------------


@register(
    "j3_agg_dim_join",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_c
      FROM orders GROUP BY o_custkey
    )
    SELECT n.n_name AS nation, count(*) AS n_customers,
           CAST(sum(p.n_orders) AS BIGINT) AS n_orders,
           round(CAST(sum(p.spend_c) AS BIGINT) / 100.0, 2) AS spend
    FROM per_cust p
    JOIN customer c ON p.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def agg_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(fixed_units(F.col("o_totalprice"))).alias("spend_c"),
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
            rounded(F.sum("spend_c") / 100.0, 2).alias("spend"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# A8: composition counting (reference ui.py:43-53 -- role counts in an XI).
# groupBy + count + countDistinct.
# ---------------------------------------------------------------------------


@register(
    "a8_composition_count",
    oracle="""
    SELECT c_mktsegment AS segment, count(*) AS n,
           count(DISTINCT c_nationkey) AS n_nations,
           round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                 / 100.0 / count(*), 6) + 0 AS avg_bal
    FROM customer GROUP BY c_mktsegment ORDER BY segment
    """,
)
def composition_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            rounded(F.sum(fixed_units(F.col("c_acctbal"))) / 100.0 / F.count("*"), 6).alias(
                "avg_bal"
            ),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# A10: strength / win-chance arithmetic (reference ui.py:66-74:
# strength = sum(rating*avg)/11; chanceA = (0.5 + sA - (sA+sB)/2) * 100).
# Per-nation "strength" vs the global mean -- the scalar-vs-aggregate
# pattern: one tiny aggregate cross-joined onto a grouped result.
# ---------------------------------------------------------------------------


@register(
    "a10_win_chance",
    oracle="""
    WITH strength AS (
      SELECT c_nationkey AS nation,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               / 100.0 / count(*) AS s
      FROM customer GROUP BY c_nationkey
    ), g AS (SELECT avg(s) AS gs FROM strength)
    SELECT nation, round(s, 6) + 0 AS strength,
           round((0.5 + s / 10000.0 - (s / 10000.0 + gs / 10000.0) / 2) * 100, 6) + 0 AS win_chance
    FROM strength, g
    ORDER BY nation
    """,
)
def win_chance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    strength = cust.groupBy(F.col("c_nationkey").alias("nation")).agg(
        (F.sum(fixed_units(F.col("c_acctbal"))) / 100.0 / F.count("*")).alias("s")
    )
    g = strength.agg(F.avg("s").alias("gs"))
    sn = F.col("s") / 10000.0
    gn = F.col("gs") / 10000.0
    return (
        strength.crossJoin(F.broadcast(g))
        .select(
            "nation",
            rounded(F.col("s"), 6).alias("strength"),
            rounded((F.lit(0.5) + sn - (sn + gn) / 2) * 100, 6).alias("win_chance"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# A11 + O3: max-of-group selection (reference master.py:166 max matchId;
# metrics.py:53 "last batch" = max batch id).
# ---------------------------------------------------------------------------


@register(
    "a11_max_per_key",
    oracle="""
    SELECT user_id,
           -- STRING on both engines: Spark TIMESTAMP fetches as
           -- datetime64[ns] on the driver's pandas path, DuckDB as
           -- [us]; no temporal type is byte-identical (r12 preflight)
           CAST(max(ts) AS STRING) AS last_ts,
           count(*) AS n, round(max(value), 2) AS max_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def max_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max("ts").cast("string").alias("last_ts"),
            F.count("*").alias("n"),
            rounded(F.max("value"), 2).alias("max_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# O2: top-k (reference ui.py .first() limit-1 lookups, generalized).
# Total order with key tiebreak so the result set is deterministic.
# At scale: orderBy+limit is a TakeOrderedAndProject -- no full sort.
# ---------------------------------------------------------------------------


@register(
    "o2_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", rounded(F.col("o_totalprice"), 2).alias("totalprice"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# O1: full sort (reference metrics.py:4 sorted batch dirs).
# ---------------------------------------------------------------------------


@register(
    "o1_sorted_scan",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_name",
)
def sorted_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).orderBy("n_name")


# ---------------------------------------------------------------------------
# U1: union (reference master.py:307 bench + lineup concat). Distinct union
# of two projections with a provenance tag dropped by DISTINCT semantics --
# modeled as UNION (dedup) of nation keys present in customer vs supplier.
# ---------------------------------------------------------------------------


@register(
    "u1_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    sup = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(sup).distinct().orderBy("nationkey")


# ---------------------------------------------------------------------------
# W1: top-k per group via window (rebuild-native; reference has no window
# functions -- SURVEY 2.5). row_number with full tiebreak for determinism.
# ---------------------------------------------------------------------------


@register(
    "w1_topk_per_group",
    oracle="""
    SELECT segment, c_custkey, acctbal, CAST(rn AS INTEGER) AS rn FROM (
      SELECT c_mktsegment AS segment, c_custkey, round(c_acctbal, 2) AS acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3 ORDER BY segment, rn
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.select(
            F.col("c_mktsegment").alias("segment"),
            "c_custkey",
            rounded(F.col("c_acctbal"), 2).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("segment", "rn")
    )


# ---------------------------------------------------------------------------
# C1: JSON extraction (reference master.py:71-75 json.loads + tag list
# projection). events.props is the tags analogue: a JSON string column.
# Extraction happens ONCE in a projection, JVM-side, then aggregates.
# ---------------------------------------------------------------------------


@register(
    "c1_json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).alias("k_sum"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# C5/C6: string + date scalar functions (reference metrics.py:6-9 split/cast;
# ui.py:122 dateutc.split()[0]). Projection-only plan.
# ---------------------------------------------------------------------------


@register(
    "c5_string_date_funcs",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           upper(o_orderstatus) AS status_uc,
           CAST(split_part(o_orderpriority, '-', 1) AS INT) AS priority_rank
    FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey
    """,
)
def string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.upper("o_orderstatus").alias("status_uc"),
            F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1))
            .cast("int")
            .alias("priority_rank"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# C8: zero-guarded division (reference master.py:183-209 try/except -> 0).
# ---------------------------------------------------------------------------


@register(
    "c8_safe_division",
    oracle="""
    SELECT user_id,
           round(coalesce(
             (CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) / 100.0)
               / nullif(count(CASE WHEN event_type = 'purchase' THEN 1 END), 0),
             0.0), 6) AS avg_purchase,
           round(coalesce(
             count(CASE WHEN event_type = 'error' THEN 1 END)
               / nullif(count(CASE WHEN event_type = 'click' THEN 1 END), 0)
             , 0.0), 6) AS err_per_click
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def safe_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return (
        ev.groupBy("user_id")
        .agg(
            rounded(
                safe_div(
                    F.sum(F.when(is_purchase, fixed_units(F.col("value")))) / 100.0,
                    F.count(F.when(is_purchase, 1)),
                ),
                6,
            ).alias("avg_purchase"),
            rounded(
                safe_div(
                    F.count(F.when(F.col("event_type") == "error", 1)).cast("double"),
                    F.count(F.when(F.col("event_type") == "click", 1)),
                ),
                6,
            ).alias("err_per_click"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: 3-way join + agg + top-k. The "full pipeline" relational
# smoke: customer filter -> join orders -> join lineitem -> groupBy revenue
# -> top 10. At scale: customer is the small side (broadcast after filter);
# orders |x| lineitem is the one genuine shuffle, on orderkey.
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           round(CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
                 AS BIGINT) / 10000.0, 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '2024-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2024-06-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"), "o_orderdate")
        .agg(
            rounded(
                F.sum(fixed_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000))
                / 10_000.0,
                2,
            ).alias("revenue")
        )
        .select(
            "orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Semi/anti joins (rebuild-native; reference expresses existence checks as
# driver-side dict lookups). EXISTS / NOT EXISTS as left_semi / left_anti:
# no payload duplication, Catalyst can broadcast the filter side.
# ---------------------------------------------------------------------------


@register(
    "j7_semi_anti_join",
    oracle="""
    SELECT
      (SELECT count(*) FROM customer c WHERE EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
      (SELECT count(*) FROM customer c WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    with_orders = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").count()
    without = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").count()
    spark_df = spark.createDataFrame(
        [(with_orders, without)], "with_orders long, without_orders long"
    )
    return spark_df


# ---------------------------------------------------------------------------
# J8: FULL OUTER join -- the reconciliation shape (two event feeds
# merged hour by hour, keeping hours where either side is absent).
# Completes the join-type inventory next to inner/broadcast (J1),
# left-semi/anti (J7) and interval stream-stream (T7). Both inputs
# pre-aggregate to one row per hour BEFORE the join, so the full-outer
# shuffle carries |hours| rows, not |events| -- at 100 TB the join
# state is the calendar, not the corpus.
# ---------------------------------------------------------------------------


@register(
    "j8_full_outer_reconcile",
    oracle="""
    WITH s AS (
      SELECT date_trunc('hour', ts) AS hr, count(*) AS n_signups
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    e AS (
      SELECT date_trunc('hour', ts) AS hr, count(*) AS n_errors
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT strftime(coalesce(s.hr, e.hr), '%Y-%m-%d %H') AS hour,
           CAST(coalesce(n_signups, 0) AS BIGINT) AS n_signups,
           CAST(coalesce(n_errors, 0) AS BIGINT) AS n_errors,
           CAST(CASE WHEN s.hr IS NULL OR e.hr IS NULL THEN 1 ELSE 0 END AS INT)
             AS one_sided
    FROM s FULL OUTER JOIN e ON s.hr = e.hr
    ORDER BY hour
    """,
)
def j8_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hr = F.date_trunc("hour", F.col("ts"))
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy(hr.alias("s_hr"))
        .agg(F.count("*").alias("n_signups"))
    )
    e = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(hr.alias("e_hr"))
        .agg(F.count("*").alias("n_errors"))
    )
    joined = s.join(e, s.s_hr == e.e_hr, "full_outer")
    return joined.select(
        F.date_format(F.coalesce("s_hr", "e_hr"), "yyyy-MM-dd HH").alias("hour"),
        F.coalesce("n_signups", F.lit(0)).alias("n_signups"),
        F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
        F.when(F.col("s_hr").isNull() | F.col("e_hr").isNull(), 1)
        .otherwise(0)
        .alias("one_sided"),
    ).orderBy("hour")


# ---------------------------------------------------------------------------
# C13: semi-structured data through the Spark 4 VARIANT type — the
# modern replacement for string-JSON hot paths (binary-encoded, typed
# path access, no per-row re-parse). The reference re-parses JSON per
# record per access (master.py:37,45,71); c1_json_extract shows the
# from_json/schema route; this shows parse_json -> try_variant_get,
# which at 100 TB is the column you'd MATERIALIZE once at ingest and
# then path-query many times without string parsing.
# ---------------------------------------------------------------------------


@register(
    "c13_variant_json",
    oracle="""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum
    FROM events
    GROUP BY event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
    ORDER BY event_type, k_bucket
    """,
)
def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.sum("k").alias("k_sum"))
        .orderBy("event_type", "k_bucket")
    )


# ---------------------------------------------------------------------------
# C14: malformed-input accounting. Real feeds carry broken records; the
# reference's socket parser (master.py:139-156) raises on the first bad
# line and loses the batch. Here ingestion is PERMISSIVE: every line is
# read as text, `from_json` yields NULL for structurally-invalid rows
# (Spark's permissive contract), and the audit reports valid/corrupt
# counts plus the value mass that survived -- the dead-letter-queue
# accounting every production pipeline fronts its parsers with. The
# oracle re-derives validity with DuckDB's json_valid + json_type over
# the same raw lines: two independent JSON validity implementations
# agreeing on every line IS the gate.
#
# Scale: a pure line-wise projection + one 2-row aggregate; corrupt
# rows cost exactly one failed parse each, no job failure, no retry.
# ---------------------------------------------------------------------------


def _corrupt_feed_path() -> str:
    from fantasy_premier_league_spark.sources.fpl_fixtures import (
        ensure_corrupt_feed,
        ensure_fixtures,
    )

    return ensure_corrupt_feed(ensure_fixtures())


@register(
    "c14_corrupt_record_audit",
    oracle=f"""
    WITH lines AS (
      SELECT unnest(string_split(rtrim(content, chr(10)), chr(10))) AS line
      FROM read_text('{_corrupt_feed_path()}')
    ),
    parsed AS (
      SELECT CASE WHEN json_valid(line) AND json_type(line) = 'OBJECT'
                  THEN 'valid' ELSE 'corrupt' END AS status,
             CASE WHEN json_valid(line) AND json_type(line) = 'OBJECT'
                  THEN CAST(round(try_cast(
                         json_extract_string(line, '$.value') AS DOUBLE) * 100)
                       AS BIGINT) END AS cents
      FROM lines
    )
    SELECT status, count(*) AS n_lines,
           CAST(coalesce(sum(cents), 0) AS BIGINT) AS value_cents
    FROM parsed GROUP BY status ORDER BY status
    """,
)
def c14_corrupt_record_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _corrupt_feed_path()
    lines = spark.read.text(path)
    # the full PERMISSIVE contract: malformed input yields EITHER a null
    # struct (whitespace-only lines) or a struct whose configured
    # _corrupt_record field carries the raw text (every other shape) --
    # a bare null-check undercounts corruption by ~7x
    r = F.from_json(
        F.col("value"),
        "id BIGINT, type STRING, value DOUBLE, _corrupt_record STRING",
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    ok = r.isNotNull() & r.getField("_corrupt_record").isNull()
    parsed = lines.select(
        F.when(ok, "valid").otherwise("corrupt").alias("status"),
        F.when(ok, fixed_units(r.getField("value"))).alias("cents"),
    )
    return (
        parsed.groupBy("status")
        .agg(
            F.count("*").alias("n_lines"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("value_cents"),
        )
        .orderBy("status")
    )
