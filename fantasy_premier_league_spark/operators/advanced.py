"""Advanced relational operators the reference cannot express but a
production Spark engine needs (SURVEY 2.10 scale mandate): as-of join,
session windows, rollup, salted skew join, and a binned range join.

None of these exist in the reference (its only joins are per-batch
equi hash joins on playerId, master.py:364-372); they are the
"operator Spark lacks -> compose from DataFrame ops" tier:

- as-of join: Spark has no ASOF JOIN operator. The classic scalable
  form is union-the-two-streams + one partitioned sort + a running
  ``last(ignorenulls)`` -- ONE shuffle on the key, no range-condition
  join that Catalyst would execute as a broadcast-nested-loop.
- session windows (batch): gaps-and-islands with lag + running sum --
  one shuffle on user_id; the streaming twin is
  ``F.session_window`` (streaming/pipeline.py covers watermarked state).
- rollup: native ``df.rollup`` (Catalyst Expand), subtotals + grand
  total in one pass over the fact table.
- salted skew join: the hand-rolled mitigation for a hot key joining a
  large dim when AQE skew-split cannot kick in (e.g. the skewed side
  feeds an aggregation that must not be split). Salting trades an
  S-times replication of the small side for an even key distribution;
  results are provably identical to the plain join (the oracle IS the
  plain join).
- range join: |ts - ts'| <= W as equality on coarse time bins +
  neighbor-bin explosion + exact re-filter: turns an O(n^2)
  theta-join (BroadcastNestedLoopJoin) into a hash join whose
  candidate set is only the +-1-bin neighborhood.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fantasy_premier_league_spark.functions import epoch_us, fixed_units, rounded
from fantasy_premier_league_spark.plans.registry import register
from fantasy_premier_league_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# As-of join: every purchase matched to the user's most recent click
# at-or-before the purchase time.
# ---------------------------------------------------------------------------


@register(
    "asof_join_events",
    oracle="""
    WITH c AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY purchase_id
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union + running last: one shuffle on user_id.

    DuckDB states the semantics with its native ASOF JOIN; Spark
    executes the scalable composition (a range-condition join would
    plan as BroadcastNestedLoopJoin). Clicks are deduped per
    (user, ts) keeping max event_id so tie behavior is deterministic
    on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    # "keep max event_id per (user, ts)" is a plain aggregate, not a
    # row_number window: the hash groupBy combines map-side and never
    # sorts, where the window form paid an exchange + per-partition
    # sort on a key nothing else reuses
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("kind"),
            F.struct(F.col("ts").alias("cts"), F.col("event_id").alias("cid")).alias("c"),
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("struct<cts:timestamp_ntz,cid:bigint>").alias("c"),
        F.col("event_id").alias("purchase_id"),
    )
    # kind orders clicks before purchases at equal ts => "at-or-before"
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click", F.last("c", ignorenulls=True).over(w)
    )
    return (
        merged.filter((F.col("kind") == 1) & F.col("last_click").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.col("last_click.cid").alias("click_id"),
            (epoch_us("ts") - epoch_us("last_click.cts")).alias("gap_us"),
        )
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------------------
# Session windows (batch gaps-and-islands). 30-minute inactivity gap.
# ---------------------------------------------------------------------------

_GAP_US = 30 * 60 * 1_000_000


@register(
    "session_windows",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                    OVER (PARTITION BY user_id ORDER BY ts) > {_GAP_US}
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS INT) AS session_id,
           count(*) AS n_events,
           epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0, 2)
             AS total_value
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize per user on a 30-min gap: lag -> flag -> running sum
    -> groupBy. One shuffle on user_id; every window reuses it."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = epoch_us(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = ev.select("user_id", "ts", "value").withColumn(
        "is_new", F.when(gap.isNull() | (gap > _GAP_US), 1).otherwise(0)
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(run))
    return (
        sessions.groupBy("user_id", F.col("session_id").cast("int").alias("session_id"))
        .agg(
            F.count("*").alias("n_events"),
            epoch_us(F.min("ts")).alias("start_us"),
            epoch_us(F.max("ts")).alias("end_us"),
            rounded(F.sum(fixed_units(F.col("value"))) / 100.0, 2).alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# Rollup: subtotal hierarchy (year, priority) in one Expand pass.
# ---------------------------------------------------------------------------


@register(
    "rollup_revenue",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderpriority AS priority,
           count(*) AS n_orders,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS revenue
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
    ORDER BY yr NULLS FIRST, priority NULLS FIRST
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            rounded(F.sum(fixed_units(F.col("o_totalprice"))) / 100.0, 2).alias("revenue"),
        )
        .orderBy(F.col("yr").asc_nulls_first(), F.col("priority").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Salted skew join: identical result to the plain join, even key
# distribution by construction. The oracle IS the plain join.
# ---------------------------------------------------------------------------

_SALT = 16
_HOT_THRESHOLD = 5  # keys with >= this many fact rows get salted


@register(
    "salted_skew_join",
    oracle="""
    SELECT o.o_orderpriority AS priority, count(*) AS n_items,
           round(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY priority
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-salt skew join: detect keys above a frequency
    threshold, then run ONE join on (key, salt) where cold keys carry
    salt 0 on both sides and hot keys spread across _SALT salts (fact
    side by row hash, dim side exploded x _SALT).

    Salting everything would replicate the entire dim side x _SALT --
    fine at toy scale, catastrophic at 100 TB. The production recipe
    salts only the hot set (tiny by definition, so it broadcasts into
    the membership probe) and the replication cost is bounded by
    |hot| x _SALT. Fusing hot and cold into one conditional-salt join
    (rather than semi/anti splitting into two joins) scans each input
    once and shuffles once -- the earlier two-join form cost 2x scans
    and an extra union. This is the manual fallback for when AQE's
    skew split can't apply (skewed side under an aggregation);
    correctness is gated on the UNSALTED plain-join oracle, which is
    the entire point.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")

    hot = (
        li.groupBy("l_orderkey")
        .count()
        .filter(F.col("count") >= _HOT_THRESHOLD)
        .select(F.col("l_orderkey").alias("hot_key"), F.lit(True).alias("is_hot"))
    )

    li_salted = (
        li.join(F.broadcast(hot), li.l_orderkey == hot.hot_key, "left_outer")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot"),
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT)),
            ).otherwise(F.lit(0)),
        )
        .select("l_orderkey", "l_extendedprice", "salt")
    )
    all_salts = F.array(*[F.lit(i) for i in range(_SALT)])
    od_salted = (
        od.join(F.broadcast(hot), od.o_orderkey == hot.hot_key, "left_outer")
        .withColumn(
            "salt",
            F.explode(
                F.when(F.col("is_hot"), all_salts).otherwise(F.array(F.lit(0)))
            ),
        )
        .select("o_orderkey", "o_orderpriority", "salt")
    )

    return (
        li_salted.join(
            od_salted,
            (li_salted.l_orderkey == od_salted.o_orderkey)
            & (li_salted.salt == od_salted.salt),
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_items"),
            rounded(F.sum(fixed_units(F.col("l_extendedprice"))) / 100.0, 2).alias("revenue"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# AQE skew-join twin of salted_skew_join: the AUTOMATIC recipe next to
# the manual one. A synthetic hot key (30% of fact rows remapped onto
# one order key by a DuckDB-portable arithmetic rule) makes one shuffle
# partition ~14x the median; with skew-join thresholds sized for the
# test SFs, AQE's OptimizeSkewedJoin splits that partition at runtime
# -- no salt, no dim replication, same plain-join oracle.
#
# Runtime confs only apply if set at EXECUTION time, so this query
# executes eagerly inside a conf guard (result is |priorities| ~ 5
# rows, materialized via localCheckpoint) and restores every conf it
# touched; the executed plan is kept in LAST_AQE_SKEW_PLAN so
# tests/test_plan_quality.py can assert the skew split actually
# happened (isFinalPlan=true + skew=true on the join).
# ---------------------------------------------------------------------------

_AQE_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # sized so the sf0.01/sf0.1 hot partition (hundreds of KB) counts
    # as skewed; production keeps the 256MB-ish defaults
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
}

# AQE splits a skewed REDUCE partition into ranges of MAP outputs, so a
# skewed partition fed by a single mapper is unsplittable no matter how
# skewed (empirically verified: the single-row-group toy parquet scans
# as ONE map task even under a tiny maxPartitionBytes, and
# OptimizeSkewedJoin then reports "0 skewed partitions"). The fact side
# therefore round-robins across _AQE_MAPPERS tasks first -- standing in
# for the many-file scan a 100 TB table has naturally.
_AQE_MAPPERS = 16

LAST_AQE_SKEW_PLAN: str = ""


@register(
    "aqe_skew_join",
    oracle="""
    WITH hot AS (SELECT min(o_orderkey) AS hk FROM orders),
    fact AS (
      SELECT CASE WHEN (l_orderkey * 37 + l_linenumber) % 10 < 3
                  THEN (SELECT hk FROM hot) ELSE l_orderkey END AS k,
             l_extendedprice
      FROM lineitem
    )
    SELECT o.o_orderpriority AS priority, count(*) AS n_items,
           round(CAST(sum(CAST(round(f.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS revenue
    FROM fact f JOIN orders o ON f.k = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY priority
    """,
)
def aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE-split skew join, same oracle discipline as salted_skew_join
    (the unsalted plain join IS the oracle). The merge hint forces a
    sort-merge join so the skewed shuffle actually exists for AQE to
    re-plan (at these SFs orders would otherwise broadcast and there
    would be nothing to split)."""
    global LAST_AQE_SKEW_PLAN
    saved = {k: spark.conf.get(k, None) for k in _AQE_SKEW_CONFS}
    try:
        for k, v in _AQE_SKEW_CONFS.items():
            spark.conf.set(k, v)
        # plan built INSIDE the guard: file-scan partitioning reads the
        # maxPartitionBytes conf when the scan node is planned
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        )
        od = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        hot_key = od.agg(F.min("o_orderkey")).collect()[0][0]  # one scalar

        fact = li.select(
            F.when(
                (F.col("l_orderkey") * 37 + F.col("l_linenumber")) % 10 < 3,
                F.lit(hot_key).cast("long"),
            )
            .otherwise(F.col("l_orderkey"))
            .cast("long")
            .alias("k"),
            "l_extendedprice",
        ).repartition(_AQE_MAPPERS)

        plan = (
            fact.join(od.hint("merge"), fact.k == od.o_orderkey)
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.count("*").alias("n_items"),
                rounded(F.sum(fixed_units(F.col("l_extendedprice"))) / 100.0, 2).alias(
                    "revenue"
                ),
            )
        )
        result = plan.localCheckpoint()  # eager: executes under the confs
        LAST_AQE_SKEW_PLAN = plan._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return result.orderBy("priority")


# ---------------------------------------------------------------------------
# Range join via time binning: same-user events within +-5 minutes of
# each error event.
# ---------------------------------------------------------------------------

_WIN_US = 5 * 60 * 1_000_000


@register(
    "range_join_neighbors",
    oracle=f"""
    SELECT e.event_id, e.user_id, count(*) AS n_neighbors
    FROM events e JOIN events o
      ON e.user_id = o.user_id AND o.event_id <> e.event_id
     AND abs(epoch_us(e.ts) - epoch_us(o.ts)) <= {_WIN_US}
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.user_id
    ORDER BY e.event_id
    """,
)
def range_join_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|ts - ts'| <= 5 min as a HASH join: errors keep their exact time
    bin, candidates explode to the 3 neighboring bins, and the exact
    predicate re-filters. A raw range condition would plan as
    BroadcastNestedLoopJoin -- O(n^2) per user and a driver OOM at any
    real scale; binning bounds candidates to the +-1-bin neighborhood.
    """
    base = load_table(spark, sf_dir, "events")
    ev = base.select("event_id", "user_id", epoch_us("ts").alias("us"))
    errors = (
        base.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", epoch_us("ts").alias("us"))
        .withColumn("bin", (F.col("us") / _WIN_US).cast("long"))
    )
    others = ev.select(
        F.col("event_id").alias("o_id"),
        F.col("user_id").alias("o_user"),
        F.col("us").alias("o_us"),
        F.explode(
            F.array(*[(F.col("us") / _WIN_US).cast("long") + d for d in (-1, 0, 1)])
        ).alias("bin"),
    )
    return (
        errors.join(others, (errors.user_id == others.o_user) & (errors.bin == others.bin))
        .filter(
            (F.col("o_id") != F.col("event_id"))
            & (F.abs(F.col("us") - F.col("o_us")) <= _WIN_US)
        )
        .groupBy("event_id", "user_id")
        .agg(F.count("*").alias("n_neighbors"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi join: prefilter a huge fact scan against a compact
# bit-set sketch of the dim keys before the exact semi join. The
# pattern for when the interesting key set is too large to broadcast
# raw but its BLOOM FILTER is not (the sketch is O(m) regardless of
# key count): at 100 TB the prefilter drops ~96% of fact rows before
# they reach the join shuffle, for two broadcast probes that never
# shuffle the fact side. False positives are removed by the exact semi
# join that follows, so the result -- and the oracle -- is exactly the
# plain semi join; the bloom is pure plumbing, which is what makes it
# differentially testable. (Spark's AQE injects the same shape as
# InSubqueryExec/runtime bloom when statistics allow; this is the
# explicit form under the engine's control.)
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 16
_HOT_PRICE = 480000.0


@register(
    "bloom_semi_join",
    oracle=f"""
    SELECT l.l_returnflag, count(*) AS n_items,
           round(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS revenue
    FROM lineitem l
    WHERE l.l_orderkey IN
          (SELECT o_orderkey FROM orders WHERE o_totalprice > {_HOT_PRICE})
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)
def bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    hot = orders.filter(F.col("o_totalprice") > _HOT_PRICE).select("o_orderkey")

    def _bit(key, salt: int):
        return F.pmod(F.xxhash64(F.lit(salt), key), F.lit(_BLOOM_M))

    bits = (
        hot.select(_bit(F.col("o_orderkey"), 0).alias("bit"))
        .unionByName(hot.select(_bit(F.col("o_orderkey"), 1).alias("bit")))
        .distinct()
    )
    candidates = li.join(
        F.broadcast(bits), _bit(F.col("l_orderkey"), 0) == F.col("bit"), "left_semi"
    ).join(F.broadcast(bits), _bit(F.col("l_orderkey"), 1) == F.col("bit"), "left_semi")
    exact = candidates.join(hot, candidates.l_orderkey == hot.o_orderkey, "left_semi")
    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            rounded(F.sum(fixed_units(F.col("l_extendedprice"))) / 100.0, 2).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# CDC latest-state compaction: the Delta/Hudi MERGE pattern expressed
# as ONE hash aggregate. The events table is read as a changelog keyed
# by user_id, ordered by (ts, event_id); the current snapshot is the
# per-key latest change, with 'error' as the tombstone type (a key
# whose LAST change is a tombstone is absent from the snapshot).
#
# Scale: the naive form is a row_number window, which shuffles the
# ENTIRE 100 TB changelog and then sorts every key's full history.
# This form is groupBy(key).max(struct): the map-side partial
# aggregate compacts each scan partition to one row per key before
# anything moves, so the shuffle carries |keys| x |partitions| rows
# instead of the whole changelog. The struct buffer does force
# SortAggregate (HashAggregate needs primitive buffers), but those
# sorts are LOCAL to each scan partition (parallel, bounded by split
# size) and to the compacted post-shuffle rows -- the full changelog
# never moves or sorts as one unit. Struct max orders by
# (ts, event_id) exactly because those lead the struct and are unique
# per row.
# ---------------------------------------------------------------------------


@register(
    "cdc_latest_state",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id AS last_event, event_type AS last_type,
           value AS last_value, epoch_us(ts) AS last_ts_us
    FROM latest WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(
        F.max(
            F.struct(
                epoch_us(F.col("ts")).alias("ts_us"),
                F.col("event_id").alias("last_event"),
                F.col("event_type").alias("last_type"),
                F.col("value").alias("last_value"),
            )
        ).alias("s")
    )
    return (
        latest.filter(F.col("s.last_type") != "error")
        .select(
            "user_id",
            F.col("s.last_event").alias("last_event"),
            F.col("s.last_type").alias("last_type"),
            F.col("s.last_value").alias("last_value"),
            F.col("s.ts_us").alias("last_ts_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# W5: time-RANGE window frame -- "sum of this user's activity in the
# trailing hour", a frame defined by event-TIME distance, not row
# count (w2's ROWS frame is its row-count sibling). Both engines order
# by integer epoch microseconds so the frame boundary arithmetic is
# exact and identical; the summed value is fixed-point cents so
# in-frame accumulation order cannot drift the hash.
#
# Scale: one shuffle on user_id + per-user sort; frame evaluation is a
# sliding two-pointer over each user's run, O(rows), state bounded by
# one hour of any single user's events. Skew ceiling is the hottest
# user's row count, same bound as every per-user window in the repo.
# ---------------------------------------------------------------------------

_HOUR_US = 3_600_000_000


@register(
    "w5_range_frame",
    oracle=f"""
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CAST(count(*) OVER w AS BIGINT) AS n_events_1h,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
                 / 100.0, 2) AS value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts_us, event_id
    """,
)
def w5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us(F.col("ts")))
        .rangeBetween(-_HOUR_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        epoch_us(F.col("ts")).alias("ts_us"),
        F.count("*").over(w).alias("n_events_1h"),
        rounded(F.sum(fixed_units(F.col("value"))).over(w) / 100.0, 2).alias(
            "value_1h"
        ),
    ).orderBy("user_id", "ts_us", "event_id")


# ---------------------------------------------------------------------------
# Bucketed co-located join: both fact tables written ONCE bucketed (and
# sorted) on the join key, after which every key-equal join between
# them is exchange-free — each bucket pair joins in place. This is THE
# 100 TB recipe for a join repeated across many jobs (fact-to-fact on
# orderkey): pay the shuffle once at layout time, never at query time.
# The plan contains a SortMergeJoin with NO Exchange on either side
# (asserted in tests/test_plan_quality.py); the oracle is the plain
# unbucketed join, proving layout changes nothing about the answer.
# ---------------------------------------------------------------------------

_N_BUCKETS = 8
_BUCKETED: set[str] = set()
# scratch root per Spark application, claimed lazily on first use
# (claim wipes the dir, so claiming per bucketed_tables() call would
# delete tables the session's catalog still points at)
_BUCKET_ROOTS: dict[str, str] = {}


def _session_bucket_root(spark: SparkSession) -> str:
    from fantasy_premier_league_spark.functions.tuning import (
        claim_session_tmpdir,
    )

    app = spark.sparkContext.applicationId
    if app not in _BUCKET_ROOTS:
        _BUCKET_ROOTS[app] = claim_session_tmpdir("fpl_spark_buckets", app)
    root = _BUCKET_ROOTS[app]
    # bucket tables are written once then only READ, and reads never
    # update mtimes -- without a liveness touch, a sibling session's
    # hour-stale prune would delete a live session's tables after an
    # hour of other queries (review r9). Touch on every call.
    try:
        os.utime(root)
    except OSError:
        pass
    return root


def _bucket_tag(sf_dir: str) -> str:
    return "".join(c if c.isalnum() else "_" for c in sf_dir.rstrip("/"))


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """lineitem + orders as bucketed catalog tables (written on first
    use per sf_dir; reused — catalog metadata is what makes the
    bucketed scan exchange-free).

    The tables are EXTERNAL with an explicit scratch path: this query
    also runs under harness-owned SparkSessions whose warehouse dir may
    default to ./spark-warehouse in an arbitrary (possibly read-only)
    cwd — an explicit tempdir location makes the layout independent of
    session config."""
    import shutil

    tag = _bucket_tag(sf_dir)
    lt, ot = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    # per-session scratch (review r9): the old shared fpl_spark_buckets
    # path let a second session DROP+rmtree the tables a concurrent
    # session's bucketed scan was reading. A fresh session's in-memory
    # catalog is empty, so the shared path never saved a rebuild anyway;
    # per-application dirs cost nothing and the claim helper prunes
    # stale leftovers (sf10 study copies are ~GB).
    root = _session_bucket_root(spark)
    # rebuild when the files vanished under a live catalog entry (a
    # sibling prune that raced the liveness touch) -- reading a catalog
    # table whose parquet is gone fails mid-scan otherwise
    files_ok = os.path.isdir(os.path.join(root, lt)) and os.path.isdir(
        os.path.join(root, ot)
    )
    if tag not in _BUCKETED or not spark.catalog.tableExists(lt) or not files_ok:
        specs = [
            (lt, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"], "l_orderkey"),
            (ot, "orders", ["o_orderkey", "o_orderpriority"], "o_orderkey"),
        ]
        for tbl, src, cols, key in specs:
            path = os.path.join(root, tbl)
            # a previous session's files may survive while the
            # (in-memory) catalog entry did not — clear both or
            # saveAsTable fails with LOCATION_ALREADY_EXISTS
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(path, ignore_errors=True)
            (
                load_table(spark, sf_dir, src)
                .select(*cols)
                .write.bucketBy(_N_BUCKETS, key)
                .sortBy(key)
                .option("path", path)
                .format("parquet")
                .saveAsTable(tbl)
            )
        _BUCKETED.add(tag)
    return spark.table(lt), spark.table(ot)


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw co-located join (pre-aggregation) — exposed so the plan
    test can assert Exchange-freedom on exactly this node."""
    li, od = bucketed_tables(spark, sf_dir)
    # hint both sides to merge-join: a broadcast would also avoid the
    # exchange but would not demonstrate (or test) bucket co-location,
    # and at 100 TB neither fact side is broadcastable anyway.
    return li.hint("merge").join(
        od.hint("merge"), li.l_orderkey == od.o_orderkey
    )


@register(
    "bucketed_colocated_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                 AS BIGINT) / 10000.0, 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev_u = fixed_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
    return (
        bucketed_join(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            rounded(F.sum(rev_u) / 10_000.0, 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Fuzzy string search (approximate string join): probe part names
# matched against the part dimension by character-trigram Jaccard --
# the pg_trgm / fuzzy-join capability class. Candidates meet on a
# shared-trigram inverted-index equality join (never an all-pairs
# cross of probes x parts); the exact Jaccard re-check runs on
# candidates only, and top-3-per-probe is a rank<=k filter
# (map-side WindowGroupLimit). A self-match rides along as rank 1,
# pinning the metric's reflexivity in the gate. At 100 TB the hot-
# trigram cap is the same df-cap lever as dedup_ngram_jaccard's
# shingle posting lists.
# ---------------------------------------------------------------------------


@register(
    "fuzzy_name_search",
    oracle="""
    WITH tg AS (
      SELECT p_partkey, p_name,
             list_distinct([substr(lower(p_name), i, 3)
                            for i in generate_series(1, length(p_name) - 2)]) AS t
      FROM part
    ),
    probes AS (
      -- perturbed probe: first two chars corrupted, so the match is
      -- genuinely approximate (never an exact-string equality hit)
      SELECT p_partkey AS probe_key,
             'xx' || substr(lower(p_name), 3) AS probe_name,
             list_distinct([substr('xx' || substr(lower(p_name), 3), i, 3)
                            for i in generate_series(1, length(p_name) - 2)]) AS pt
      FROM part WHERE p_partkey <= 5
    ),
    cand AS (
      SELECT DISTINCT pr.probe_key, x.p_partkey
      FROM (SELECT probe_key, unnest(pt) AS g FROM probes) pr
      JOIN (SELECT p_partkey, unnest(t) AS g FROM tg) x USING (g)
    ),
    scored AS (
      SELECT c.probe_key, pr.probe_name, c.p_partkey AS match_key,
             tg.p_name AS match_name,
             round(CAST(len(list_intersect(pr.pt, tg.t)) AS DOUBLE)
                   / (len(pr.pt) + len(tg.t) - len(list_intersect(pr.pt, tg.t)))
                   * 1000000) / 1000000 AS trigram_jaccard
      FROM cand c
      JOIN probes pr ON pr.probe_key = c.probe_key
      JOIN tg ON tg.p_partkey = c.p_partkey
    )
    SELECT probe_key, probe_name, match_key, match_name, trigram_jaccard,
           CAST(row_number() OVER (PARTITION BY probe_key
                ORDER BY trigram_jaccard DESC, match_key) AS BIGINT) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY probe_key
            ORDER BY trigram_jaccard DESC, match_key) <= 3
    ORDER BY probe_key, rank
    """,
)
def fuzzy_name_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # substring with a lambda-var start needs the SQL form (the Python
    # F.substring binding takes int positions only)
    tg = part.select(
        "p_partkey",
        "p_name",
        F.array_distinct(
            F.expr(
                "transform(sequence(1, length(p_name) - 2),"
                " i -> substring(lower(p_name), i, 3))"
            )
        ).alias("t"),
    )
    probes = part.filter(F.col("p_partkey") <= 5).select(
        F.col("p_partkey").alias("probe_key"),
        F.concat(F.lit("xx"), F.expr("substr(lower(p_name), 3)")).alias("probe_name"),
        F.array_distinct(
            F.expr(
                "transform(sequence(1, length(p_name) - 2),"
                " i -> substring('xx' || substr(lower(p_name), 3), i, 3))"
            )
        ).alias("pt"),
    )
    cand = (
        probes.select("probe_key", F.explode("pt").alias("g"))
        .join(tg.select("p_partkey", F.explode("t").alias("g")), "g")
        .select("probe_key", "p_partkey")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(probes), "probe_key")
        .join(tg.select(F.col("p_partkey"), F.col("p_name").alias("match_name"), F.col("t")), "p_partkey")
        .withColumn("inter", F.size(F.array_intersect("pt", "t")))
        .select(
            "probe_key",
            "probe_name",
            F.col("p_partkey").alias("match_key"),
            "match_name",
            rounded(
                F.col("inter").cast("double")
                / (F.size("pt") + F.size("t") - F.col("inter")),
                6,
            ).alias("trigram_jaccard"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("probe_key").orderBy(
            F.col("trigram_jaccard").desc(), "match_key"
        )
    )
    return (
        scored.withColumn("rank", rn)
        .filter(F.col("rank") <= 3)
        .select(
            "probe_key",
            "probe_name",
            "match_key",
            "match_name",
            "trigram_jaccard",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("probe_key", "rank")
    )


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto-optimal set): parts no other part dominates with
# cheaper-or-equal price AND bigger-or-equal size (at least one strict).
# The textbook definition is a quadratic NOT EXISTS self-join -- that IS
# the DuckDB oracle, so the differential gate proves the scalable
# formulation below equals the brute-force spec.
#
# Scalable form (one shuffle): the classic sort-sweep. Distinct
# (price, size) points sorted by price asc, size desc are on the
# skyline iff size exceeds the running max size of every strictly
# preceding point. The running max is computed HIERARCHICALLY, the same
# recipe as docs_pack_sequences / orders_revenue_concentration: a
# per-price-band window (partitioned, parallel) plus a |bands|-row
# band-boundary table whose cumulative max broadcasts back -- no global
# single-task window over the data ever exists, so the sweep survives
# 100 TB (bands are ~100 rows regardless of corpus size).
# ---------------------------------------------------------------------------


@register(
    "part_skyline",
    oracle="""
    WITH pts AS (
      SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
             p_size AS size,
             CAST(min(p_partkey) AS BIGINT) AS rep_partkey,
             count(*) AS n_parts
      FROM part GROUP BY 1, 2
    )
    SELECT price_cents, size, rep_partkey, n_parts FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.price_cents <= a.price_cents AND b.size >= a.size
        AND (b.price_cents < a.price_cents OR b.size > a.size)
    )
    ORDER BY price_cents
    """,
)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = (
        load_table(spark, sf_dir, "part")
        .groupBy(
            F.round(F.col("p_retailprice") * 100)
            .cast("long")
            .alias("price_cents"),
            F.col("p_size").alias("size"),
        )
        .agg(
            F.min("p_partkey").alias("rep_partkey"),
            F.count("*").alias("n_parts"),
        )
        .withColumn("band", (F.col("price_cents") / 1000).cast("long"))
    )
    w_in = (
        Window.partitionBy("band")
        .orderBy(F.col("price_cents").asc(), F.col("size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    in_band = pts.withColumn("maxprev_band", F.max("size").over(w_in))
    # |bands|-row boundary table (~100 rows at any corpus size: one row
    # per $10 price band); its cumulative max over STRICTLY earlier
    # bands is the only unpartitioned window and broadcasts back.
    w_bands = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    boundaries = (
        pts.groupBy("band")
        .agg(F.max("size").alias("bmax"))
        .withColumn("prior_max", F.max("bmax").over(w_bands))
        .select("band", "prior_max")
    )
    prev_max = F.greatest(
        F.coalesce(F.col("maxprev_band"), F.lit(-1)),
        F.coalesce(F.col("prior_max"), F.lit(-1)),
    )
    return (
        in_band.join(F.broadcast(boundaries), "band")
        .filter(F.col("size") > prev_max)
        .select("price_cents", "size", "rep_partkey", "n_parts")
        .orderBy("price_cents")
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) layout clustering: THE data-layout lever for
# multi-dimensional scan pruning at 100 TB. Interleaving the bits of
# two dimensions gives a 1-D sort key whose contiguous ranges are small
# RECTANGLES in (size, price) space; files written in z-order therefore
# carry tight per-file min/max footers on BOTH dimensions, and a scan
# filtered on either dimension prunes most files. (A production write
# is `repartitionByRange(z).sortWithinPartitions(z)` before the parquet
# sink; Delta OPTIMIZE ZORDER BY is this exact recipe.)
#
# The query quantifies the win, differentially gated: bucket parts by
# (a) z-value ranges and (b) arrival order (p_partkey ranges -- the
# layout you get for free), and emit each bucket's bounding rectangle.
# Z-order buckets cover a fraction of the value space; arrival buckets
# span nearly all of it (footer min/max prunes nothing). All pure
# column expressions, one shuffle (the bucket agg).
# ---------------------------------------------------------------------------

_Z_BITS = 10  # y = price decigrid 0..999 needs 10; x = size 1..50 needs 6

_Z_TERMS_SQL = " + ".join(
    f"(((x >> {i}) & 1) * {1 << (2 * i + 1)}) + (((y >> {i}) & 1) * {1 << (2 * i)})"
    for i in range(_Z_BITS)
)


def _morton(x, y):
    z = F.lit(0)
    for i in range(_Z_BITS):
        z = (
            z
            + F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
            + F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
    return z


@register(
    "zorder_layout_buckets",
    oracle=f"""
    WITH xy AS (
      SELECT p_partkey, p_size AS x,
             CAST(round((p_retailprice - 900.0) * 10) AS INTEGER) AS y
      FROM part
    ),
    coded AS (
      SELECT p_partkey, x, y, {_Z_TERMS_SQL} AS z FROM xy
    ),
    both_layouts AS (
      SELECT 'zorder' AS layout, z >> 15 AS bucket, x, y FROM coded
      UNION ALL
      SELECT 'arrival', p_partkey >> 6, x, y FROM coded
    )
    SELECT layout, CAST(bucket AS BIGINT) AS bucket, count(*) AS n_rows,
           min(x) AS min_size, max(x) AS max_size,
           CAST(min(y) AS BIGINT) AS min_pu, CAST(max(y) AS BIGINT) AS max_pu,
           CAST((max(x) - min(x) + 1) AS BIGINT) * (max(y) - min(y) + 1)
             AS rect_area
    FROM both_layouts
    GROUP BY 1, 2 ORDER BY layout, bucket
    """,
)
def zorder_layout_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    xy = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").alias("x"),
        F.round((F.col("p_retailprice") - 900.0) * 10).cast("int").alias("y"),
    )
    coded = xy.withColumn("z", _morton(F.col("x"), F.col("y")))
    zorder = coded.select(
        F.lit("zorder").alias("layout"),
        F.shiftright(F.col("z"), 15).cast("long").alias("bucket"),
        "x",
        "y",
    )
    arrival = coded.select(
        F.lit("arrival").alias("layout"),
        F.shiftright(F.col("p_partkey"), 6).cast("long").alias("bucket"),
        "x",
        "y",
    )
    return (
        zorder.unionByName(arrival)
        .groupBy("layout", "bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("x").alias("min_size"),
            F.max("x").alias("max_size"),
            F.min("y").cast("long").alias("min_pu"),
            F.max("y").cast("long").alias("max_pu"),
            (
                (F.max("x") - F.min("x") + 1).cast("long")
                * (F.max("y") - F.min("y") + 1)
            ).alias("rect_area"),
        )
        .orderBy("layout", "bucket")
    )
