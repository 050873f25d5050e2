"""SQL front-end surface: the engine's tables exposed as temp views and
queried with ONE dialect-common ANSI-SQL string that is ALSO the DuckDB
oracle, verbatim.

Everything else in the repo declares plans through the DataFrame API;
this module pins the complementary entry point (SURVEY section 4: "If
we later add a SQL front-end ... they compile to the same plans"). The
same text parsing through two independent engines and hash-matching is
the strongest form of the differential gate -- there is no translation
step left to hide a semantic difference in.

Scale: identical to the DataFrame tier -- Catalyst sees the same
logical plan it would get from the fluent API (joins broadcast/shuffle
by size, the window ranks per nation after a one-shuffle aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fantasy_premier_league_spark.plans.registry import register
from fantasy_premier_league_spark.sources.testdata import load_table

# one string, two engines: keep to the common dialect (date_trunc, rank,
# CAST, round) and exact fixed-point revenue units. Dialect traps: a
# literal like 100.0 parses as DECIMAL in Spark SQL but DOUBLE in
# DuckDB -- scientific notation (1e2) is a double literal in both; and
# round(x, 2) half-boundary behavior DIFFERS between engines (Spark
# rounds the shortest decimal repr half-up, DuckDB rounds the scaled
# double), so the final revenue uses the scaled form
# round(units / 1e2) / 100 -- at scale 0 the only half-way doubles are
# exact k+0.5 where both engines round away from zero, making the
# shared string bit-stable (see functions/scalars.py rounded()).
_TOPDAY_SQL = """
    WITH rev AS (
      SELECT n_name,
             CAST(date_trunc('DAY', o_orderdate) AS DATE) AS day,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
               AS units
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, CAST(date_trunc('DAY', o_orderdate) AS DATE)
    ),
    ranked AS (
      SELECT n_name, day, units,
             rank() OVER (PARTITION BY n_name ORDER BY units DESC, day) AS rk
      FROM rev
    )
    SELECT n_name AS nation, CAST(day AS STRING) AS day,
           round(units / 1e2) / 100 AS revenue
    FROM ranked WHERE rk = 1 ORDER BY nation
"""
# ^ day CAST to STRING for pandas-path byte-identity (r12 preflight;
# same normalization as _RUNNING_SQL below).


@register("sql_frontend_topday", oracle=_TOPDAY_SQL)
def sql_frontend_topday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best revenue day per nation, through spark.sql on temp views --
    the oracle is the IDENTICAL string DuckDB runs."""
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TOPDAY_SQL)


# ---------------------------------------------------------------------------
# Two more shared-dialect strings, chosen to cover the surfaces a user
# switching from the DataFrame tier would reach for first: a correlated
# EXISTS + anti pattern, and a windowed running total over a CTE.
# Same discipline as _TOPDAY_SQL: common-dialect functions only, fixed-
# point units for money, scaled rounding, explicit CASTs at engine
# type-divergence points (sum(int) is HUGEINT in DuckDB, LONG in
# Spark).
# ---------------------------------------------------------------------------

_REPEAT_BUYERS_SQL = """
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_repeat_buyers
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      )
    GROUP BY c_mktsegment ORDER BY segment
"""


@register("sql_frontend_repeat_buyers", oracle=_REPEAT_BUYERS_SQL)
def sql_frontend_repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS/NOT EXISTS through spark.sql; Catalyst plans
    them as left-semi + left-anti joins -- the same physical shapes the
    DataFrame tier's j7 pins."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_REPEAT_BUYERS_SQL)


_RUNNING_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('DAY', o_orderdate) AS DATE) AS day,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS units,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
      GROUP BY CAST(date_trunc('DAY', o_orderdate) AS DATE)
    )
    SELECT CAST(day AS STRING) AS day, n_orders,
           round(CAST(sum(units) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE))
                 / 100 AS running_revenue
    FROM daily ORDER BY day LIMIT 100
"""
# ^ day is CAST to STRING at output (both engines render ISO
# yyyy-MM-dd) so the driver's pandas fetch path sees byte-identical
# object columns -- Spark DATE fetches as object(datetime.date) but
# DuckDB DATE as datetime64[us] (r12 strict-preflight normalization,
# VERDICT r11 #3). The window still orders by the DATE column.


@register("sql_frontend_running_total", oracle=_RUNNING_SQL)
def sql_frontend_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + running-total window through spark.sql; the window runs
    over the |days| pre-aggregate, never the order rows."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RUNNING_SQL)


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE, SPARK-24497): a month spine
# generated by the recursion itself, left-joined to the 1995 order
# aggregate so empty months surface as explicit zero rows in the
# running total -- the date-spine idiom that needs recursion (or a
# generator function) because no base table contains the missing rows.
#
# Dialect notes: both engines accept `day + INTERVAL 1 MONTH` and
# terminate UNION ALL recursion on the WHERE guard; Spark executes it
# as UnionLoopExec with one tiny job per level, so the spine is kept
# at MONTH granularity (12 levels -- well under Spark's default
# spark.sql.cteRecursionLevelLimit of 100, and each level is
# driver-cheap; a day-granularity spine would mean 365 sequential
# micro-jobs, the same per-iteration fixed cost lesson as the CC loop).
# ---------------------------------------------------------------------------

_RECURSIVE_SPINE_SQL = """
    WITH RECURSIVE bounds AS (
      SELECT CAST(min(date_trunc('MONTH', o_orderdate)) AS DATE) AS m0,
             CAST(max(date_trunc('MONTH', o_orderdate)) AS DATE) AS m1
      FROM orders
      WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
    ),
    spine(month) AS (
      SELECT m0 FROM bounds
      UNION ALL
      SELECT CAST(month + INTERVAL 1 MONTH AS DATE) FROM spine
      WHERE month < (SELECT m1 FROM bounds)
    ),
    monthly AS (
      SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS month,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS units
      FROM orders
      WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
      GROUP BY CAST(date_trunc('MONTH', o_orderdate) AS DATE)
    )
    SELECT CAST(s.month AS STRING) AS month, coalesce(m.n_orders, 0) AS n_orders,
           round(CAST(sum(coalesce(m.units, 0)) OVER (ORDER BY s.month
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE))
                 / 100 AS running_revenue
    FROM spine s LEFT JOIN monthly m ON m.month = s.month
    ORDER BY s.month
"""
# ^ month CAST to STRING at output for pandas-path byte-identity
# (same normalization as _RUNNING_SQL above); recursion and the
# window still run on the DATE column.


@register("sql_frontend_recursive_spine", oracle=_RECURSIVE_SPINE_SQL)
def sql_frontend_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month spine through spark.sql; the |months|-row
    window runs over the recursion output, never the order rows."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SPINE_SQL)


# ---------------------------------------------------------------------------
# LATERAL correlated subquery (SPARK-34382): per-nation top-2 customers
# by balance, the "top-N per group as a join" formulation. Catalyst
# decorrelates the LATERAL into a ranked window under the hood -- the
# same WindowGroupLimit-able shape as the explicit w1/w7 queries, but
# stated in the dialect both engines parse verbatim. Balance is a
# pass-through 2-dp column (no arithmetic), so no rounding is needed.
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT n_name, t.c_name, t.c_acctbal
    FROM nation,
    LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
    ORDER BY n_name, t.c_acctbal DESC, t.c_name
"""


@register("sql_frontend_lateral_topn", oracle=_LATERAL_SQL)
def sql_frontend_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL top-N-per-group through spark.sql; one identical string
    on both engines."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# TPC-H shapes through the SQL front-end (r9 verdict, Next #7): the
# DataFrame tier pins q2-q22 against rewritten oracles; these gate the
# SQL surface itself on the CLASSIC correlated forms -- Catalyst's
# subquery decorrelation (EXISTS -> left semi, NOT EXISTS -> left
# anti, correlated scalar agg -> aggregate + join) runs on the exact
# text DuckDB also executes, so a rewrite bug in either engine's
# decorrelator breaks the hash. Money stays in fixed-point BIGINT
# units (no decimal-vs-double literal divergence: 0.2*avg is
# double on both engines, see q17 notes in analytics.py).
# ---------------------------------------------------------------------------

_Q4_EXISTS_SQL = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@register("sql_frontend_q4_exists", oracle=_Q4_EXISTS_SQL)
def sql_frontend_q4_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4's correlated EXISTS through spark.sql: Catalyst must
    decorrelate the non-equi date predicate into the semi-join
    condition itself."""
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q4_EXISTS_SQL)


_Q17_CORRELATED_SQL = """
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_units
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


@register("sql_frontend_q17_correlated", oracle=_Q17_CORRELATED_SQL)
def sql_frontend_q17_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17's correlated scalar aggregate subquery through
    spark.sql (the DataFrame twin q17_small_quantity_revenue hand-
    decorrelates it; here Catalyst's rewrite is what's under test)."""
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q17_CORRELATED_SQL)


_Q21_MULTI_EXISTS_SQL = """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
"""


@register("sql_frontend_q21_multi_exists", oracle=_Q21_MULTI_EXISTS_SQL)
def sql_frontend_q21_multi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21's classic EXISTS + NOT EXISTS stack through
    spark.sql: one semi and one anti join against the same fact
    table, both with non-equi correlated predicates (the l3 branch
    re-joins orders so correlation stays single-level -- the form
    both engines' decorrelators accept)."""
    for t in ("supplier", "lineitem", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q21_MULTI_EXISTS_SQL)


_Q20_NESTED_IN_SQL = """
    WITH q AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_units
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND p_name LIKE '%blue%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    )
    SELECT s_name, round(s_acctbal * 1e2) / 100 AS s_acctbal
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT suppkey FROM q
        WHERE qty_units > (SELECT sum(q2.qty_units) FROM q q2
                           WHERE q2.partkey = q.partkey) * 0.5)
    ORDER BY s_name
"""


@register("sql_frontend_q20_nested_in", oracle=_Q20_NESTED_IN_SQL)
def sql_frontend_q20_nested_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20's nested IN containing its own correlated scalar
    aggregate subquery, through spark.sql (the DataFrame twin
    q20_excess_suppliers hand-decorrelates the half-sum into a
    groupBy+rejoin; here Catalyst must do both rewrites itself:
    IN -> semi join, correlated sum -> aggregate + join). s_acctbal
    uses the scaled round form (round(x*1e2)/100) -- plain round(x,2)
    is the documented cross-engine half-boundary trap."""
    for t in ("lineitem", "part", "supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q20_NESTED_IN_SQL)
