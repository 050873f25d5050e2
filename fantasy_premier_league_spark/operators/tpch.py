"""TPC-H-shaped relational suite over the synthetic star schema.

The reference app (a fixed-pipeline DStream job, SURVEY.md section 2.3:
"all joins are per-micro-batch equi hash joins on playerId") has no
general relational surface; a user replacing it with this engine gets
one. These queries pin the full shape vocabulary a warehouse workload
needs -- semi/anti joins from EXISTS/NOT EXISTS, 6-way star joins,
disjunctive predicate pushdown, scalar subqueries, HAVING-subquery
fan-back -- each adapted to the driver's schema (no partsupp table, no
l_commitdate/l_receiptdate: "late" is derived as l_shipdate more than
N days after o_orderdate).

Scale discipline (100 TB):
- nation/region are FIXED-cardinality dims (25/5 rows at any scale
  factor) -> always F.broadcast;
- customer/supplier/part GROW with the scale factor -> never hinted;
  AQE picks broadcast at small SF and shuffle-hash/sort-merge at large;
- every money aggregate sums exact fixed-point integer units (see
  functions.fixed_units) so results are order-independent and
  bit-identical to the DuckDB oracle;
- top-k always orderBy().limit() -> TakeOrderedAndProject, never a
  global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fantasy_premier_league_spark.functions import fixed_units, rounded
from fantasy_premier_league_spark.plans.registry import register
from fantasy_premier_league_spark.sources.testdata import load_table

# revenue = sum(l_extendedprice * (1 - l_discount)) in 1e-4 fixed units
_REV_UNITS_SQL = (
    "sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))"
)


def _rev_units() -> Column:
    return F.sum(
        fixed_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
    )


def _ts(lit: str) -> Column:
    return F.lit(lit).cast("timestamp")


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS -> left-semi join with a non-equi conjunct.
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (lineitem never duplicates orders, so
    no post-join distinct is needed); the date window is a pushed scan
    filter and the semi join shuffles only the 3-month order slice."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        orders.join(li, (F.col("o_orderkey") == F.col("l_orderkey")) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q5 shape: 6-way star join with a cross-dimension equality
# (customer and supplier in the same nation).
# ---------------------------------------------------------------------------


@register(
    "q5_regional_revenue",
    oracle=f"""
    SELECT n_name, round({_REV_UNITS_SQL} / 10000.0, 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join order: facts first (lineitem><orders><customer shuffle on
    their keys), then supplier (carries the c_nationkey = s_nationkey
    cross-filter), then the fixed dims broadcast. nation/region never
    shuffle anything."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(rounded(_rev_units() / 10_000.0, 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# Q6 shape: pure scan aggregate behind three pushed range predicates.
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))
                 / 10000.0, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every predicate is a plain range on a scan column -> all three
    reach the parquet reader as PushedFilters; the agg is a single
    map-side-combined reduction (no groupBy key at all)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            rounded(
                F.sum(fixed_units(F.col("l_extendedprice") * F.col("l_discount"), 10_000))
                / 10_000.0,
                2,
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q7 shape: bidirectional nation-pair volume with a disjunctive
# cross-dimension predicate and a year rollup.
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation,
           CAST(l_year AS INTEGER) AS l_year,
           round({_REV_UNITS_SQL} / 10000.0, 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice, l_discount
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two nation legs broadcast (fixed 25 rows); the disjunctive
    pair predicate runs after both, on already-joined rows. supplier
    and customer join unhinted (they scale with SF)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(rounded(_rev_units() / 10_000.0, 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape: market share -- conditional-sum / total-sum ratio per year.
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle="""
    SELECT CAST(o_year AS INTEGER) AS o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                      AS DOUBLE) / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS volume,
             n2.n_name AS nation
      FROM lineitem, orders, customer, nation n1, region, supplier, nation n2
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'EUROPE'
        AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numerator and denominator are both exact integer-unit sums, so
    the share is one double division -- deterministic across engines
    and summation orders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select("n_nationkey", "n_regionkey")
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = fixed_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            rounded(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0))
                .cast("double")
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item top-k -- wide group-by keys + TakeOrdered.
# ---------------------------------------------------------------------------


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, round({_REV_UNITS_SQL} / 10000.0, 2) AS revenue, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rounded(_rev_units() / 10_000.0, 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 shape: late-shipment buckets with priority conditional counts
# (l_shipmode / commitdate don't exist here; lateness is derived).
# ---------------------------------------------------------------------------


@register(
    "q12_late_shipments",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1 ORDER BY 1
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "LATE"
    ).otherwise("ONTIME")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


# ---------------------------------------------------------------------------
# Q14 shape: promo-revenue percentage (conditional / total ratio after a
# fact><part join; part scales with SF -> unhinted).
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN units ELSE 0 END)
                          AS DOUBLE) / sum(units), 6) AS promo_revenue
    FROM (
      SELECT CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS units,
             p_type
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    )
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part")
    units = fixed_units(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(units.alias("units"), "p_type")
        .agg(
            rounded(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", F.col("units")).otherwise(0))
                .cast("double")
                / F.sum("units"),
                6,
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape: scalar-subquery max -- top supplier(s) by 3-month revenue.
# ---------------------------------------------------------------------------

_Q15_REV = """
      SELECT l_suppkey AS supplier_no,
             {units} AS total_units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
""".format(units=_REV_UNITS_SQL)


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS ({_Q15_REV})
    SELECT s_suppkey, s_name, round(total_units / 10000.0, 2) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_units = (SELECT max(total_units) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The max-revenue scalar lands as a 1-row broadcast EQUALITY join
    (not a nested loop), and the tie comparison runs on exact integer
    units so cross-engine float drift cannot change the winner set."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _rev_units().alias("total_units")
    )
    best = rev.agg(F.max("total_units").alias("best_units"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), F.col("total_units") == F.col("best_units"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            rounded(F.col("total_units") / 10_000.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q18 shape: HAVING-subquery fan-back -- large-quantity orders rejoined
# to their customers.
# ---------------------------------------------------------------------------


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS STRING) AS o_orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING pre-aggregation keys by l_orderkey -- the same key as
    the rejoin, so both lineitem passes hash-partition identically and
    the semi join needs no extra repartition of its probe side. (The
    two exchanges do NOT physically merge: column pruning gives each
    pass a different payload, which Catalyst prefers over reuse --
    verified against the executed adaptive plan.) Only qualifying
    orderkeys (a left-semi join) flow into the wide join."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_u = fixed_units(F.col("l_quantity"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_u).alias("qty_units"))
        .filter(F.col("qty_units") > 30_000)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
                F.col("l_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(rounded(F.sum(qty_u) / 100.0, 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            # STRING: timestamps fetch as datetime64[ns] (Spark) vs
            # [us] (DuckDB) on the pandas path (r12 preflight)
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            rounded(F.col("o_totalprice"), 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive bracket predicate over a fact><part join.
# ---------------------------------------------------------------------------


@register(
    "q19_bracket_revenue",
    oracle=f"""
    SELECT round({_REV_UNITS_SQL} / 10000.0, 2) AS revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey AND (
         (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
          AND l_quantity BETWEEN 1 AND 11)
      OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 10
          AND l_quantity BETWEEN 10 AND 20)
      OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The disjunction splits into per-side conjuncts Catalyst can push:
    brand/size brackets reach the part scan, quantity brackets the
    lineitem scan (CNF conversion), before the join runs."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def bracket(brand: str, size_hi: int, q_lo: int, q_hi: int) -> Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    cond = (
        bracket("Brand#11", 5, 1, 11)
        | bracket("Brand#14", 10, 10, 20)
        | bracket("Brand#17", 15, 20, 30)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(rounded(_rev_units() / 10_000.0, 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q21 shape: "only supplier who shipped late" -- the classic
# EXISTS / NOT-EXISTS pair, rewritten as one per-order aggregation
# (count distinct suppliers vs distinct LATE suppliers), which is the
# single-shuffle form that survives 100 TB.
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_supplier",
    oracle="""
    WITH flagged AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem, orders
      WHERE l_orderkey = o_orderkey AND o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
      FROM flagged GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM (SELECT DISTINCT f.l_orderkey, f.l_suppkey
          FROM flagged f JOIN per_order p ON f.l_orderkey = p.l_orderkey
          WHERE f.late = 1 AND p.n_supp > 1 AND p.n_late = 1) w
    JOIN supplier ON w.l_suppkey = s_suppkey
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    flagged = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("late"),
        )
    )
    per_order = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late"),
    )
    waiting = (
        flagged.filter(F.col("late") == 1)
        .join(per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)), "l_orderkey")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        waiting.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q22 shape: scalar-subquery threshold + NOT EXISTS anti join --
# well-funded customers with no recent orders.
# ---------------------------------------------------------------------------


@register(
    "q22_idle_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS numcust,
           round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS totacctbal
    FROM customer c
    WHERE CAST(round(c_acctbal * 100) AS BIGINT) > (
        SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT))
        FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left-anti join against the pushed-down recent-order
    slice; the average-balance scalar is a 1-row broadcast nested loop
    (bounded by design). Balance comparisons run on integer cents."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_cents", fixed_units(F.col("c_acctbal"))
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("bal_cents").alias("avg_cents")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01 00:00:00")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("bal_cents") > F.col("avg_cents"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            rounded(F.sum("bal_cents") / 100.0, 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Q2 shape: correlated scalar-MIN subquery + supplier->nation->region
# dim chain. No partsupp table: "supply cost" is proxied by the minimum
# extended-price units a supplier has ever shipped the part at, an
# exact integer min that both engines agree on bit-for-bit.
# ---------------------------------------------------------------------------

_Q2_COST = """
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           min(CAST(round(l_extendedprice * 10000) AS BIGINT)) AS cost_units
    FROM lineitem, supplier, nation, region
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
    GROUP BY 1, 2
"""


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH cost AS ({_Q2_COST})
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
           round(cost_units / 10000.0, 2) AS min_cost
    FROM part, cost, supplier, nation
    WHERE p_partkey = partkey AND suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND p_size = 15 AND p_type = 'STANDARD'
      AND cost_units = (SELECT min(cost_units) FROM cost c2
                        WHERE c2.partkey = cost.partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated MIN decorrelated into groupBy(partkey).min + an
    equality rejoin on (partkey, cost) -- both sides of the rejoin are
    partitioned by partkey, so at scale the shuffle is computed once
    and reused, never a per-row subquery. Fixed dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_supp = supp.join(
        F.broadcast(nation.join(F.broadcast(region),
                                F.col("n_regionkey") == F.col("r_regionkey"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"), "n_name")
    cost = (
        li.join(euro_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.min(fixed_units(F.col("l_extendedprice"), 10_000)).alias("cost_units"))
    )
    best = cost.groupBy("partkey").agg(F.min("cost_units").alias("best_units"))
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    # the decorrelated rejoin and the supplier re-enrichment are exact
    # equi-joins whose sort order nothing downstream consumes (the
    # final TakeOrdered re-sorts anyway): shuffle_hash drops the
    # SortMergeJoin sorts while keeping the same exchanges, with the
    # smaller aggregate (best: one row per partkey) as the build side
    return (
        cost.join(best.hint("shuffle_hash"), ["partkey"])
        .filter(F.col("cost_units") == F.col("best_units"))
        .join(part, F.col("partkey") == F.col("p_partkey"))
        .join(euro_supp.hint("shuffle_hash"), F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            rounded(F.col("cost_units") / 10_000.0, 2).alias("min_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 shape: profit by (supplier nation, order year) over a part-name
# slice. No ps_supplycost: per-unit cost is proxied at 10% of
# p_retailprice, kept exact by computing it in the same 1e-4 fixed
# units as revenue (retail * qty * 1000 units = 0.1 * retail * qty).
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                     - CAST(round(p_retailprice * l_quantity * 1000) AS BIGINT)) AS BIGINT)
                 / 10000.0, 2) + 0 AS profit
    FROM lineitem, orders, part, supplier, nation
    WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
      AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with the part-name filter pushed to the part scan (the
    smallest slice drives the join), profit summed as a single exact
    integer expression; nation broadcasts, facts shuffle on their keys."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit_units = fixed_units(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000
    ) - fixed_units(F.col("p_retailprice") * F.col("l_quantity"), 1_000)
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(rounded(F.sum(profit_units) / 10_000.0, 2).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 shape: group + whole-table scalar share threshold. "Inventory
# value" is proxied by revenue shipped per part by one nation's
# suppliers; a part is important if it carries more than 3x the MEAN
# part share (scalar subquery fan-in, 1-row broadcast). The threshold
# is data-relative rather than TPC-H's absolute 0.1% because the
# synthetic slice has ~14k parts with a max share of 0.04% -- an
# absolute cut returns the empty set at every scale factor and the
# differential check would be vacuous; 3x-the-mean is non-empty and
# scale-invariant by construction.
# ---------------------------------------------------------------------------

_Q11_VALUE = """
    SELECT l_partkey AS partkey,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
             AS value_units
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_7'
    GROUP BY 1
"""


@register(
    "q11_important_parts",
    oracle=f"""
    WITH v AS ({_Q11_VALUE})
    SELECT partkey, round(value_units / 10000.0, 2) AS part_value
    FROM v
    WHERE value_units > (SELECT CAST(sum(value_units) AS DOUBLE) / count(*) FROM v) * 3
    ORDER BY part_value DESC, partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mean part share is a 1-row broadcast fan-in over the SAME
    aggregated frame (computed once, reused), so the fact table is
    scanned and shuffled exactly once; the share comparison runs
    integer-vs-double identically on both engines (sum/count are exact
    integers below 2^52, so the mean double is bit-identical)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    v = (
        li.join(
            supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(_rev_units().alias("value_units"))
    )
    mean = v.agg(
        (F.sum("value_units").cast("double") / F.count(F.lit(1))).alias("mean_units")
    )
    return (
        v.crossJoin(F.broadcast(mean))
        .filter(F.col("value_units") > F.col("mean_units") * 3)
        .select("partkey", rounded(F.col("value_units") / 10_000.0, 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "partkey")
    )


# ---------------------------------------------------------------------------
# Q13 shape: outer-join distribution. Customers counted by how many
# non-urgent orders they placed, INCLUDING zero -- the left outer join
# and the two-level aggregation are the whole point of the shape.
# ---------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeps zero-order customers; the first aggregate
    keys by custkey (same key as the join: one shuffle serves both),
    the second is a tiny distribution over |distinct counts| rows."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q16 shape: NOT IN exclusion + grouped count(distinct). Suppliers per
# part attribute bucket, excluding "complaint" suppliers (proxied as
# negative account balance -- the schema has no s_comment).
# ---------------------------------------------------------------------------


@register(
    "q16_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1' AND p_type <> 'MEDIUM'
      AND p_size IN (5, 15, 25, 35, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN becomes a left-anti join against the (tiny, broadcast)
    excluded-supplier set; count(distinct) expands to a two-phase
    aggregate so the shuffle carries (bucket, suppkey) pairs, never raw
    lineitems. All part predicates push to the scan."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(5, 15, 25, 35, 45)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 shape: correlated half-sum threshold -> suppliers who shipped
# more than half of a part's 1996 volume ("excess inventory" without a
# partsupp table), surfaced through a semi join up the supplier chain.
# ---------------------------------------------------------------------------

_Q20_QTY = """
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_units
    FROM lineitem, part
    WHERE l_partkey = p_partkey AND p_name LIKE '%blue%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2
"""


@register(
    "q20_excess_suppliers",
    oracle=f"""
    WITH q AS ({_Q20_QTY})
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT suppkey FROM q
        WHERE qty_units > (SELECT sum(q2.qty_units) FROM q q2
                           WHERE q2.partkey = q.partkey) * 0.5)
    ORDER BY s_name
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated half-sum decorrelates into a per-part total
    (groupBy partkey) rejoined on the same key -- shared shuffle
    partitioning -- then collapses to a distinct supplier set that
    semi-joins the supplier dim. Integer quantity units throughout."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%"))
    q = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(fixed_units(F.col("l_quantity"))).alias("qty_units"))
    )
    totals = q.groupBy("partkey").agg(F.sum("qty_units").alias("part_total"))
    excess = (
        q.join(totals, ["partkey"])
        .filter(F.col("qty_units") > F.col("part_total") * 0.5)
        .select("suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("suppkey"), "left_semi")
        .select("s_name", rounded(F.col("s_acctbal"), 2).alias("s_acctbal"))
        .orderBy("s_name")
    )
