"""Iterative graph algorithms as DataFrame loops (north-star extension,
SURVEY 2.10; companion to the label-propagation connected components in
operators/dedup.py).

PageRank here runs over the customer--supplier trade graph implied by
the star schema (an edge per distinct (custkey, suppkey) pair appearing
on an order line, made undirected so no node is a dangling sink). The
reference has no graph tier at all; this is the "iterative algorithm on
Spark" pattern done scale-correctly:

- the edge list is built ONCE, repartitioned on src, and cached: every
  iteration's join reuses the same shuffle-free probe side;
- each iteration is join -> groupBy(dst) -> sum: one shuffle per
  iteration, partial aggregation map-side, nothing ever collects to the
  driver except the final result;
- lineage is truncated with localCheckpoint every few rounds so the
  plan does not grow linearly with iterations (the 100 TB driver-stall
  failure mode of naive iterative DataFrame code);
- the ENTIRE recurrence runs in scaled 64-bit INTEGERS (rank = units
  on a 1e-12 grid; per-edge contribution = units div outdeg; damping
  17/20 applied as integer multiply-then-divide), so the differential
  gate is summation-order independent BY CONSTRUCTION: integer sums
  commute exactly, unlike doubles, and no partition-order or
  single-thread-vs-parallel difference between Spark and DuckDB can
  flip a value. Units stay < ~2e13, far inside BIGINT.

The oracle unrolls the identical recurrence as chained CTEs (DuckDB has
recursive CTEs, but unrolling keeps the iteration count and the integer
grid textually explicit and engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fantasy_premier_league_spark.plans.registry import register
from fantasy_premier_league_spark.sources.testdata import load_table

_ITERS = 3
_GRID = 10**12  # rank units per 1.0 of probability mass
# damping d = 0.85 = _D_NUM / _D_DEN, applied as integer mul-then-div
_D_NUM = 17
_D_DEN = 20


def _oracle() -> str:
    edges = f"""
    edges AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      UNION
      SELECT DISTINCT 's' || l_suppkey AS src, 'c' || o_custkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    nodes AS (SELECT DISTINCT src AS v FROM edges),
    n AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT v, {_GRID} // (SELECT n FROM n) AS u FROM nodes)
    """
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(
            f"""
    r{i} AS (
      SELECT nodes.v,
             CAST((({_D_DEN - _D_NUM} * {_GRID} // {_D_DEN}) // (SELECT n FROM n))
                  + ({_D_NUM} * coalesce(sum(r{i - 1}.u // deg.outdeg), 0))
                    // {_D_DEN} AS BIGINT) AS u
      FROM nodes
      LEFT JOIN edges ON edges.dst = nodes.v
      LEFT JOIN deg ON deg.src = edges.src
      LEFT JOIN r{i - 1} ON r{i - 1}.v = edges.src
      GROUP BY nodes.v
    )"""
        )
    return (
        "WITH "
        + edges
        + ","
        + ",".join(steps)
        + f"""
    SELECT v AS node, CAST(u AS BIGINT) AS rank_units
    FROM r{_ITERS} ORDER BY rank_units DESC, node LIMIT 50
    """
    )


@register("graph_pagerank", oracle=_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # dedupe on the INTEGER key pair -- the distinct is the widest
    # shuffle in the query, and 16-byte (long, long) rows beat
    # concatenated strings; the typed node ids are built after, on the
    # already-deduped rows
    pairs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        )
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # ONE materialization: the degree-annotated edge list is everything
    # the iterations probe, so checkpoint it once (truncating the
    # distinct+union lineage) instead of recomputing the edges+deg
    # shuffle inside every iteration's plan.
    contrib_base = edges.join(deg, "src").repartition("src").localCheckpoint()
    # every node of the undirected graph appears as a src
    nodes = contrib_base.select(F.col("src").alias("v")).distinct()
    n = nodes.count()  # one scalar to the driver; everything else stays distributed

    base_units = ((_D_DEN - _D_NUM) * _GRID // _D_DEN) // n  # (1-d)/n on the grid

    # The rank vector is |nodes| rows -- tiny next to the edge list --
    # so each iteration BROADCASTS it into the edge scan and the only
    # shuffle is the map-side-combined groupBy(dst). At a scale where
    # the node set itself outgrows broadcast, drop the hint and the
    # pre-partitioned contrib_base turns this into a co-located join.
    ranks = nodes.select("v", F.lit(_GRID // n).cast("long").alias("u"))
    for i in range(_ITERS):
        contribs = (
            contrib_base.join(F.broadcast(ranks), contrib_base.src == ranks.v)
            # integer floor-division per edge: exact, order-independent
            .select(F.col("dst"), F.expr("u div outdeg").alias("w"))
            .groupBy("dst")
            .agg(F.sum("w").alias("mass"))
        )
        ranks = (
            nodes.join(F.broadcast(contribs), nodes.v == contribs.dst, "left_outer")
            .select("v", F.coalesce(F.col("mass"), F.lit(0)).alias("mass"))
            .select(
                "v",
                (
                    F.lit(base_units)
                    + F.expr(f"({_D_NUM} * mass) div {_D_DEN}")
                ).cast("long").alias("u"),
            )
        )
        if (i + 1) % 2 == 0 and i + 1 < _ITERS:
            ranks = ranks.localCheckpoint()  # truncate lineage growth

    return (
        ranks.select(F.col("v").alias("node"), F.col("u").alias("rank_units"))
        .orderBy(F.col("rank_units").desc(), "node")
        .limit(50)
    )
