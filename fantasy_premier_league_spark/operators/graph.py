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
- ranks are FLOORED to 1e-12 grid after every iteration on both
  engines, so cross-engine double drift (summation order inside a
  partition vs DuckDB's single-threaded sum) cannot compound across
  iterations -- the same fixed-grid discipline as operators/ml.py's
  deterministic k-means.

The oracle unrolls the identical recurrence as chained CTEs (DuckDB has
recursive CTEs, but unrolling keeps the iteration count and the
flooring textually explicit and engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fantasy_premier_league_spark.functions import rounded
from fantasy_premier_league_spark.plans.registry import register
from fantasy_premier_league_spark.sources.testdata import load_table

_D = 0.85  # damping
_ITERS = 3
_GRID = 1e12  # per-iteration floor grid


def _oracle() -> str:
    edges = """
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
    r0 AS (SELECT v, 1.0 / (SELECT n FROM n) AS r FROM nodes)
    """
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(
            f"""
    r{i} AS (
      SELECT nodes.v,
             floor(((1.0 - {_D}) / (SELECT n FROM n)
                    + {_D} * coalesce(sum(r{i - 1}.r / deg.outdeg), 0.0))
                   * {_GRID:.0f}) / {_GRID:.0f} AS r
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
    SELECT v AS node, round(r * 1000000, 6) AS rank_ppm
    FROM r{_ITERS} ORDER BY rank_ppm DESC, node LIMIT 50
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

    # The rank vector is |nodes| rows -- tiny next to the edge list --
    # so each iteration BROADCASTS it into the edge scan and the only
    # shuffle is the map-side-combined groupBy(dst). At a scale where
    # the node set itself outgrows broadcast, drop the hint and the
    # pre-partitioned contrib_base turns this into a co-located join.
    ranks = nodes.select("v", (F.lit(1.0) / n).alias("r"))
    for i in range(_ITERS):
        contribs = (
            contrib_base.join(F.broadcast(ranks), contrib_base.src == ranks.v)
            .select(F.col("dst"), (F.col("r") / F.col("outdeg")).alias("w"))
            .groupBy("dst")
            .agg(F.sum("w").alias("mass"))
        )
        ranks = nodes.join(
            F.broadcast(contribs), nodes.v == contribs.dst, "left_outer"
        ).select(
            "v",
            (
                F.floor(
                    (
                        F.lit((1.0 - _D) / n)
                        + _D * F.coalesce(F.col("mass"), F.lit(0.0))
                    )
                    * _GRID
                )
                / _GRID
            ).alias("r"),
        )
        if (i + 1) % 2 == 0 and i + 1 < _ITERS:
            ranks = ranks.localCheckpoint()  # truncate lineage growth

    return (
        ranks.select(F.col("v").alias("node"), rounded(F.col("r") * 1e6, 6).alias("rank_ppm"))
        .orderBy(F.col("rank_ppm").desc(), "node")
        .limit(50)
    )
