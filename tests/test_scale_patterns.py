"""Storage-layout scale patterns: bucketed co-located joins and
partition-pruned scans.

These are the two layout tools the operator modules cite for 100 TB
(SURVEY section 4 "Partitioning / shuffle", README "Design for 100 TB")
but that no registered query can exercise, because they require WRITING
tables. Pinned here instead: a join between same-bucketed tables must
plan with ZERO shuffle exchanges, and a filter on a partition column
must prune at the directory level before any row is read.
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from fantasy_premier_league_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@pytest.fixture
def warehouse_tables(spark, tmp_path):
    yield
    for t in ("li_bucketed", "ord_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_plans_no_shuffle(spark, warehouse_tables):
    """Two tables bucketed+sorted on the join key by the same bucket
    count join with NO Exchange in the plan — the write pre-paid the
    shuffle once, every subsequent join of any two such tables reads
    co-located buckets. This is the 100 TB answer to repeated fact-fact
    joins on a stable key."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("li_bucketed")
    orders.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("ord_bucketed")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("ord_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_of(joined)
        assert re.search(r"\bExchange\b", plan) is None, (
            f"bucketed join still shuffles:\n{plan}"
        )
        assert "SortMergeJoin" in plan
        # correctness of the co-located join against the plain join
        plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partition_pruning_skips_directories(spark, tmp_path):
    """A filter on the physical partition column becomes a
    PartitionFilters entry — directories for other values are never
    listed into the scan, the I/O win that makes date/type-partitioned
    100 TB layouts queryable interactively."""
    out = str(tmp_path / "events_by_type")
    ev = load_table(spark, SF, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    df = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = plan_of(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), (
        f"partition filter not pruned at scan:\n{plan}"
    )
    # the pruned read returns exactly the slice
    assert df.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_dynamic_partition_pruning(spark, tmp_path):
    """When the partition-column filter lives on the JOIN DIM side, the
    fact scan must still prune -- Catalyst injects a dynamicpruning
    subquery that evaluates the dim filter first and feeds the surviving
    partition keys to the fact scan at runtime. Without DPP, a 100 TB
    date-partitioned fact joined to a filtered calendar dim reads every
    partition."""
    out = str(tmp_path / "events_dpp")
    ev = load_table(spark, SF, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    dim = spark.createDataFrame(
        [("purchase", 1), ("signup", 0), ("click", 0), ("view", 0), ("error", 0)],
        "etype string, is_revenue int",
    )
    fact = spark.read.parquet(out)
    joined = fact.join(
        dim.filter(F.col("is_revenue") == 1),
        fact.event_type == dim.etype,
    )
    plan = plan_of(joined)
    assert "dynamicpruning" in plan.lower(), (
        f"no dynamic partition pruning on the fact scan:\n{plan}"
    )
    assert joined.count() == ev.filter(F.col("event_type") == "purchase").count()
