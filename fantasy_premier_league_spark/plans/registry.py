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
        textstats,
        tpch,
    )
    from fantasy_premier_league_spark.streaming import queries as streaming_queries  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(ORACLES)
