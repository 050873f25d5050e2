from fantasy_premier_league_spark.plans.registry import (
    ORACLES,
    QUERIES,
    all_oracles,
    all_queries,
    register,
)

__all__ = ["ORACLES", "QUERIES", "all_oracles", "all_queries", "register"]
