from fantasy_premier_league_spark.functions.scalars import fixed_units, rounded, safe_div

__all__ = ["fixed_units", "rounded", "safe_div"]
