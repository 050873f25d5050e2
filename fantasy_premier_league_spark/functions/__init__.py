from fantasy_premier_league_spark.functions.scalars import (
    epoch_secs,
    epoch_us,
    fixed_units,
    rounded,
    safe_div,
)

__all__ = ["epoch_secs", "epoch_us", "fixed_units", "rounded", "safe_div"]
