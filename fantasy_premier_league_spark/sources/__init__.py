from fantasy_premier_league_spark.sources.testdata import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
