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
    SELECT n_name AS nation, day, round(units / 1e2) / 100 AS revenue
    FROM ranked WHERE rk = 1 ORDER BY nation
"""


@register("sql_frontend_topday", oracle=_TOPDAY_SQL)
def sql_frontend_topday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best revenue day per nation, through spark.sql on temp views --
    the oracle is the IDENTICAL string DuckDB runs."""
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_TOPDAY_SQL)
