"""Runtime tuning helpers shared by the iterative operators."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

# one reducer per this many rows keeps loop-shuffle tasks meaningfully
# sized; below it, task-launch overhead dominates the round
_ROWS_PER_PARTITION = 100_000
_MIN_PARTITIONS = 4


@contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str):
    """Set a SQL conf for a code block, restoring the previous value."""
    old = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, old)


@contextmanager
def sized_loop_partitions(spark: SparkSession, n_rows: int):
    """Scope ``spark.sql.shuffle.partitions`` to the working-set size
    for an iterative loop.

    Iterative operators (CC pointer jumping, PageRank) run several
    shuffles PER ROUND over a working set that is usually far smaller
    than the session default anticipates; at sf0.1 the default 32
    reducers do ~1 ms of work each, so scheduling dominates (measured
    8.2 s -> 4.8 s for CC at 4 reducers). Sizing reducers to
    rows/100k — never below 4, never above the session setting, which
    is what a 100 TB working set gets — removes the fixed cost without
    capping real scale. AQE coalescing does the same for single
    queries, but per-round micro-jobs pay plan/launch overhead AQE
    cannot remove."""
    session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(_MIN_PARTITIONS, min(session_parts, (n_rows // _ROWS_PER_PARTITION) + 1))
    with scoped_conf(spark, "spark.sql.shuffle.partitions", str(parts)):
        yield parts
