"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API):
an events-changelog feed exposed as ``spark.read.format("events_feed")``.

The reference's only ingest surfaces are a TCP socket and ad-hoc file
reads (SURVEY 2.1 S1-S7). A production engine additionally needs the
escape hatch for systems with no built-in connector (internal feed
services, bespoke formats); Spark 4's Python DataSource API is that
hatch, and this module demonstrates it end-to-end with the two
properties that make such a source scale:

- **partition planning**: ``partitions()`` maps the underlying parquet
  row groups 1:1 to InputPartitions, so executors read disjoint byte
  ranges in parallel (at 100 TB this is what keeps a custom source
  from serializing through one task — a real feed source would
  partition by shard/offset range the same way);
- **Arrow-batch reads**: ``read()`` yields pyarrow RecordBatches, the
  vectorized fast path (per-row Python tuples would cross the
  JVM/Python boundary once per record).

Only encoding-stable columns are exposed (event_id, user_id,
event_type, value) — timestamp canonicalization is the batch reader's
job (sources/testdata.py), not a connector concern.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_FEED_COLUMNS = ["event_id", "user_id", "event_type", "value"]


class _RowGroupPartition(InputPartition):
    def __init__(self, index: int) -> None:
        self.index = index


class _EventsFeedReader(DataSourceReader):
    def __init__(self, path: str) -> None:
        self._path = path

    def partitions(self) -> list[InputPartition]:
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self._path).metadata.num_row_groups
        return [_RowGroupPartition(i) for i in range(n)]

    def read(self, partition: _RowGroupPartition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(self._path)
        table = pf.read_row_group(partition.index, columns=_FEED_COLUMNS)
        yield from table.to_batches()


class EventsFeedDataSource(DataSource):
    """``spark.read.format("events_feed").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "events_feed"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> _EventsFeedReader:
        return _EventsFeedReader(self.options["path"])


def register_feed_source(spark) -> None:
    """Idempotent per-session registration."""
    if not getattr(spark, "_events_feed_registered", False):
        spark.dataSource.register(EventsFeedDataSource)
        spark._events_feed_registered = True


# ---------------------------------------------------------------------------
# Gate query: the feed source vs plain SQL over the same parquet —
# proving the connector returns exactly the table it wraps (S-tier
# widening; the reference's closest analog is the socket source S1,
# master.py:330).
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from fantasy_premier_league_spark.functions import fixed_units, rounded  # noqa: E402
from fantasy_premier_league_spark.plans.registry import register  # noqa: E402


@register(
    "s8_python_datasource_feed",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS total_value,
           CAST(min(event_id) AS BIGINT) AS first_event,
           CAST(max(event_id) AS BIGINT) AS last_event
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def python_datasource_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_feed_source(spark)
    feed = (
        spark.read.format("events_feed")
        .option("path", f"{sf_dir}/events.parquet")
        .load()
    )
    return (
        feed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            rounded(F.sum(fixed_units(F.col("value"))) / 100.0, 2).alias("total_value"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("event_type")
    )
