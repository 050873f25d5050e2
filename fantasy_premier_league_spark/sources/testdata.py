"""Loaders for the driver's synthetic star-schema parquet tables.

Parquet is the scan path the engine is designed around: columnar,
predicate-pushdown, partition-prunable. At 100 TB these reads become
multi-file partitioned scans; nothing here changes (``spark.read
.parquet`` on a directory), which is why every operator takes an
``sf_dir`` instead of a cached DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def canonicalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a timestamp column to TIMESTAMP_NTZ whatever the file
    encoded.

    The driver has regenerated the testdata with different physical
    encodings across rounds -- TIMESTAMP(NANOS) (reads as long under
    the legacy conf), and now TIMESTAMP(MICROS, isAdjustedToUTC=false)
    (reads as TIMESTAMP_NTZ). NTZ is the canonical engine type: its
    wall-clock semantics are timezone-independent and identical to the
    DuckDB oracle's naive TIMESTAMP in any session zone. Operators use
    functions.epoch_us/epoch_secs instead of unix_micros (which
    rejects NTZ).
    """
    field = next((f for f in df.schema.fields if f.name == col), None)
    if field is None:
        return df
    if isinstance(field.dataType, T.LongType):
        # legacy nanos-as-long: integer arithmetic (never float -- ns
        # epoch exceeds 2^53); DuckDB truncates ns->us the same way.
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"{col} div 1000")).cast("timestamp_ntz")
        )
    if isinstance(field.dataType, T.TimestampType):
        # session tz is pinned UTC in get_spark, so this cast is
        # value-preserving relative to the oracle's naive reading.
        return df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    return df


# every temporal column the generator writes; all get the same
# canonicalization so a future encoding flip cannot silently change
# date-boundary semantics in any table
TEMPORAL_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    cols = TEMPORAL_COLS.get(name)
    if cols:
        # tolerate the nanos encoding of earlier testdata generations
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(path)
        for c in cols:
            df = canonicalize_ts(df, c)
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so SQL-form operators work."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
