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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as long (legacy conf) and convert to a
        # microsecond timestamp with integer arithmetic (never float --
        # ns-epoch values exceed 2^53). DuckDB truncates ns->us the same way.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(path)
        ts_field = next((f for f in df.schema.fields if f.name == "ts"), None)
        if ts_field is not None and isinstance(ts_field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so SQL-form operators work."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
