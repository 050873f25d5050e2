"""Similarity search over the ``embeddings`` table (north-star
extension, SURVEY 2.10): brute-force cosine top-k as the exactness
baseline, plus an LSH-bucketed approximate variant as the scale path.

Design for 100 TB:
- brute force is a broadcast of the (small) query set against the full
  corpus -- the corpus never shuffles; per-partition dot products stay
  JVM-side via zip_with/aggregate; top-k per query is a
  TakeOrderedAndProject, not a full sort;
- the sign-random-projection LSH variant hashes each vector to a small
  bucket code with deterministic hyperplanes; candidates meet on an
  equality join on the code, shrinking the candidate set by ~2^bits;
- everything computes in float64 after an explicit cast so the DuckDB
  oracle (which would otherwise use float32 list arithmetic) agrees
  bit-for-bit modulo rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fantasy_premier_league_spark.functions import rounded
from fantasy_premier_league_spark.plans.registry import register
from fantasy_premier_league_spark.sources.testdata import load_table

N_QUERIES = 5  # vectors with vec_id < 5 act as the query set
TOP_K = 5


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"), "label"
    )


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec, label FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, vec AS qvec FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, v.vec_id,
             round(list_dot_product(q.qvec, v.vec)
               / (sqrt(list_dot_product(q.qvec, q.qvec))
                  * sqrt(list_dot_product(v.vec, v.vec))), 6) AS cosine
      FROM q JOIN v ON v.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cosine, rank FROM (
      SELECT query_id, vec_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            rounded(
                dot(F.col("qvec"), F.col("vec")) / (norm(F.col("qvec")) * norm(F.col("vec"))), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Sign-random-projection LSH bucketing: code_i = (vec . h_i) >= 0 with
# deterministic "hyperplanes" h_i built from an alternating +-1 pattern
# (portable across engines -- no RNG at query time). Demonstrates the
# bucket-join scale path: at 100 TB candidates meet on bucket equality,
# cutting the cross product by ~2^bits; the exact re-rank then runs on
# candidates only.
# ---------------------------------------------------------------------------

_LSH_BITS = 4


def _bit(vec: Column, stride: int) -> Column:
    # pseudo-hyperplane: sign pattern alternating every `stride` dims
    signed = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, i: F.when((i / stride).cast("int") % 2 == 0, x).otherwise(-x),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(signed >= 0, 1).otherwise(0)


_BIT_SQL = """
    CASE WHEN list_sum([
      CASE WHEN (i // {stride}) % 2 = 0 THEN vec[i + 1] ELSE -vec[i + 1] END
      for i in range(0, len(vec))
    ]) >= 0 THEN 1 ELSE 0 END
"""


@register(
    "ann_lsh_buckets",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings)
    SELECT bucket, count(*) AS n_vectors,
           CAST(min(vec_id) AS BIGINT) AS min_vec_id
    FROM (
      SELECT vec_id,
             {b0} * 8 + {b1} * 4 + {b2} * 2 + {b3} AS bucket
      FROM v
    )
    GROUP BY bucket ORDER BY bucket
    """.format(
        b0=_BIT_SQL.format(stride=1),
        b1=_BIT_SQL.format(stride=2),
        b2=_BIT_SQL.format(stride=4),
        b3=_BIT_SQL.format(stride=8),
    ),
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _vectors(spark, sf_dir)
    bucket = (
        _bit(F.col("vec"), 1) * 8
        + _bit(F.col("vec"), 2) * 4
        + _bit(F.col("vec"), 4) * 2
        + _bit(F.col("vec"), 8)
    )
    return (
        v.select("vec_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("bucket")
    )
