"""Retrieval + labeling operators for training-data pipelines
(north-star extension, SURVEY 2.10): BM25 relevance ranking,
benchmark-decontamination overlap, and k-NN label voting.

These are the three retrieval-shaped jobs a corpus pipeline runs next
to dedup: score documents against a query (BM25), remove documents
that leak evaluation benchmarks (n-gram decontamination, the GPT-3
appendix-C recipe), and propagate labels from a seed set (k-NN vote).

Design for 100 TB:
- BM25: the corpus is touched once (tokenize -> filter to query terms
  -> explode); document frequencies and corpus stats are tiny aggregates
  broadcast back, so the only full shuffle is the final per-doc sum and
  the top-k is a TakeOrderedAndProject, never a global sort;
- decontamination: the eval set is small by construction, so its n-gram
  inventory broadcasts; the training corpus streams through an
  equality join on gram hash without ever shuffling raw text;
- k-NN voting: same broadcast-the-queries shape as ann_cosine_topk --
  the corpus never shuffles; votes aggregate over k*|queries| rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fantasy_premier_league_spark.functions import rounded
from fantasy_premier_league_spark.operators.similarity import dot, norm
from fantasy_premier_league_spark.plans.registry import register
from fantasy_premier_league_spark.sources.testdata import load_table

# ---------------------------------------------------------------------------
# BM25 (Robertson/Sparck Jones; the Okapi k1/b variant with the
# monotone-positive idf ln(1 + (N - df + 0.5)/(df + 0.5))).
# Query terms mix common and rare vocabulary so the idf spread is real.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "dup")
_K1 = 1.2
_B = 0.75
_TOP_N = 20


@register(
    "text_bm25_rank",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS dl
      FROM documents
    ),
    s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
    tf AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM (
        SELECT doc_id, dl,
               unnest(list_filter(toks, t -> t IN {_BM25_TERMS})) AS term
        FROM d
      ) GROUP BY doc_id, dl, term
    ),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT doc_id,
             round(sum(
               ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * tf * ({_K1} + 1)
               / (tf + {_K1} * (1 - {_B} + {_B} * dl / s.avgdl))
             ), 6) AS bm25
      FROM tf JOIN dfreq USING (term) CROSS JOIN s
      GROUP BY doc_id
    )
    SELECT doc_id, bm25,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rank
    FROM scored ORDER BY bm25 DESC, doc_id LIMIT {_TOP_N}
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("dl"))
    # corpus stats + per-term document frequency are single-row /
    # |terms|-row aggregates: both broadcast, so the corpus-side plan
    # stays one pass (tokenize -> in-array filter -> explode -> agg).
    stats = d.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    # materialize tf ONCE: it feeds both the df aggregate and the score
    # join, and its grouping keys differ between the two consumers, so
    # without the checkpoint Catalyst re-runs the tokenize+explode
    # corpus scan per consumer (3 scans observed; 2 after — the
    # remaining stats scan is a separate column-pruned aggregate).
    # tf is tiny: <= |terms| rows per matching document.
    tf = (
        d.select(
            "doc_id",
            "dl",
            F.explode(F.filter("toks", lambda t: t.isin(*_BM25_TERMS))).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = (
        idf
        * F.col("tf")
        * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(rounded(F.sum(contrib), 6).alias("bm25"))
    )
    # top-N FIRST (TakeOrderedAndProject — per-partition heads, never a
    # global sort), then rank the surviving _TOP_N rows: the only
    # unpartitioned window runs over 20 rows, not the corpus.
    topn = scored.orderBy(F.col("bm25").desc(), "doc_id").limit(_TOP_N)
    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return topn.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "bm25", "rank"
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag training documents sharing word
# 5-grams with a (small) held-out eval set. Eval membership is a
# deterministic id rule so both engines derive the same split; the
# overlap semantics (distinct shared 5-grams per training doc) follow
# the published LLM-decontamination recipes.
# ---------------------------------------------------------------------------

_EVAL_MOD = 97  # doc_id % 97 == 0 -> held-out eval document
_NGRAM = 5
_MIN_SHARED = 3


def ngrams_col(text: Column, n: int) -> Column:
    """Distinct word n-grams via chained zip_with over shifted slices
    (same one-pass shape as dedup.shingles_col, generalized to any n:
    no per-element lambda ever re-evaluates the tokenizer)."""
    toks = F.split(text, " ")
    sz = F.size(toks)
    grams = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(sz - k, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(
        F.when(sz >= n, F.slice(grams, 1, sz - (n - 1))).otherwise(
            F.array().cast("array<string>")
        )
    )


_NGRAMS_SQL = f"""
      SELECT doc_id,
             list_distinct([
               array_to_string(toks[i:i + {_NGRAM - 1}], ' ')
               for i in range(1, greatest(len(toks) - {_NGRAM - 2}, 1))
             ]) AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
"""


@register(
    "docs_decontaminate",
    oracle=f"""
    WITH g AS ({_NGRAMS_SQL}),
    eval_grams AS (
      SELECT DISTINCT unnest(grams) AS gram FROM g
      WHERE doc_id % {_EVAL_MOD} = 0
    ),
    train AS (
      SELECT doc_id, unnest(grams) AS gram FROM g
      WHERE doc_id % {_EVAL_MOD} <> 0
    )
    SELECT t.doc_id, count(*) AS n_shared_ngrams,
           count(*) >= {_MIN_SHARED} AS contaminated
    FROM train t JOIN eval_grams e ON t.gram = e.gram
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)
def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select("doc_id", ngrams_col(F.col("text"), _NGRAM).alias("grams"))
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    # the eval inventory is tiny relative to the corpus (benchmarks are
    # MBs, corpora are TBs) -> broadcast it; the training side streams
    # through the probe without shuffling text. grams are distinct per
    # doc already, so the per-doc match count needs no re-dedup.
    eval_grams = (
        g.filter(is_eval).select(F.explode("grams").alias("gram")).distinct()
    )
    train = g.filter(~is_eval).select("doc_id", F.explode("grams").alias("gram"))
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_ngrams"))
        .select(
            "doc_id",
            "n_shared_ngrams",
            (F.col("n_shared_ngrams") >= _MIN_SHARED).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# k-NN label voting: propagate labels from the corpus to a query set by
# majority vote over the k nearest neighbors (cosine). The standard
# cheap classifier for weak-labeling / quality-bucketing embeddings.
# Ties break to the smallest label so both engines agree exactly.
# ---------------------------------------------------------------------------

# Query points: vec_id % 50 == 0 AND vec_id < 500 — ten queries at
# EVERY scale factor. The bound matters: an unbounded "% 50" rule made
# the query set a fixed FRACTION of the corpus, so broadcast-scoring
# work grew quadratically (measured 59x wall at 10x data in the sf1
# study); with |queries| capped, work is linear in the corpus again
# (re-measured 3.1x at 10x data).
_KNN_MOD = 50
_KNN_CAP = 500
_KNN_K = 7


@register(
    "knn_classify_vote",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec, label FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, vec AS qvec, label AS true_label
      FROM v WHERE vec_id % {_KNN_MOD} = 0 AND vec_id < {_KNN_CAP}
    ),
    scored AS (
      SELECT q.query_id, q.true_label, v.vec_id, v.label,
             round(list_dot_product(q.qvec, v.vec)
               / (sqrt(list_dot_product(q.qvec, q.qvec))
                  * sqrt(list_dot_product(v.vec, v.vec))), 6) AS cosine
      FROM q JOIN v ON v.vec_id <> q.query_id
    ),
    topk AS (
      SELECT query_id, true_label, label FROM (
        SELECT query_id, true_label, label,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
      ) WHERE rank <= {_KNN_K}
    ),
    votes AS (
      SELECT query_id, true_label, label AS predicted_label,
             count(*) AS n_votes
      FROM topk GROUP BY query_id, true_label, label
    )
    SELECT query_id, true_label, predicted_label, n_votes FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY n_votes DESC, predicted_label) AS pick
      FROM votes
    ) WHERE pick = 1 ORDER BY query_id
    """,
)
def knn_classify_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-side norms once per row (r17, guide §1.2: norm() is a
    # per-vector quantity; inside the crossJoin it ran twice per
    # (query, vector) pair). Same doubles, bit-identical cosine.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"), "label"
    ).withColumn("nrm", norm(F.col("vec")))
    is_query = (F.col("vec_id") % _KNN_MOD == 0) & (F.col("vec_id") < _KNN_CAP)
    q = emb.filter(is_query).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
        F.col("label").alias("true_label"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "true_label",
            "vec_id",
            "label",
            rounded(
                dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm")),
                6,
            ).alias("cosine"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    topk = scored.withColumn("rank", F.row_number().over(w_rank)).filter(
        F.col("rank") <= _KNN_K
    )
    votes = topk.groupBy("query_id", "true_label", F.col("label").alias("predicted_label")).agg(
        F.count("*").alias("n_votes")
    )
    w_pick = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), "predicted_label"
    )
    return (
        votes.withColumn("pick", F.row_number().over(w_pick))
        .filter(F.col("pick") == 1)
        .select("query_id", "true_label", "predicted_label", "n_votes")
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Repetition + entropy quality signals (the Gopher/MassiveText filter
# family, Rae et al. 2021 appendix A1.1): top-token fraction, duplicate
# bigram fraction, and token-distribution entropy per document. These
# are the standard "degenerate text" detectors a corpus pipeline runs
# after the cheap length/stopword filters (text_quality_filter).
#
# Scale shape: bigram stats are pure per-row array expressions (no
# shuffle at all); term counts go through one explode + two aggregates
# co-partitioned on doc_id. The repetitive flag compares exact integer
# ratios, so it cannot flip across engines; only the entropy (a
# per-doc float sum) needs rounding.
# ---------------------------------------------------------------------------

_TOP_TOKEN_MAX = 0.2  # > 20% of tokens the same word -> repetitive
_DUP_BIGRAM_MAX = 0.5  # > 50% repeated bigrams -> repetitive


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS cnt FROM (
        SELECT doc_id, unnest(toks) AS term FROM d
      ) GROUP BY doc_id, term
    ),
    per_doc AS (
      SELECT doc_id, max(cnt) AS max_tf,
             sum(cnt * ln(cnt)) AS sum_clnc
      FROM tf GROUP BY doc_id
    ),
    big AS (
      SELECT doc_id, n,
             n - 1 AS n_bigrams,
             len(list_distinct([toks[i] || ' ' || toks[i+1]
                                for i in range(1, greatest(len(toks), 1))]))
               AS n_distinct_bigrams
      FROM d
    )
    SELECT b.doc_id,
           -- INTEGER, not BIGINT: Spark's size() is int32 and the
           -- driver's pandas fetch path distinguishes the widths (r12
           -- strict-preflight normalization, VERDICT r11 #3)
           CAST(b.n AS INTEGER) AS n_tokens,
           round(CAST(p.max_tf AS DOUBLE) / b.n, 6) AS top_token_frac,
           round(1 - CAST(b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams, 6)
             AS dup_bigram_frac,
           round(ln(b.n) - p.sum_clnc / b.n, 6) + 0 AS token_entropy,
           (p.max_tf * 5 > b.n)
             OR ((b.n_bigrams - b.n_distinct_bigrams) * 2 > b.n_bigrams)
             AS repetitive
    FROM big b JOIN per_doc p USING (doc_id)
    WHERE b.n >= 2
    ORDER BY b.doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("n")).filter(
        F.col("n") >= 2
    )
    tf = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("cnt"))
    )
    per_doc = tf.groupBy("doc_id").agg(
        F.max("cnt").alias("max_tf"),
        F.sum(F.col("cnt") * F.log("cnt")).alias("sum_clnc"),
    )
    shifted = F.slice(F.col("toks"), 2, F.greatest(F.col("n") - 1, F.lit(0)))
    bigrams = F.slice(
        F.zip_with(F.col("toks"), shifted, lambda a, b: F.concat_ws(" ", a, b)),
        1,
        F.col("n") - 1,
    )
    big = d.select(
        "doc_id",
        "n",
        (F.col("n") - 1).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct_bigrams"),
    )
    # integer-arithmetic flags (max_tf*5 > n, dup*2 > n_bigrams): the
    # thresholds {_TOP_TOKEN_MAX}/{_DUP_BIGRAM_MAX} as exact ratios, so
    # the boolean can never flip on a float rounding boundary.
    return (
        big.join(per_doc, "doc_id")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            rounded(F.col("max_tf").cast("double") / F.col("n"), 6).alias(
                "top_token_frac"
            ),
            rounded(
                1 - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams"), 6
            ).alias("dup_bigram_frac"),
            rounded(F.log("n") - F.col("sum_clnc") / F.col("n"), 6).alias(
                "token_entropy"
            ),
            (
                (F.col("max_tf") * 5 > F.col("n"))
                | ((F.col("n_bigrams") - F.col("n_distinct_bigrams")) * 2 > F.col("n_bigrams"))
            ).alias("repetitive"),
        )
        .orderBy("doc_id")
    )
