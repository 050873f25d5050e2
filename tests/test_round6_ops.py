"""Behavioral tests for the round-6 operators that oracle parity alone
cannot pin: multi-batch-ness of the CDC upsert, partition planning of
the Python data source, and the retrieval tier's set invariants."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from fantasy_premier_league_spark.plans.registry import all_queries
from tests.conftest import SF_SMOKE


def test_cdc_upsert_really_runs_multiple_batches(spark):
    """t13's MERGE claim rests on the changelog arriving across several
    micro-batches (maxFilesPerTrigger=1 over a 4-file split): after the
    drain, the versioned state dir must hold one snapshot per non-empty
    batch — a single v0 would mean the upsert never exercised the
    prev-snapshot union path."""
    all_queries()["t13_stream_cdc_upsert"](spark, SF_SMOKE).collect()
    tag = "".join(c if c.isalnum() else "_" for c in SF_SMOKE.rstrip("/"))
    versions = glob.glob(
        os.path.join(tempfile.gettempdir(), f"cdc_upsert_{tag}", "state", "v*")
    )
    assert len(versions) >= 2, (
        f"expected multiple per-batch snapshots, found {versions}"
    )


def test_python_datasource_partitions_map_row_groups(spark):
    """One InputPartition per parquet row group is what lets executors
    read the feed in parallel; collapsing to a single partition would
    serialize a 100 TB scan through one task."""
    from fantasy_premier_league_spark.sources.py_datasource import (
        _EventsFeedReader,
        register_feed_source,
    )

    path = f"{SF_SMOKE}/events.parquet"
    n_groups = pq.ParquetFile(path).metadata.num_row_groups
    parts = _EventsFeedReader(path).partitions()
    assert len(parts) == n_groups
    assert sorted(p.index for p in parts) == list(range(n_groups))

    register_feed_source(spark)
    feed = spark.read.format("events_feed").option("path", path).load()
    assert feed.count() == spark.read.parquet(path).count()


def test_decontaminate_never_flags_eval_docs(spark):
    """The eval set defines contamination; it must never appear in the
    flagged training output (a % rule typo would silently self-match
    every eval doc with a perfect score)."""
    from fantasy_premier_league_spark.operators.ranking import _EVAL_MOD

    out = all_queries()["docs_decontaminate"](spark, SF_SMOKE)
    assert out.filter(F.col("doc_id") % _EVAL_MOD == 0).count() == 0
    assert out.count() > 0, "vacuous: no overlap found at all"


def test_knn_query_set_is_bounded(spark):
    """The sf1 study's quadratic-work regression: the query set must be
    the fixed seed set (% _KNN_MOD, capped below _KNN_CAP), independent
    of corpus size."""
    from fantasy_premier_league_spark.operators.ranking import _KNN_CAP, _KNN_MOD

    rows = all_queries()["knn_classify_vote"](spark, SF_SMOKE).collect()
    assert rows, "no query points resolved"
    for r in rows:
        assert r.query_id % _KNN_MOD == 0 and r.query_id < _KNN_CAP


def test_sized_loop_partitions_clamps(spark):
    """The loop-reducer sizing must floor at 4 (toy data), ceiling at
    the session setting (100 TB working sets keep full parallelism),
    and always restore the session conf."""
    from fantasy_premier_league_spark.functions import sized_loop_partitions

    key = "spark.sql.shuffle.partitions"
    session_parts = int(spark.conf.get(key))
    with sized_loop_partitions(spark, 10) as p:
        assert p == 4 and int(spark.conf.get(key)) == 4
    with sized_loop_partitions(spark, 10**9) as p:
        assert p == session_parts
    assert int(spark.conf.get(key)) == session_parts
