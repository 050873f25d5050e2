"""Structured Streaming rebuild of the reference's DStream job
(master.py:330-379; SURVEY section 7 Phase 3+4).

Reference topology: socket text DStream, 5 s batches, 4 chained
``updateStateByKey``, rmtree/append text sinks. Rebuild topology:

- sources: ``readStream.format("socket")`` for the live demo (S1) and
  the file source over the fixture stream dir for replayable tests --
  ``maxFilesPerTrigger=1`` makes one micro-batch per match file,
  reproducing the reference's match-per-batch cadence deterministically
  (T1); ``availableNow`` drains the backlog and stops (T7);
- one permissive ``from_json`` + wyId/eventId discrimination (F1/F2);
- K2 (match log) and the event feed as idempotent ``foreachBatch``
  Parquet appends partitioned by batch_id -- re-running a batch
  overwrites its own partition, replacing the reference's
  non-transactional append/rmtree sinks (T8);
- A2/A3 as a streaming groupBy aggregation in update mode (state keyed
  by (playerId, matchId), kept partition-local by the StateStore --
  the reference reshuffles the FULL key space every batch);
- A4+A5 (profile running mean + rating recurrence) as ONE
  ``applyInPandasWithState`` operator keyed by playerId (T5): the only
  genuinely sequential semantics in the engine, Arrow-batched, state =
  a single row per player. Chaining stateful ops inside one query is
  not supported by the incremental planner (and the reference's
  4-deep updateStateByKey chain recomputed everything every batch),
  so counters/metrics are derived inside the state function from the
  batch's raw events -- each batch is one match, so the per-match
  aggregate is complete within the invocation.

At 100 TB: the file/kafka source partitions by file/topic-partition;
the single stateful shuffle keys on playerId (bounded state, one row
per player); sinks are partitioned appends -- no global barrier, no
driver-memory state.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from fantasy_premier_league_spark.schemas import STREAM_SCHEMA

INIT_RATING = 0.5

RATING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("playerId", T.IntegerType()),
        T.StructField("matchId", T.IntegerType()),
        T.StructField("rating", T.DoubleType()),
        T.StructField("delta", T.DoubleType()),
        T.StructField("pass_accuracy_mean", T.DoubleType()),
        T.StructField("fouls_total", T.LongType()),
        T.StructField("goals_total", T.LongType()),
        T.StructField("own_goals_total", T.LongType()),
        T.StructField("shots_on_target_total", T.LongType()),
    ]
)

# state: one row per player (rating + cumulative profile)
RATING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("rating", T.DoubleType()),
        T.StructField("pa_mean", T.DoubleType()),
        T.StructField("fouls", T.LongType()),
        T.StructField("goals", T.LongType()),
        T.StructField("own_goals", T.LongType()),
        T.StructField("shots", T.LongType()),
        T.StructField("last_match", T.IntegerType()),
    ]
)


def stream_source(
    spark: SparkSession, stream_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source replay of the fixture stream: one match file per
    micro-batch (S1's test twin; socket source in socket_source())."""
    return (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(os.path.join(stream_dir, "*.jsonl"))
        .select(F.from_json("value", STREAM_SCHEMA).alias("r"))
        .select("r.*")
    )


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """S1: the reference's socket ingest (master.py:330), parsed once."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .select(F.from_json("value", STREAM_SCHEMA).alias("r"))
        .select("r.*")
    )


def console_sink(
    stream_df: DataFrame, checkpoint: str, num_rows: int = 20
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """K1: the reference's debug console sink (master.py:333-368 prints
    every DStream with .pprint() x8). One writeStream.format("console")
    covers the same observability role; debug-only, never a data sink.
    """
    return (
        stream_df.writeStream.format("console")
        .option("numRows", num_rows)
        .option("truncate", True)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_ingest_sinks(
    parsed: DataFrame, out_dir: str, checkpoint: str
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """K2 + event feed: idempotent foreachBatch Parquet appends.

    Each batch overwrites its own batch_id partition (dynamic partition
    overwrite), so replays after failure cannot duplicate -- the
    exactly-once story the reference's append-to-Match.json lacks.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        stamped = batch_df.withColumn("batch_id", F.lit(batch_id))
        # two write actions below -- without a persist each re-runs the
        # source scan + from_json parse (the same double-execution the
        # r16 t16 stage study priced in make_state_sink; at scale this
        # is the full feed parse, once per sink instead of per action)
        stamped.persist()
        try:
            stamped.filter(F.col("wyId").isNotNull()).select(
                "batch_id", "wyId", "label", "dateutc", "duration", "winner",
                "venue", "gameweek",
                F.to_json(F.struct("teamsData")).alias("teams_json"),
            ).write.mode("overwrite").partitionBy("batch_id").parquet(
                os.path.join(out_dir, "match_log")
            )
            stamped.filter(F.col("eventId").isNotNull()).select(
                "batch_id", "id", "eventId", "subEventId", "playerId",
                "matchId", "teamId", F.col("tags.id").alias("tag_ids"),
            ).write.mode("overwrite").partitionBy("batch_id").parquet(
                os.path.join(out_dir, "events")
            )
        finally:
            stamped.unpersist()

    return (
        parsed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def latest_committed_version(root: str, batch_id: int) -> "str | None":
    """Newest COMMITTED snapshot dir ``root/vNNNNN`` strictly older than
    ``batch_id``: the shared replay rule for versioned MERGE sinks
    (K3 profile snapshots and the t18 dedup-history table). Committed =
    the ``_SUCCESS`` marker exists AND the version is below the current
    batch -- so a replayed batch after a crash ignores its own partial
    write and re-reads the state its original attempt read (T8)."""
    import glob as _glob
    import re as _re

    prevs = []
    for d in sorted(_glob.glob(os.path.join(root, "v*"))):
        m = _re.search(r"v(\d+)$", d)
        if (
            m is not None
            and int(m.group(1)) < batch_id
            and os.path.exists(os.path.join(d, "_SUCCESS"))
        ):
            prevs.append(d)
    return prevs[-1] if prevs else None


def make_state_sink(
    rating_dir: str,
    profile_root: str,
    marks: list | None = None,
    persist_batch: bool = True,
):
    """K3 + K4 foreachBatch sink over the streaming player state
    (shared by t16_fpl_pipeline_roundtrip and the restart-idempotency
    test, so the test exercises the REAL sink).

    K4: each batch's rating rows land in their own batch_id partition
    (dynamic partition overwrite) -- a replayed batch rewrites the same
    partition, never duplicates.

    K3: profile snapshot v{batch_id} = previous COMMITTED snapshot
    MERGE this batch's latest per-player state. "Committed" means a
    _SUCCESS marker AND version < batch_id: after a crash mid-write,
    the replayed batch must not read its own partial v{batch_id} dir as
    the merge base (players absent from the partial write would be
    silently dropped) -- it re-reads v{batch_id-1} and reproduces the
    identical snapshot.

    ``marks`` (r16 stage study): when given, each batch appends
    ``{"batch_id", "rating_s", "merge_s"}`` so the K4 write and the K3
    MERGE are priced separately -- both actions re-execute the
    micro-batch's stateful-fold plan (foreachBatch DataFrames are not
    materialized between actions), which is exactly the double-run the
    study quantifies.
    """
    import time as _time

    from pyspark.sql import Window

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        sp.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # The K4 write and the K3 MERGE are two ACTIONS on batch_df,
        # and foreachBatch DataFrames are not materialized between
        # actions -- without a persist each action re-executes the
        # micro-batch's whole stateful-fold plan. Caching costs only
        # the touched-groups output (bounded per batch) and cut the
        # t16 state stage to 0.60x in the r16 stage study
        # (tools/t16_stage_study.py; BASELINE.md "Round 16").
        # persist_batch=False exists for that study's before/after row.
        if not persist_batch:
            _sink_inner(batch_df, batch_id)
            return
        batch_df.persist()
        try:
            _sink_inner(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    def _sink_inner(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        t0 = _time.perf_counter()
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).partitionBy("batch_id").parquet(rating_dir)
        t_rating = _time.perf_counter()
        wlast = Window.partitionBy("playerId").orderBy(F.col("matchId").desc())
        latest = (
            batch_df.withColumn("rn", F.row_number().over(wlast))
            .filter(F.col("rn") == 1)
            .select(
                "playerId",
                "matchId",
                F.col("pass_accuracy_mean").alias("pass_accuracy"),
                F.col("fouls_total").alias("fouls"),
                F.col("goals_total").alias("goals"),
                F.col("own_goals_total").alias("own_goals"),
                F.col("shots_on_target_total").alias("shots_on_target"),
            )
        )
        prev_dir = latest_committed_version(profile_root, batch_id)
        if prev_dir is not None:
            prev = sp.read.parquet(prev_dir)
            merged = prev.join(latest, "playerId", "left_anti").unionByName(
                latest
            )
        else:
            merged = latest
        merged.write.mode("overwrite").parquet(
            os.path.join(profile_root, f"v{batch_id:05d}")
        )
        if marks is not None:
            t_end = _time.perf_counter()
            marks.append(
                {
                    "batch_id": batch_id,
                    "rating_s": t_rating - t0,
                    "merge_s": t_end - t_rating,
                }
            )

    return sink


def streaming_match_counters(parsed: DataFrame) -> DataFrame:
    """A2 as an incremental streaming aggregation: state keyed by
    (playerId, matchId); update mode emits only changed keys."""
    from fantasy_premier_league_spark.operators.pipeline import metric_vectors

    events = parsed.filter(F.col("eventId").isNotNull())
    return metric_vectors(events).drop("id").groupBy("playerId", "matchId").agg(
        *[
            F.sum(c).cast("long").alias(c)
            for c in (
                "acc_normal_passes", "acc_key_passes", "normal_passes", "key_passes",
                "duels_won", "neutral_duels", "total_duels", "shots",
                "shots_on_target_goal", "shots_on_target_no_goal", "shots_on_target",
                "fouls", "own_goals", "free_kicks", "effective_free_kicks",
                "penalty_goals", "goals",
            )
        ]
    )


def _fold_player_state(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """A4+A5 in one pass (updatePlayerRating master.py:214-239 +
    getPlayerProfile master.py:242-259). Input rows: one per event for
    this player in this batch; each batch carries whole matches."""
    (player_id,) = key
    if state.exists:
        rating, pa_mean, fouls_t, goals_t, og_t, shots_t, last_match = state.get
    else:
        rating, pa_mean = INIT_RATING, None
        fouls_t = goals_t = og_t = shots_t = 0
        last_match = -1

    out_rows = []
    pdf = pd.concat(list(pdfs), ignore_index=True)
    for match_id, g in pdf.sort_values("matchId").groupby("matchId", sort=True):
        if match_id <= last_match:
            continue  # replayed/duplicate match: idempotent skip
        c = g.sum(numeric_only=True)
        pa_den = c["normal_passes"] + c["key_passes"] * 2
        pass_accuracy = (
            (c["acc_normal_passes"] + c["acc_key_passes"] * 2) / pa_den if pa_den else 0.0
        )
        duel_eff = (
            (c["duels_won"] + c["neutral_duels"] * 0.5) / c["total_duels"]
            if c["total_duels"]
            else 0.0
        )
        shot_eff = (
            (c["shots_on_target_goal"] + c["shots_on_target_no_goal"] * 0.5) / c["shots"]
            if c["shots"]
            else 0.0
        )
        contrib = (pass_accuracy + duel_eff + shot_eff + c["shots_on_target"]) / 4
        contrib = contrib - (0.005 * c["fouls"] + 0.05 * c["own_goals"]) * contrib
        new_rating = 1.05 * ((contrib + rating) / 2)
        delta = new_rating - rating
        rating = new_rating
        pa_mean = pass_accuracy if pa_mean is None else (pass_accuracy + pa_mean) / 2
        fouls_t += int(c["fouls"])
        goals_t += int(c["goals"])
        og_t += int(c["own_goals"])
        shots_t += int(c["shots_on_target"])
        last_match = int(match_id)
        out_rows.append(
            {
                "playerId": player_id,
                "matchId": last_match,
                "rating": rating,
                "delta": delta,
                "pass_accuracy_mean": pa_mean,
                "fouls_total": fouls_t,
                "goals_total": goals_t,
                "own_goals_total": og_t,
                "shots_on_target_total": shots_t,
            }
        )

    state.update((rating, pa_mean, fouls_t, goals_t, og_t, shots_t, last_match))
    yield pd.DataFrame(
        out_rows,
        columns=[f.name for f in RATING_OUTPUT_SCHEMA.fields],
    )


def streaming_player_state(parsed: DataFrame) -> DataFrame:
    """The stateful tier: per-player rating + profile evolving match by
    match, emitted in append mode. Replaces the reference's chained
    updateStateByKey with ONE keyed state operator."""
    from fantasy_premier_league_spark.operators.pipeline import metric_vectors

    events = parsed.filter(F.col("eventId").isNotNull())
    vectors = metric_vectors(events).drop("id")
    return vectors.groupBy("playerId").applyInPandasWithState(
        _fold_player_state,
        outputStructType=RATING_OUTPUT_SCHEMA,
        stateStructType=RATING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    checkpoint: str,
    output_mode: str = "append",
    query_name: str = "fpl_stream",
) -> DataFrame:
    """Drain with availableNow and return the sink table (T7)."""
    query = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return stream_df.sparkSession.table(query_name)
