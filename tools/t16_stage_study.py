#!/usr/bin/env python
"""Decompose t16_fpl_pipeline_roundtrip's fixed cost (VERDICT r15
stretch #8: top wall four driver rounds running, 7.7-8.0 s, with engine
code unchanged since r13 -- the pricing, not the optimization, is the
deliverable).

The ladder has three stages (streaming/queries.py t16_run_* -- the
study times the SAME functions the registered query calls):

1. ingest  -- K2 match-log + event-feed sinks, one availableNow batch;
2. state   -- the applyInPandasWithState fold drained through the
              K4 rating + K3 committed-snapshot-MERGE sink across the
              4-batch ladder (make_state_sink marks split K4 vs K3
              per batch: BOTH actions re-execute the micro-batch's
              stateful plan, foreachBatch DataFrames are not
              materialized between actions);
3. serve   -- the batch recompute (final rating / chemistry pairs /
              profile join) off the sink tables.

Two variants bracket the candidate savings:
- uncached-batch: the state drain with persist_batch=False -- the
  pre-r16 sink, pricing the K4+K3 double plan execution the study's
  first run found (0.60x with the persist; the persist is now the
  sink's default);
- concurrent: ingest and state drained as two SIMULTANEOUS availableNow
  queries (they share the fixture source but neither reads the other's
  output), pricing the shared-session overlap the verdict asked about.

Usage:
    python tools/t16_stage_study.py [--repeats 3]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    repeats = 3
    args = sys.argv[1:]
    while args:
        flag = args.pop(0)
        if flag == "--repeats":
            repeats = int(args.pop(0))
        else:
            raise SystemExit(f"unknown flag {flag}")

    from fantasy_premier_league_spark.session import get_spark
    from fantasy_premier_league_spark.streaming.pipeline import (
        make_state_sink,
        run_ingest_sinks,
        stream_source,
        streaming_player_state,
    )
    from fantasy_premier_league_spark.streaming.queries import (
        scoped_conf,
        t16_run_ingest,
        t16_run_state,
        t16_serve,
        t16_stage_plan,
    )

    spark = get_spark("t16-stage-study")
    pc = time.perf_counter

    # warmup: one full roundtrip so JVM codegen, the Python worker pool
    # (the state fold is Arrow/pandas), and the streaming engine's
    # first-query machinery don't land in repeat 1
    plan = t16_stage_plan(spark)
    t16_run_ingest(spark, plan)
    t16_run_state(spark, plan)
    t16_serve(spark, plan["out_dir"]).write.format("noop").mode(
        "overwrite"
    ).save()

    runs = []
    for _ in range(repeats):
        plan = t16_stage_plan(spark)
        out = plan["out_dir"]
        marks: list[dict] = []
        sink = make_state_sink(
            os.path.join(out, "rating"), os.path.join(out, "profile"), marks
        )
        t0 = pc()
        t16_run_ingest(spark, plan)
        t_ingest = pc() - t0
        t0 = pc()
        t16_run_state(spark, plan, sink=sink)
        t_state = pc() - t0
        t0 = pc()
        t16_serve(spark, out).write.format("noop").mode("overwrite").save()
        t_serve = pc() - t0
        runs.append(
            {
                "ingest": t_ingest,
                "state": t_state,
                "serve": t_serve,
                "rating_s": sum(m["rating_s"] for m in marks),
                "merge_s": sum(m["merge_s"] for m in marks),
                "n_batches": len(marks),
            }
        )

    uncached = []
    for _ in range(repeats):
        plan = t16_stage_plan(spark)
        out = plan["out_dir"]
        sink = make_state_sink(
            os.path.join(out, "rating"),
            os.path.join(out, "profile"),
            persist_batch=False,
        )
        t0 = pc()
        t16_run_state(spark, plan, sink=sink)
        uncached.append(pc() - t0)

    concurrent = []
    for _ in range(repeats):
        plan = t16_stage_plan(spark)
        out = plan["out_dir"]
        sink = make_state_sink(
            os.path.join(out, "rating"), os.path.join(out, "profile")
        )
        t0 = pc()
        q_ingest = run_ingest_sinks(
            stream_source(
                spark,
                plan["stream_dir"],
                max_files_per_trigger=max(64, plan["n_stream_files"]),
            ),
            out,
            os.path.join(out, "_ckpt_ingest"),
        )
        with scoped_conf(spark, "spark.sql.shuffle.partitions", "4"):
            q_state = (
                streaming_player_state(
                    stream_source(
                        spark,
                        plan["stream_dir"],
                        max_files_per_trigger=plan["state_fpt"],
                    )
                )
                .writeStream.foreachBatch(sink)
                .option(
                    "checkpointLocation", os.path.join(out, "_ckpt_state")
                )
                .trigger(availableNow=True)
                .start()
            )
        q_ingest.awaitTermination()
        q_state.awaitTermination()
        concurrent.append(pc() - t0)

    med = lambda k: statistics.median(r[k] for r in runs)  # noqa: E731
    total = med("ingest") + med("state") + med("serve")
    sink_wall = med("rating_s") + med("merge_s")
    print(f"# t16 stage decomposition (repeats={repeats}, "
          f"{runs[0]['n_batches']}-batch state ladder)")
    print()
    print("| stage | med wall (s) | % of total | detail |")
    print("|---|---|---|---|")
    print(f"| ingest (K2+feed) | {med('ingest'):.2f} | "
          f"{100 * med('ingest') / total:.0f}% | one availableNow batch |")
    print(f"| state (fold + K4 + K3) | {med('state'):.2f} | "
          f"{100 * med('state') / total:.0f}% | "
          f"K4 rating writes {med('rating_s'):.2f} s + K3 MERGE "
          f"{med('merge_s'):.2f} s in-sink; "
          f"ladder overhead {med('state') - sink_wall:.2f} s |")
    print(f"| serve (batch recompute) | {med('serve'):.2f} | "
          f"{100 * med('serve') / total:.0f}% | rating/chem/profile joins |")
    print(f"| **total (sequential)** | **{total:.2f}** | 100% | |")
    print()
    print("| variant | med wall (s) | vs baseline stage |")
    print("|---|---|---|")
    print(f"| state WITHOUT batch persist (pre-r16 sink) | "
          f"{statistics.median(uncached):.2f} | "
          f"{statistics.median(uncached) / med('state'):.2f}x of state |")
    conc = statistics.median(concurrent)
    seq2 = med("ingest") + med("state")
    print(f"| ingest+state drained concurrently | {conc:.2f} | "
          f"{conc / seq2:.2f}x of sequential ingest+state |")
    spark.stop()


if __name__ == "__main__":
    main()
