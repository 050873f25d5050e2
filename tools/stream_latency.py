#!/usr/bin/env python
"""Steady-state streaming latency readout (VERDICT r12 #8).

Every streaming correctness gate in this repo drains with
trigger(availableNow=True) -- which proves exactly-once semantics and
result parity but never measures the dimension a production stream
lives on: per-micro-batch trigger-to-commit latency at a steady
processing-time cadence. This harness runs the t4 SHAPE (event-time
watermark + tumbling-window aggregate, update mode -- the canonical
stateful pipeline of streaming/queries.py:118) over Spark's built-in
``rate`` source with a processingTime trigger, lets it run for a fixed
number of micro-batches, and reports the latency distribution from
StreamingQueryProgress:

- ``trigger_ms``  = durationMs.triggerExecution -- wall time from
  trigger fire to batch commit (the user-visible freshness bound);
- ``addBatch_ms`` = durationMs.addBatch -- the execution component;
- state rows / input rows per batch as a sanity readout.

Batch 0 pays stream initialization (offset log creation, state store
setup) and is reported separately, not folded into the percentiles --
steady state is what the p50/p95 claim is about.

Usage:
    python tools/stream_latency.py [--batches 24] [--trigger-ms 500]
                                   [--rows-per-sec 5000] [--json]

Prints a markdown table (BASELINE.md records it) or one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _pct(xs: list[float], p: float) -> float:
    """Linear-interpolation percentile (the quantile_cont definition)."""
    s = sorted(xs)
    if not s:
        return float("nan")
    idx = (len(s) - 1) * p
    lo, hi = math.floor(idx), math.ceil(idx)
    if lo == hi:
        return s[lo]
    return s[lo] + (s[hi] - s[lo]) * (idx - lo)


def run(n_batches: int, trigger_ms: int, rows_per_sec: int) -> dict:
    from pyspark.sql import functions as F

    from fantasy_premier_league_spark.session import get_spark

    spark = get_spark("stream-latency")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    # the t4 shape over the rate source: event-time watermark +
    # 10-second tumbling window + per-window count/sum, update mode
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_sec))
        .load()
        .withWatermark("timestamp", "5 seconds")
        .groupBy(F.window("timestamp", "10 seconds").alias("win"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value") % 97).alias("checksum"),
        )
    )
    ckpt = tempfile.mkdtemp(prefix="stream_latency_ckpt_")
    query = (
        stream.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )
    # wait until n_batches micro-batches have committed rows; poll
    # lastProgress rather than sleeping a fixed wall time so a loaded
    # machine yields MORE wait, not fewer batches
    seen: dict[int, dict] = {}
    deadline = time.monotonic() + max(120, n_batches * trigger_ms / 1000 * 6)
    while len(seen) < n_batches and time.monotonic() < deadline:
        for p in query.recentProgress:
            seen[p["batchId"]] = p
        time.sleep(trigger_ms / 1000 / 4)
    query.stop()
    spark.stop()

    batches = [seen[b] for b in sorted(seen)][:n_batches]
    if len(batches) < n_batches:
        raise SystemExit(
            f"only {len(batches)}/{n_batches} micro-batches committed "
            f"before deadline -- machine too loaded for a readout"
        )
    init, steady = batches[0], batches[1:]

    def series(ps, key):
        return [float(p["durationMs"][key]) for p in ps if key in p["durationMs"]]

    trig = series(steady, "triggerExecution")
    add = series(steady, "addBatch")
    rows = [int(p["numInputRows"]) for p in steady]
    state = [
        int(p["stateOperators"][0]["numRowsTotal"])
        for p in steady
        if p.get("stateOperators")
    ]
    return {
        "shape": "rate -> watermark 5s -> window 10s agg -> noop (update)",
        "trigger_ms": trigger_ms,
        "rows_per_sec": rows_per_sec,
        "n_batches_steady": len(steady),
        "batch0_trigger_ms": float(init["durationMs"]["triggerExecution"]),
        "p50_trigger_ms": round(_pct(trig, 0.50), 1),
        "p95_trigger_ms": round(_pct(trig, 0.95), 1),
        "max_trigger_ms": round(max(trig), 1),
        "p50_addBatch_ms": round(_pct(add, 0.50), 1),
        "p95_addBatch_ms": round(_pct(add, 0.95), 1),
        "median_input_rows": sorted(rows)[len(rows) // 2],
        "max_state_rows": max(state) if state else 0,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--trigger-ms", type=int, default=500)
    ap.add_argument("--rows-per-sec", type=int, default=5000)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    out = run(args.batches, args.trigger_ms, args.rows_per_sec)
    if args.json:
        print(json.dumps(out, sort_keys=True))
        return 0
    print(
        "| shape | trigger | steady batches | p50 trigger→commit | "
        "p95 | max | p50 addBatch | batch0 (init) |"
    )
    print("|---|---|---|---|---|---|---|---|")
    print(
        f"| {out['shape']} | {out['trigger_ms']} ms | "
        f"{out['n_batches_steady']} | {out['p50_trigger_ms']} ms | "
        f"{out['p95_trigger_ms']} ms | {out['max_trigger_ms']} ms | "
        f"{out['p50_addBatch_ms']} ms | {out['batch0_trigger_ms']:.0f} ms |"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
