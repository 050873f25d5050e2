#!/usr/bin/env python
"""Price the S10 custom sink's COMMIT path at scale (VERDICT r15 #4).

The s10 headline row times the full reader->writer ladder; its scale
rows (exp 0.07 sf1 / 0.23 sf10) price the DATA path. What had no
numbers yet is the sink's own serial section: the driver-side
``commit(messages, batchId)`` -- rename every staged file + publish one
manifest -- whose claim is O(#tasks) FILE NAMES, never data; and the
manifest-only read surface ``committed_feed_files``, whose cost grows
with the number of PUBLISHED MANIFESTS (the compaction question: at
what epoch count does globbing+parsing manifests stop being trivial?).

Both run driver-side by construction (commit/read-back never touch
executors), so the measurement needs no SparkSession: staged files are
real parquet written via pyarrow, the commit call is the production
code path (sources/py_datasource.py _EventsFeedSinkWriter.commit), and
the read-back is the production committed_feed_files.

Usage:
    python tools/sink_commit_study.py [--tasks 8,64,256,1024]
        [--manifests 4,32,128,512] [--repeats 5] [--anchor]

Prints two BASELINE.md-ready markdown tables: commit wall vs #tasks at
fixed total rows, and read-back wall vs #manifests. ``--anchor`` also
runs a REAL batch write through Spark (sf0.01 events repartitioned to
each task count, mode overwrite) so the driver-side numbers can be
read against an end-to-end job wall: the serial commit section should
be invisible inside it at every task count.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOTAL_ROWS = 8192  # fixed data volume across task counts


def _staged_messages(root: str, n_files: int, total_rows: int):
    """Real staged parquet files + their commit messages, exactly what
    executors hand the driver (one message per task)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fantasy_premier_league_spark.sources.py_datasource import (
        _FeedSinkCommit,
    )

    staging = os.path.join(root, "staging")
    os.makedirs(staging, exist_ok=True)
    rows = max(1, total_rows // n_files)
    table = pa.table({"event_id": pa.array(range(rows), type=pa.int64())})
    messages = []
    for i in range(n_files):
        path = os.path.join(staging, f"part-{i:06d}.parquet")
        pq.write_table(table, path)
        messages.append(_FeedSinkCommit(file=path, rows=rows))
    return messages


def commit_wall(n_tasks: int, repeats: int) -> list[float]:
    from fantasy_premier_league_spark.sources.py_datasource import (
        _stream_writer_cls,
    )

    cls = _stream_writer_cls()
    walls = []
    for _ in range(repeats):
        root = tempfile.mkdtemp(prefix="sink_commit_study_")
        try:
            messages = _staged_messages(root, n_tasks, TOTAL_ROWS)
            w = cls(root)
            t0 = time.perf_counter()
            w.commit(messages, batchId=0)
            walls.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return walls


def readback_wall(n_manifests: int, repeats: int) -> tuple[list[float], int]:
    """Publish n_manifests epochs (2 files each), then time the
    manifest-only read surface."""
    from fantasy_premier_league_spark.sources.py_datasource import (
        _stream_writer_cls,
        committed_feed_files,
    )

    cls = _stream_writer_cls()
    root = tempfile.mkdtemp(prefix="sink_readback_study_")
    try:
        w = cls(root)
        for b in range(n_manifests):
            w.commit(_staged_messages(root, 2, 64), batchId=b)
        walls = []
        n_files = len(committed_feed_files(root))  # warm + sanity
        assert n_files == 2 * n_manifests, (n_files, n_manifests)
        for _ in range(repeats):
            t0 = time.perf_counter()
            committed_feed_files(root)
            walls.append(time.perf_counter() - t0)
        return walls, n_files
    finally:
        shutil.rmtree(root, ignore_errors=True)


def anchor_wall(tasks: list[int], repeats: int) -> list[tuple[int, float]]:
    """End-to-end batch write through Spark at each task count: the
    full pipeline (scan -> repartition shuffle -> executor staged
    writes -> driver commit). Overwrite mode so each repeat replaces
    the epoch."""
    from fantasy_premier_league_spark.session import get_spark
    from fantasy_premier_league_spark.sources.py_datasource import (
        register_feed_sink,
    )

    spark = get_spark("sink-commit-anchor")
    register_feed_sink(spark)
    src = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    src.count()  # warm the scan
    out = []
    root_base = tempfile.mkdtemp(prefix="sink_anchor_")
    try:
        for n in tasks:
            root = os.path.join(root_base, f"n{n}")
            walls = []
            for r in range(repeats):
                t0 = time.perf_counter()
                src.repartition(n).write.format("events_feed_sink").option(
                    "path", root
                ).mode("overwrite").save()
                walls.append(time.perf_counter() - t0)
            out.append((n, statistics.median(walls)))
    finally:
        shutil.rmtree(root_base, ignore_errors=True)
        spark.stop()
    return out


def main() -> None:
    args = sys.argv[1:]
    tasks = [8, 64, 256, 1024]
    manifests = [4, 32, 128, 512]
    repeats = 5
    anchor = False
    while args:
        flag = args.pop(0)
        if flag == "--tasks":
            tasks = [int(s) for s in args.pop(0).split(",")]
        elif flag == "--manifests":
            manifests = [int(s) for s in args.pop(0).split(",")]
        elif flag == "--repeats":
            repeats = int(args.pop(0))
        elif flag == "--anchor":
            anchor = True
        else:
            raise SystemExit(f"unknown flag {flag}")

    print(f"# s10 sink commit-path study (repeats={repeats}, "
          f"total_rows={TOTAL_ROWS} fixed)")
    print()
    print("| #tasks | commit med (ms) | ms/task | x vs 8 tasks |")
    print("|---|---|---|---|")
    base = None
    for n in tasks:
        med = statistics.median(commit_wall(n, repeats)) * 1000
        if base is None:
            base = med
        print(
            f"| {n} | {med:.2f} | {med / n:.3f} | {med / base:.2f}x |"
        )
    print()
    print("| #manifests | files | read-back med (ms) | ms/manifest |")
    print("|---|---|---|---|")
    for m in manifests:
        walls, n_files = readback_wall(m, repeats)
        med = statistics.median(walls) * 1000
        print(f"| {m} | {n_files} | {med:.2f} | {med / m:.3f} |")

    if anchor:
        print()
        print("| #tasks | end-to-end job med (s) | driver commit share |")
        print("|---|---|---|")
        for n, wall in anchor_wall(tasks, repeats):
            # commit share read from the driver-side table's per-task
            # slope (~12-35 us/task incl. floor); recompute exactly
            commit_ms = statistics.median(commit_wall(n, repeats)) * 1000
            print(
                f"| {n} | {wall:.2f} | {commit_ms:.1f} ms = "
                f"{100 * commit_ms / 1000 / wall:.2f}% |"
            )


if __name__ == "__main__":
    main()
