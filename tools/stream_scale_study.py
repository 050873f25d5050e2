#!/usr/bin/env python
"""Stream-volume scaling study for the FPL pipeline chain (VERDICT r8 #3).

The sf* parquet studies (scale_study.py) never touch the FPL fixture
stream, so t16_fpl_pipeline_roundtrip -- the heaviest headline query --
and the request chain had no scale evidence. This tool generates scaled
fixture dirs (ensure_fixtures(scale): scale x 12 matches, same roster),
benches the named queries at each scale via bench.py with
SPARK_GRAFT_FPL_FIXTURES pointing the whole chain (Spark readers AND the
baked DuckDB oracle paths) at the scaled dir, and prints the
ratio/exponent markdown recorded in BASELINE.md.

t16's triggers size to the file count (streaming/queries.py), so the
batch count stays constant and the measurement is data scaling, not
micro-batch fixed cost.

Usage:
    python tools/stream_scale_study.py [--scales 1,10,100] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.1"  # irrelevant to FPL queries; bench needs one

DEFAULT_QUERIES = [
    "t16_fpl_pipeline_roundtrip",
    "fpl_req1_win_prediction",
    "fpl_a6_chemistry",
]


def bench(fixtures_dir: str, names: list[str]) -> dict[str, float]:
    env = os.environ | {
        "SPARK_GRAFT_SF_DIR": SF_DIR,
        "SPARK_GRAFT_BENCH_ONLY": ",".join(names),
        "SPARK_GRAFT_FPL_FIXTURES": fixtures_dir,
        "SPARK_GRAFT_BENCH_REPEATS": os.environ.get(
            "SPARK_GRAFT_BENCH_REPEATS", "3"
        ),
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=False,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"bench produced no JSON at {fixtures_dir}")
    payload = json.loads(lines[0])
    if payload.get("errors"):
        print(f"# errors at {fixtures_dir}: {payload['errors']}", file=sys.stderr)
    return payload["queries"]


def main() -> None:
    args = sys.argv[1:]
    scales = [1, 10, 100]
    if args and args[0] == "--scales":
        scales = [int(s) for s in args[1].split(",")]
        args = args[2:]
    names = args or DEFAULT_QUERIES

    sys.path.insert(0, REPO)
    from fantasy_premier_league_spark.sources import fpl_fixtures

    dirs = {s: fpl_fixtures.ensure_fixtures(s) for s in scales}
    results = {s: bench(dirs[s], names) for s in scales}

    base = scales[0]
    header = " | ".join(f"x{s} med" for s in scales)
    print(f"| query | {header} | ratio (x{scales[-1]//base} volume) | exponent |")
    print("|---|" + "---|" * (len(scales) + 2))
    for n in names:
        meds = [results[s].get(n) for s in scales]
        if any(m is None for m in meds):
            print(f"| `{n}` | MISSING |")
            continue
        r = meds[-1] / meds[0]
        factor = scales[-1] / base
        cells = " | ".join(f"{m:.2f} s" for m in meds)
        exp = (
            f"{math.log10(r) / math.log10(factor):.2f}"
            if factor > 1
            else "n/a (single scale)"
        )
        print(f"| `{n}` | {cells} | {r:.2f}x | {exp} |")


if __name__ == "__main__":
    main()
