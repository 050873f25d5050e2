#!/usr/bin/env python
"""Re-run the sf0.1 -> sf1 heavy-tier scaling study (BASELINE.md).

Builds the local sf1 replica via make_scale.py if absent, benches the
named queries at both scale factors (medians of SPARK_GRAFT_BENCH_REPEATS
in-session repeats via bench.py), and prints the ratio/exponent table in
the exact markdown shape BASELINE.md records.

Usage:
    python tools/scale_study.py [query ...]     # default: the audited heavies
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
# big side of the study: .scale/sf1 (one decade) by default; point
# SPARK_GRAFT_SCALE_BIG at .scale/sf10 for the two-decade sweep
SF1 = os.environ.get(
    "SPARK_GRAFT_SCALE_BIG", os.path.join(REPO, ".scale", "sf1")
)
_FACTOR = 100 if SF1.rstrip("/").endswith("sf10") else 10

DEFAULT_HEAVIES = [
    "aqe_skew_join",
    "salted_skew_join",
    "t7_stream_stream_join",
    "dedup_cluster_components",
    "graph_pagerank",
    "dedup_simhash_pairs",
    "docs_decontaminate",
    "dedup_prefix_filter_pairs",
    "knn_classify_vote",
    "text_bm25_rank",
    "t13_stream_cdc_upsert",
    "bucketed_colocated_join",
]


def bench(sf_dir: str, names: list[str]) -> dict[str, float]:
    env = os.environ | {
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_ONLY": ",".join(names),
    }
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=False,
    )
    # first JSON line = the full payload (per-query medians for every
    # selected query); the LAST line is the driver-facing compact
    # summary whose queries dict only covers the comparable-24 prefix
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][0]
    payload = json.loads(line)
    if payload.get("errors"):
        print(f"# errors at {sf_dir}: {payload['errors']}", file=sys.stderr)
    return payload["queries"]


def main() -> None:
    names = sys.argv[1:] or DEFAULT_HEAVIES
    if not os.path.isdir(SF1):
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "make_scale.py"),
                "--src",
                SF01,
                "--dst",
                SF1,
                "--factor",
                str(_FACTOR),
            ],
            check=True,
        )
    small = bench(SF01, names)
    big = bench(SF1, names)
    big_name = os.path.basename(SF1.rstrip("/"))
    print(f"| query | sf0.1 med | {big_name} med | ratio ({_FACTOR}x data) | exponent |")
    print("|---|---|---|---|---|")
    for n in names:
        if n not in small or n not in big:
            print(f"| `{n}` | MISSING | MISSING | - | - |")
            continue
        r = big[n] / small[n]
        print(
            f"| `{n}` | {small[n]:.2f} s | {big[n]:.2f} s "
            f"| {r:.2f}x | {math.log10(r) / math.log10(_FACTOR):.2f} |"
        )


if __name__ == "__main__":
    main()
