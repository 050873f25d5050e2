"""Run the ENTIRE differential fuzz set at an arbitrary scale factor.

The pytest gate (tests/test_fuzz_differential.py) pins every axis to
sf0.001 to keep CI wall-time flat; this tool replays the identical
seeded cases at a larger SF, where 10-100x more rows reach the tie,
empty-group, and cut-boundary edges the small corpus may never touch.
A divergence here reproduces from (axis, seed) alone, exactly like the
gate.

Usage:
    python tools/fuzz_shakeout.py [sf_dir]   # default /root/testdata/sf0.01
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from fantasy_premier_league_spark.session import get_spark  # noqa: E402
from tests import fuzz_grammar as g  # noqa: E402
from tests.oracle_harness import (  # noqa: E402
    compare,
    compare_signed,
    duck_connection,
)

AXES = [
    ("scan", g.draw_case, g.build_spark, 30),
    ("join", g.draw_join_case, g.build_join_spark, 15),
    ("window", g.draw_window_case, g.build_window_spark, 12),
    ("null", g.draw_null_case, g.build_null_spark, 12),
    ("setop", g.draw_setop_case, g.build_setop_spark, 12),
    ("expr", g.draw_expr_case, g.build_expr_spark, 12),
    ("topk", g.draw_topk_case, g.build_topk_spark, 12),
    ("rollup", g.draw_rollup_case, g.build_rollup_spark, 12),
    ("subquery", g.draw_subquery_case, g.build_subquery_spark, 12),
    ("datetime", g.draw_datetime_case, g.build_datetime_spark, 12),
    ("pattern", g.draw_pattern_case, g.build_pattern_spark, 12),
    ("numeric", g.draw_numeric_case, g.build_numeric_spark, 12),
    ("rangejoin", g.draw_rangejoin_case, g.build_rangejoin_spark, 12),
    ("stream", g.draw_stream_case, g.build_stream_spark, 12),
    ("scalarsub", g.draw_scalarsub_case, g.build_scalarsub_spark, 12),
    ("rangeframe", g.draw_rangeframe_case, g.build_rangeframe_spark, 12),
    ("filteragg", g.draw_filteragg_case, g.build_filteragg_spark, 12),
    ("signedzero", g.draw_signedzero_case, g.build_signedzero_spark, 12),
    ("lateral", g.draw_lateral_case, g.build_lateral_spark, 12),
    ("joinchain", g.draw_joinchain_case, g.build_joinchain_spark, 12),
    ("multidistinct", g.draw_multidistinct_case, g.build_multidistinct_spark, 12),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("fuzz-shakeout")
    con = duck_connection(sf_dir)
    failures: list[tuple[str, int, str]] = []
    total = 0
    for name, draw, build, n in AXES:
        t0 = time.monotonic()
        bad = 0
        for seed in range(n):
            total += 1
            case = draw(seed)
            try:
                # the signedzero axis exists to see the class compare()
                # erases: compare_signed layers the byte-level check on
                # the same single collection
                check = compare_signed if name == "signedzero" else compare
                check(build(spark, sf_dir, case), con, case["sql"])
            except AssertionError as e:
                bad += 1
                failures.append((name, seed, str(e).splitlines()[0][:160]))
        status = "ok" if bad == 0 else f"{bad} FAILED"
        print(f"  {name:<9} {n:>3} cases  {time.monotonic() - t0:6.1f}s  {status}")
    print(f"shakeout: {total - len(failures)}/{total} matched at {sf_dir}")
    for name, seed, msg in failures:
        print(f"  DIVERGED {name}[{seed}]: {msg}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
