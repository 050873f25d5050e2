#!/usr/bin/env python
"""Decompose graph_triangle_counts (VERDICT r16 task #5: the new top
committed wall, 7.11 s at sf0.1, code unchanged since r14 -- crack it
the way t16 was cracked: per-stage timing plus a specific check for
hidden re-execution).

Two re-execution suspects, both of the class the t16 study found:

1. the canonical edge list (lineitem distinct -> per-order self-join ->
   pair distinct) feeds BOTH the degree aggregate and the rank-
   annotation join inside the single orientation action -- its subtree
   appears twice in that plan, with only ReuseExchange-level reuse to
   mitigate;
2. the registered node expansion references the wedge+closing-join
   `triangles` plan in THREE unionByName branches -- the whole triangle
   enumeration appears three times in the final plan.

Stages (timed solo, same session, the SAME functions the registered
query calls -- operators/graph.py triangle_counts_plan):

  edges  : materialize the canonical co-purchase edge list
  orient : _oriented_triangles up through the oriented localCheckpoint
           (includes the edge build, x2 if the subtree is re-executed)
  wedge  : wedge join + closing join -> triangle count, off the
           checkpointed orientation
  serve  : node expansion + groupBy + top-20 off the same checkpoint,
           in BOTH node modes (union = registered, explode = candidate)

Variants (end-to-end, fresh plan each):
  current   : cache_edges=False, node_mode=union   (registered r14-r16)
  edgecache : cache_edges=True,  node_mode=union
  explode   : cache_edges=False, node_mode=explode
  both      : cache_edges=True,  node_mode=explode

Usage:
    python tools/triangle_stage_study.py [--repeats 3] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    repeats = 3
    sf_dir = "/root/testdata/sf0.1"
    args = sys.argv[1:]
    while args:
        flag = args.pop(0)
        if flag == "--repeats":
            repeats = int(args.pop(0))
        elif flag.startswith("--"):
            raise SystemExit(f"unknown flag {flag}")
        else:
            sf_dir = flag

    from fantasy_premier_league_spark.operators.graph import (
        _copurchase_edges,
        _copurchase_is_small,
        _oriented_triangles,
        _triangle_top_nodes,
        triangle_counts_plan,
    )
    from fantasy_premier_league_spark.session import get_spark

    spark = get_spark("triangle-stage-study")
    pc = time.perf_counter

    # warmup: one full registered-shape run (JVM codegen + parquet
    # footer caches out of repeat 1)
    _noop(triangle_counts_plan(spark, sf_dir))

    small = _copurchase_is_small(spark, sf_dir)
    runs = []
    for _ in range(repeats):
        t0 = pc()
        _noop(_copurchase_edges(spark, sf_dir, small))
        t_edges = pc() - t0
        # orient: the localCheckpoint inside _oriented_triangles is
        # eager, so the call itself prices edge-build(s) + orientation
        t0 = pc()
        triangles = _oriented_triangles(
            _copurchase_edges(spark, sf_dir, small), small
        )
        t_orient = pc() - t0
        t0 = pc()
        _noop(triangles)
        t_wedge = pc() - t0
        t0 = pc()
        _noop(_triangle_top_nodes(triangles, "union"))
        t_serve_union = pc() - t0
        t0 = pc()
        _noop(_triangle_top_nodes(triangles, "explode"))
        t_serve_explode = pc() - t0
        runs.append(
            {
                "edges": t_edges,
                "orient": t_orient,
                "wedge": t_wedge,
                "serve_union": t_serve_union,
                "serve_explode": t_serve_explode,
            }
        )

    variants = {}
    for name, cache_edges, node_mode in (
        ("current", False, "union"),
        ("edgecache", True, "union"),
        ("explode", False, "explode"),
        ("both", True, "explode"),
    ):
        walls = []
        for _ in range(repeats):
            t0 = pc()
            _noop(triangle_counts_plan(spark, sf_dir, cache_edges, node_mode))
            walls.append(pc() - t0)
        variants[name] = statistics.median(walls)

    med = lambda k: statistics.median(r[k] for r in runs)  # noqa: E731
    print(f"# graph_triangle_counts stage decomposition "
          f"(repeats={repeats}, sf_dir={sf_dir}, small={small})")
    print()
    print("| stage | med wall (s) | reading |")
    print("|---|---|---|")
    print(f"| edges (solo) | {med('edges'):.2f} | "
          "lineitem distinct + per-order self-join + pair distinct |")
    print(f"| orient (edges + degree/rank + checkpoint) | "
          f"{med('orient'):.2f} | "
          f"excess over 1x edges: {med('orient') - med('edges'):.2f} s; "
          f"over 2x edges: {med('orient') - 2 * med('edges'):.2f} s |")
    print(f"| wedge+closing (off checkpoint) | {med('wedge'):.2f} | "
          "the orientation-bounded enumeration itself |")
    print(f"| serve, union mode (registered) | {med('serve_union'):.2f} | "
          f"{med('serve_union') / max(med('wedge'), 1e-9):.2f}x the single "
          "wedge pass -- the 3-branch re-execution price |")
    print(f"| serve, explode mode | {med('serve_explode'):.2f} | "
          f"{med('serve_explode') / max(med('wedge'), 1e-9):.2f}x the "
          "single wedge pass |")
    print()
    print("| variant (end-to-end, fresh plan) | med wall (s) | vs current |")
    print("|---|---|---|")
    for name, wall in variants.items():
        print(f"| {name} | {wall:.2f} | "
              f"{wall / variants['current']:.2f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
