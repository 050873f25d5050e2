#!/usr/bin/env python
"""Solo-time registered queries with the noop sink and/or dump their
``explain("formatted")`` plans (optimization-round workhorse, guide
S1.1/S1.4: isolate the computation, read the plan, then change it).

Usage:
    python tools/qtime.py [--repeats 3] [--sf DIR] [--plan-out FILE] q1 [q2 ...]

Prints one line per query: median/min/max wall seconds over repeats
(first repeat reported separately as warmup). With --plan-out and a
single query, writes the formatted plan to FILE.
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plan_out = None
    names: list[str] = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--repeats":
            repeats = int(args.pop(0))
        elif a == "--sf":
            sf_dir = args.pop(0)
        elif a == "--plan-out":
            plan_out = args.pop(0)
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a}")
        else:
            names.append(a)
    if not names:
        raise SystemExit("no query names given")
    if plan_out and len(names) != 1:
        raise SystemExit("--plan-out needs exactly one query")

    from fantasy_premier_league_spark.plans.registry import all_queries
    from fantasy_premier_league_spark.session import get_spark

    queries = all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("qtime")
    for name in names:
        fn = queries[name]
        if plan_out:
            df = fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(plan_out, "w") as fh:
                fh.write(txt)
            print(f"{name}: plan -> {plan_out} ({len(txt.splitlines())} lines)")
        walls = []
        for i in range(repeats + 1):  # +1 warmup
            spark.sparkContext.setJobDescription(f"qtime:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        warm, rest = walls[0], walls[1:]
        print(
            f"{name}: med={statistics.median(rest):.3f} min={min(rest):.3f} "
            f"max={max(rest):.3f} warmup={warm:.3f} (n={repeats})"
        )


if __name__ == "__main__":
    main()
