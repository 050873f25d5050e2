"""Run the ENTIRE registered fleet against its DuckDB oracles at an
arbitrary scale factor.

The driver's correctness gate runs at sf0.01 forever; this tool replays
the same queries()-vs-oracle_sql() comparison at a larger SF, where a
decade more rows reach value edges the gate never sees. First run
(r13, sf0.1) machine-found the signed-zero hazard: docs_dsir_weights
doc 3533's log-ratio mean rounded to -0.0 in DuckDB and +0.0 in Spark
-- float-equal, hash-distinct -- now pinned fleet-wide by the
`round(...) + 0` oracle convention (tests/test_round13_ops.py).

Usage:
    python tools/contract_sweep.py [sf_dir]   # default /root/testdata/sf0.1
    python tools/contract_sweep.py .scale/sf1 --queries a,b,c   # subset

Comparison is the repo harness's own (type families + canonical rows,
which intentionally normalizes signed zero like the parity suite); add
--strict-zero to ALSO fail on -0.0-vs-+0.0 splits, the class the
driver's float normalization would see. --queries (comma-separated)
restricts the sweep, e.g. the approximation/threshold tier at a
make_scale.py-built sf1.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from fantasy_premier_league_spark.plans import registry  # noqa: E402
from fantasy_premier_league_spark.session import get_spark  # noqa: E402
from tests.oracle_harness import (  # noqa: E402
    compare,
    compare_signed,
    duck_connection,
)


def main() -> int:
    argv = sys.argv[1:]
    only: set[str] | None = None
    strict_zero = False
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--queries":
            if i + 1 >= len(argv):
                raise SystemExit("--queries needs a comma-separated value")
            only = set(argv[i + 1].split(","))
            i += 2
        elif a.startswith("--queries="):
            only = set(a.split("=", 1)[1].split(","))
            i += 1
        elif a == "--strict-zero":
            strict_zero = True
            i += 1
        elif a.startswith("--"):
            # Unknown flags fail loudly: a typo'd flag silently sweeping
            # the ENTIRE fleet costs ~35 min at sf0.1 (ADVICE r13 #2).
            raise SystemExit(
                f"unrecognized flag {a!r}; known: --queries NAMES | "
                "--queries=NAMES | --strict-zero"
            )
        else:
            args.append(a)
            i += 1
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    registry._load_all()
    if only is not None:
        unknown = only - set(registry.QUERIES)
        if unknown:
            raise SystemExit(f"--queries names not registered: {sorted(unknown)}")
    spark = get_spark("contract-sweep")
    con = duck_connection(sf_dir)
    failures: list[tuple[str, str]] = []
    n = 0
    t0 = time.monotonic()
    for name, fn in registry.QUERIES.items():
        if only is not None and name not in only:
            continue
        n += 1
        oracle = registry.ORACLES.get(name)
        try:
            df = fn(spark, sf_dir)
            if oracle is None:
                rows = df.count()  # rows-only queries: must still run
                print(f"{n:3d} {name}: rows-only ({rows})", flush=True)
                continue
            # compare_signed collects each side ONCE and layers the
            # byte-level signed-zero multiset check on top; the r13
            # form re-executed both engines a second time per query
            (compare_signed if strict_zero else compare)(df, con, oracle)
            print(f"{n:3d} {name}: OK", flush=True)
        except Exception as ex:
            failures.append((name, str(ex).splitlines()[0][:160]))
            print(f"{n:3d} {name}: FAIL {str(ex)[:160]}", flush=True)
    print(
        f"sweep: {n - len(failures)}/{n} matched at {sf_dir}"
        f" in {time.monotonic() - t0:.0f}s"
    )
    for name, msg in failures:
        print(f"  DIVERGED {name}: {msg}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
