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
    python tools/contract_sweep.py --strict-zero --out SWEEP_r17.json

Comparison is the repo harness's own (type families + canonical rows,
which intentionally normalizes signed zero like the parity suite); add
--strict-zero to ALSO fail on -0.0-vs-+0.0 splits, the class the
driver's float normalization would see. --queries (comma-separated)
restricts the sweep, e.g. the approximation/threshold tier at a
make_scale.py-built sf1.

--out writes a committed-artifact JSON (VERDICT r16 task #2: closing-run
gates were prose-only -- the stdout-only sweep left SURVEY's wall claims
unverifiable after the fact). The artifact carries per-query status, the
sf_dir, the strict-zero flag, and the wall;
tests/test_closing_artifacts.py requires the NEWEST SWEEP_r{N}.json to
be git-tracked, divergence-free, and to cover EXACTLY the registered
fleet, so a registration change forces a fresh committed sweep. --out is
refused with --queries: a subset run must never masquerade as fleet
coverage.
"""

from __future__ import annotations

import json
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
    out_path: str | None = None
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
        elif a == "--out":
            if i + 1 >= len(argv):
                raise SystemExit("--out needs a path")
            out_path = argv[i + 1]
            i += 2
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
            i += 1
        elif a.startswith("--"):
            # Unknown flags fail loudly: a typo'd flag silently sweeping
            # the ENTIRE fleet costs ~35 min at sf0.1 (ADVICE r13 #2).
            raise SystemExit(
                f"unrecognized flag {a!r}; known: --queries NAMES | "
                "--queries=NAMES | --strict-zero | --out PATH"
            )
        else:
            args.append(a)
            i += 1
    if out_path is not None and only is not None:
        # a subset artifact would satisfy nothing and could be mistaken
        # for fleet coverage -- the coverage test checks exact equality
        # with the registered fleet anyway, so fail at the source
        raise SystemExit("--out is only valid for full-fleet sweeps (no --queries)")
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    registry._load_all()
    if only is not None:
        unknown = only - set(registry.QUERIES)
        if unknown:
            raise SystemExit(f"--queries names not registered: {sorted(unknown)}")
    spark = get_spark("contract-sweep")
    con = duck_connection(sf_dir)
    report: dict[str, dict] = {}
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
                report[name] = {"status": "ROWS_ONLY", "rows": rows}
                print(f"{n:3d} {name}: rows-only ({rows})", flush=True)
                continue
            # compare_signed collects each side ONCE and layers the
            # byte-level signed-zero multiset check on top; the r13
            # form re-executed both engines a second time per query
            (compare_signed if strict_zero else compare)(df, con, oracle)
            report[name] = {"status": "OK"}
            print(f"{n:3d} {name}: OK", flush=True)
        except Exception as ex:
            msg = str(ex).splitlines()[0][:160]
            report[name] = {"status": "FAIL", "err": msg}
            failures.append((name, msg))
            print(f"{n:3d} {name}: FAIL {str(ex)[:160]}", flush=True)
    wall_s = round(time.monotonic() - t0, 1)
    print(f"sweep: {n - len(failures)}/{n} matched at {sf_dir} in {wall_s:.0f}s")
    for name, msg in failures:
        print(f"  DIVERGED {name}: {msg}")
    if out_path is not None:
        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "strict_zero": strict_zero,
                    "wall_s": wall_s,
                    "n": n,
                    "n_failed": len(failures),
                    "queries": report,
                },
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
        print(f"sweep artifact written to {out_path}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
