#!/usr/bin/env python
"""Strict pandas-path preflight of the driver's correctness gate
(VERDICT r11 #3).

The driver hashes query results through a pandas fetch path
(`df.toPandas()` on the Spark side, `con.execute(sql).fetchdf()` on the
DuckDB side). The local parity harness normalizes values through
`fetchall()` + repr, which COLLAPSES type-level divergences: DuckDB
HUGEINT renders float64 in pandas (690415.0 vs int64 690415) yet equal
via fetchall -- exactly the class that cost rounds 9-11 on
quality_perceptron_train. This tool runs BOTH engines through the
strict pandas path and reports, per query:

  IDENTICAL -- same dtypes per column AND byte-exact values
  DTYPE     -- per-column pandas dtypes differ (the latent driver class)
  VALUES    -- dtypes match but values differ (a real divergence the
               value-normalizing harness may also be hiding)

The r11 preflight (commit 017acef) found 7/50 dtype-divergent rows and
recorded the finding only in the commit message; this committed tool
plus its PREFLIGHT_r{N}.json artifact make the list inspectable and the
"byte-identical" state re-checkable every round (tolerated-today is not
a contract -- the HUGEINT lesson).

Usage:
    python tools/strict_preflight.py                    # predicted next driver head
    python tools/strict_preflight.py --queries a,b,c
    python tools/strict_preflight.py --from-artifact CORRECTNESS_r11.json
    python tools/strict_preflight.py --out PREFLIGHT_r12.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def canon(df: pd.DataFrame) -> tuple[dict[str, str], list[tuple]]:
    """(per-column dtype map, rows sorted on a dtype-independent key).

    The sort key stringifies every cell so int32/int64 or
    datetime64/date-object frames sort the SAME way and the value diff
    below reports cell-level divergence, not ordering noise.
    """
    cols = sorted(df.columns)
    df = df[cols]
    dtypes = {c: str(df[c].dtype) for c in cols}
    rows = [tuple(r) for r in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda t: tuple(str(v) for v in t))
    return dtypes, rows


def _cell_eq(a: object, b: object) -> bool:
    """Byte-exact cell equality: same concrete type AND same repr.
    NaN == NaN (both engines emit it for the same nulls)."""
    if type(a) is not type(b):
        # numpy scalars vs python scalars ARE a pandas-path divergence
        return False
    if a != a and b != b:  # NaN
        return True
    return repr(a) == repr(b)


def compare_strict(sdf_pd: pd.DataFrame, ddf_pd: pd.DataFrame) -> dict:
    s_dtypes, s_rows = canon(sdf_pd)
    d_dtypes, d_rows = canon(ddf_pd)
    out: dict = {"status": "IDENTICAL"}
    dtype_diffs = {
        c: [s_dtypes.get(c), d_dtypes.get(c)]
        for c in set(s_dtypes) | set(d_dtypes)
        if s_dtypes.get(c) != d_dtypes.get(c)
    }
    if dtype_diffs:
        out["status"] = "DTYPE"
        out["dtype_diffs"] = dict(sorted(dtype_diffs.items()))
    if len(s_rows) != len(d_rows):
        out["status"] = "VALUES" if not dtype_diffs else "DTYPE"
        out["rows"] = [len(s_rows), len(d_rows)]
        return out
    # cell-level diff only when dtypes agree (differing dtypes imply
    # differing cell types by construction -- don't double-report)
    if not dtype_diffs:
        n_bad = 0
        first = None
        for sr, dr in zip(s_rows, d_rows):
            for i, (a, b) in enumerate(zip(sr, dr)):
                if not _cell_eq(a, b):
                    n_bad += 1
                    if first is None:
                        first = {
                            "col": sorted(s_dtypes)[i],
                            "spark": repr(a),
                            "duck": repr(b),
                        }
                    break
        if n_bad:
            out["status"] = "VALUES"
            out["n_diff_rows"] = n_bad
            out["first_diff"] = first
    return out


def predicted_head(n: int = 50) -> list[str]:
    from fantasy_premier_league_spark.plans.registry import (
        all_queries,
        sample_priority,
    )

    return sample_priority(list(all_queries()))[:n]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", help="comma-separated query names")
    ap.add_argument("--from-artifact", help="CORRECTNESS_r*.json whose keys to check")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--out", help="write the JSON report here too")
    args = ap.parse_args()

    from oracle_harness import duck_connection

    from fantasy_premier_league_spark.plans.registry import all_oracles, all_queries
    from fantasy_premier_league_spark.session import get_spark

    queries, oracles = all_queries(), all_oracles()
    if args.queries:
        names = [s.strip() for s in args.queries.split(",") if s.strip()]
    elif args.from_artifact:
        with open(args.from_artifact) as fh:
            names = list(json.load(fh))
    else:
        names = predicted_head()
    unknown = [n for n in names if n not in queries]
    if unknown and args.queries:
        # explicit names: a typo must abort, not silently skip
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    if unknown:
        # artifact/head mode: names may have been deregistered since
        # the artifact was written (retired twins/probes) -- note them
        print(f"# skipping deregistered: {unknown}", file=sys.stderr)
        names = [n for n in names if n in queries]

    spark = get_spark("fpl-spark-preflight")
    con = duck_connection(args.sf_dir)
    report: dict[str, dict] = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            report[name] = {"status": "NO_ORACLE"}
            continue
        try:
            sdf = queries[name](spark, args.sf_dir).toPandas()
            ddf = con.execute(sql).fetchdf()
            report[name] = compare_strict(sdf, ddf)
        except Exception as exc:  # noqa: BLE001 - record and continue
            report[name] = {"status": "ERROR", "err": f"{type(exc).__name__}: {exc}"[:300]}

    counts: dict[str, int] = {}
    for name, row in report.items():
        counts[row["status"]] = counts.get(row["status"], 0) + 1
        if row["status"] not in ("IDENTICAL", "NO_ORACLE"):
            print(f"{row['status']} {name}: "
                  f"{json.dumps({k: v for k, v in row.items() if k != 'status'})}")
    print(f"# strict preflight @ {args.sf_dir}: "
          + ", ".join(f"{k}={v}" for k, v in sorted(counts.items())))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(
                {"sf_dir": args.sf_dir, "counts": counts, "queries": report},
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
    bad = sum(v for k, v in counts.items() if k not in ("IDENTICAL", "NO_ORACLE"))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
