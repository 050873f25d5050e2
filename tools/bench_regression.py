#!/usr/bin/env python
"""Per-query bench regression gate (VERDICT r8 #8).

Diffs the current full-headline spread (working-tree BENCH_DETAIL.json,
written by a full `python bench.py` run at the default sf0.1) against
the newest COMMITTED version of the same file whose content differs --
i.e. the previous round's recorded spread -- and flags any query whose
median grew past the threshold. Turns the judge's by-hand round-over-
round diff into a standing tripwire.

Exit status: 1 if any unwaived regression is flagged, else 0.

Usage:
    python tools/bench_regression.py [--threshold 1.5] [--base PATH] [--cur PATH]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(REPO, "BENCH_DETAIL.json")

# Queries whose slowdown is a DELIBERATE trade, with the one-line
# waiver the round record carries (precedent: r7's containment +1.6 s
# at sf0.1 bought the 27x -> 4.1x sf10 collapse). Each entry is
# (base_rev_prefix, reason): the waiver applies ONLY while the gate
# still compares against that committed baseline -- once the base
# moves (next round's BENCH_DETAIL lands, absorbing the slowdown) the
# waiver auto-expires and a recurrence flags normally (ADVICE r10:
# name-keyed waivers persisted across rounds and could mask a real
# future regression on the same query). Grant with:
#   git rev-list -1 HEAD -- BENCH_DETAIL.json
# Prune expired entries when touching this file.
WAIVERS: dict[str, tuple[str, str]] = {
    # (the two r10 waivers -- mm_image_resize's real-decode trade and
    # bucketed_colocated_join's sub-second env drift -- expired when
    # the r10 spread was committed at 48e6e2d and were pruned.)
    # (r11's events_transition_matrix drift -- 1.76x median, 1.16x
    # min-of-spread, no code change since r8 -- is now suppressed
    # structurally by the min-of-spread gate below instead of a waiver;
    # it measured 0.45-0.47 s again across all three r12 runs.)
    # (the two r12 env-drift waivers -- ann_pq_recall and
    # events_trailing_distinct_users, both pinned to the r11 base
    # dd014c74 with solo 7-repeat floor evidence -- expired when the
    # r12 spread was committed at 6e72b08 and were pruned at the start
    # of r13 per VERDICT r12 #3: if either flags again vs the r12
    # base, root-cause, do not re-waive.)
}

# Queries DELIBERATELY removed from the headline list (deregistered
# twins etc). Their disappearance from the current run is expected and
# reported informationally, not as the errored-query regression below.
RETIRED: dict[str, str] = {
    "a3_final_metrics": "r12: redundant events-table twin retired "
    "(VERDICT r11 #2); A3 coverage via fpl_a3_final_metrics",
    "text_winnowing": "r14: bare fingerprint query retired in the "
    "N=200 swap for t19_state_store_reader; the winnowing pipeline "
    "stays timed through dedup_winnowing_pairs",
}

# Re-based comparable contract (BASELINE.md "Re-based comparable
# contract (round 12)"): the 23-query prefix subtotal must stay within
# 2x of the r11 steady-state target.
COMPARABLE_TARGET_S = 20.6
COMPARABLE_MAX_RATIO = 2.0

# below this absolute growth (seconds) a ratio is VM jitter, not signal
MIN_ABS_GROWTH = 0.15


def _steal_note(spread_entry: dict | None) -> str:
    """Contention annotation from the run's OWN telemetry (r15,
    VERDICT r14 #3): a flagged ratio whose wall-clock window recorded
    hypervisor steal carries the evidence inline, so the adjudication
    that took a run-order autopsy in r14 becomes part of the gate
    output. Annotation only -- it NEVER waives; the solo-floor protocol
    stays the named outcome path."""
    peak = (spread_entry or {}).get("steal_max")
    if peak is None or peak < 1.0:
        return ""
    return f" [telemetry: steal_max {peak:.1f}% in-window]"


def _committed_base(cur_text: str) -> tuple[str, dict] | None:
    """Newest committed BENCH_DETAIL.json whose content differs from
    the current file (the previous round's spread)."""
    revs = subprocess.run(
        ["git", "rev-list", "HEAD", "--", "BENCH_DETAIL.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=False,
    ).stdout.split()
    for rev in revs:
        out = subprocess.run(
            ["git", "show", f"{rev}:BENCH_DETAIL.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=False,
        )
        if out.returncode != 0:
            continue
        if out.stdout != cur_text:
            return rev[:9], json.loads(out.stdout)
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--base", help="explicit baseline JSON path")
    ap.add_argument(
        "--waive",
        action="append",
        default=[],
        metavar="NAME",
        help="with --base: apply the named WAIVERS entry to this run "
        "(rev-pinned auto-expiry cannot work against an arbitrary "
        "file, so explicit-base runs apply no waivers unless named)",
    )
    ap.add_argument("--cur", default=DETAIL)
    args = ap.parse_args()

    with open(args.cur) as fh:
        cur_text = fh.read()
    cur = json.loads(cur_text)
    if args.base:
        with open(args.base) as fh:
            base = json.load(fh)
        base_label = args.base
    else:
        found = _committed_base(cur_text)
        if found is None:
            print("bench_regression: no differing committed baseline; nothing to diff")
            return 0
        base_label, base = found

    cq, bq = cur["queries"], base["queries"]
    # The bench VM's load varies run-to-run (BASELINE.md documents ~3x
    # wall jitter; a concurrent process slowed one full 104-query run
    # ~18% uniformly and tripped six unrelated queries past 1.5x). A
    # UNIFORM slowdown carries no per-query signal, so flag each query
    # against the run-wide median ratio, not against 1.0: real
    # regressions move a query relative to its peers either way.
    ratios = sorted(
        cq[n] / bq[n] for n in cq if n in bq and bq[n] > 0
    )
    run_drift = ratios[len(ratios) // 2] if ratios else 1.0
    # only correct for drift, never tighten the gate below its stated
    # threshold when the machine happened to run FASTER
    drift = max(1.0, run_drift)
    flagged, waived, improved, new, suppressed = [], [], [], [], []
    # a baseline query MISSING from the current run is the worst
    # regression there is (it errored or was dropped) -- bench.py
    # records failures in 'errors' and omits them from 'queries', so
    # iterating cur alone would let a total failure sail through
    retired_seen = []
    for name in sorted(set(bq) - set(cq)):
        if name in RETIRED:
            retired_seen.append(f"{name}: {RETIRED[name]}")
            continue
        flagged.append(
            f"{name}: {bq[name]:.2f}s -> MISSING from current run "
            f"(errored or deregistered)"
        )
    c_spread, b_spread = cur.get("spread", {}), base.get("spread", {})
    for name, med in sorted(cq.items()):
        if name not in bq:
            new.append(name)
            continue
        prev = bq[name]
        if prev <= 0:
            continue
        ratio = med / prev
        # Medians of 3 repeats flap at sub-second scale (r10
        # bucketed_colocated_join, r11 events_transition_matrix: both
        # 1.6-1.8x median with min-of-spread ~1.1x, both hand-verified
        # as ambient load). A REAL regression -- a changed plan -- moves
        # the floor too, so when both runs recorded spreads, require
        # the min ratio to clear the threshold as well before flagging.
        cmin = (c_spread.get(name) or {}).get("min")
        bmin = (b_spread.get(name) or {}).get("min")
        min_ok = True  # no spread recorded -> median alone decides
        if cmin is not None and bmin is not None and bmin > 0:
            min_ok = (cmin / bmin) / drift > args.threshold
        median_flagged = (
            ratio / drift > args.threshold and (med - prev) > MIN_ABS_GROWTH
        )
        if median_flagged and not min_ok:
            # ADVICE r11: a min-of-spread save must leave a visible
            # trace in the round record, not vanish into exit 0 -- an
            # INTERMITTENT real regression (median 3x, one fast repeat)
            # is suppressed here too, and only this line preserves the
            # signal for the next human diff.
            suppressed.append(
                f"{name}: {prev:.2f}s -> {med:.2f}s ({ratio:.2f}x raw, "
                f"{ratio / drift:.2f}x drift-adjusted) "
                f"[SUPPRESSED: min-of-spread {cmin / bmin:.2f}x]"
                + _steal_note(c_spread.get(name))
            )
            continue
        if median_flagged:
            row = (
                f"{name}: {prev:.2f}s -> {med:.2f}s ({ratio:.2f}x raw, "
                f"{ratio / drift:.2f}x drift-adjusted)"
            )
            if cmin is not None and bmin:
                row += f" [min-of-spread {cmin / bmin:.2f}x]"
            row += _steal_note(c_spread.get(name))
            waiver = WAIVERS.get(name)
            # ADVICE r12: with an explicit --base PATH, rev-prefix
            # matching is meaningless (base_label is a file path, and
            # the detail payload records no commit) -- but blanket-
            # accepting every waiver on every explicit-base run
            # disables expiry entirely, letting a stale waiver pinned
            # to an old rev keep suppressing regressions against
            # arbitrarily newer baselines. So an explicit-base run
            # applies ONLY waivers the operator names with --waive;
            # committed-base runs keep the rev-prefix auto-expiry.
            if args.base is not None:
                same_base = waiver is not None and name in args.waive
            else:
                same_base = waiver is not None and (
                    waiver[0].startswith(base_label)
                    or base_label.startswith(waiver[0])
                )
            if waiver and same_base:
                waived.append(f"{row} [waived: {waiver[1]}]")
            elif waiver:
                flagged.append(
                    f"{row} [waiver EXPIRED: granted vs base {waiver[0]}, "
                    f"now comparing vs {base_label} -- prune or re-grant]"
                )
            else:
                flagged.append(row)
        elif ratio < 1 / args.threshold and (prev - med) > MIN_ABS_GROWTH:
            improved.append(f"{name}: {prev:.2f}s -> {med:.2f}s ({ratio:.2f}x)")

    print(f"# bench regression gate: cur={args.cur} base={base_label}")
    print(
        f"# {len(cq)} queries vs {len(bq)} baseline; threshold "
        f">{args.threshold}x and >{MIN_ABS_GROWTH}s growth; "
        f"run-wide median ratio {run_drift:.2f}x "
        f"(drift correction {drift:.2f}x)"
    )
    # Re-based comparable contract: gate the prefix subtotal too (only
    # meaningful on full default-SF runs that recorded it).
    sub = cur.get("comparable_subtotal")
    if sub is not None:
        cap = COMPARABLE_TARGET_S * COMPARABLE_MAX_RATIO
        if sub > cap:
            flagged.append(
                f"comparable_subtotal {sub:.1f}s exceeds the re-based "
                f"contract cap {cap:.1f}s "
                f"({COMPARABLE_MAX_RATIO}x of {COMPARABLE_TARGET_S}s, "
                f"BASELINE.md r12)"
            )
        else:
            print(
                f"# comparable_subtotal {sub:.1f}s = "
                f"{sub / COMPARABLE_TARGET_S:.2f}x the re-based "
                f"{COMPARABLE_TARGET_S}s target (cap {cap:.1f}s)"
            )
    for row in flagged:
        print(f"REGRESSION {row}")
    for row in waived:
        print(f"WAIVED {row}")
    for row in suppressed:
        print(f"SUPPRESSED {row}")
    for row in retired_seen:
        print(f"retired {row}")
    for row in improved:
        print(f"improved {row}")
    if new:
        print(f"new (no baseline): {', '.join(new)}")
    if not flagged:
        print("OK: no unwaived per-query regression")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
