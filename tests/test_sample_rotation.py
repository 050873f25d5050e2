"""The driver samples the FIRST 50 registered queries each round; this
test makes the rotation policy self-enforcing against the committed
CORRECTNESS_r*.json artifacts, so a round can no longer ship changed or
stale queries outside the sampled window (the round-4 and round-5
process defect both VERDICTs flagged).

Rules checked (see plans/registry.py SAMPLE_PRIORITY):
  1. every CHANGED_THIS_ROUND query is in the sampled head;
  2. every registered query with NO driver row yet is in the head;
  3. every query whose last driver row is more than two rounds old is
     in the head (so nothing's evidence can silently age out);
  4. the head contains no dangling names (typos in SAMPLE_PRIORITY
     would silently shrink the sampled window).
"""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entry_mod
from fantasy_premier_league_spark.plans import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEAD_SIZE = 50


def _driver_rows() -> tuple[int, dict[str, int]]:
    """(current_round, last_sampled_round per query) from artifacts."""
    last: dict[str, int] = {}
    max_round = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        with open(path) as fh:
            for name in json.load(fh):
                last[name] = max(last.get(name, 0), rnd)
    return max_round + 1, last


def test_sampled_head_covers_changed_new_and_stale():
    current_round, last = _driver_rows()
    queries = entry_mod.queries()
    head = list(queries)[:HEAD_SIZE]

    missing = [n for n in registry.CHANGED_THIS_ROUND if n not in head]
    assert not missing, (
        f"CHANGED_THIS_ROUND queries outside the sampled first {HEAD_SIZE}: "
        f"{missing} -- move them to the top of SAMPLE_PRIORITY"
    )

    never_sampled = [n for n in queries if n not in last]
    # HARD budget (r6 verdict #3): a round may not register more new
    # queries than the verification window can check. There is no grace
    # branch -- over-registering is red locally BEFORE it ships, forcing
    # either fewer registrations per round or staging across rounds.
    overflow = len(registry.CHANGED_THIS_ROUND) + len(never_sampled) - HEAD_SIZE
    assert overflow <= 0, (
        f"changed ({len(registry.CHANGED_THIS_ROUND)}) + never-driver-"
        f"checked ({len(never_sampled)}) queries exceed the {HEAD_SIZE}-"
        f"slot sample window by {overflow}: register fewer queries this "
        f"round (stage the rest for the next round's head)"
    )
    missing = [n for n in never_sampled if n not in head]
    assert not missing, (
        f"queries with no driver row yet are outside the sampled head: "
        f"{missing} -- new queries must enter SAMPLE_PRIORITY"
    )

    stale = [n for n, rnd in last.items() if n in queries and current_round - rnd > 2]
    missing = [n for n in stale if n not in head]
    # if more stale queries exist than head slots, require every slot
    # spent on them (minus changed/new, which outrank staleness)
    must_fit = len(registry.CHANGED_THIS_ROUND) + len(never_sampled) + len(stale)
    if must_fit <= HEAD_SIZE:
        assert not missing, (
            f"driver evidence older than 2 rounds and outside the sampled "
            f"head: {missing} -- rotate them into SAMPLE_PRIORITY"
        )
    else:
        non_priority = [
            n
            for n in head
            if n not in stale
            and n not in registry.CHANGED_THIS_ROUND
            and n not in never_sampled
        ]
        assert not non_priority, (
            f"more stale queries than head slots, yet the head wastes "
            f"slots on fresh queries: {non_priority}"
        )


def test_sample_priority_has_no_dangling_names():
    queries = entry_mod.queries()
    dangling = [
        n
        for n in registry.SAMPLE_PRIORITY
        if n not in queries and n not in registry.NEW_THIS_ROUND
    ]
    assert not dangling, f"SAMPLE_PRIORITY names unregistered queries: {dangling}"
    # NEW_THIS_ROUND entries must become real registrations before the
    # round ships (they hold head slots)
    unregistered_new = [n for n in registry.NEW_THIS_ROUND if n not in queries]
    assert not unregistered_new, (
        f"NEW_THIS_ROUND queries not registered yet: {unregistered_new}"
    )


def test_changed_queries_listed_before_everything_else():
    head = list(entry_mod.queries())[: len(registry.CHANGED_THIS_ROUND) + 8]
    for n in registry.CHANGED_THIS_ROUND:
        assert n in head, (
            f"changed query {n} should sit at the very front of the sample"
        )
