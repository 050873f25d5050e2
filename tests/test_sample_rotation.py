"""The driver samples the FIRST 50 registered queries each round; this
test makes the rotation policy self-enforcing against the committed
CORRECTNESS_r*.json artifacts, so a round can no longer ship changed or
stale queries outside the sampled window (the round-4 and round-5
process defect both VERDICTs flagged).

Since round 8 the head is DERIVED from the artifacts by
``registry.sample_priority`` (changed -> never-sampled -> oldest-first)
rather than hand-listed, and the staleness threshold is
``ceil(N/50)`` rounds -- one full rotation cycle -- instead of the
fixed ">2 rounds" bound that is unsatisfiable at steady state once
N > 150 (VERDICT r7 "what's wrong" #1). These tests verify the derived
head actually honours the rules, so a regression in the derivation
(or a stale-overflow caused by over-registration) still fails red.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from fantasy_premier_league_spark.plans import registry

HEAD_SIZE = 50


def test_sampled_head_covers_changed_new_and_stale():
    current_round, last = registry.driver_history()
    queries = entry_mod.queries()
    head = list(queries)[:HEAD_SIZE]
    threshold = registry.staleness_threshold(len(queries), HEAD_SIZE)

    missing = [n for n in registry.CHANGED_THIS_ROUND if n not in head]
    assert not missing, (
        f"CHANGED_THIS_ROUND queries outside the sampled first {HEAD_SIZE}: "
        f"{missing}"
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
        f"{missing}"
    )

    stale = [
        n for n, rnd in last.items() if n in queries and current_round - rnd > threshold
    ]
    missing = [n for n in stale if n not in head]
    must_fit = len(registry.CHANGED_THIS_ROUND) + len(never_sampled) + len(stale)
    if must_fit <= HEAD_SIZE:
        assert not missing, (
            f"driver evidence older than {threshold} rounds and outside the "
            f"sampled head: {missing}"
        )
    else:
        # more stale queries than head slots: every slot must be spent
        # on changed/new/stale (nothing fresh may ride the head)
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


def test_head_fill_is_oldest_evidence_first():
    """The fill portion (after changed+new) must be sorted by last
    driver round ascending -- the property that makes a full
    re-verification cycle complete in ceil(N/50) rounds."""
    _, last = registry.driver_history()
    queries = list(entry_mod.queries())
    skip = set(registry.CHANGED_THIS_ROUND) | {n for n in queries if n not in last}
    fill_rounds = [last[n] for n in queries if n not in skip]
    assert fill_rounds == sorted(fill_rounds), (
        "sample ordering is not oldest-driver-evidence-first"
    )


def test_changed_and_new_names_are_registered():
    queries = entry_mod.queries()
    dangling = [n for n in registry.CHANGED_THIS_ROUND if n not in queries]
    assert not dangling, f"CHANGED_THIS_ROUND names unregistered queries: {dangling}"
    # NEW_THIS_ROUND entries must become real registrations before the
    # round ships (they hold head slots)
    unregistered_new = [n for n in registry.NEW_THIS_ROUND if n not in queries]
    assert not unregistered_new, (
        f"NEW_THIS_ROUND queries not registered yet: {unregistered_new}"
    )


def test_changed_queries_listed_before_everything_else():
    head = list(entry_mod.queries())[: len(registry.CHANGED_THIS_ROUND)]
    assert set(head) == {
        n for n in registry.CHANGED_THIS_ROUND if n in entry_mod.queries()
    }, "changed queries must sit at the very front of the sample"


def test_driver_artifacts_are_git_tracked():
    """VERDICT r8 #5: the head derivation reads CORRECTNESS_r*.json
    from disk; an untracked artifact means a clean checkout silently
    shifts the derived sample head. Every artifact the derivation sees
    must be committed."""
    import glob
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tracked = set(
        subprocess.run(
            ["git", "ls-files"],
            cwd=repo,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
    )
    on_disk = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    )
    assert on_disk, "no driver artifacts on disk?"
    untracked = [p for p in on_disk if p not in tracked]
    assert not untracked, (
        f"driver artifacts feeding sample_priority() are not committed: "
        f"{untracked} -- commit them (VERDICT r8 #5)"
    )


def test_failed_driver_rows_do_not_refresh_evidence(tmp_path, monkeypatch):
    """ADVICE r8: a query that FAILED its driver check must rotate back
    into the head, i.e. driver_history must skip non-green rows."""
    import json

    green = {
        "rows_match": True, "schema_match": True, "hash_match": True,
        "spark_rows": 5, "oracle_rows": 5, "err": None,
    }
    red_hash = dict(green, hash_match=False)
    errored = dict(green, rows_match=None, schema_match=None,
                   hash_match=None, err="AnalysisException: boom")
    no_oracle = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": 5, "oracle_rows": None, "err": "no_oracle",
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "q_green": green, "q_red": green, "q_err": green, "q_weak": no_oracle,
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "q_red": red_hash, "q_err": errored, "q_weak": no_oracle,
    }))
    monkeypatch.setattr(registry, "_REPO_ROOT", str(tmp_path))
    current, last = registry.driver_history()
    assert current == 3
    assert last["q_green"] == 1
    assert last["q_red"] == 1, "red hash row must not refresh evidence"
    assert last["q_err"] == 1, "errored row must not refresh evidence"
    assert last["q_weak"] == 2, "rows-only pass IS evidence for no-oracle queries"
