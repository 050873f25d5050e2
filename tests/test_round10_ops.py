"""Round-10 behavior tests: BPE merge-loop invariants (the oracle
parity suite is the value gate; these pin the semantics that a hash
can't explain on its own)."""

from __future__ import annotations

from fantasy_premier_league_spark.operators.textstats import (
    _BPE_MERGES,
    bpe_train_merges,
)

SF = "/root/testdata/sf0.001"


def test_bpe_merge_invariants(spark):
    rows = bpe_train_merges(spark, SF).collect()
    assert [r["step"] for r in rows] == list(range(1, _BPE_MERGES + 1))
    seen = set()
    for r in rows:
        # each merge concatenates its own pair and is weighted by real
        # occurrences
        assert r["merged"] == r["left_sym"] + r["right_sym"]
        assert r["pair_count"] > 0
        # a pair, once merged, can never be the argmax again (its
        # occurrences were rewritten into the merged symbol)
        assert (r["left_sym"], r["right_sym"]) not in seen
        seen.add((r["left_sym"], r["right_sym"]))
    # later merges may legitimately build on earlier ones: merged
    # symbols are multi-char, singles are chars
    assert all(len(r["merged"]) >= 2 for r in rows)


def test_bpe_is_deterministic(spark):
    a = [tuple(r) for r in bpe_train_merges(spark, SF).collect()]
    b = [tuple(r) for r in bpe_train_merges(spark, SF).collect()]
    assert a == b
