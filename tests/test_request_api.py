"""Request-API behavior tests (ui.py req_types 1-3, FIXTURES.md section 5):
response shapes, the Invalid Team path, the Not Found path, and the
canonical quirk fixes (goals present in profile, real card counts)."""

from __future__ import annotations

import json
import os

import pytest

from fantasy_premier_league_spark.operators.api import (
    REQ1,
    REQ2,
    REQ3,
    match_details,
    player_profile,
    predict_win,
)
from fantasy_premier_league_spark.sources.fpl_fixtures import ensure_fixtures


def _load(path):
    with open(path) as f:
        return json.load(f)


def test_predict_win_valid(spark):
    out = predict_win(spark, _load(REQ1))
    assert set(out) == {"team1", "team2"}
    c1 = out["team1"]["winning chance"]
    c2 = out["team2"]["winning chance"]
    assert c1 + c2 == pytest.approx(100.0)
    assert out["team1"]["name"] == "Arsenal"


def test_predict_win_invalid_composition(spark):
    req = _load(REQ1)
    # swap the GK (player1, slot 0) for a second FW-role bench player:
    # composition becomes gk=0 -> invalid (ui.py:53)
    req["team1"]["player1"] = "Player Arsenal 14"
    out = predict_win(spark, req)
    assert out == {"status": "Invalid Team"}


def test_predict_win_unknown_player(spark):
    req = _load(REQ1)
    req["team2"]["player3"] = "No Such Player"
    out = predict_win(spark, req)
    assert out == {"status": "Invalid Team"}


def test_player_profile_includes_goals(spark):
    out = player_profile(spark, _load(REQ2)["name"])
    assert out is not None
    # spec-required field the reference omits (ui.py:100-104)
    assert "goals" in out
    for k in ("name", "birthArea", "foot", "role", "height", "weight",
              "fouls", "own goals", "pass_acc", "shots on target"):
        assert k in out
    assert out["fouls"] >= 0 and 0.0 <= out["pass_acc"] <= 1.0


def test_player_profile_unknown_name(spark):
    assert player_profile(spark, "No Such Player") is None


def test_match_details_found(spark):
    out = match_details(spark, _load(REQ3))
    assert out["winner"] in {"Arsenal", "Chelsea", "Liverpool", "Spurs", "draw"}
    assert out["duration"] == "Regular"
    assert len(out["goals"]) == 30  # 2 teams x (11 lineup + 4 bench)
    assert len(out["own_goals"]) == 30
    # canonical card behavior: no cards in fixtures -> empty lists
    # (the reference would fill every player's name, ui.py:162-163)
    assert out["yellow_cards"] == []
    assert out["red_cards"] == []


def test_match_details_not_found(spark):
    missing = _load(os.path.join(ensure_fixtures(), "requests", "req3_missing.json"))
    assert match_details(spark, missing) == {"status": "Not Found"}


def test_req2_dropped_goals_quirk_twin(spark):
    """Faithful twin omits exactly the goals column; rows otherwise
    identical to the canonical profile (ui.py:102-105)."""
    from fantasy_premier_league_spark.operators.api import (
        fpl_req2,
        fpl_req2_dropped_goals_quirk,
    )

    canon = fpl_req2(spark, "").collect()
    quirk = fpl_req2_dropped_goals_quirk(spark, "").collect()
    assert len(canon) == len(quirk) == 1
    c, q = canon[0].asDict(), quirk[0].asDict()
    assert "goals" in c and "goals" not in q
    c.pop("goals")
    assert c == q


def test_req3_card_list_quirk_twin(spark):
    """Faithful twin lists every rostered player under BOTH colors
    regardless of actual card counts (ui.py:162-163,183-184)."""
    from fantasy_premier_league_spark.operators.api import (
        fpl_req3,
        fpl_req3_card_list_quirk,
    )

    roster = fpl_req3(spark, "").collect()
    quirk = fpl_req3_card_list_quirk(spark, "").collect()
    assert len(quirk) == 2 * len(roster) == 60  # 30 players x 2 colors
    names = {r["player_name"] for r in roster}
    for color in ("yellow", "red"):
        rows = [r for r in quirk if r["card_color"] == color]
        assert {r["player_name"] for r in rows} == names
    # fixtures carry no cards: the quirk lists players anyway, and the
    # carried actual count exhibits the ignored discrepancy
    assert all(r["actual_cards"] == 0 for r in quirk)
