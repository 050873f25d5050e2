"""Deterministic FPL match/event fixture generator (FIXTURES.md sections 1-4).

The reference consumes a socket stream of one match JSON followed by its
event JSONs (`/root/reference/master.py:330`, docs/Presentation.pdf
"Initialisation"). For hermetic tests we materialize that stream as one
JSONL file per match under a content-versioned temp dir: the file source
replays it for Structured Streaming, the batch pipeline reads the same
files, and the DuckDB oracle re-derives every metric from the identical
raw JSON -- a full-chain differential test.

Determinism: seeded ``random.Random``; the directory is stamped with a
VERSION marker and regenerated only when the generator changes, so
repeated driver runs (Spark query, then oracle) see identical bytes.

Coverage matrix (FIXTURES.md section 4) is force-injected into match 1:
every (eventId, tags) branch of the reference's getMetrics
(`master.py:48-138`), including the eventId-not-in-{1,2,3,8,10} record
carrying tag 102 that pins the 19-tuple default-branch quirk, players
with zero events of some type (divide-by-zero paths), and all four
substitution-span shapes (`master.py:280-291`).
"""

from __future__ import annotations

import datetime
import json
import os
import random
import shutil
import tempfile

VERSION = "fpl_fixtures_v2"  # v2: escaped-unicode name for (team 0, slot 5)

N_TEAMS = 4
PLAYERS_PER_TEAM = 15  # 11 lineup + 4 bench
N_PLAYERS = N_TEAMS * PLAYERS_PER_TEAM
N_MATCHES = 12

ROLES = ["GK", "DF", "DF", "DF", "DF", "MD", "MD", "MD", "MD", "FW", "FW",
         "GK", "DF", "MD", "FW"]  # per-team slot -> role; bench mirrors XI shape

TEAM_NAMES = ["Arsenal", "Chelsea", "Liverpool", "Spurs"]
AREAS = ["England", "France", "Spain", "Brazil", "Germany"]
VENUES = ["Emirates", "Stamford Bridge", "Anfield", "White Hart Lane"]

# (eventId, subEventId, tags) templates; weights tuned so every player
# accumulates passes/duels/shots/fouls/FKs across a match.
EVENT_TEMPLATES = [
    (8, 80, [1801], 30),        # accurate normal pass
    (8, 80, [1802], 12),        # inaccurate normal pass
    (8, 80, [302, 1801], 5),    # accurate key pass
    (8, 80, [302, 1802], 2),    # inaccurate key pass
    (1, 10, [703], 8),          # duel won
    (1, 10, [702], 4),          # duel neutral
    (1, 10, [701], 8),          # duel lost
    (10, 100, [1801], 3),       # shot on target, no goal
    (10, 100, [1801, 101], 1),  # shot on target, goal
    (10, 100, [1802], 3),       # shot off target
    (3, 30, [1801], 3),         # effective free kick
    (3, 35, [101], 1),          # penalty goal (subEventId 35, master.py:129)
    (3, 30, [1802], 2),         # ineffective free kick
    (2, 20, [], 4),             # foul
]

# pins the reference default-branch quirk input shape (master.py:138):
# an eventId outside {1,2,3,8,10} carrying tag 102 (own goal)
QUIRK_EVENT = (7, 70, [102])


def player_id(team: int, slot: int) -> int:
    return 1000 + team * 100 + slot


# The reference's players.csv stores non-ASCII names as LITERAL
# backslash-u escapes ("Andr\\u00e9 Ramalho Silva",
# /root/reference/data/players.csv:2) and ui.py:41 matches request
# names byte-exactly against that escaped text -- requests must carry
# the ESCAPED form, never the decoded "André". One fixture player pins
# this (SURVEY 1.2; VERDICT r10 #6): (team 0, slot 5) is req2's lookup
# target, so the escaped name flows through the request path
# end-to-end on every round's req2 gates.
ESCAPED_TEAM, ESCAPED_SLOT = 0, 5


def player_name(team: int, slot: int) -> str:
    if (team, slot) == (ESCAPED_TEAM, ESCAPED_SLOT):
        return f"Play\\u00e9r {TEAM_NAMES[team]} {slot:02d}"
    return f"Player {TEAM_NAMES[team]} {slot:02d}"


def make_players() -> list[dict]:
    rng = random.Random(421)
    rows = []
    for team in range(N_TEAMS):
        for slot in range(PLAYERS_PER_TEAM):
            pid = player_id(team, slot)
            rows.append(
                {
                    "name": player_name(team, slot),
                    "birthArea": rng.choice(AREAS),
                    "birthDate": f"{rng.randint(1980, 2000)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}",
                    "foot": rng.choice(["right", "left", "both"]),
                    "role": ROLES[slot],
                    "height": rng.randint(160, 200),
                    "passportArea": rng.choice(AREAS),
                    "weight": rng.randint(60, 95),
                    "Id": pid,
                }
            )
    return rows


def make_teams() -> list[dict]:
    return [{"name": TEAM_NAMES[t], "Id": 10 + t} for t in range(N_TEAMS)]


def _roster_entry(pid: int, goals: int = 0, own_goals: int = 0,
                  yellow: int = 0, red: int = 0) -> dict:
    # goals fields are int-or-"null" strings in the wild (FIXTURES.md section 3)
    return {
        "playerId": pid,
        "goals": str(goals) if goals else "null",
        "ownGoals": str(own_goals) if own_goals else "null",
        "yellowCards": str(yellow) if yellow else "null",
        "redCards": str(red) if red else "null",
    }


def make_match(rng: random.Random, match_no: int) -> tuple[dict, list[dict]]:
    home = match_no % N_TEAMS
    away = (match_no + 1 + match_no // N_TEAMS) % N_TEAMS
    if away == home:
        away = (home + 1) % N_TEAMS
    match_id = 5000 + match_no
    # one match per day => (player, match) horizon == day; real calendar
    # arithmetic so SCALED fixture dirs (ensure_fixtures(scale>1), 120+
    # matches) roll past April -- identical strings for matches 0..11
    date = str(datetime.date(2018, 4, 1) + datetime.timedelta(days=match_no))

    teams_data = {}
    fielded: list[tuple[int, int]] = []  # (playerId, teamId)
    for side, team in (("home", home), ("away", away)):
        team_id = 10 + team
        lineup = [_roster_entry(player_id(team, s)) for s in range(11)]
        bench = [_roster_entry(player_id(team, s)) for s in range(11, PLAYERS_PER_TEAM)]
        # span shapes (master.py:280-291): slot 10 subbed out for slot 11;
        # slot 9 subbed out for slot 12; slots 13-14 stay unused (-1,-1)
        subs = [
            {"playerIn": player_id(team, 11), "playerOut": player_id(team, 10),
             "minute": 46 + (match_no % 20)},
            {"playerIn": player_id(team, 12), "playerOut": player_id(team, 9),
             "minute": 60 + (match_no % 15)},
        ]
        teams_data[str(team_id)] = {
            "teamId": team_id,
            "side": side,
            "score": 0,
            "scoreHT": 0,
            "scoreET": 0,
            "scoreP": 0,
            "hasFormation": 1,
            "coachId": 9000 + team,
            "formation": {"lineup": lineup, "bench": bench, "substitutions": subs},
        }
        for s in list(range(11)) + [11, 12]:
            fielded.append((player_id(team, s), team_id))

    score_h, score_a = rng.randint(0, 3), rng.randint(0, 3)
    winner = 0 if score_h == score_a else (10 + home if score_h > score_a else 10 + away)
    match = {
        "wyId": match_id,
        "label": f"{TEAM_NAMES[home]} - {TEAM_NAMES[away]}, {score_h} - {score_a}",
        "dateutc": f"{date} 18:00:00",
        "duration": "Regular",
        "winner": winner,
        "venue": VENUES[home],
        "gameweek": match_no + 1,
        "status": "Played",
        "competitionId": 364,
        "seasonId": 181150,
        "roundId": 4405654,
        "date": f"{date} 18:00:00",
        "teamsData": teams_data,
    }

    templates = [(e, s, t) for e, s, t, w in EVENT_TEMPLATES for _ in range(w)]
    events: list[dict] = []
    eid = match_id * 10_000
    for pid, team_id in fielded:
        # slot-9 players get no shots in even matches -> div-by-zero paths
        n_events = rng.randint(8, 24)
        for _ in range(n_events):
            e, sub, tags = rng.choice(templates)
            if pid % 100 == 9 and match_no % 2 == 0 and e == 10:
                continue
            eid += 1
            events.append(_event(eid, e, sub, tags, pid, match_id, team_id, rng))
    if match_no == 0:
        # force-inject the full coverage matrix + the default-branch quirk
        for e, sub, tags, _w in EVENT_TEMPLATES:
            eid += 1
            events.append(_event(eid, e, sub, tags, player_id(home, 0), match_id, 10 + home, rng))
        eid += 1
        e, sub, tags = QUIRK_EVENT
        events.append(_event(eid, e, sub, tags, player_id(away, 5), match_id, 10 + away, rng))
    rng.shuffle(events)  # stream order within a match is not meaningful
    return match, events


def _event(eid, event_id, sub_id, tags, pid, match_id, team_id, rng) -> dict:
    return {
        "eventId": event_id,
        "subEventId": sub_id,
        "tags": [{"id": t} for t in tags],
        "playerId": pid,
        "matchId": match_id,
        "teamId": team_id,
        "eventSec": round(rng.uniform(0.0, 3000.0), 2),
        "matchPeriod": rng.choice(["1H", "2H"]),
        "id": eid,
        "eventName": {1: "Duel", 2: "Foul", 3: "Free Kick", 7: "Others on the ball",
                      8: "Pass", 10: "Shot"}.get(event_id, "Other"),
        "subEventName": "",
    }


def fixtures_dir(scale: int = 1) -> str:
    suffix = "" if scale == 1 else f"_x{scale}"
    return os.path.join(tempfile.gettempdir(), VERSION + suffix)


def ensure_fixtures(scale: int = 1) -> str:
    """Generate (idempotently) and return the fixture directory.

    ``scale`` multiplies the match count (N_MATCHES * scale, same
    players/teams/request fixtures) into a SEPARATE content-versioned
    dir -- the stream-volume axis for the t16 / request-chain scaling
    study (VERDICT r8 #3). scale=1 bytes are unchanged.

    Layout:
      players.csv, teams.csv            -- dimension tables (S2/S3)
      stream/match_<nnnn>.jsonl         -- 1 match record then its events,
                                           one file per match (stream replay
                                           order, master.py stream contract)
      requests/req{1,2,3}*.json         -- request fixtures (S4)
    """
    root = fixtures_dir(scale)
    marker = os.path.join(root, "_COMPLETE")
    if os.path.exists(marker):
        ensure_invalid_req1(root)
        ensure_corrupt_feed(root)
        return root
    # Stage-then-atomic-rename publication (review r9, same race class
    # as the scratch-dir fixes): generating directly into the shared
    # content-versioned dir let a second session's regeneration
    # truncate stream files a live session was already reading in the
    # pre-marker window. Each generator builds its own stage dir and
    # publishes with one rename, so `root` either doesn't exist or is
    # complete-with-marker; root-without-marker can only be a crashed
    # pre-fix leftover (no reader can have seen it past the marker
    # check above), safe to clear.
    import glob as _glob
    import time as _time

    stage = f"{root}.stage{os.getpid()}"
    shutil.rmtree(stage, ignore_errors=True)
    # a crashed generator leaks its stage tree (nothing else matches
    # the *.stage* names); clear hour-stale ones -- generation takes
    # seconds, so an hour-old stage can only be dead (review r9)
    for leftover in _glob.glob(f"{root}.stage*"):
        if leftover != stage:
            try:
                if os.path.getmtime(leftover) < _time.time() - 3600:
                    shutil.rmtree(leftover, ignore_errors=True)
            except OSError:
                pass
    try:
        _generate_into(stage, scale)
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    for _ in range(3):
        try:
            os.rename(stage, root)
            break
        except OSError:
            if os.path.exists(marker):  # a concurrent generator won
                shutil.rmtree(stage, ignore_errors=True)
                break
            # root without marker = crashed pre-fix partial. Claim it
            # ATOMICALLY by renaming it aside before deleting: a bare
            # marker-check-then-rmtree would race a concurrent
            # publisher and delete its complete, possibly in-use output
            # (review r9 TOCTOU). If the rename-aside grabs a root that
            # a winner published in the interim, our own stage holds
            # byte-identical content (deterministic generator, same
            # VERSION), so the subsequent publish restores it.
            aside = f"{root}.old{os.getpid()}"
            try:
                os.rename(root, aside)
            except OSError:
                pass  # another session claimed or published; retry
            else:
                # Narrow TOCTOU (ADVICE r9): a concurrent winner may
                # have published a COMPLETE root between our marker
                # check and the rename-aside -- deleting it would
                # open a FileNotFound window for a third session that
                # already passed its own marker check, until our
                # byte-identical republish lands. Re-check the marker
                # INSIDE the claimed dir: complete -> put it straight
                # back (rename is atomic; no window at all); partial
                # -> it really was a crashed leftover, delete it.
                if os.path.exists(os.path.join(aside, "_COMPLETE")):
                    try:
                        os.rename(aside, root)
                        shutil.rmtree(stage, ignore_errors=True)
                        break
                    except OSError:
                        # yet another publish landed meanwhile; ours
                        # and theirs are byte-identical, drop the copy
                        shutil.rmtree(aside, ignore_errors=True)
                        shutil.rmtree(stage, ignore_errors=True)
                        break
                shutil.rmtree(aside, ignore_errors=True)
    else:
        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(f"could not publish fixtures at {root}")
    if not os.path.exists(marker):
        raise RuntimeError(f"fixture dir incomplete after publish: {root}")
    ensure_invalid_req1(root)
    ensure_corrupt_feed(root)
    return root


def _generate_into(root: str, scale: int) -> None:
    os.makedirs(os.path.join(root, "stream"), exist_ok=True)
    os.makedirs(os.path.join(root, "requests"), exist_ok=True)
    marker = os.path.join(root, "_COMPLETE")

    players = make_players()
    with open(os.path.join(root, "players.csv"), "w") as f:
        cols = ["name", "birthArea", "birthDate", "foot", "role", "height",
                "passportArea", "weight", "Id"]
        f.write(",".join(cols) + "\n")
        for p in players:
            f.write(",".join(str(p[c]) for c in cols) + "\n")
    with open(os.path.join(root, "teams.csv"), "w") as f:
        f.write("name,Id\n")
        for t in make_teams():
            f.write(f"{t['name']},{t['Id']}\n")

    rng = random.Random(42)
    first_match = None
    n_matches = N_MATCHES * scale
    # zero-pad to the widest name so path order == chronological order
    # at any scale; scale=1 keeps the original match_NN names
    width = max(2, len(str(n_matches - 1)))
    for m in range(n_matches):
        match, events = make_match(rng, m)
        if first_match is None:
            first_match = match
        with open(
            os.path.join(root, "stream", f"match_{m:0{width}d}.jsonl"), "w"
        ) as f:
            f.write(json.dumps(match, separators=(",", ":")) + "\n")
            for ev in events:
                f.write(json.dumps(ev, separators=(",", ":")) + "\n")

    # request fixtures (FIXTURES.md section 5)
    xi = [player_name(0, s) for s in range(11)]
    xi2 = [player_name(1, s) for s in range(11)]
    reqs = {
        "req1_valid.json": {
            "req_type": 1,
            "date": "2018-04-01",
            "team1": {"name": TEAM_NAMES[0], **{f"player{i+1}": n for i, n in enumerate(xi)}},
            "team2": {"name": TEAM_NAMES[1], **{f"player{i+1}": n for i, n in enumerate(xi2)}},
        },
        "req2_profile.json": {"req_type": 2, "name": xi[5]},
        "req3_match.json": {
            "req_type": 3,
            "date": first_match["dateutc"].split()[0],
            "label": first_match["label"],
        },
        "req3_missing.json": {"req_type": 3, "date": "1999-01-01", "label": "No - Match, 0 - 0"},
    }
    for fname, payload in reqs.items():
        with open(os.path.join(root, "requests", fname), "w") as f:
            json.dump(payload, f)

    with open(marker, "w") as f:
        f.write(VERSION + "\n")


def ensure_corrupt_feed(root: str) -> str:
    """A JSONL feed with deterministic malformed lines mixed into valid
    event records — the ingest-robustness fixture (the reference's
    socket parser, master.py:139-156, would raise on any of these).
    Corruption shapes: truncated object, unquoted key, plain text, a
    whitespace-only line, and a JSON array where an object is expected. Written
    idempotently outside the _COMPLETE marker, like the invalid-req1
    fixture below.
    """
    path = os.path.join(root, "stream_corrupt", "feed.jsonl")
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = random.Random(777)
    lines: list[str] = []
    for i in range(200):
        if i % 10 == 3:
            lines.append('{"id": %d, "type": "click", "value": 1.2' % i)  # truncated
        elif i % 10 == 6:
            lines.append("{id: %d, type: click}" % i)  # unquoted keys
        elif i % 10 == 9:
            lines.append(rng.choice(["garbage line", "   ", "[1, 2, 3]"]))
        else:
            lines.append(
                json.dumps(
                    {
                        "id": i,
                        "type": rng.choice(["click", "view", "buy"]),
                        "value": round(rng.uniform(0, 50), 2),
                    },
                    separators=(",", ":"),
                )
            )
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, path)
    return path


def ensure_invalid_req1(root: str) -> str:
    """req1 fixture with an INVALID team1 (two goalkeepers) and a valid
    team2 — the input shape that exposes the reference's last-iteration
    overwrite quirk (ui.py:53-74): team1's "Invalid Team" status is
    silently replaced by team2's win-prediction, computed with
    team1's strength stuck at its initial 0.

    Written idempotently OUTSIDE the _COMPLETE marker so adding it to
    an already-generated v1 fixture dir needs no version bump (content
    is deterministic; existing files and oracle paths are untouched).
    """
    path = os.path.join(root, "requests", "req1_invalid_team1.json")
    if os.path.exists(path):
        return path
    # team1 XI: slots 0-9 plus the bench GK (slot 11) -> gk==2, invalid
    bad_xi = [player_name(0, s) for s in list(range(10)) + [11]]
    xi2 = [player_name(1, s) for s in range(11)]
    payload = {
        "req_type": 1,
        "date": "2018-04-01",
        "team1": {"name": TEAM_NAMES[0], **{f"player{i+1}": n for i, n in enumerate(bad_xi)}},
        "team2": {"name": TEAM_NAMES[1], **{f"player{i+1}": n for i, n in enumerate(xi2)}},
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)
    return path
