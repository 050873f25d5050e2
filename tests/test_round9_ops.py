"""Round-9 infrastructure tests: the per-session scratch-dir lifecycle
(claim_session_tmpdir) that t13/t16/t18 and the bucketed catalog tables
now share, and the atomic fixture publication. No SparkSession needed."""

from __future__ import annotations

import os
import time

from fantasy_premier_league_spark.functions import tuning


def _fresh_prefix() -> str:
    return f"claimtest_{os.getpid()}_{int(time.time() * 1e6) % 10**9}"


def test_claim_wipes_own_dir_and_returns_path(tmp_path, monkeypatch):
    monkeypatch.setattr(tuning.tempfile, "gettempdir", lambda: str(tmp_path))
    prefix = _fresh_prefix()
    own = tuning.claim_session_tmpdir(prefix, "appA")
    assert own == str(tmp_path / f"{prefix}_appA")
    # leftover state from a previous claim of the SAME session dir is
    # wiped (t13/t18 restage their sources fresh on every invocation)
    os.makedirs(os.path.join(own, "old_state"))
    own2 = tuning.claim_session_tmpdir(prefix, "appA")
    assert own2 == own
    assert not os.path.exists(os.path.join(own, "old_state"))


def test_claim_prunes_stale_sibling_keeps_fresh(tmp_path, monkeypatch):
    monkeypatch.setattr(tuning.tempfile, "gettempdir", lambda: str(tmp_path))
    prefix = _fresh_prefix()
    stale = tmp_path / f"{prefix}_dead_session"
    fresh = tmp_path / f"{prefix}_live_session"
    for d in (stale, fresh):
        (d / "sub").mkdir(parents=True)
        (d / "sub" / "data.parquet").write_bytes(b"x")
    two_hours_ago = time.time() - 7200
    # stale: EVERYTHING old; fresh: old top-level but one recent file
    # deep in the tree (the t16 lesson -- sink writes never touch the
    # top-level mtime, so staleness must consider the newest file)
    for d in (stale, fresh):
        for root, _dirs, files in os.walk(d):
            for name in files:
                os.utime(os.path.join(root, name), (two_hours_ago,) * 2)
            os.utime(root, (two_hours_ago,) * 2)
    os.utime(fresh / "sub" / "data.parquet")  # now
    tuning.claim_session_tmpdir(prefix, "appB")
    assert not stale.exists(), "hour-stale sibling must be pruned"
    assert fresh.exists(), "sibling with any fresh file must survive"


def test_claim_prunes_once_per_process(tmp_path, monkeypatch):
    monkeypatch.setattr(tuning.tempfile, "gettempdir", lambda: str(tmp_path))
    prefix = _fresh_prefix()
    tuning.claim_session_tmpdir(prefix, "appC")
    # a stale sibling appearing AFTER the first claim is not swept by
    # later claims in the same process (the per-prefix prune runs once;
    # bench repeats must not pay a /tmp walk per invocation)
    late = tmp_path / f"{prefix}_late_crash"
    late.mkdir()
    os.utime(late, (time.time() - 7200,) * 2)
    tuning.claim_session_tmpdir(prefix, "appC")
    assert late.exists()


def test_fixture_publication_is_atomic_and_idempotent(tmp_path, monkeypatch):
    import fantasy_premier_league_spark.sources.fpl_fixtures as fx

    monkeypatch.setattr(fx.tempfile, "gettempdir", lambda: str(tmp_path))
    root = fx.ensure_fixtures()
    marker = os.path.join(root, "_COMPLETE")
    assert os.path.exists(marker)
    # no stage or aside debris after a clean publish
    import glob

    assert not glob.glob(f"{root}.stage*")
    assert not glob.glob(f"{root}.old*")
    # second call reuses the published dir untouched
    before = os.path.getmtime(os.path.join(root, "players.csv"))
    assert fx.ensure_fixtures() == root
    assert os.path.getmtime(os.path.join(root, "players.csv")) == before
    # a crashed PRE-FIX partial (root without marker) is replaced
    os.remove(marker)
    root2 = fx.ensure_fixtures()
    assert root2 == root
    assert os.path.exists(marker)


def test_heartbeat_tick_keeps_idle_claims_visibly_live(tmp_path, monkeypatch):
    """ADVICE r9: reads never update mtimes, so an idle session's
    scratch must be kept fresh by the heartbeat, or a sibling's prune
    yanks it. One tick must refresh every claimed dir's TOP-LEVEL
    mtime (the first stat _is_stale checks), and skip not-yet-rebuilt
    dirs without raising."""
    monkeypatch.setattr(tuning.tempfile, "gettempdir", lambda: str(tmp_path))
    prefix = _fresh_prefix()
    own = tuning.claim_session_tmpdir(prefix, "appHB")
    os.makedirs(own)  # the sink normally recreates it
    two_hours_ago = time.time() - 7200
    os.utime(own, (two_hours_ago,) * 2)
    # a claimed-but-not-rebuilt dir from another prefix must not break
    # the tick
    ghost = str(tmp_path / "never_recreated_xyz")
    tuning._CLAIMED_DIRS.add(ghost)
    try:
        tuning._heartbeat_tick()
    finally:
        tuning._CLAIMED_DIRS.discard(ghost)
    assert os.path.getmtime(own) >= time.time() - 60
    # and the refreshed dir now survives a sibling's staleness check
    assert not tuning._nothing_fresh_under(own, time.time() - 3600)


def test_claim_starts_heartbeat_thread(tmp_path, monkeypatch):
    import threading

    monkeypatch.setattr(tuning.tempfile, "gettempdir", lambda: str(tmp_path))
    tuning.claim_session_tmpdir(_fresh_prefix(), "appHB2")
    names = [t.name for t in threading.enumerate()]
    assert "scratch-dir-heartbeat" in names


def test_publish_restores_winner_claimed_mid_retry(tmp_path, monkeypatch):
    """ADVICE r9 TOCTOU: if a concurrent winner publishes a COMPLETE
    root between our marker check and the rename-aside, the claimed
    dir must be put straight back (atomic rename), never deleted --
    otherwise a third session that already passed its marker check
    sees FileNotFound until the republish lands."""
    import fantasy_premier_league_spark.sources.fpl_fixtures as fx

    monkeypatch.setattr(fx.tempfile, "gettempdir", lambda: str(tmp_path))
    # a winner's complete root already on disk
    root = fx.ensure_fixtures()
    marker = os.path.join(root, "_COMPLETE")
    winner_mtime = os.path.getmtime(os.path.join(root, "players.csv"))

    # force the loser down the retry path: both the entry marker check
    # AND the in-loop post-OSError check must miss (the winner
    # publishes "between" them), so the loser reaches rename-aside
    # with a complete root in hand
    real_exists = os.path.exists
    missed = {"n": 0}

    def flaky_exists(path):
        if path == marker and missed["n"] < 2:
            missed["n"] += 1
            return False
        return real_exists(path)

    monkeypatch.setattr(fx.os.path, "exists", flaky_exists)
    root2 = fx.ensure_fixtures()
    assert root2 == root
    assert real_exists(marker)
    # the winner's files came back via rename, not a regeneration
    assert os.path.getmtime(os.path.join(root, "players.csv")) == winner_mtime
    # and no aside/stage debris
    import glob

    assert not glob.glob(f"{root}.old*")
    assert not glob.glob(f"{root}.stage*")
