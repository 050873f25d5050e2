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
