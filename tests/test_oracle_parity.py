"""Differential tests mirroring the driver's t2 gate: every registered
query vs its DuckDB oracle at sf0.01 (and smoke at sf0.001)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECTNESS, SF_SMOKE
from tests.oracle_harness import compare, duck_connection

import __spark_entry__ as entry_mod


def _cases():
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    return [(name, queries[name], oracles.get(name)) for name in sorted(queries)]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_CORRECTNESS)
    yield con
    con.close()


@pytest.fixture(scope="module")
def parity_outcomes(spark, duck):
    """All ~200 registered queries run vs their oracles through a
    thread pool (r18: the sequential suite's 16:31 wall overran the
    driver's verify budget -- VERDICT r17 #1; see tests/parallel.py for
    the safety argument). Each parametrized test below asserts its own
    precomputed outcome, so count/attribution/-x behavior are
    unchanged -- only the wall moves."""
    from fantasy_premier_league_spark.sources.fpl_fixtures import ensure_fixtures

    from tests.parallel import fan_out

    ensure_fixtures()  # build once up front, not racing inside the pool

    def thunk(fn, oracle):
        def run():
            df = fn(spark, SF_CORRECTNESS)
            if oracle is None:
                return ("rows_only", df.count())
            cur = duck.cursor()
            try:
                return ("parity", compare(df, cur, oracle))
            finally:
                cur.close()

        return run

    return fan_out((name, thunk(fn, oracle)) for name, fn, oracle in _cases())


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(parity_outcomes, name, fn, oracle):
    from tests.parallel import unwrap

    kind, n = unwrap(parity_outcomes[name])
    if kind == "rows_only":
        assert n >= 0  # rows-only check, like the driver
    else:
        # the driver regenerates testdata between rounds: a drifted
        # literal predicate (brand, priority, date range) can silently
        # empty a query and 0=0 still hash-matches. No registered query
        # legitimately returns an empty result at sf0.01 today, so an
        # empty match is a data-drift canary, not a pass.
        assert n > 0, f"{name}: vacuous 0-row parity (testdata drift?)"


def test_no_oracle_returns_hugeint():
    """r9/r10 lesson (quality_perceptron_train): DuckDB sum(BIGINT)
    widens to HUGEINT, which the driver's pandas fetch path renders as
    float64 -- a hash mismatch that compare()'s fetchall path can NEVER
    see (HUGEINT -> Python int). Bind every registered oracle (DESCRIBE
    runs the binder only, ~3 s for all of them) and reject HUGEINT
    result columns outright; the fix is always CAST(... AS BIGINT)."""
    from fantasy_premier_league_spark.sources.fpl_fixtures import ensure_fixtures

    ensure_fixtures()  # fpl-tier oracles read the fixture CSVs/JSONL
    con = duck_connection(SF_SMOKE)
    flagged = {}
    for name, sql in entry_mod.oracle_sql().items():
        cols = con.execute("DESCRIBE " + sql).fetchall()
        bad = [
            c[0]
            for c in cols
            if "HUGEINT" in str(c[1]) or "DECIMAL" in str(c[1]).upper()
        ]
        if bad:
            flagged[name] = bad
    con.close()
    assert not flagged, (
        f"oracles returning HUGEINT/DECIMAL columns (the pandas fetch path "
        f"renders these float64/object(Decimal) on the driver, "
        f"hash-mismatching Spark's int64/float64): {flagged} -- "
        f"CAST to BIGINT/DOUBLE"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
