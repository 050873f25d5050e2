"""Differential tests mirroring the driver's t2 gate: every registered
query vs its DuckDB oracle at sf0.01 (and smoke at sf0.001)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECTNESS
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


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, duck, name, fn, oracle):
    df = fn(spark, SF_CORRECTNESS)
    if oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
    else:
        n = compare(df, duck, oracle)
        # the driver regenerates testdata between rounds: a drifted
        # literal predicate (brand, priority, date range) can silently
        # empty a query and 0=0 still hash-matches. No registered query
        # legitimately returns an empty result at sf0.01 today, so an
        # empty match is a data-drift canary, not a pass.
        assert n > 0, f"{name}: vacuous 0-row parity (testdata drift?)"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"
