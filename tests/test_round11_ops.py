"""Round-11 behavior tests.

BPE merge application must be token-boundary-safe (ADVICE r10): a plain
string replace on the space-joined sequence fuses across token
boundaries once multi-char tokens exist -- tokens [ab, b, b] with pair
(b, b) must become [ab, bb], but replace('b b', 'bb') matches ab's
trailing 'b' first and yields [abb, b]. The differential oracle gate
could never catch this because both sides shared the same replace; this
fixture is built so the buggy and correct applications DIVERGE at merge
step 4, and both engines are asserted against the hand-computed table.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from fantasy_premier_league_spark.operators.textstats import (
    _bpe_oracle,
    bpe_train_merges,
)

# Corpus word frequencies chosen so the merge schedule is forced:
#   step 1: (a, b) count 13  -> 'ab'   (all tokens single chars: safe)
#   step 2: (b, b) count  7  -> 'bb'   ('abbb' is now [ab, b, b]: the
#                                       boundary case -- correct [ab, bb],
#                                       buggy [abb, b])
#   step 3: (bb, c) count 4  -> 'bbc'
#   step 4: (ab, bb) count 3 -> 'abbb' (buggy code would emit (abb, b))
#   step 5: (d, e) count 2   -> 'de'   (tie among d-e-f-g-h: l/r ASC)
#   step 6: (de, f) count 2  -> 'def'
_WORDS = ["ab"] * 10 + ["bbc"] * 4 + ["abbb"] * 3 + ["defgh"] * 2

_EXPECTED = [
    (1, "a", "b", "ab", 13),
    (2, "b", "b", "bb", 7),
    (3, "bb", "c", "bbc", 4),
    (4, "ab", "bb", "abbb", 3),
    (5, "d", "e", "de", 2),
    (6, "de", "f", "def", 2),
]


@pytest.fixture(scope="module")
def boundary_corpus(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("bpe_boundary")
    # one word per document: word frequency == document count
    spark.createDataFrame(
        [(w,) for w in _WORDS], "text string"
    ).coalesce(1).write.parquet(os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_bpe_merge_is_token_boundary_safe(spark, boundary_corpus):
    rows = bpe_train_merges(spark, boundary_corpus).collect()
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in rows
    ]
    assert got == _EXPECTED, (
        "step-4 left symbol 'abb' instead of 'ab' means a merge fused "
        "across a token boundary"
    )


def test_fpl_a5_spec_twin_diverges_where_the_reference_deviates(spark):
    """The spec-correct A5 twin (fpl_a5_spec_rating) must differ from
    the code-faithful fpl_a5_rating exactly where SURVEY 2.4-A5 says the
    reference deviates from docs/Specs.pdf: free-kick (not shot)
    effectiveness in the contribution mean, and real (out-in)/90
    minutes scaling instead of the master.py:219-220 overwrite-with-90.
    Both are oracle-gated for values; this pins non-vacuity and the
    scaling direction."""
    from fantasy_premier_league_spark.operators.pipeline import (
        fpl_a5,
        fpl_a5_spec,
        matches_df,
        player_spans,
        spec_performance_df,
    )

    sf = "/root/testdata/sf0.001"  # fixtures dir is ignored by the fpl tier
    code = {(r["playerId"], r["matchId"]): r["rating"] for r in fpl_a5(spark, sf).collect()}
    spec = {(r["playerId"], r["matchId"]): r["rating"] for r in fpl_a5_spec(spark, sf).collect()}
    assert code.keys() == spec.keys()
    assert any(code[k] != spec[k] for k in code), "twin is vacuous"

    # substituted players (top < 90) must take the (top/90) path: their
    # first-match spec rating is strictly below the 1.05 path applied to
    # the same finalContrib whenever finalContrib > 0
    perf = {
        (r["playerId"], r["matchId"]): (r["perf"], r["top"])
        for r in spec_performance_df(spark).collect()
    }
    subbed = [k for k, (p, top) in perf.items() if 0 < top < 90]
    assert subbed, "fixtures carry no substituted players?"
    spans = player_spans(matches_df(spark))
    assert spans.filter("outTime - inTime < 90 AND inTime >= 0").count() > 0


def test_escaped_unicode_name_matches_byte_exactly(spark):
    """SURVEY 1.2 / VERDICT r10 #6: the reference's players.csv stores
    non-ASCII names as LITERAL backslash-u escapes and ui.py:41 matches
    request names byte-exactly against that text. Fixture (team 0,
    slot 5) -- req2's lookup target -- now carries the escaped form;
    this pins byte-exact matching through the batch dim, both engines'
    CSV readers, and the request path, and that the DECODED form does
    NOT match."""
    import json as _json

    from fantasy_premier_league_spark.operators.api import REQ2, player_profile
    from fantasy_premier_league_spark.operators.pipeline import load_players
    from fantasy_premier_league_spark.sources.fpl_fixtures import (
        ensure_fixtures,
        player_id,
        player_name,
    )

    escaped = player_name(0, 5)
    assert "\\u00e9" in escaped and "é" not in escaped
    root = ensure_fixtures()

    # the CSV on disk carries the literal backslash bytes
    with open(f"{root}/players.csv", encoding="utf-8") as f:
        assert any(escaped in line for line in f)

    # batch dim: Spark's CSV reader must deliver the raw escaped bytes
    row = load_players(spark).filter(F.col("name") == escaped).collect()
    assert len(row) == 1 and row[0]["Id"] == player_id(0, 5)

    # ...and so must DuckDB's (the oracle side of every req gate).
    # Pin the SINGLE behavior the oracles rely on (ADVICE r11: the old
    # OR of both escaping conventions passed regardless of which one
    # DuckDB used and could not catch a quoting regression): DuckDB
    # single-quoted literals are RAW -- no backslash processing -- so
    # the escaped name matches as-is...
    dk_raw = duckdb.sql(
        f"SELECT Id FROM read_csv('{root}/players.csv', header=true) "
        f"WHERE name = '{escaped}'"
    ).fetchall()
    assert [r[0] for r in dk_raw] == [player_id(0, 5)]
    # ...and the doubled-backslash form must NOT match (it would be the
    # convention of an escape-processing dialect, which the req-gate
    # oracles do not use).
    dk_doubled = duckdb.sql(
        f"SELECT Id FROM read_csv('{root}/players.csv', header=true) "
        f"WHERE name = '{escaped.replace(chr(92), chr(92) * 2)}'"
    ).fetchall()
    assert dk_doubled == []

    # request path: req2's fixture routes through the escaped name...
    with open(REQ2) as f:
        assert _json.load(f)["name"] == escaped
    prof = player_profile(spark, escaped)
    assert prof is not None and prof["name"] == escaped

    # ...and the DECODED form must NOT match (byte-exact, ui.py:41)
    decoded = escaped.replace("\\u00e9", "é")
    assert player_profile(spark, decoded) is None


def test_bpe_oracle_is_token_boundary_safe(boundary_corpus):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(boundary_corpus, 'documents.parquet')}/*.parquet')"
    )
    got = [tuple(r) for r in con.execute(_bpe_oracle()).fetchall()]
    assert got == _EXPECTED
