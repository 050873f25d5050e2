"""Differential fuzz gate (round 13): 30 seeded grammar queries run as
DataFrame plans AND as DuckDB SQL from one draw each (tests/
fuzz_grammar.py), compared through the same harness as the registered
fleet (type families + canonical rows). Complements the curated
oracle-parity suite with machine-chosen predicate/aggregate
combinations; a failure reproduces from its seed alone.

A vacuity canary keeps the set honest: if testdata drift (or a grammar
edit) ever collapses most cases to empty results, the DuckDB-only
sweep fails loudly instead of letting 30 trivially-matching empty
queries count as coverage.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.fuzz_grammar import build_spark, draw_case
from tests.oracle_harness import compare, duck_connection
from tests.parallel import unwrap

SEEDS = list(range(30))


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="module")
def fuzz_outcomes(spark, duck):
    """Every (axis, seed) case run vs DuckDB through a thread pool
    (r18: the sequential suite contributed minutes to the 16:31 driver
    verify that overran its budget -- VERDICT r17 #1; safety argument
    in tests/parallel.py). Each parametrized test asserts its own
    precomputed outcome: same case count, same (axis, seed)
    reproduction contract, same -x behavior."""
    import tests.fuzz_grammar as grammar
    from tests.oracle_harness import compare_signed
    from tests.parallel import fan_out

    def make(fam, draw, build, seed, cmp_fn):
        def run():
            case = getattr(grammar, draw)(seed)
            df = getattr(grammar, build)(spark, SF_SMOKE, case)
            cur = duck.cursor()
            try:
                return cmp_fn(df, cur, case["sql"])
            finally:
                cur.close()

        return run

    cases = []
    for fam, (draw, build, seeds_name, cmp_name) in _FAMILIES.items():
        cmp_fn = compare_signed if cmp_name == "signed" else compare
        for seed in globals()[seeds_name]:
            cases.append(((fam, seed), make(fam, draw, build, seed, cmp_fn)))
    return fan_out(cases)


# axis -> (draw fn, build fn, seeds var, comparator); the parametrized
# tests below each consult fuzz_outcomes[(axis, seed)]
_FAMILIES: dict[str, tuple[str, str, str, str]] = {
    "scan": ("draw_case", "build_spark", "SEEDS", "value"),
    "join": ("draw_join_case", "build_join_spark", "JOIN_SEEDS", "value"),
    "window": ("draw_window_case", "build_window_spark", "WINDOW_SEEDS", "value"),
    "null": ("draw_null_case", "build_null_spark", "NULL_SEEDS", "value"),
    "setop": ("draw_setop_case", "build_setop_spark", "SETOP_SEEDS", "value"),
    "expr": ("draw_expr_case", "build_expr_spark", "EXPR_SEEDS", "value"),
    "topk": ("draw_topk_case", "build_topk_spark", "TOPK_SEEDS", "value"),
    "rollup": ("draw_rollup_case", "build_rollup_spark", "ROLLUP_SEEDS", "value"),
    "subquery": (
        "draw_subquery_case", "build_subquery_spark", "SUBQUERY_SEEDS", "value",
    ),
    "datetime": (
        "draw_datetime_case", "build_datetime_spark", "DATETIME_SEEDS", "value",
    ),
    "pattern": (
        "draw_pattern_case", "build_pattern_spark", "PATTERN_SEEDS", "value",
    ),
    "numeric": (
        "draw_numeric_case", "build_numeric_spark", "NUMERIC_SEEDS", "value",
    ),
    "rangejoin": (
        "draw_rangejoin_case", "build_rangejoin_spark", "RANGEJOIN_SEEDS", "value",
    ),
    "stream": ("draw_stream_case", "build_stream_spark", "STREAM_SEEDS", "value"),
    "scalarsub": (
        "draw_scalarsub_case", "build_scalarsub_spark", "SCALARSUB_SEEDS", "value",
    ),
    "rangeframe": (
        "draw_rangeframe_case", "build_rangeframe_spark", "RANGEFRAME_SEEDS", "value",
    ),
    "filteragg": (
        "draw_filteragg_case", "build_filteragg_spark", "FILTERAGG_SEEDS", "value",
    ),
    "signedzero": (
        "draw_signedzero_case", "build_signedzero_spark", "SIGNEDZERO_SEEDS",
        "signed",
    ),
    "lateral": (
        "draw_lateral_case", "build_lateral_spark", "LATERAL_SEEDS", "value",
    ),
    "joinchain": (
        "draw_joinchain_case", "build_joinchain_spark", "JOINCHAIN_SEEDS", "value",
    ),
    "multidistinct": (
        "draw_multidistinct_case", "build_multidistinct_spark",
        "MULTIDISTINCT_SEEDS", "value",
    ),
    "winjoin": (
        "draw_winjoin_case", "build_winjoin_spark", "WINJOIN_SEEDS", "value",
    ),
}


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_query_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("scan", seed)])


JOIN_SEEDS = list(range(15))


@pytest.mark.parametrize("seed", JOIN_SEEDS)
def test_fuzz_join_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("join", seed)])


WINDOW_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", WINDOW_SEEDS)
def test_fuzz_window_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("window", seed)])


NULL_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", NULL_SEEDS)
def test_fuzz_null_semantics_match_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("null", seed)])


SETOP_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", SETOP_SEEDS)
def test_fuzz_setop_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("setop", seed)])


EXPR_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", EXPR_SEEDS)
def test_fuzz_expr_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("expr", seed)])


TOPK_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", TOPK_SEEDS)
def test_fuzz_topk_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("topk", seed)])


ROLLUP_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", ROLLUP_SEEDS)
def test_fuzz_rollup_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("rollup", seed)])


SUBQUERY_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", SUBQUERY_SEEDS)
def test_fuzz_subquery_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("subquery", seed)])


DATETIME_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", DATETIME_SEEDS)
def test_fuzz_datetime_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("datetime", seed)])


PATTERN_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", PATTERN_SEEDS)
def test_fuzz_pattern_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("pattern", seed)])


NUMERIC_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", NUMERIC_SEEDS)
def test_fuzz_numeric_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("numeric", seed)])


RANGEJOIN_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", RANGEJOIN_SEEDS)
def test_fuzz_rangejoin_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("rangejoin", seed)])


STREAM_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", STREAM_SEEDS)
def test_fuzz_stream_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("stream", seed)])


SCALARSUB_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", SCALARSUB_SEEDS)
def test_fuzz_scalarsub_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("scalarsub", seed)])


RANGEFRAME_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", RANGEFRAME_SEEDS)
def test_fuzz_rangeframe_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("rangeframe", seed)])


FILTERAGG_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", FILTERAGG_SEEDS)
def test_fuzz_filteragg_matches_duckdb(fuzz_outcomes, seed):
    unwrap(fuzz_outcomes[("filteragg", seed)])


SIGNEDZERO_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", SIGNEDZERO_SEEDS)
def test_fuzz_signedzero_matches_duckdb_bytewise(fuzz_outcomes, seed):
    """Axis 18 (round 14): value parity through compare() FIRST, then
    the byte-level re-check compare() deliberately cannot do -- the
    signed canonical rows must match exactly, pinning that Spark's
    BigDecimal round never signs a zero and the oracle's `+ 0`
    spelling repairs DuckDB's std::round -0.0 on machine-drawn
    sign-crossing measures, not just the curated fleet."""
    unwrap(fuzz_outcomes[("signedzero", seed)])


LATERAL_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", LATERAL_SEEDS)
def test_fuzz_lateral_matches_duckdb(fuzz_outcomes, seed):
    """Axis 19 (round 15, the VERDICT r13 #8 / r14 #6 carried axis):
    correlated table-function laterals -- guarded sequence explode
    (inner/outer/SQL-LATERAL text) and posexplode token/position --
    against DuckDB's LATERAL unnest twins, with per-element correlated
    arithmetic feeding the standing cent-grid aggregates."""
    unwrap(fuzz_outcomes[("lateral", seed)])


def test_fuzz_lateral_axis_reaches_empty_generators(spark):
    """The axis's distinguishing hazard -- n = 0 rows, where inner
    lateral DROPS and outer lateral NULL-PADS (and Spark's descending
    sequence(1, 0) would corrupt both without the drawn guard) -- must
    actually occur: across the seeds, at least one range-shaped case's
    n-expression must hit 0 on the testdata."""
    import duckdb

    from tests.fuzz_grammar import draw_lateral_case

    con = duckdb.connect()
    hits = 0
    for seed in LATERAL_SEEDS:
        case = draw_lateral_case(seed)
        if "ncol" not in case:
            continue
        # count UNDER the case's own WHERE -- a table-wide count could
        # pass while every differential case's predicate excludes all
        # n = 0 rows, leaving the hazard untested (review r15)
        tbl = f"{SF_SMOKE}/{case['table']}.parquet"
        n0 = con.execute(
            f"SELECT count(*) FROM '{tbl}' "
            f"WHERE ({' AND '.join(case['pred_sql'])}) "
            f"AND CAST(floor({case['ncol']}) AS INT) % {case['k']} = 0"
        ).fetchone()[0]
        hits += n0
    con.close()
    assert hits > 0, (
        "no lateral seed reaches an empty generator under its own "
        "predicate -- the axis has drifted off its inner-vs-outer hazard"
    )


JOINCHAIN_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", JOINCHAIN_SEEDS)
def test_fuzz_joinchain_matches_duckdb(fuzz_outcomes, seed):
    """Axis 20 (round 16, VERDICT r15 stretch #7): 3-table
    customer ⋈ orders ⋈ lineitem chains with independently drawn
    inner/left steps and ON-vs-WHERE residual placement -- the axis
    where join reordering meets null propagation THROUGH a chain (a
    left step null-extends the middle join key; the next step joins ON
    that NULL; a WHERE residual on a null-extendable column inner-izes
    deterministically on both engines). Axes 2/16 cover these hazards
    only pairwise."""
    unwrap(fuzz_outcomes[("joinchain", seed)])


def test_fuzz_joinchain_axis_reaches_null_extension(spark, duck):
    """The chain axis's distinguishing hazard -- rows flowing through a
    LEFT step null-extended (n_rows > n_orders, or n_orders > n_items)
    -- must actually occur across the seeds, or every drawn chain
    degenerated to inner-join behavior and the axis is vacuous."""
    from tests.fuzz_grammar import draw_joinchain_case

    extended = 0
    for seed in JOINCHAIN_SEEDS:
        case = draw_joinchain_case(seed)
        if case["how1"] == "inner" and case["how2"] == "inner":
            continue
        for row in duck.execute(case["sql"]).fetchall():
            keys = len(case["keys"])
            n_rows, n_orders, n_items = row[keys], row[keys + 1], row[keys + 2]
            if n_rows > n_orders or n_orders > n_items:
                extended += 1
    assert extended > 0, (
        "no joinchain seed produced a null-extended row -- every drawn "
        "chain degenerated to inner semantics on the testdata"
    )


MULTIDISTINCT_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", MULTIDISTINCT_SEEDS)
def test_fuzz_multidistinct_matches_duckdb(fuzz_outcomes, seed):
    """Axis 21 (round 16): multiple DISTINCT aggregates in one grouped
    query -- Spark executes these through an Expand rewrite (one
    duplicated stream per distinct set + two-phase aggregate), DuckDB
    directly; the rewrite's bookkeeping (null streams, duplicate
    elimination, grouping-key routing) is the surface under test. The
    distinct sum stays on the integer cent grid, so every output is
    exact on both engines."""
    unwrap(fuzz_outcomes[("multidistinct", seed)])


def test_fuzz_multidistinct_plans_expand(spark):
    """The axis exists to exercise the Expand rewrite -- prove the
    drawn plans actually contain it (two distinct column sets in one
    aggregate force it; if a grammar edit ever collapsed the draws to
    one distinct set, the axis would silently stop covering the
    machinery it names). Explain-only."""
    from tests.fuzz_grammar import (
        build_multidistinct_spark,
        draw_multidistinct_case,
    )
    from tests.test_plan_quality import plan_of

    expanded = 0
    for seed in MULTIDISTINCT_SEEDS[:4]:
        case = draw_multidistinct_case(seed)
        plan = plan_of(build_multidistinct_spark(spark, SF_SMOKE, case))
        if "Expand" in plan:
            expanded += 1
    assert expanded == 4, (
        f"only {expanded}/4 sampled multidistinct plans contain Expand -- "
        "the axis no longer exercises the multi-distinct rewrite"
    )


WINJOIN_SEEDS = list(range(12))


@pytest.mark.parametrize("seed", WINJOIN_SEEDS)
def test_fuzz_winjoin_matches_duckdb(fuzz_outcomes, seed):
    """Axis 22 (round 17, VERDICT r16 stretch #8): windowed aggregates
    over join results -- drawn orders ⋈ lineitem joins feeding drawn
    window functions, partition keys from either side, frames from the
    existing ROWS/RANGE pools. The composition surface axes 3/20 cover
    only separately: Spark's window-after-join exchange planning, the
    NULL partition a left join feeds a right-side partition key, and
    the ASC NULLS FIRST pin on the possibly-null ROWS tiebreak column
    (Spark's asc default vs DuckDB's NULLS LAST default)."""
    unwrap(fuzz_outcomes[("winjoin", seed)])


def test_fuzz_winjoin_axis_reaches_null_partition(spark, duck):
    """The axis's distinguishing hazard -- a null-extended right-side
    row flowing INTO the window (NULL l_linenumber in the output, NULL
    partition when the key is right-side) -- must actually occur across
    the seeds, or every drawn case degenerated to inner behavior and
    the composition axis is vacuous."""
    from tests.fuzz_grammar import draw_winjoin_case

    null_extended = 0
    for seed in WINJOIN_SEEDS:
        case = draw_winjoin_case(seed)
        if case["how"] != "left":
            continue
        for row in duck.execute(case["sql"]).fetchall():
            if row[1] is None:  # l_linenumber of a null-extended row
                null_extended += 1
    assert null_extended > 0, (
        "no winjoin seed produced a null-extended row into the window -- "
        "the axis has drifted off its left-join composition hazard"
    )


def test_fuzz_signedzero_axis_hits_the_window(spark, duck):
    """The axis must not pass vacuously: across the 12 seeds, the
    UNPINNED oracle spelling must actually produce at least one -0.0
    cell on the DuckDB side (i.e. the drawn family genuinely reaches
    the hazard the pin exists to repair). DuckDB-only, cheap; the
    spark fixture is needed because draw builds Column objects."""
    import math

    from tests.fuzz_grammar import draw_signedzero_case

    neg_zeros = 0
    for seed in SIGNEDZERO_SEEDS:
        case = draw_signedzero_case(seed)
        for row in duck.execute(case["unpinned_sql"]).fetchall():
            for v in row:
                if isinstance(v, float) and v == 0 and math.copysign(1, v) < 0:
                    neg_zeros += 1
    assert neg_zeros > 0, (
        "no seed reached a DuckDB -0.0 -- the signedzero grammar has "
        "drifted off the hazard window"
    )


def test_fuzz_set_is_not_vacuous(spark, duck):
    """>= 60% of the cases must return rows (DuckDB-only, cheap).

    (The spark fixture is required even though only DuckDB executes:
    draw_case constructs Column expressions, and classic PySpark needs
    an active SparkContext to build a Column at all.)"""
    from tests.fuzz_grammar import (
        draw_join_case,
        draw_null_case,
        draw_window_case,
    )

    from tests.fuzz_grammar import (
        draw_datetime_case,
        draw_expr_case,
        draw_filteragg_case,
        draw_numeric_case,
        draw_pattern_case,
        draw_rangeframe_case,
        draw_rangejoin_case,
        draw_rollup_case,
        draw_scalarsub_case,
        draw_setop_case,
        draw_stream_case,
        draw_subquery_case,
        draw_topk_case,
    )

    sqls = [draw_case(s)["sql"] for s in SEEDS]
    sqls += [draw_join_case(s)["sql"] for s in JOIN_SEEDS]
    sqls += [draw_window_case(s)["sql"] for s in WINDOW_SEEDS]
    sqls += [draw_null_case(s)["sql"] for s in NULL_SEEDS]
    sqls += [draw_setop_case(s)["sql"] for s in SETOP_SEEDS]
    sqls += [draw_expr_case(s)["sql"] for s in EXPR_SEEDS]
    sqls += [draw_topk_case(s)["sql"] for s in TOPK_SEEDS]
    sqls += [draw_rollup_case(s)["sql"] for s in ROLLUP_SEEDS]
    sqls += [draw_subquery_case(s)["sql"] for s in SUBQUERY_SEEDS]
    sqls += [draw_datetime_case(s)["sql"] for s in DATETIME_SEEDS]
    sqls += [draw_pattern_case(s)["sql"] for s in PATTERN_SEEDS]
    sqls += [draw_numeric_case(s)["sql"] for s in NUMERIC_SEEDS]
    sqls += [draw_rangejoin_case(s)["sql"] for s in RANGEJOIN_SEEDS]
    sqls += [draw_stream_case(s)["sql"] for s in STREAM_SEEDS]
    sqls += [draw_scalarsub_case(s)["sql"] for s in SCALARSUB_SEEDS]
    sqls += [draw_rangeframe_case(s)["sql"] for s in RANGEFRAME_SEEDS]
    sqls += [draw_filteragg_case(s)["sql"] for s in FILTERAGG_SEEDS]
    from tests.fuzz_grammar import draw_lateral_case, draw_signedzero_case

    sqls += [draw_signedzero_case(s)["sql"] for s in SIGNEDZERO_SEEDS]
    sqls += [draw_lateral_case(s)["sql"] for s in LATERAL_SEEDS]
    from tests.fuzz_grammar import draw_joinchain_case, draw_multidistinct_case

    sqls += [draw_joinchain_case(s)["sql"] for s in JOINCHAIN_SEEDS]
    sqls += [draw_multidistinct_case(s)["sql"] for s in MULTIDISTINCT_SEEDS]
    from tests.fuzz_grammar import draw_winjoin_case

    sqls += [draw_winjoin_case(s)["sql"] for s in WINJOIN_SEEDS]
    nonempty = 0
    for sql in sqls:
        rows = duck.execute(sql).fetchall()
        if rows and not all(
            v in (None, 0) for r in rows for v in r
        ):
            nonempty += 1
    assert nonempty >= 0.6 * len(sqls), (
        f"only {nonempty}/{len(sqls)} fuzz cases return data -- "
        "grammar domains have drifted from the testdata"
    )


def test_shakeout_tool_covers_every_axis():
    """tools/fuzz_shakeout.py replays the whole set at larger SFs; a
    new draw_*_case added to the grammar without a matching AXES row
    would silently shrink that replay, so the two are pinned here."""
    import inspect

    import tests.fuzz_grammar as g
    from tools.fuzz_shakeout import AXES

    draws = {
        fn for name, fn in inspect.getmembers(g, inspect.isfunction)
        if name == "draw_case" or (
            name.startswith("draw_") and name.endswith("_case")
        )
    }
    covered = {draw for _, draw, _, _ in AXES}
    missing = {f.__name__ for f in draws - covered}
    assert not missing, f"axes absent from fuzz_shakeout.AXES: {missing}"


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_scan_filters_push_down(spark, seed):
    """Value parity is half the gate; the PLAN matters too. Every
    machine-drawn scan predicate must reach the parquet reader as a
    pushed filter -- a drawn predicate that silently ran as a
    post-scan Filter over full row groups would pass the value check
    while reading 100x the data at scale. Explain-only: nothing
    executes."""
    import re

    from tests.test_plan_quality import plan_of

    case = draw_case(seed)
    plan = plan_of(build_spark(spark, SF_SMOKE, case))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed, f"scan[{seed}]: no parquet scan with PushedFilters"
    spec = __import__("tests.fuzz_grammar", fromlist=["_TABLES"])._TABLES[
        case["table"]
    ]
    where = case["sql"].split("WHERE", 1)[1].split("GROUP BY", 1)[0]
    pred_columns = {
        c
        for group in ("num", "str", "ts")
        for c in spec[group]
        if c in where
    }
    for col in pred_columns:
        assert any(col in p for p in pushed), (
            f"scan[{seed}]: predicate on {col} not pushed; pushed={pushed}"
        )


def test_draw_is_deterministic(spark):
    a, b = draw_case(7), draw_case(7)
    assert a["sql"] == b["sql"]
    assert a["keys"] == b["keys"]
    assert [str(c) for c in a["pred_cols"]] == [str(c) for c in b["pred_cols"]]
