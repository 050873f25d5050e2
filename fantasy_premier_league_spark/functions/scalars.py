"""Scalar helpers shared across operators.

These mirror the reference's ad-hoc per-record Python (try/except
zero-guard division, ``master.py:183-209``) as JVM-side column
expressions that stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column) -> Column:
    """Division with divide-by-zero -> 0.0 (reference master.py:183-209).

    DuckDB oracle twin: ``coalesce(a / nullif(b, 0), 0.0)``.
    """
    return F.coalesce(F.try_divide(num, den), F.lit(0.0))


def rounded(col: Column, scale: int = 6) -> Column:
    """Cross-engine-stable rounding; oracle twin: ``round(x, scale)``.

    Spark's ``round(x, s)`` rounds the SHORTEST decimal representation
    of the double (Java ``BigDecimal.valueOf``) half-up, while DuckDB
    rounds via ``std::round(x * 10^s) / 10^s`` -- these disagree
    whenever the true value sits exactly on a decimal boundary (easy to
    hit: dyadic averages like k/6400 of fixed-point inputs). Emulating
    the scaled form here makes the two bit-identical for ANY identical
    input double: at scale 0 the only half-way doubles are exact k+0.5,
    where shortest-repr half-up and std::round both go away from zero;
    everywhere else both take the nearest integer. Requires
    |x * 10^scale| < 2^52 -- keep aggregate magnitudes in range.
    """
    factor = float(10**scale)
    return F.round(col * factor) / factor


def fixed_units(col: Column, scale: int = 100) -> Column:
    """Fixed-point decimal column -> exact integer units (e.g. cents).

    The synthetic tables carry 2-decimal money/value columns as
    doubles. Summing those as doubles is order-dependent, and the true
    totals/averages are dyadic rationals that land EXACTLY on rounding
    boundaries, so a 1-ulp cross-engine drift flips the rounded digit.
    Summing exact integers instead is order-independent: both engines
    then derive bit-identical doubles and rounding can never disagree.
    Oracle twin: ``CAST(round(x * scale) AS BIGINT)``.
    """
    return F.round(col * scale).cast("long")
