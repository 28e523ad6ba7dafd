"""Executable record of the round-7 halfway-rounding hazard (FLOATS.md).

`window_analytic_family` used to emit ROUND(cume_dist, 6); the sf0.1
bit-exact sweep caught 3 rows where Spark and DuckDB disagree — not a
bug in either engine, but a semantic difference in rounding DOUBLES
whose value sits EXACTLY on the decimal .5 grid (k/3200 is such a
rational: 0.0640625 is exactly representable in binary AND is exactly
halfway at 6 decimals). Spark's round() goes through BigDecimal
HALF_UP (→ 0.064063); DuckDB rounds to even / by its libm path
(→ 0.064062). These tests pin the disagreement as a fact so nobody
"simplifies" an exact-rational output back to rounded form, and pin
the fixed entries' contract (raw emission is bit-identical).
"""

from __future__ import annotations

import duckdb
import pytest

HALFWAY = 0.0640625  # == 205/3200, exactly representable in binary


def test_the_two_engines_round_halfway_doubles_differently(spark):
    s = spark.sql(f"SELECT round(CAST({HALFWAY!r} AS DOUBLE), 6) AS r").collect()[0]["r"]
    d = duckdb.sql(f"SELECT round({HALFWAY!r}::DOUBLE, 6) AS r").fetchone()[0]
    # If a Spark or DuckDB upgrade ever makes these agree, the guard in
    # FLOATS.md can be relaxed — until then rounding exact rationals is
    # a parity bug by construction.
    assert s == pytest.approx(0.064063)
    assert d == pytest.approx(0.064062)
    assert s != d


def test_raw_rational_division_is_bit_identical(spark):
    """The fix direction: the unrounded division k/n is one correctly
    rounded IEEE op and matches bit-for-bit across engines."""
    s = spark.sql("SELECT CAST(205 AS DOUBLE) / 3200 AS r").collect()[0]["r"]
    d = duckdb.sql("SELECT 205::DOUBLE / 3200 AS r").fetchone()[0]
    assert s == d == HALFWAY
