"""Cross-engine semantic pins for the seams the integer-lattice
recursions (holt_winters_seasonal, croston_intermittent_demand) rely
on. These failed SILENTLY during round-11 development — DuckDB's //
truncates toward zero where Python floors, and DuckDB round() is
half-away-from-zero where Python's is banker's — so the exact
contracts are pinned here against DuckDB itself, property-style."""

from __future__ import annotations

import duckdb
import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def _tdiv(a: int, d: int) -> int:
    # the mirror used by the driver-side recursions
    q = abs(a) // d
    return q if a >= 0 else -q


def _r6(x: float) -> float:
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@pytest.mark.skipif(not HAVE_HYP, reason="hypothesis unavailable")
@settings(max_examples=200, deadline=None)
@given(
    a=st.integers(min_value=-(10**15), max_value=10**15),
    d=st.integers(min_value=1, max_value=10**6),
)
def test_tdiv_matches_duckdb_integer_division(a, d):
    con = duckdb.connect()
    duck = con.execute(f"SELECT CAST({a} AS BIGINT) // {d}").fetchone()[0]
    assert _tdiv(a, d) == duck, (a, d)


@pytest.mark.skipif(not HAVE_HYP, reason="hypothesis unavailable")
@settings(max_examples=200, deadline=None)
@given(
    num=st.integers(min_value=-(10**9), max_value=10**9),
    den=st.integers(min_value=1, max_value=10**6),
)
def test_r6_matches_duckdb_round(num, den):
    x = num / den
    con = duckdb.connect()
    duck = con.execute(f"SELECT round(CAST({num} AS DOUBLE) / {den}, 6)").fetchone()[0]
    assert _r6(x) == duck, (num, den, x)


def test_python_floor_division_differs_on_negatives(con):
    """The hazard itself, pinned: if DuckDB ever changes // to floor
    semantics, this fails and the recursions' mirrors must flip."""
    assert con.execute("SELECT (-7) // 2").fetchone()[0] == -3  # trunc
    assert (-7) // 2 == -4  # Python floors
    assert _tdiv(-7, 2) == -3


def test_python_round_is_bankers_duckdb_is_half_away(con):
    assert con.execute("SELECT round(0.5, 0)").fetchone()[0] == 1.0
    assert round(0.5) == 0  # banker's
    assert _r6(0.0000005) == 0.000001
