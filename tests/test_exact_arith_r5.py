"""Property tests for the round-5 exact-arithmetic conventions.

Every new operator emits ratios as `(2*scale*num + den) DIV (2*den)` — integer
half-up — and signed variants via abs/sign. These pin the formulas against
Python's exact rational rounding so a future refactor can't silently change
rounding behavior (the class of defect behind the round-4 driver hash-fails).
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st


def half_up_milli(num: int, den: int) -> int:
    """The SQL/Spark twin: (2000*num + den) DIV (2*den), positives only."""
    assert num >= 0 and den > 0
    return (2000 * num + den) // (2 * den)


def signed_half_up_milli(num: int, den: int) -> int:
    sign = -1 if num < 0 else 1
    return sign * ((2000 * abs(num) + den) // (2 * den))


def py_half_up(x: Fraction) -> int:
    """Round half away from zero, exactly."""
    sign = -1 if x < 0 else 1
    ax = abs(x)
    fl = ax.numerator // ax.denominator
    rem = ax - fl
    return sign * (fl + (1 if rem >= Fraction(1, 2) else 0))


@settings(max_examples=500)
@given(st.integers(0, 10**12), st.integers(1, 10**9))
def test_half_up_milli_matches_exact_rational(num, den):
    assert half_up_milli(num, den) == py_half_up(Fraction(1000 * num, den))


@settings(max_examples=500)
@given(st.integers(-(10**12), 10**12), st.integers(1, 10**9))
def test_signed_half_up_matches_exact_rational(num, den):
    assert signed_half_up_milli(num, den) == py_half_up(Fraction(1000 * num, den))


@settings(max_examples=200)
@given(st.integers(0, 10**6), st.integers(1, 10**6))
def test_half_up_bounded_by_scale(num, den):
    # a share num<=den can never exceed 1000 milli after rounding
    m = half_up_milli(min(num, den), den)
    assert 0 <= m <= 1000


@settings(max_examples=500)
@given(st.lists(st.integers(0, 2000), min_size=1, max_size=50))
def test_weight_normalization_sums_to_unit(factors):
    # the doremi/mixture normalization: per-item (2*scale*f + S) DIV (2*S)
    # weights must sum to the unit scale within one half-up per item
    s = sum(factors)
    if s == 0:
        return
    weights = [(2_000_000 * f + s) // (2 * s) for f in factors]
    assert abs(sum(weights) - 1_000_000) <= len(factors)


@settings(max_examples=500)
@given(st.integers(0, 62), st.integers(0, 62))
def test_bitmap_word_bits_never_touch_sign(b1, b2):
    # 63-bit packing: any OR/AND of shifted bits stays non-negative int64
    w = (1 << b1) | (1 << b2)
    assert 0 <= w < (1 << 63)
