"""Number tower tests (reference analog: relp-num semantics used by the crate)."""

from fractions import Fraction

from relp_tpu.numbers import (
    common_denominator,
    factorize_fraction,
    factorize_int,
    parse_decimal,
    sign,
)


def test_parse_decimal():
    assert parse_decimal("1.5") == Fraction(3, 2)
    assert parse_decimal("-2.5E-1") == Fraction(-1, 4)
    assert parse_decimal(".5") == Fraction(1, 2)
    assert parse_decimal("4") == Fraction(4)
    assert parse_decimal("1.0E+4") == Fraction(10000)
    assert parse_decimal("-123.456") == Fraction(-123456, 1000)


def test_sign():
    assert sign(Fraction(3, 2)) == 1
    assert sign(Fraction(-1)) == -1
    assert sign(Fraction(0)) == 0


def test_common_denominator():
    assert common_denominator([Fraction(1, 2), Fraction(1, 3)]) == 6
    assert common_denominator([]) == 1


def test_factorize_int():
    assert factorize_int(1) == {}
    assert factorize_int(12) == {2: 2, 3: 1}
    assert factorize_int(-35) == {5: 1, 7: 1}
    assert factorize_int(97) == {97: 1}
    assert factorize_int(2 * 2 * 101 * 103) == {2: 2, 101: 1, 103: 1}


def test_factorize_fraction():
    assert factorize_fraction(Fraction(4, 9)) == {2: 2, 3: -2}
    assert factorize_fraction(Fraction(-10, 3)) == {2: 1, 5: 1, 3: -1}
