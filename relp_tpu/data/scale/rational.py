"""Exact rational prime-factor scaling.

Mirror of reference ``presolve/scale/rational``: factorize every nonzero of
the problem, then per prime choose integer row/column power shifts that
minimize the total absolute exponent mass (the reference optimizes greedily
via alternating row/column queues, rational/mod.rs:175-216; here each pass
sets a row's/column's shift to the weighted median of its exponents, iterated
to a local optimum — the same fixpoint family).

Shrinking shared prime powers keeps rational representations small — in this
framework it speeds the exact certifier's integerization (smaller
denominators -> fewer Dixon lifting digits).
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from typing import Dict, List, Optional, Tuple

from relp_tpu.data.elements import RangedKind
from relp_tpu.data.general_form import GeneralForm
from relp_tpu.linalg.sparse import SparseVector
from relp_tpu.numbers.factorize import factorize_fraction


@dataclass
class Scaling:
    """reference: Scaling (scale/mod.rs:88-96)."""

    cost_factor: Fraction
    constraint_row_factors: List[Fraction]
    constraint_column_factors: List[Fraction]

    def scale_back_solution(self, vector: SparseVector) -> None:
        """x_j *= col_j (reference: Scaling::scale_back)."""
        assert vector.length == len(self.constraint_column_factors)
        vector.entries = [
            (j, v * self.constraint_column_factors[j]) for j, v in vector.entries
        ]


def _exponent_of(value: Fraction, prime: int) -> int:
    e = 0
    num, den = value.numerator, value.denominator
    while num % prime == 0:
        num //= prime
        e += 1
    while den % prime == 0:
        den //= prime
        e -= 1
    return e


def _weighted_median(values: List[int]) -> int:
    values = sorted(values)
    return values[len(values) // 2]


def _optimize_prime(
    exponents: Dict[Tuple[int, int], int],
    nr_rows: int,
    nr_cols: int,
    max_rounds: int = 8,
) -> Tuple[List[int], List[int]]:
    """Choose integer row/col shifts minimizing sum |e_ij + r_i + c_j|."""
    row_shift = [0] * nr_rows
    col_shift = [0] * nr_cols
    by_row: Dict[int, List[Tuple[int, int]]] = {}
    by_col: Dict[int, List[Tuple[int, int]]] = {}
    for (i, j), e in exponents.items():
        by_row.setdefault(i, []).append((j, e))
        by_col.setdefault(j, []).append((i, e))

    for _ in range(max_rounds):
        changed = False
        for i, entries in by_row.items():
            target = _weighted_median(
                [-(e + col_shift[j]) for j, e in entries]
            )
            if target != row_shift[i]:
                row_shift[i] = target
                changed = True
        for j, entries in by_col.items():
            target = _weighted_median(
                [-(e + row_shift[i]) for i, e in entries]
            )
            if target != col_shift[j]:
                col_shift[j] = target
                changed = True
        if not changed:
            break
    return row_shift, col_shift


def scale_general_form(gf: GeneralForm) -> Scaling:
    """Compute and apply an exact prime-power scaling in place
    (reference: Scalable::scale)."""
    nr_rows, nr_cols = gf.nr_constraints(), gf.nr_variables()

    # Collect the primes of all constraint coefficients.
    primes = set()
    entries: List[Tuple[int, int, Fraction]] = []
    for j, col in enumerate(gf.constraints.columns):
        for i, v in col:
            entries.append((i, j, v))
            primes.update(factorize_fraction(v))

    row_factors = [Fraction(1)] * nr_rows
    col_factors = [Fraction(1)] * nr_cols
    for prime in sorted(primes):
        exps = {
            (i, j): _exponent_of(v, prime) for i, j, v in entries
        }
        if all(e == 0 for e in exps.values()):
            continue
        row_shift, col_shift = _optimize_prime(exps, nr_rows, nr_cols)
        for i, s in enumerate(row_shift):
            if s:
                row_factors[i] *= Fraction(prime) ** s
        for j, s in enumerate(col_shift):
            if s:
                col_factors[j] *= Fraction(prime) ** s

    scaling = Scaling(Fraction(1), row_factors, col_factors)
    _apply(gf, scaling, forward=True)
    return scaling


def scale_back_general_form(gf: GeneralForm, scaling: Scaling) -> None:
    """Undo a scaling in place (reference: Scalable::scale_back)."""
    _apply(gf, scaling, forward=False)


def _apply(gf: GeneralForm, scaling: Scaling, forward: bool) -> None:
    """Forward: multiply coefficients by row*col, costs by cost*col, b and
    ranges by row; divide bounds by col.  Backward: inverse
    (reference: scale helper, scale/mod.rs:122-167)."""

    def op(value: Fraction, factor: Fraction) -> Fraction:
        return value * factor if forward else value / factor

    def inverse_op(value: Fraction, factor: Fraction) -> Fraction:
        return value / factor if forward else value * factor

    for j, column in enumerate(gf.constraints.columns):
        col_factor = scaling.constraint_column_factors[j]
        variable = gf.variables[j]
        variable.cost = op(variable.cost, scaling.cost_factor * col_factor)
        if variable.lower_bound is not None:
            variable.lower_bound = inverse_op(variable.lower_bound, col_factor)
        if variable.upper_bound is not None:
            variable.upper_bound = inverse_op(variable.upper_bound, col_factor)
        for k, (i, value) in enumerate(column):
            row_factor = scaling.constraint_row_factors[i]
            column[k] = (i, op(value, row_factor * col_factor))

    for i in range(len(gf.b)):
        row_factor = scaling.constraint_row_factors[i]
        gf.b[i] = op(gf.b[i], row_factor)
        ct = gf.constraint_types[i]
        if ct.kind is RangedKind.RANGE:
            from relp_tpu.data.elements import RangedConstraintRelation

            gf.constraint_types[i] = RangedConstraintRelation.ranged(
                op(ct.range, row_factor)
            )
