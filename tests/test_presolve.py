"""Per-rule presolve tests (reference: presolve/test/per_rule.rs +
with_application.rs)."""

from fractions import Fraction

import pytest

from relp_tpu.data.elements import (
    LinearProgramError,
    LPStatus,
    Objective,
    RangedConstraintRelation,
    RangedKind,
)
from relp_tpu.data.general_form import (
    FunctionOfOthers,
    GeneralForm,
    Solved,
    Variable,
    VariableType,
)
from relp_tpu.linalg.sparse import SparseColumnMatrix

F = Fraction


def make_gf(rows, types, b, costs, bounds, objective=Objective.MINIMIZE):
    variables = [
        Variable(
            VariableType.CONTINUOUS,
            F(c),
            None if lo is None else F(lo),
            None if hi is None else F(hi),
        )
        for c, (lo, hi) in zip(costs, bounds)
    ]
    return GeneralForm(
        objective=objective,
        constraints=SparseColumnMatrix.from_dense(
            [[F(v) for v in row] for row in rows]
        ),
        constraint_types=types,
        b=[F(v) for v in b],
        variables=variables,
        variable_names=[f"x{j}" for j in range(len(costs))],
    )


def test_fixed_variable_substitution():
    # x0 fixed at 3; substitution cascades: the residual row x1 <= 7 becomes
    # a bound, x1 is then constraint-free and optimized independently to its
    # lower bound — presolve solves the whole problem.
    gf = make_gf(
        [[1, 1]],
        [RangedConstraintRelation.less()],
        [10],
        [1, 1],
        [(3, 3), (0, None)],
    )
    with pytest.raises(LinearProgramError) as err:
        gf.presolve()
    assert err.value.status is LPStatus.FINITE_OPTIMUM
    solution = err.value.payload
    assert solution.objective_value == F(3)
    assert solution.solution_values == [("x0", F(3)), ("x1", F(0))]


def test_singleton_row_becomes_bound():
    # Row 2x0 <= 8 becomes bound x0 <= 4 and the row disappears.
    gf = make_gf(
        [[2, 0], [1, 1]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.greater()],
        [8, 2],
        [1, 1],
        [(0, None), (0, None)],
    )
    gf.presolve()
    assert gf.nr_constraints() == 1
    assert gf.variables[0].upper_bound == F(4)


def test_empty_constraint_feasible_removed():
    # After substituting the fixed variable the row 0 <= 5 is removed; the
    # whole problem presolves away to a full solution.
    gf = make_gf(
        [[1]],
        [RangedConstraintRelation.less()],
        [5],
        [1],
        [(2, 2)],
    )
    with pytest.raises(LinearProgramError) as err:
        gf.presolve()
    assert err.value.status is LPStatus.FINITE_OPTIMUM
    solution = err.value.payload
    assert solution.objective_value == F(2)
    assert solution.solution_values == [("x0", F(2))]


def test_empty_constraint_infeasible():
    gf = make_gf(
        [[1]],
        [RangedConstraintRelation.greater()],
        [5],
        [0],
        [(2, 2)],
    )
    with pytest.raises(LinearProgramError) as err:
        gf.presolve()
    assert err.value.status is LPStatus.INFEASIBLE


def test_slack_elimination_equality_becomes_range():
    # s has cost 0, appears once with bounds [0, 5]:
    # x + y + s == 10 becomes 5 <= x + y <= 10 (Range with r = 5).
    gf = make_gf(
        [[1, 1, 1]],
        [RangedConstraintRelation.equal()],
        [10],
        [1, 1, 0],
        [(0, None), (0, None), (0, 5)],
    )
    gf.presolve()
    assert gf.nr_constraints() == 1
    ct = gf.constraint_types[0]
    assert ct.kind is RangedKind.RANGE
    assert ct.range == F(5)
    assert gf.b == [F(10)]
    assert gf.nr_variables() == 2
    entry = gf.original_variables[2][1]
    assert isinstance(entry, FunctionOfOthers)


def test_slack_elimination_removes_row():
    # Free-direction slack in a <= row: the row and column are absorbed; the
    # remaining singleton row x0 >= 1 becomes a bound and x0 optimizes to it
    # — fully solved by presolve.
    gf = make_gf(
        [[1, 1], [1, 0]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.greater()],
        [10, 1],
        [1, 0],
        [(0, None), (0, None)],  # x1 is a pure slack (cost 0, one row)
    )
    with pytest.raises(LinearProgramError) as err:
        gf.presolve()
    assert err.value.status is LPStatus.FINITE_OPTIMUM
    solution = err.value.payload
    assert solution.objective_value == F(1)
    assert solution.value_of("x0") == F(1)
    # The slack sits at the bound used for elimination (reference:
    # RemovedVariable::Solved(bound) for </<= rows).
    assert solution.value_of("x1") == F(0)


def test_domain_propagation_removes_redundant_row():
    # x <= 2, y <= 3 -> x + y <= 6 is redundant.
    gf = make_gf(
        [[1, 1], [1, -1]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.less()],
        [6, 1],
        [-1, -1],
        [(0, 2), (0, 3)],
    )
    gf.presolve()
    assert gf.nr_constraints() == 1


def test_domain_propagation_proves_infeasible():
    # x >= 0, y >= 0, x, y <= 1 but x + y >= 5.
    gf = make_gf(
        [[1, 1], [1, -1]],
        [RangedConstraintRelation.greater(), RangedConstraintRelation.less()],
        [5, 1],
        [1, 1],
        [(0, 1), (0, 1)],
    )
    with pytest.raises(LinearProgramError) as err:
        gf.presolve()
    assert err.value.status is LPStatus.INFEASIBLE


def test_domain_propagation_forces_variables():
    # x + y <= 2 with x, y in [1, 5]: activity lower bound == rhs forces
    # x = y = 1 and solves the problem.
    gf = make_gf(
        [[1, 1]],
        [RangedConstraintRelation.less()],
        [2],
        [3, 4],
        [(1, 5), (1, 5)],
    )
    with pytest.raises(LinearProgramError) as err:
        gf.presolve()
    assert err.value.status is LPStatus.FINITE_OPTIMUM
    assert err.value.payload.objective_value == F(7)


def test_unbounded_free_column():
    # Variable with negative cost, no constraints, no upper bound.
    gf = make_gf(
        [[1, 0]],
        [RangedConstraintRelation.less()],
        [5],
        [0, -1],
        [(0, None), (0, None)],
    )
    with pytest.raises(LinearProgramError) as err:
        gf.presolve()
    assert err.value.status is LPStatus.UNBOUNDED


def test_budget_terminates_tightening_loops():
    """A problem that admits endless non-meaningful bound tightening must
    still terminate (reference: the nr_vars+nr_constraints budget)."""
    gf = make_gf(
        [[1, -1], [-1, 1]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.less()],
        [1, 1],
        [1, 1],
        [(0, None), (0, None)],
    )
    gf.presolve()  # must return, not loop forever
    assert gf.nr_constraints() >= 0


# --- float-screen differential: screened == unscreened, bit-identical ---


def _gf_state(gf):
    """Full comparable snapshot of a presolved GeneralForm."""
    return (
        gf.objective,
        gf.b,
        gf.constraint_types,
        gf.variables,
        gf.fixed_cost,
        gf.original_variables,
        gf.from_active_to_original,
        [list(col) for col in gf.constraints.columns],
    )


@pytest.mark.parametrize(
    "name", ["ADLITTLE.SIF", "BRANDY.SIF", "E226.SIF", "AGG.SIF"]
)
def test_domain_propagation_screen_differential(name):
    """The float screen must not change presolve outcomes at all: the
    screened and unscreened engines produce bit-identical GeneralForms
    (reference semantics: presolve is exact rational arithmetic)."""
    from conftest import reference_problem
    from relp_tpu.data.presolve import rules
    from relp_tpu.io import mps_to_general_form, parse_fixed

    path = reference_problem("netlib", name)
    with open(path) as f:
        text = f.read()

    gf_screened = mps_to_general_form(parse_fixed(text))
    gf_exact = mps_to_general_form(parse_fixed(text))

    assert rules.SCREEN_ENABLED
    gf_screened.presolve()
    rules.SCREEN_ENABLED = False
    try:
        gf_exact.presolve()
    finally:
        rules.SCREEN_ENABLED = True

    assert _gf_state(gf_screened) == _gf_state(gf_exact)


@pytest.mark.parametrize("name", ["ADLITTLE.SIF", "BRANDY.SIF", "E226.SIF"])
def test_mip_safe_presolve_identical_on_continuous_lps(name):
    """mip_safe presolve only changes behavior for INTEGER variables: on a
    purely continuous LP it must produce a bit-identical GeneralForm (the
    rounding helper and slack gate are no-ops for CONTINUOUS)."""
    from conftest import reference_problem
    from relp_tpu.io import mps_to_general_form, parse_fixed

    path = reference_problem("netlib", name)
    with open(path) as f:
        text = f.read()

    gf_lp = mps_to_general_form(parse_fixed(text))
    gf_mip = mps_to_general_form(parse_fixed(text))

    gf_lp.presolve()
    gf_mip.presolve(mip_safe=True)

    assert _gf_state(gf_lp) == _gf_state(gf_mip)
