"""End-to-end solves on tiny exact fixtures.

Oracle values computed by hand / cross-checked against the reference's test
expectations (e.g. burkardt testprob objective 54, netlib AFIRO -464.753...).
"""

from fractions import Fraction

import pytest

from relp_tpu.data.elements import Objective, RangedConstraintRelation
from relp_tpu.data.general_form import GeneralForm, Variable, VariableType
from relp_tpu.io import load_general_form, mps_to_general_form, parse_free
from relp_tpu.linalg.sparse import SparseColumnMatrix
from relp_tpu.simplex import SolveStatus, solve_general_form


def _gf(objective, rows, types, b, costs, bounds):
    """Small helper: dense rows -> GeneralForm."""
    variables = [
        Variable(
            variable_type=VariableType.CONTINUOUS,
            cost=Fraction(c),
            lower_bound=None if lo is None else Fraction(lo),
            upper_bound=None if hi is None else Fraction(hi),
        )
        for c, (lo, hi) in zip(costs, bounds)
    ]
    return GeneralForm(
        objective=objective,
        constraints=SparseColumnMatrix.from_dense(
            [[Fraction(v) for v in row] for row in rows]
        ),
        constraint_types=types,
        b=[Fraction(v) for v in b],
        variables=variables,
        variable_names=[f"x{j}" for j in range(len(costs))],
    )


def test_basic_max_lp(cpu_config):
    # max x + y st x + 2y <= 4, 3x + y <= 6, x,y >= 0 -> optimum at (8/5, 6/5)
    gf = _gf(
        Objective.MAXIMIZE,
        [[1, 2], [3, 1]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.less()],
        [4, 6],
        [1, 1],
        [(0, None), (0, None)],
    )
    result, solution = solve_general_form(gf, cpu_config)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert solution is not None
    # Reference convention: maximization problems report the minimized
    # (negated) objective (see reference tests/cook/test.rs: -143/2).
    assert solution.objective_value == Fraction(-14, 5)
    assert solution.value_of("x0") == Fraction(8, 5)
    assert solution.value_of("x1") == Fraction(6, 5)
    assert result.stats.certified


def test_equality_and_ge(cpu_config):
    # min 2x + 3y st x + y == 10, x - y >= 2, x,y >= 0
    # optimum at y = 0, x = 10 (the >= row is slack): objective 20
    gf = _gf(
        Objective.MINIMIZE,
        [[1, 1], [1, -1]],
        [RangedConstraintRelation.equal(), RangedConstraintRelation.greater()],
        [10, 2],
        [2, 3],
        [(0, None), (0, None)],
    )
    result, solution = solve_general_form(gf, cpu_config)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert solution.objective_value == Fraction(20)
    assert solution.value_of("x0") == Fraction(10)


def test_free_variable_split(cpu_config):
    # min x + y with y free: x + y >= 3, x - y >= -1, x >= 0
    # y can be large negative? objective x+y decreases... x+y>=3 bounds it: opt 3.
    gf = _gf(
        Objective.MINIMIZE,
        [[1, 1], [1, -1]],
        [RangedConstraintRelation.greater(), RangedConstraintRelation.greater()],
        [3, -1],
        [1, 1],
        [(0, None), (None, None)],
    )
    result, solution = solve_general_form(gf, cpu_config)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert solution.objective_value == Fraction(3)


def test_unbounded(cpu_config):
    # min -x, x >= 0, x - y <= 1 (y >= 0 free to grow)
    gf = _gf(
        Objective.MINIMIZE,
        [[1, -1]],
        [RangedConstraintRelation.less()],
        [1],
        [-1, 0],
        [(0, None), (0, None)],
    )
    result, solution = solve_general_form(gf, cpu_config)
    assert result.status is SolveStatus.UNBOUNDED


def test_infeasible(cpu_config):
    # x >= 0: x <= 1, x >= 3 infeasible; use 2 vars to dodge presolve's
    # singleton-row elimination catching it first (either way is correct).
    from relp_tpu.config import SolverConfig

    cfg = SolverConfig(pad_to=8, presolve=False)
    gf = _gf(
        Objective.MINIMIZE,
        [[1, 1], [1, 1]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.greater()],
        [1, 3],
        [1, 1],
        [(0, None), (0, None)],
    )
    result, solution = solve_general_form(gf, cfg)
    assert result.status is SolveStatus.INFEASIBLE


def test_upper_bounded_variables(cpu_config):
    # max 3x + 2y, x <= 2, y <= 3, x + y <= 4 -> x=2, y=2, obj 10
    gf = _gf(
        Objective.MAXIMIZE,
        [[1, 1]],
        [RangedConstraintRelation.less()],
        [4],
        [3, 2],
        [(0, 2), (0, 3)],
    )
    result, solution = solve_general_form(gf, cpu_config)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert solution.objective_value == Fraction(-10)
    assert solution.value_of("x0") == Fraction(2)


def test_range_constraint(cpu_config):
    # min x + y st 2 <= x + y <= 5 (range), x, y >= 0 -> obj 2
    gf = _gf(
        Objective.MINIMIZE,
        [[1, 1]],
        [RangedConstraintRelation.ranged(Fraction(3))],
        [5],
        [1, 1],
        [(0, None), (0, None)],
    )
    result, solution = solve_general_form(gf, cpu_config)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert solution.objective_value == Fraction(2)


def test_redundant_rows_rank_repair(cpu_config):
    # Duplicate equality rows: rank-deficient; solver must drop one.
    from relp_tpu.config import SolverConfig

    cfg = SolverConfig(pad_to=8, presolve=False)
    gf = _gf(
        Objective.MINIMIZE,
        [[1, 1], [1, 1], [1, -1]],
        [
            RangedConstraintRelation.equal(),
            RangedConstraintRelation.equal(),
            RangedConstraintRelation.equal(),
        ],
        [4, 4, 0],
        [1, 2],
        [(0, None), (0, None)],
    )
    result, solution = solve_general_form(gf, cfg)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    # x = y = 2 forced; obj = 2 + 4 = 6
    assert solution.objective_value == Fraction(6)


def test_degenerate_lp(cpu_config):
    # Classic degenerate LP; checks anti-cycling paths.
    gf = _gf(
        Objective.MINIMIZE,
        [[1, 1, 1], [1, 0, 0], [0, 1, 0]],
        [
            RangedConstraintRelation.less(),
            RangedConstraintRelation.less(),
            RangedConstraintRelation.less(),
        ],
        [2, 1, 1],
        [-1, -1, -1],
        [(0, None), (0, None), (0, None)],
    )
    result, solution = solve_general_form(gf, cpu_config)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert solution.objective_value == Fraction(-2)


def test_infeasible_is_exactly_certified():
    """Infeasibility verdicts carry an exact Farkas certificate."""
    from relp_tpu.config import SolverConfig

    cfg = SolverConfig(pad_to=8, presolve=False)
    gf = _gf(
        Objective.MINIMIZE,
        [[1, 1], [1, 1]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.greater()],
        [1, 3],
        [1, 1],
        [(0, None), (0, None)],
    )
    result, solution = solve_general_form(gf, cfg)
    assert result.status is SolveStatus.INFEASIBLE
    assert result.stats.certified


def test_unbounded_is_exactly_certified():
    from relp_tpu.config import SolverConfig

    cfg = SolverConfig(pad_to=8, presolve=False)
    gf = _gf(
        Objective.MINIMIZE,
        [[1, -1]],
        [RangedConstraintRelation.less()],
        [1],
        [-1, 0],
        [(0, None), (0, None)],
    )
    result, solution = solve_general_form(gf, cfg)
    assert result.status is SolveStatus.UNBOUNDED
    assert result.stats.certified


def test_full_initial_basis_skips_phase1(cpu_config):
    """All-<= problems have slack pivots covering every row: no phase 1
    (reference: FullInitialBasis specialization, two_phase/mod.rs:80-109)."""
    from relp_tpu.config import SolverConfig
    from relp_tpu.simplex import solve_relaxation

    gf = _gf(
        Objective.MINIMIZE,
        [[1, 2], [3, 1]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.less()],
        [4, 6],
        [-1, -1],
        [(0, None), (0, None)],
    )
    counts = gf.standardize()
    data = gf.derive_matrix_data(counts)
    result = solve_relaxation(data, SolverConfig(pad_to=8))
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert result.stats.phase1_iterations == 0
    assert result.exact_objective == Fraction(-14, 5)


def test_debug_validate_runs_clean(cpu_config):
    """The BFS invariant validator (reference
    debug_assert_in_basic_feasible_solution_state, tableau/mod.rs:319-357)
    holds at every refactorization boundary of a normal solve."""
    import dataclasses

    gf = _gf(
        Objective.MINIMIZE,
        [[1, 2], [3, 1], [1, 1]],
        [
            RangedConstraintRelation.greater(),
            RangedConstraintRelation.less(),
            RangedConstraintRelation.equal(),
        ],
        [2, 9, 3],
        [2, 3],
        [(0, None), (0, None)],
    )
    cfg = dataclasses.replace(cpu_config, debug_validate=True, chunk_size=2,
                              refactor_period=2)
    result, solution = solve_general_form(gf, cfg)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert result.stats.certified


def test_debug_validate_catches_corruption():
    """A corrupted carry (wrong basic values) trips the validator."""
    import numpy as np
    import pytest as _pytest

    from relp_tpu.utils.debug import validate_bfs_state

    class FakeState:
        pass

    m = 3
    A = np.eye(m)
    b = np.array([1.0, 2.0, 3.0])
    c = np.zeros(m)
    s = FakeState()
    s.basis = np.arange(m)
    s.Binv = np.eye(m)
    s.xB = b.copy()
    s.pi = np.zeros(m)
    s.obj = 0.0
    validate_bfs_state(s, A, b, c)  # clean state passes

    s.xB = b - 1.5  # negative basic value
    with _pytest.raises(AssertionError, match="b_bar"):
        validate_bfs_state(s, A, b, c)

    s.xB = b.copy()
    s.Binv = np.eye(m) * 2.0  # not the basis inverse
    with _pytest.raises(AssertionError, match="Binv"):
        validate_bfs_state(s, A, b, c)
