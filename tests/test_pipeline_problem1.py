"""Stage-equality pipeline fixtures.

Mirror of reference ``src/tests/problem_{1,2}.rs`` — the single most valuable
test pattern of the reference (SURVEY.md section 4): one MPS literal is
materialized at *every* pipeline stage (parsed MPS, GeneralForm, presolved +
standardized GeneralForm, MatrixData, solve, reconstruction) and each stage
is asserted against hand-built expectations, pinning the semantics of every
layer boundary.
"""

from fractions import Fraction

from relp_tpu.config import SolverConfig
from relp_tpu.data.elements import (
    ConstraintRelation,
    Objective,
    RangedKind,
    VariableType,
)
from relp_tpu.data.general_form import GeneralForm, Variable
from relp_tpu.data.solution import Solution
from relp_tpu.io import mps_to_general_form, parse_free
from relp_tpu.linalg.sparse import SparseColumnMatrix
from relp_tpu.simplex import SolveStatus, solve_relaxation

F = Fraction

# reference: src/tests/problem_1.rs MPS_LITERAL_STRING
MPS_LITERAL = """NAME          TESTPROB
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    XONE      COST                 1   LIM1                 1
    XONE      LIM2                 1
    MARKER0   'MARKER'      'INTORG'
    YTWO      COST                 4   LIM1                 1
    YTWO      MYEQN               -1
    MARKER0   'MARKER'      'INTEND'
    ZTHREE    COST                 9   LIM2                 1
    ZTHREE    MYEQN                1
RHS
    RHS1      LIM1                 5   LIM2                10
    RHS1      MYEQN                7
BOUNDS
 UP BND1      XONE                 4
 LO BND1      YTWO                -1
 UP BND1      YTWO                 1
ENDATA"""


def test_conversion_pipeline():
    # --- stage 1: parsed MPS (reference: mps()) ---
    mps = parse_free(MPS_LITERAL)
    assert mps.name == "TESTPROB"
    assert mps.cost_row_name == "COST"
    assert mps.cost_values == [(0, F(1)), (1, F(4)), (2, F(9))]
    assert [(r.name, r.constraint_type) for r in mps.rows] == [
        ("LIM1", ConstraintRelation.LESS),
        ("LIM2", ConstraintRelation.GREATER),
        ("MYEQN", ConstraintRelation.EQUAL),
    ]
    assert [c.name for c in mps.columns] == ["XONE", "YTWO", "ZTHREE"]
    assert mps.columns[0].variable_type is VariableType.CONTINUOUS
    assert mps.columns[1].variable_type is VariableType.INTEGER
    assert mps.columns[0].values == [(0, F(1)), (1, F(1))]
    assert mps.columns[1].values == [(0, F(1)), (2, F(-1))]
    assert mps.columns[2].values == [(1, F(1)), (2, F(1))]
    assert mps.rhss[0].values == [(0, F(5)), (1, F(10)), (2, F(7))]

    # --- stage 2: GeneralForm (reference: general_form()) ---
    gf = mps_to_general_form(mps)
    assert gf.objective is Objective.MINIMIZE
    assert gf.b == [F(5), F(10), F(7)]
    assert [v.cost for v in gf.variables] == [F(1), F(4), F(9)]
    assert gf.variables[0].lower_bound == 0 and gf.variables[0].upper_bound == 4
    assert gf.variables[1].lower_bound == -1 and gf.variables[1].upper_bound == 1
    assert gf.variables[2].lower_bound == 0 and gf.variables[2].upper_bound is None

    # --- stage 3: presolve + standardize
    # (reference: general_form_standardized()) ---
    gf.presolve()
    counts = gf.standardize()
    # Presolve removes LIM1 (activity bound 4 + 1 <= 5); standardize shifts
    # YTWO by its lower bound -1 and sorts rows [==, >=].
    assert counts == [1, 0, 0, 1]
    assert gf.b == [F(6), F(10)]
    assert [ct.kind for ct in gf.constraint_types] == [
        RangedKind.EQUAL,
        RangedKind.GREATER,
    ]
    assert gf.constraints.to_dense() == [
        [F(0), F(-1), F(1)],
        [F(1), F(0), F(1)],
    ]
    assert gf.variables[1].shift == F(1)
    assert gf.variables[1].lower_bound == F(0)
    assert gf.variables[1].upper_bound == F(2)
    assert gf.fixed_cost == F(-4)

    # --- stage 4: MatrixData (reference: matrix_data_form()) ---
    data = gf.derive_matrix_data(counts)
    assert data.nr_equality == 1
    assert data.nr_range == 0
    assert data.nr_upper == 0
    assert data.nr_lower == 1
    assert data.bound_index_to_variable == [0, 1]
    # Rows: MYEQN, LIM2, bound(XONE), bound(YTWO); rhs [6, 10, 4, 2].
    assert data.right_hand_side() == [F(6), F(10), F(4), F(2)]
    assert data.nr_columns() == 6  # 3 normal + 1 >= slack + 2 bound slacks
    # Initial slack pivots cover the two bound rows (partially artificial).
    assert data.pivot_element_indices() == [(2, 4), (3, 5)]

    # --- stage 5: solve (reference asserts BFS {0:4, 2:6, 5:2}) ---
    cfg = SolverConfig(pad_to=8, pricing="first")
    result = solve_relaxation(data, cfg)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert dict(result.bfs.entries) == {0: F(4), 2: F(6), 5: F(2)}

    # --- stage 6: reconstruction (objective 54, reference solution) ---
    reconstructed = data.reconstruct_solution(result.bfs)
    solution = gf.compute_full_solution_with_reduced_solution(reconstructed)
    assert solution == Solution(
        F(54), [("XONE", F(4)), ("YTWO", F(-1)), ("ZTHREE", F(6))]
    )


def test_problem_2_direct_matrix_data():
    """reference: src/tests/problem_2.rs — MatrixData built directly."""
    from relp_tpu.providers.matrix_data import MatrixData

    constraints = SparseColumnMatrix.from_dense(
        [
            [F(3), F(2), F(1), F(0), F(0)],
            [F(5), F(1), F(1), F(1), F(0)],
            [F(2), F(5), F(1), F(0), F(1)],
        ]
    )
    b = [F(1), F(3), F(4)]
    variables = [
        Variable(VariableType.CONTINUOUS, F(1), F(0), None) for _ in range(5)
    ]
    data = MatrixData(
        constraints=constraints,
        b=b,
        ranges=[],
        nr_equality=3,
        nr_range=0,
        nr_upper=0,
        nr_lower=0,
        variables=variables,
    )
    cfg = SolverConfig(pad_to=8, pricing="first")
    result = solve_relaxation(data, cfg)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    # reference expectation: x = (0, 1/2, 0, 5/2, 3/2).
    assert dict(result.bfs.entries) == {1: F(1, 2), 3: F(5, 2), 4: F(3, 2)}
