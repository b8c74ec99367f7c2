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


def _problem_2_matrix_data():
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
    return MatrixData(
        constraints=constraints,
        b=b,
        ranges=[],
        nr_equality=3,
        nr_range=0,
        nr_upper=0,
        nr_lower=0,
        variables=variables,
    )


def test_problem_2_direct_matrix_data():
    """reference: src/tests/problem_2.rs — MatrixData built directly."""
    data = _problem_2_matrix_data()
    cfg = SolverConfig(pad_to=8, pricing="first")
    result = solve_relaxation(data, cfg)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    # reference expectation: x = (0, 1/2, 0, 5/2, 3/2).
    assert dict(result.bfs.entries) == {1: F(1, 2), 3: F(5, 2), 4: F(3, 2)}


def test_problem_2_conversion_pipeline():
    """reference: src/tests/problem_2.rs conversion_pipeline — every layer
    boundary of the two-phase solve pinned to hand-built expectations.

    The reference materializes the artificial tableau (Carry: -obj = -8,
    -pi = [-1,-1,-1], b-bar = [1,3,4], all-artificial basis), the
    post-phase-1 NonArtificial tableau (Carry: -obj = -9/2,
    -pi = [5/2,-1,-1], b-bar = [1/2,5/2,3/2], basis [1,3,4], explicit
    B^-1 rows) and the phase-2 optimum; this test pins the same three
    boundaries on the device state (our state stores +pi; the reference
    stores -pi — same convention for reduced costs c_j - pi.a_j).
    """
    import numpy as np
    import jax.numpy as jnp

    from relp_tpu.simplex.engine import DenseEngine
    from relp_tpu.simplex.kernels import PRICE_FIRST
    from relp_tpu.simplex.lowering import lower_provider
    from relp_tpu.simplex.result import SolveStats
    from relp_tpu.simplex.state import OPTIMAL, RUNNING

    data = _problem_2_matrix_data()
    cfg = SolverConfig(
        pad_to=8, pricing="first", dtype="float64", chunk_size=20,
        refactor_period=20,
    )
    problem = lower_provider(data, dtype=np.float64, pad_to=8)
    assert (problem.m_real, problem.n_real, problem.art_offset) == (3, 5, 5)

    engine = DenseEngine()
    A = jnp.asarray(problem.A)
    b = jnp.asarray(problem.b)
    c1 = jnp.asarray(problem.c_phase1)
    c2 = jnp.asarray(problem.c_phase2)
    mask = jnp.asarray(problem.candidate_mask)

    # --- artificial tableau (reference: artificial_tableau_form) ---
    state = engine.init_state(problem, cfg)
    assert np.asarray(state.basis)[:3].tolist() == [5, 6, 7]  # artificials
    assert np.asarray(state.xB)[:3].tolist() == [1.0, 3.0, 4.0]
    assert float(state.obj) == 8.0  # reference minus_objective = -8
    assert np.asarray(state.pi)[:3].tolist() == [1.0, 1.0, 1.0]  # -(-pi)
    assert np.allclose(np.asarray(state.Binv), np.eye(8))

    # --- phase 1 (FirstProfitable) ---
    state = engine.run_chunk(state, A, A, c1, mask, PRICE_FIRST, cfg,
                             stop_at_zero=True)
    assert float(state.obj) == 0.0

    # --- post-phase-1 tableau (reference: tableau_form) ---
    stats = SolveStats()
    state, residual = engine.refactor(state, A, b, c2, cfg, stats)
    assert residual < 1e-12
    assert np.asarray(state.basis)[:3].tolist() == [1, 3, 4]
    assert np.asarray(state.xB)[:3].tolist() == [0.5, 2.5, 1.5]
    assert float(state.obj) == 4.5  # reference minus_objective = -9/2
    assert np.asarray(state.pi)[:3].tolist() == [-2.5, 1.0, 1.0]
    assert np.asarray(state.Binv)[:3, :3].tolist() == [
        [0.5, 0.0, 0.0],
        [-0.5, 1.0, 0.0],
        [-2.5, 0.0, 1.0],
    ]

    # --- phase 2: already optimal, zero further pivots ---
    iters_before = int(state.iteration)
    state = state._replace(status=jnp.asarray(RUNNING, jnp.int32))
    state = engine.run_chunk(state, A, A, c2, mask, PRICE_FIRST, cfg)
    assert int(state.status) == OPTIMAL
    assert int(state.iteration) == iters_before
    assert np.asarray(state.basis)[:3].tolist() == [1, 3, 4]
    assert np.asarray(state.xB)[:3].tolist() == [0.5, 2.5, 1.5]
