"""Scale-out tests: scenario batches and column sharding on the virtual
8-device CPU mesh."""

from fractions import Fraction

import numpy as np
import pytest

from relp_tpu.config import SolverConfig
from relp_tpu.data.elements import Objective, RangedConstraintRelation
from relp_tpu.data.general_form import GeneralForm, Variable, VariableType
from relp_tpu.linalg.sparse import SparseColumnMatrix
from relp_tpu.simplex import SolveStatus

F = Fraction


def _provider(b2):
    """min -x - y st x + 2y <= 4, 3x + y <= b2 (perturbable)."""
    gf = GeneralForm(
        objective=Objective.MINIMIZE,
        constraints=SparseColumnMatrix.from_dense(
            [[F(1), F(2)], [F(3), F(1)]]
        ),
        constraint_types=[
            RangedConstraintRelation.less(),
            RangedConstraintRelation.less(),
        ],
        b=[F(4), F(b2)],
        variables=[
            Variable(VariableType.CONTINUOUS, F(-1), F(0), None),
            Variable(VariableType.CONTINUOUS, F(-1), F(0), None),
        ],
        variable_names=["x", "y"],
    )
    counts = gf.standardize()
    return gf.derive_matrix_data(counts), gf


def test_solve_batch_scenarios(cpu_config):
    from relp_tpu.parallel.batch_driver import solve_batch

    scenarios = [6, 7, 8, 9]
    providers = []
    for b2 in scenarios:
        md, _ = _provider(b2)
        providers.append(md)
    results = solve_batch(providers, cpu_config)
    assert len(results) == 4
    for b2, result in zip(scenarios, results):
        assert result.status is SolveStatus.FINITE_OPTIMUM, b2
        assert result.stats.certified
        # optimum of max x+y st x+2y<=4, 3x+y<=b2 at intersection:
        # x=(2 b2-4)/5, y=(12-b2)/5 for b2 in [2,12] -> obj -(b2+8)/5.
        assert result.exact_objective == -F(b2 + 8, 5)


def test_solve_batch_mixed_phase1(cpu_config):
    """Batch where some LPs need phase 1 (equality rows) and some don't."""
    from relp_tpu.parallel.batch_driver import solve_batch

    def eq_provider(rhs):
        gf = GeneralForm(
            objective=Objective.MINIMIZE,
            constraints=SparseColumnMatrix.from_dense(
                [[F(1), F(1)], [F(1), F(-1)]]
            ),
            constraint_types=[
                RangedConstraintRelation.equal(),
                RangedConstraintRelation.greater(),
            ],
            b=[F(rhs), F(2)],
            variables=[
                Variable(VariableType.CONTINUOUS, F(2), F(0), None),
                Variable(VariableType.CONTINUOUS, F(3), F(0), None),
            ],
            variable_names=["x", "y"],
        )
        counts = gf.standardize()
        return gf.derive_matrix_data(counts)

    md_ineq, _ = _provider(6)
    providers = [eq_provider(10), md_ineq, eq_provider(8)]
    results = solve_batch(providers, cpu_config)
    assert results[0].exact_objective == F(20)
    assert results[1].exact_objective == -F(14, 5)
    assert results[2].exact_objective == F(16)


def test_column_sharded_chunk(cpu_config):
    """Column-sharded pricing on an 8-device mesh gives the same pivots."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    import jax.numpy as jnp

    from relp_tpu.parallel.mesh import make_mesh
    from relp_tpu.parallel.sharded import shard_problem, shard_state
    from relp_tpu.simplex import kernels
    from relp_tpu.simplex.engine import DenseEngine
    from relp_tpu.simplex.lowering import lower_provider

    md, _ = _provider(6)
    problem = lower_provider(md, pad_to=8)  # f64 arrays
    engine = DenseEngine()
    cfg64 = SolverConfig(pad_to=8, dtype="float64")
    state = engine.init_state(problem, cfg64)

    A = jnp.asarray(problem.A)
    c = jnp.asarray(problem.c_phase2)
    cand = jnp.asarray(problem.candidate_mask)
    kwargs = dict(
        pricing=kernels.PRICE_DANTZIG,
        chunk=30,
        opt_tol=1e-9,
        pivot_tol=1e-9,
        degen_tol=1e-9,
    )
    plain = kernels.run_chunk(state, A, A, c, cand, **kwargs)

    mesh = make_mesh((1, 8))
    with mesh:
        A_s, b_s, c_s, cand_s = shard_problem(
            mesh, A, jnp.asarray(problem.b), c, cand
        )
        state_s = shard_state(mesh, engine.init_state(problem, cfg64))
        sharded = kernels.run_chunk(state_s, A_s, A_s, c_s, cand_s, **kwargs)

    assert int(sharded.iteration) == int(plain.iteration)
    assert np.array_equal(np.asarray(sharded.basis), np.asarray(plain.basis))
    assert np.allclose(np.asarray(sharded.xB), np.asarray(plain.xB))


def test_driver_with_mesh(cpu_config):
    """End-to-end solve through the driver with a column-sharded mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from relp_tpu.parallel.mesh import make_mesh
    from relp_tpu.simplex import solve_relaxation

    md, _ = _provider(6)
    plain = solve_relaxation(md, cpu_config)
    mesh = make_mesh((1, 8))
    sharded = solve_relaxation(md, cpu_config, mesh=mesh)
    assert sharded.status is plain.status
    assert sharded.exact_objective == plain.exact_objective
    assert sharded.basis == plain.basis
