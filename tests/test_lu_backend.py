"""LU + eta backend tests.

Mirrors the reference's backend cross-check strategy: the same problems run
through both BasisInverseRows and LUDecomposition (reference:
two_phase/test.rs:30-44); plus the random-matrix inverse identities
(reference: decomposition/mod.rs:454-651 checks B^-1 B = I both ways).
"""

from fractions import Fraction

import numpy as np
import pytest

from relp_tpu.config import SolverConfig
from relp_tpu.simplex import SolveStatus, solve_general_form


def lu_config(**overrides):
    defaults = dict(
        pad_to=8, chunk_size=20, refactor_period=20, basis_inverse="lu"
    )
    defaults.update(overrides)
    return SolverConfig(**defaults)


def test_lu_ftran_btran_identities():
    """B^-1 column/row identities through factors + eta ring."""
    import jax.numpy as jnp

    from relp_tpu.simplex import lu as lu_mod
    from relp_tpu.simplex.state import RUNNING

    rng = np.random.default_rng(42)
    M = 24
    A = rng.standard_normal((M, 2 * M))
    A_d = jnp.asarray(A)
    b = jnp.asarray(np.abs(rng.standard_normal(M)))
    c = jnp.asarray(rng.standard_normal(2 * M))
    basis = jnp.asarray(np.arange(M, dtype=np.int32))

    lu, piv, B0, eta_vals, eta_rows, xB, pi, obj, residual = lu_mod.lu_refactorize(
        A_d, b, c, basis, eta_capacity=8
    )
    assert float(residual) < 1e-10

    state = lu_mod.LUState(
        lu=lu, piv=piv, B0=B0, eta_vals=eta_vals, eta_rows=eta_rows,
        eta_count=jnp.zeros((), jnp.int32), basis=basis, xB=xB, pi=pi,
        obj=obj, in_basis=jnp.asarray(np.arange(2 * M) < M),
        gamma=jnp.ones(2 * M), iteration=jnp.zeros((), jnp.int32),
        status=jnp.asarray(RUNNING, jnp.int32), inner=jnp.zeros((), jnp.int32),
        price_start=jnp.zeros((), jnp.int32),
    )

    B = A[:, :M]
    Binv = np.linalg.inv(B)
    # FTRAN against a few unit vectors and a dense vector.
    for k in (0, 7, M - 1):
        e = np.zeros(M)
        e[k] = 1.0
        x = np.asarray(lu_mod.lu_ftran(state, jnp.asarray(e)))
        assert np.allclose(x, Binv[:, k], atol=1e-9)
    y = rng.standard_normal(M)
    v = np.asarray(lu_mod.lu_btran(state, jnp.asarray(y)))
    assert np.allclose(v, y @ Binv, atol=1e-8)

    # Now push two product-form etas and check against the updated inverse.
    import jax

    q1, r1 = M + 3, 5
    w1 = Binv @ A[:, q1]
    state = state._replace(
        eta_vals=state.eta_vals.at[0].set(jnp.asarray(w1)),
        eta_rows=state.eta_rows.at[0].set(r1),
        eta_count=jnp.asarray(1, jnp.int32),
    )
    B2 = B.copy()
    B2[:, r1] = A[:, q1]
    B2inv = np.linalg.inv(B2)
    x = np.asarray(lu_mod.lu_ftran(state, jnp.asarray(A[:, M + 9])))
    assert np.allclose(x, B2inv @ A[:, M + 9], atol=1e-8)
    v = np.asarray(lu_mod.lu_btran(state, jnp.asarray(y)))
    assert np.allclose(v, y @ B2inv, atol=1e-7)


@pytest.mark.parametrize("pricing", ["dantzig", "steepest"])
def test_lu_backend_small_lp(pricing):
    from tests.test_simplex_small import _gf
    from relp_tpu.data.elements import Objective, RangedConstraintRelation

    gf = _gf(
        Objective.MAXIMIZE,
        [[1, 2], [3, 1]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.less()],
        [4, 6],
        [1, 1],
        [(0, None), (0, None)],
    )
    result, solution = solve_general_form(gf, lu_config(pricing=pricing))
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert solution.objective_value == Fraction(-14, 5)


def test_lu_backend_netlib_afiro():
    from tests.conftest import reference_problem
    from relp_tpu.io import load_general_form

    gf = load_general_form(reference_problem("netlib", "AFIRO.SIF"))
    result, solution = solve_general_form(
        gf, lu_config(pad_to=64, chunk_size=40, refactor_period=40)
    )
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert solution.objective_value == Fraction(-406659, 875)
    assert result.stats.certified


def test_lu_backend_phase1_artificials():
    """Equality rows force phase 1 + artificial drive-out under LU."""
    from tests.test_simplex_small import _gf
    from relp_tpu.data.elements import Objective, RangedConstraintRelation

    gf = _gf(
        Objective.MINIMIZE,
        [[1, 1], [1, -1]],
        [RangedConstraintRelation.equal(), RangedConstraintRelation.greater()],
        [10, 2],
        [2, 3],
        [(0, None), (0, None)],
    )
    result, solution = solve_general_form(gf, lu_config())
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert solution.objective_value == Fraction(20)
