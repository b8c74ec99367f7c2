"""Restarted PDHG (PDLP-style first-order LP) + crossover to exact.

Beyond reference scope (the reference is simplex-only): the GPU-era
first-order method runs as pure matvecs, and its point crosses over into
the exact simplex/Dixon pipeline so the final contract stays exact.
"""

from fractions import Fraction

import numpy as np
import pytest

from relp_tpu.config import SolverConfig
from relp_tpu.firstorder import solve_first_order
from relp_tpu.firstorder.pdhg import pdhg_solve, ruiz_equilibrate
from relp_tpu.simplex.driver import solve_relaxation

from conftest import reference_problem


def _netlib_md(name):
    from relp_tpu.io import load_general_form

    gf = load_general_form(reference_problem("netlib", name))
    counts = gf.standardize()
    return gf.derive_matrix_data(counts)


def test_ruiz_equilibration_reconstructs():
    rng = np.random.default_rng(3)
    A = rng.standard_normal((7, 11)) * np.exp(rng.uniform(-6, 6, (7, 11)))
    As, dr, dc = ruiz_equilibrate(A)
    assert np.allclose(As, dr[:, None] * A * dc[None, :])
    # Equilibrated: every nonzero row/col inf-norm lands near 1.
    assert np.abs(As).max(axis=1).max() < 2.0
    assert np.abs(As).max(axis=0).max() < 2.0


def test_pdhg_tiny_lp_matches_exact():
    """min -x-y st x+2y<=4, 3x+y<=6 (standard form with slacks):
    optimum at the vertex (8/5, 6/5), objective -14/5."""
    A = np.array([[1.0, 2.0, 1.0, 0.0], [3.0, 1.0, 0.0, 1.0]])
    b = np.array([4.0, 6.0])
    c = np.array([-1.0, -1.0, 0.0, 0.0])
    x, y, stats = pdhg_solve(A, b, c, tol=1e-9, dtype=np.float64)
    assert stats.converged
    assert abs(float(c @ x) - (-2.8)) < 1e-6
    assert abs(x[0] - 1.6) < 1e-5 and abs(x[1] - 1.2) < 1e-5


def test_pdhg_box_projection_respects_upper_bounds():
    """min -x st x <= 3 via an explicit box (no bound row)."""
    A = np.array([[1.0, 1.0]])  # x + s = 5
    b = np.array([5.0])
    c = np.array([-1.0, 0.0])
    u = np.array([3.0, np.inf])
    x, y, stats = pdhg_solve(A, b, c, u, tol=1e-9, dtype=np.float64)
    assert stats.converged
    assert abs(x[0] - 3.0) < 1e-6
    assert abs(x[1] - 2.0) < 1e-6


def test_pdhg_crossover_afiro_exact():
    """PDHG converges on AFIRO; the crossover basis hands the exact layer
    a (near-)optimal basis and the certified exact objective matches the
    reference value."""
    cfg = SolverConfig(dtype="float64")
    result = solve_first_order(_netlib_md("AFIRO.SIF"), cfg, tol=1e-7)
    assert result.stats.certified
    assert result.exact_objective == Fraction(-406659, 875)
    assert result.stats.first_order_residual < 1e-6


def test_pdhg_crossover_warm_start_skips_simplex_work():
    """On BLEND the converged PDHG point's basis is optimal: the exact
    pipeline certifies it with (near-)zero simplex iterations, matching
    the cold exact solve."""
    cfg = SolverConfig(dtype="float64")
    cold = solve_relaxation(_netlib_md("BLEND.SIF"), cfg)
    xo = solve_first_order(
        _netlib_md("BLEND.SIF"), cfg, tol=1e-6, max_iters=30_000
    )
    assert xo.stats.certified and cold.stats.certified
    assert xo.exact_objective == cold.exact_objective
    assert (
        xo.stats.phase1_iterations + xo.stats.iterations
        <= (cold.stats.phase1_iterations + cold.stats.iterations) // 4
    )


def test_pdhg_crossover_graceful_on_stalled_instance():
    """SHARE2B stalls PDHG at ~1e-2; the crossover falls back to the cold
    exact solve — same certified exact objective, correctness never
    depends on the first-order phase."""
    cfg = SolverConfig(dtype="float64")
    cold = solve_relaxation(_netlib_md("SHARE2B.SIF"), cfg)
    xo = solve_first_order(
        _netlib_md("SHARE2B.SIF"), cfg, tol=1e-6, max_iters=4_000
    )
    assert xo.stats.certified
    assert xo.exact_objective == cold.exact_objective


def test_pdhg_sharded_matches_unsharded():
    """2-D mesh-sharded PDHG (rows over "batch", cols over "col", with
    zero-padding to equal shards) walks to the same optimum as the
    single-device run — GSPMD inserts the psum combines; the math is
    identical up to reduction order."""
    from relp_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    m, n = 13, 37  # deliberately indivisible by the mesh axes (padding path)
    A = np.abs(rng.standard_normal((m, n))) + 0.1
    x_feas = np.abs(rng.standard_normal(n))
    b = A @ x_feas
    c = rng.standard_normal(n)
    u = np.full(n, np.inf)
    u[::3] = np.abs(rng.standard_normal((n + 2) // 3)) + 1.0

    x0, y0, s0 = pdhg_solve(A, b, c, u, tol=1e-8, dtype=np.float64)
    mesh = make_mesh((2, 4))
    x1, y1, s1 = pdhg_solve(
        A, b, c, u, tol=1e-8, dtype=np.float64, mesh=mesh
    )
    assert s0.converged and s1.converged
    assert x1.shape == (n,) and y1.shape == (m,)
    assert abs(float(c @ x1) - float(c @ x0)) <= 1e-6 * (1 + abs(c @ x0))
    assert np.linalg.norm(A @ x1 - b) < 1e-6 * (1 + np.linalg.norm(b))


def test_pdhg_sharded_crossover_netlib_exact():
    """solve_first_order(mesh=...): the sharded PDHG phase + the exact
    crossover certify the reference AFIRO objective."""
    from relp_tpu.parallel.mesh import make_mesh

    cfg = SolverConfig(dtype="float64")
    result = solve_first_order(
        _netlib_md("AFIRO.SIF"), cfg, tol=1e-7, mesh=make_mesh((1, 8))
    )
    assert result.stats.certified
    assert result.exact_objective == Fraction(-406659, 875)
