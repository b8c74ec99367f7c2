"""Pallas fused pricing-scan kernel vs the XLA reference computation.

The kernel (relp_tpu/ops/pallas_scan.py) fuses the stacked scan
S = P @ A with the reduced-cost and Goldfarb gamma updates
(reference semantics: pivot_rule.rs:243-296).  On CPU it runs in
interpret mode; numerics must match the XLA formula to f32 rounding.
"""

import numpy as np
import pytest


def _formula(P, A, c, g, gq):
    import jax.numpy as jnp

    S = P @ A
    d = c - S[0]
    inner, abar = S[1], S[2]
    gnew = jnp.maximum(g - 2.0 * abar * inner + abar * abar * gq,
                       1.0 + abar * abar)
    return d, gnew


@pytest.mark.parametrize("M,N", [(8, 128), (64, 256), (96, 1280)])
def test_fused_scan_matches_xla(M, N):
    import jax.numpy as jnp

    from relp_tpu.ops import fused_price_scan

    rng = np.random.default_rng(M + N)
    P = jnp.asarray(rng.standard_normal((3, M)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
    c = jnp.asarray(rng.standard_normal(N), jnp.float32)
    g = jnp.asarray(1.0 + np.abs(rng.standard_normal(N)), jnp.float32)
    gq = jnp.float32(1.0 + float(np.abs(rng.standard_normal())) * 5)

    d, gnew = fused_price_scan(P, A, c, g, gq, interpret=True)
    d_ref, g_ref = _formula(P, A, c, g, gq)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gnew), np.asarray(g_ref), atol=1e-5 * (1.0 + scale)
    )


def test_solve_with_pallas_scan():
    """End-to-end: the solver with pallas_scan=True reaches the same exact
    optimum (pad_to=128 for lane-aligned tiles; interpret mode on CPU)."""
    from fractions import Fraction

    from relp_tpu.config import SolverConfig
    from relp_tpu.io import mps_to_general_form, parse_fixed
    from relp_tpu.simplex import SolveStatus, solve_general_form

    path = "/root/reference/tests/netlib/problem_files/AFIRO.SIF"
    try:
        text = open(path).read()
    except OSError:
        pytest.skip("reference netlib mount not available")
    cfg = SolverConfig(pad_to=128, pallas_scan=True)
    gf = mps_to_general_form(parse_fixed(text))
    result, solution = solve_general_form(gf, cfg)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert result.stats.certified
    assert result.exact_objective == Fraction(-406659, 875)
