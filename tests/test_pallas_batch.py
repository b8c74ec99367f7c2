"""Fused batched-pivot megakernel tests (relp_tpu/ops/pallas_batch.py).

Interpret-mode equivalence against the vmapped XLA path, plus the scenario
batch driver end-to-end with the megakernel enabled.
"""

from fractions import Fraction

import numpy as np
import pytest

from relp_tpu.config import SolverConfig
from relp_tpu.simplex import SolveStatus

F = Fraction


def _toy_batch(B=3, m=32, n=64, chunk=25, stop_at_zero=True, seed0=0):
    import jax.numpy as jnp
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_state, _synthetic_problem
    from relp_tpu.parallel.batch import make_batch_state

    states, As, cs, cands = [], [], [], []
    for s in range(B):
        A, b, c1, c2, cand, basis = _synthetic_problem(
            m=m, n=n, pad=32, seed=seed0 + s, dtype=np.float32
        )
        states.append(_make_state(A, b, c1, basis))
        As.append(A)
        cs.append(c1)
        cands.append(cand)
    batch = make_batch_state(states)
    return (
        batch,
        jnp.asarray(np.stack(As)),
        jnp.asarray(np.stack(cs)),
        jnp.asarray(np.stack(cands)),
    )


@pytest.mark.parametrize("stop_at_zero", [True, False])
def test_megakernel_matches_xla_path(stop_at_zero):
    from relp_tpu.ops.pallas_batch import batched_pivot_chunk
    from relp_tpu.parallel.batch import batched_run_chunk
    from relp_tpu.simplex.kernels import PRICE_STEEPEST

    batch, A, c, cand = _toy_batch()
    kw = dict(
        chunk=25, opt_tol=1e-7, pivot_tol=1e-7, degen_tol=1e-7,
        stop_at_zero=stop_at_zero,
    )
    ref = batched_run_chunk(
        batch, A, A, c, cand, pricing=PRICE_STEEPEST, **kw
    )
    Binv, xB, pi, basis, inb, gamma, status, iteration, degen = (
        batched_pivot_chunk(
            A, c, cand, batch.Binv, batch.xB, batch.pi, batch.basis,
            batch.in_basis, batch.gamma, batch.status, batch.iteration,
            batch.degen_count, interpret=True, **kw,
        )
    )
    assert np.array_equal(np.asarray(ref.iteration), np.asarray(iteration))
    assert np.array_equal(np.asarray(ref.status), np.asarray(status))
    assert np.array_equal(np.asarray(ref.basis), np.asarray(basis))
    assert np.array_equal(np.asarray(ref.in_basis), np.asarray(inb))
    assert np.allclose(np.asarray(ref.xB), np.asarray(xB), atol=1e-4)
    assert np.allclose(np.asarray(ref.pi), np.asarray(pi), atol=1e-3)


@pytest.mark.parametrize("stop_at_zero", [True, False])
def test_blocked_megakernel_matches_xla_path(stop_at_zero):
    """The HBM-streaming (row-blocked) megakernel must match the XLA path
    exactly in interpret mode, including across column-block boundaries
    (N=256 with col_block=128 exercises 2-block streaming)."""
    from relp_tpu.ops.pallas_batch import batched_pivot_chunk_blocked
    from relp_tpu.parallel.batch import batched_run_chunk
    from relp_tpu.simplex.kernels import PRICE_STEEPEST

    batch, A, c, cand = _toy_batch(B=3, m=48, n=192, chunk=25)
    assert A.shape[2] == 256, A.shape
    kw = dict(
        chunk=25, opt_tol=1e-7, pivot_tol=1e-7, degen_tol=1e-7,
        stop_at_zero=stop_at_zero,
    )
    ref = batched_run_chunk(
        batch, A, A, c, cand, pricing=PRICE_STEEPEST, **kw
    )
    Binv, xB, pi, basis, inb, gamma, status, iteration, degen = (
        batched_pivot_chunk_blocked(
            A, c, cand, batch.Binv, batch.xB, batch.pi, batch.basis,
            batch.in_basis, batch.gamma, batch.status, batch.iteration,
            batch.degen_count, interpret=True, col_block=128, **kw,
        )
    )
    assert np.array_equal(np.asarray(ref.iteration), np.asarray(iteration))
    assert np.array_equal(np.asarray(ref.status), np.asarray(status))
    assert np.array_equal(np.asarray(ref.basis), np.asarray(basis))
    assert np.array_equal(np.asarray(ref.in_basis), np.asarray(inb))
    assert np.allclose(np.asarray(ref.xB), np.asarray(xB), atol=1e-4)
    assert np.allclose(np.asarray(ref.pi), np.asarray(pi), atol=1e-3)
    assert np.allclose(np.asarray(ref.Binv), np.asarray(Binv), atol=1e-3)
    assert np.allclose(np.asarray(ref.gamma), np.asarray(gamma), atol=1e-2)


def test_megakernel_variant_selection():
    from relp_tpu.parallel.batch import _megakernel_variant

    assert _megakernel_variant((64, 256, 512))[0] == "resident"
    assert _megakernel_variant((64, 512, 1024))[0] == "resident"
    variant, kw = _megakernel_variant((32, 1024, 2048))
    assert variant == "blocked" and kw["col_block"] == 512
    assert _megakernel_variant((8, 2048, 4096))[0] is None


def test_solve_batch_with_megakernel(cpu_config):
    """End-to-end scenario batch through the megakernel chunk loop
    (interpret mode on CPU) reproduces the exact certified optima."""
    import dataclasses

    from tests.test_parallel import _provider
    from relp_tpu.parallel.batch_driver import solve_batch

    scenarios = [6, 7, 8, 9]
    # pad_to=32 gives M=32 (%8), N=64... N must be %128 for the megakernel;
    # use pad_to=128 so the gate accepts the shapes.
    cfg = dataclasses.replace(cpu_config, pad_to=128, pallas_batch=True)
    results = solve_batch([_provider(b2)[0] for b2 in scenarios], cfg)
    for b2, result in zip(scenarios, results):
        assert result.status is SolveStatus.FINITE_OPTIMUM, b2
        assert result.stats.certified
        assert result.exact_objective == -F(b2 + 8, 5)
