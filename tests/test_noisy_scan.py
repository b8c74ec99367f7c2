"""Noisy-scan (accelerator single-pass-bf16 matmul) termination semantics.

On TPU/GPU, "same-precision" f32 scans are single-pass bf16 on the MXU
(scripts/probe_batched_precision.py: ~2.6e-3 max relative error for both the
batched einsum and the stacked (3,M)@(M,N) scan).  The guarded-scan machinery
(kernels.make_iteration noisy_scan, the drivers' zero-pivot OPTIMAL
acceptance rule) keeps pricing from livelocking on phantom reduced costs.
CPU matmuls are exact, so these tests force ``noisy_f32_matmul`` on via
monkeypatching: the guard logic must stay *correct* (same verdicts, exactly
certified objectives) when enabled on a clean backend — the noise floor may
hide small candidates mid-chunk, and the chunk-boundary clean arbiter must
recover every one of them.
"""

from fractions import Fraction

import pytest

import relp_tpu.simplex.kernels as kernels
from relp_tpu.config import SolverConfig
from relp_tpu.io import load_general_form
from relp_tpu.simplex import SolveStatus, solve_general_form

from tests.conftest import reference_problem


@pytest.fixture
def force_noisy(monkeypatch):
    monkeypatch.setattr(kernels, "noisy_f32_matmul", lambda: True)


def test_noisy_scan_single_lp(force_noisy):
    """The single-LP driver under forced-noisy semantics: the scaled
    eligibility floor + pick recheck + zero-pivot OPTIMAL acceptance must
    still reach the exact certified optimum."""
    gf = load_general_form(reference_problem("netlib", "AFIRO.SIF"))
    gf.presolve()
    cfg = SolverConfig(pad_to=8, chunk_size=50, refactor_period=50)
    result, solution = solve_general_form(gf, cfg)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert result.stats.certified
    assert abs(float(solution.objective_value) - (-464.75314)) < 1e-4


def test_noisy_scan_batch_driver(force_noisy):
    """The scenario batch driver re-arms falsely-OPTIMAL LPs at the clean
    chunk boundary instead of accepting scan-noise freezes; every scenario
    must come back exactly certified."""
    import copy

    from relp_tpu.parallel.batch_driver import solve_batch

    base = load_general_form(reference_problem("netlib", "AFIRO.SIF"))
    base.presolve()
    counts = base.standardize()
    providers = []
    for s in range(3):
        gf = copy.deepcopy(base)
        for i in range(len(gf.b)):
            wobble = Fraction((s * 7919 + i * 104729) % 2001 - 1000, 100_000)
            gf.b[i] = gf.b[i] * (1 + wobble)
        providers.append(gf.derive_matrix_data(counts))

    cfg = SolverConfig(pad_to=32, chunk_size=50, refactor_period=50)
    results = solve_batch(providers, cfg, certify=True, shared_structure=True)
    assert all(r.status is SolveStatus.FINITE_OPTIMUM for r in results)
    assert all(r.stats.certified for r in results)
    # Small rhs perturbations: objectives must stay near the base optimum.
    for r in results:
        assert abs(r.objective - (-464.75314)) < 25.0
