"""Checkpoint / warm-start tests."""

import os
import tempfile
from fractions import Fraction

from relp_tpu.simplex import SolveStatus, solve_relaxation
from relp_tpu.utils.checkpoint import load_basis, save_basis
from tests.test_parallel import _provider


def test_save_load_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "basis.json")
    save_basis(path, [3, 1, 4, 1, 5], {"problem": "demo"})
    assert load_basis(path) == [3, 1, 4, 1, 5]


def test_warm_start_skips_phase1(cpu_config):
    md, _ = _provider(6)
    cold = solve_relaxation(md, cpu_config)
    assert cold.status is SolveStatus.FINITE_OPTIMUM

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck.json")
        save_basis(path, cold.basis)
        warm = solve_relaxation(
            md, cpu_config, warm_start_basis=load_basis(path)
        )
    assert warm.status is SolveStatus.FINITE_OPTIMUM
    assert warm.exact_objective == cold.exact_objective
    # Resuming from the optimal basis takes no pivots.
    assert warm.stats.iterations == 0
    assert warm.stats.phase1_iterations == 0


def test_warm_start_infeasible_basis_falls_back(cpu_config):
    md, _ = _provider(6)
    # A nonsense basis (duplicate columns are singular) must fall back to a
    # cold start and still solve correctly.
    bad = [0, 0]
    result = solve_relaxation(md, cpu_config, warm_start_basis=bad)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert result.exact_objective == -Fraction(14, 5)
