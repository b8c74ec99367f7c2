"""Sparse host backend tests — the CPU fallback for huge sparse LPs
(relp_tpu/simplex/host_sparse.py; reference execution-model analog:
LUDecomposition + eta files, lower_upper/mod.rs)."""

from fractions import Fraction

import numpy as np
import pytest

from tests.conftest import reference_problem
from relp_tpu.config import SolverConfig
from relp_tpu.io import mps_to_general_form, parse_fixed
from relp_tpu.simplex import SolveStatus, solve_general_form, solve_relaxation

F = Fraction


def _netlib_gf(name):
    path = reference_problem("netlib", name)
    with open(path) as f:
        mps = parse_fixed(f.read())
    return mps_to_general_form(mps)


@pytest.mark.parametrize("name,expected,tol", [
    ("AFIRO.SIF", -464.75314, 1e-4),
    ("SCAGR7.SIF", -2.331389824e06, 1e-3),
    ("SCORPION.SIF", 1878.1248227381066, 1e-6),  # exercises rank repair
    ("BRANDY.SIF", 1518.5098964881284, 1e-5),
])
def test_host_sparse_netlib(name, expected, tol):
    gf = _netlib_gf(name)
    cfg = SolverConfig(backend="host_sparse", pad_to=64)
    result, solution = solve_general_form(gf, cfg)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    assert result.stats.certified
    assert abs(float(solution.objective_value) - expected) < tol


def test_host_sparse_matches_device_backend():
    """Host-sparse and device backends certify the same exact objective."""
    gf_a = _netlib_gf("SC105.SIF")
    gf_b = _netlib_gf("SC105.SIF")
    host, _ = solve_general_form(
        gf_a, SolverConfig(backend="host_sparse", pad_to=64)
    )
    dev, _ = solve_general_form(
        gf_b, SolverConfig(backend="device", pad_to=64)
    )
    assert host.stats.certified and dev.stats.certified
    assert host.exact_objective == dev.exact_objective


def test_host_sparse_infeasible_certified():
    """Infeasible LP: Farkas certificate from the phase-1 basis."""
    from relp_tpu.data.elements import (
        Objective,
        RangedConstraintRelation,
        VariableType,
    )
    from relp_tpu.data.general_form import GeneralForm, Variable
    from relp_tpu.linalg.sparse import SparseColumnMatrix

    gf = GeneralForm(
        objective=Objective.MINIMIZE,
        constraints=SparseColumnMatrix.from_dense(
            [[F(1), F(1)], [F(1), F(1)]]
        ),
        constraint_types=[
            RangedConstraintRelation.equal(),
            RangedConstraintRelation.equal(),
        ],
        b=[F(1), F(3)],  # x+y = 1 and x+y = 3: infeasible
        variables=[
            Variable(VariableType.CONTINUOUS, F(1), F(0), None)
            for _ in range(2)
        ],
        variable_names=["x", "y"],
    )
    counts = gf.standardize()
    data = gf.derive_matrix_data(counts)
    result = solve_relaxation(data, SolverConfig(backend="host_sparse"))
    assert result.status is SolveStatus.INFEASIBLE
    assert result.stats.certified


def test_host_sparse_warm_start():
    gf = _netlib_gf("SC50A.SIF")
    gf.presolve()
    counts = gf.standardize()
    data = gf.derive_matrix_data(counts)
    cfg = SolverConfig(backend="host_sparse")
    cold = solve_relaxation(data, cfg)
    assert cold.status is SolveStatus.FINITE_OPTIMUM
    warm = solve_relaxation(data, cfg, warm_start_basis=cold.basis)
    assert warm.status is SolveStatus.FINITE_OPTIMUM
    assert warm.exact_objective == cold.exact_objective
    assert warm.stats.phase1_iterations == 0
    assert warm.stats.iterations <= 2  # already optimal


def test_auto_routing_heuristic():
    """auto routes huge+sparse to host_sparse on CPU, small stays on device."""
    from relp_tpu.simplex.host_sparse import should_use_host_sparse

    cfg = SolverConfig()
    small = _netlib_gf("AFIRO.SIF")
    counts = small.standardize()
    small_md = small.derive_matrix_data(counts)
    assert not should_use_host_sparse(small_md, cfg)

    big = _netlib_gf("80BAU3B.SIF")
    big.presolve()
    counts = big.standardize()
    big_md = big.derive_matrix_data(counts)
    assert should_use_host_sparse(big_md, cfg)


def test_host_sparse_bigm_matches_two_phase():
    """phase1='bigm' (single composite walk; the QAP degenerate-plateau
    escape) lands on the same exactly-certified objective as the classic
    two-phase path, including on a rank-repair problem (SCORPION)."""
    for name in ("AFIRO.SIF", "SCORPION.SIF"):
        gf_a, gf_b = _netlib_gf(name), _netlib_gf(name)
        classic, _ = solve_general_form(
            gf_a, SolverConfig(backend="host_sparse", pad_to=64)
        )
        bigm, _ = solve_general_form(
            gf_b,
            SolverConfig(backend="host_sparse", pad_to=64, phase1="bigm"),
        )
        assert bigm.stats.certified, name
        assert bigm.exact_objective == classic.exact_objective, name


def test_host_sparse_bigm_infeasible_falls_back_to_farkas():
    """An infeasible LP under phase1='bigm' keeps artificials positive in
    the composite optimum; the fallback classic phase 1 must still produce
    the exactly-certified INFEASIBLE verdict."""
    from relp_tpu.data.elements import (
        Objective,
        RangedConstraintRelation,
        VariableType,
    )
    from relp_tpu.data.general_form import GeneralForm, Variable
    from relp_tpu.linalg.sparse import SparseColumnMatrix

    gf = GeneralForm(
        objective=Objective.MINIMIZE,
        constraints=SparseColumnMatrix.from_dense(
            [[F(1), F(1)], [F(1), F(1)]]
        ),
        constraint_types=[
            RangedConstraintRelation.equal(),
            RangedConstraintRelation.equal(),
        ],
        b=[F(1), F(3)],
        variables=[
            Variable(VariableType.CONTINUOUS, F(1), F(0), None)
            for _ in range(2)
        ],
        variable_names=["x", "y"],
    )
    counts = gf.standardize()
    data = gf.derive_matrix_data(counts)
    result = solve_relaxation(
        data, SolverConfig(backend="host_sparse", phase1="bigm")
    )
    assert result.status is SolveStatus.INFEASIBLE
    assert result.stats.certified
