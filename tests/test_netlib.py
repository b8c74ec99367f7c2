"""Netlib integration gates.

Mirror of the reference's ``tests/netlib`` harness (mod.rs:46-70 + test.rs):
parse_fixed -> GeneralForm -> presolve -> standardize -> MatrixData -> solve
-> reconstruct, asserting |objective - expected| < tol with the expected
values the reference sources from Gurobi / CLP / GLPK / Koch.

Problem files are read from the read-only reference mount.
"""

import pytest

from tests.conftest import reference_problem
from relp_tpu.config import SolverConfig
from relp_tpu.io import mps_to_general_form, parse_fixed
from relp_tpu.simplex import SolveStatus, solve_general_form


def solve_netlib(name: str, **cfg_overrides):
    path = reference_problem("netlib", name)
    with open(path) as f:
        mps = parse_fixed(f.read())
    gf = mps_to_general_form(mps)
    defaults = dict(pad_to=64, chunk_size=100, refactor_period=100)
    defaults.update(cfg_overrides)
    cfg = SolverConfig(**defaults)
    return solve_general_form(gf, cfg)


def check_netlib(name: str, expected: float, tol: float, **cfg_overrides):
    result, solution = solve_netlib(name, **cfg_overrides)
    assert result.status is SolveStatus.FINITE_OPTIMUM, result.status
    assert solution is not None
    value = float(solution.objective_value)
    assert abs(value - expected) < tol, (
        f"{name}: got {value}, expected {expected} (certified: "
        f"{result.stats.certified}, iters {result.stats.iterations})"
    )
    return result


# Expected objectives as in reference tests/netlib/test.rs.
def test_afiro():
    result = check_netlib("AFIRO.SIF", -4.6475314286e02, 1e-4)
    assert result.stats.certified


def test_adlittle():
    check_netlib("ADLITTLE.SIF", 2.2549496316e05, 1e-3)


def test_sc50a():
    check_netlib("SC50A.SIF", -6.4575077059e01, 1e-5)


def test_sc50b():
    check_netlib("SC50B.SIF", -7.0000000000e01, 1e-5)


def test_blend():
    check_netlib("BLEND.SIF", -3.0812149846e01, 1e-5)


def test_share2b():
    check_netlib("SHARE2B.SIF", -4.1573224074e02, 1e-3)


def test_sc105():
    check_netlib("SC105.SIF", -5.2202061212e01, 1e-5)


def test_stocfor1():
    check_netlib("STOCFOR1.SIF", -4.1131976219e04, 1e-3)
