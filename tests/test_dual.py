"""Dual-simplex warm restarts after rhs changes.

Beyond reference scope: the reference's warm start (``IM::from_basis``,
carry/mod.rs:444-478) requires the supplied basis to be primal feasible; a
changed rhs forces a cold phase-1 start there.  Here a dual-feasible warm
basis (the previous optimum re-solved with a new b — the scenario-resolve
case) is restored to primal feasibility with dual pivots
(``kernels.make_dual_iteration``), skipping phase 1 entirely.
"""

import copy
from fractions import Fraction

import pytest

from relp_tpu.config import SolverConfig
from relp_tpu.data.elements import Objective, RangedConstraintRelation
from relp_tpu.data.general_form import GeneralForm, Variable, VariableType
from relp_tpu.linalg.sparse import SparseColumnMatrix
from relp_tpu.simplex import SolveStatus
from relp_tpu.simplex.driver import solve_relaxation


def _provider(b):
    """min -x - y  s.t.  x + 2y <= b0,  3x + y <= b1,  x, y >= 0."""
    gf = GeneralForm(
        objective=Objective.MINIMIZE,
        constraints=SparseColumnMatrix.from_dense(
            [[Fraction(1), Fraction(2)], [Fraction(3), Fraction(1)]]
        ),
        constraint_types=[
            RangedConstraintRelation.less(),
            RangedConstraintRelation.less(),
        ],
        b=[Fraction(v) for v in b],
        variables=[
            Variable(
                variable_type=VariableType.CONTINUOUS,
                cost=Fraction(-1),
                lower_bound=Fraction(0),
                upper_bound=None,
            )
            for _ in range(2)
        ],
        variable_names=["x", "y"],
    )
    counts = gf.standardize()
    return gf.derive_matrix_data(counts)


def _cfg(**overrides):
    defaults = dict(pad_to=8, chunk_size=50, refactor_period=50)
    defaults.update(overrides)
    return SolverConfig(**defaults)


def test_dual_restart_after_rhs_change():
    # Cold-solve the base problem: optimum (8/5, 6/5), both rows tight.
    base = solve_relaxation(_provider([4, 6]), _cfg())
    assert base.status is SolveStatus.FINITE_OPTIMUM
    assert base.exact_objective == Fraction(-14, 5)

    # Tighten row 1 to b1 = 1: the old basis {x, y} now prices x at -2/5 —
    # primal infeasible but still dual feasible.  New optimum (0, 1).
    warm = solve_relaxation(
        _provider([4, 1]), _cfg(), warm_start_basis=base.basis
    )
    assert warm.status is SolveStatus.FINITE_OPTIMUM
    assert warm.exact_objective == Fraction(-1)
    assert warm.stats.certified
    assert warm.stats.dual_iterations >= 1
    assert warm.stats.phase1_iterations == 0

    # Cross-check against the cold solve of the perturbed problem.
    cold = solve_relaxation(_provider([4, 1]), _cfg())
    assert cold.exact_objective == warm.exact_objective


def test_warm_basis_still_feasible_skips_dual():
    base = solve_relaxation(_provider([4, 6]), _cfg())
    # b = (4, 3): the old basis stays primal feasible (x, y = 0.4, 1.8);
    # the plain warm start applies, no dual pivots.
    warm = solve_relaxation(
        _provider([4, 3]), _cfg(), warm_start_basis=base.basis
    )
    assert warm.status is SolveStatus.FINITE_OPTIMUM
    assert warm.stats.dual_iterations == 0
    assert warm.stats.phase1_iterations == 0
    assert warm.exact_objective == Fraction(-11, 5)


def _interval_provider(lo):
    """min x  s.t.  x <= 2,  x >= lo — infeasible once lo > 2."""
    gf = GeneralForm(
        objective=Objective.MINIMIZE,
        constraints=SparseColumnMatrix.from_dense(
            [[Fraction(1)], [Fraction(1)]]
        ),
        constraint_types=[
            RangedConstraintRelation.less(),
            RangedConstraintRelation.greater(),
        ],
        b=[Fraction(2), Fraction(lo)],
        variables=[
            Variable(
                variable_type=VariableType.CONTINUOUS,
                cost=Fraction(1),
                lower_bound=Fraction(0),
                upper_bound=None,
            )
        ],
        variable_names=["x"],
    )
    counts = gf.standardize()
    return gf.derive_matrix_data(counts)


def test_dual_detects_infeasible_and_falls_back():
    base = solve_relaxation(_interval_provider(1), _cfg())
    assert base.status is SolveStatus.FINITE_OPTIMUM
    assert base.exact_objective == Fraction(1)

    # lo = 3 contradicts x <= 2: the dual ray is unbounded, and the driver
    # falls back to the cold path so the INFEASIBLE verdict carries the
    # exact Farkas certificate.
    warm = solve_relaxation(
        _interval_provider(3), _cfg(), warm_start_basis=base.basis
    )
    assert warm.status is SolveStatus.INFEASIBLE
    assert warm.stats.certified


def test_dual_restart_disabled_by_config():
    base = solve_relaxation(_provider([4, 6]), _cfg())
    warm = solve_relaxation(
        _provider([4, 1]),
        _cfg(dual_restart=False),
        warm_start_basis=base.basis,
    )
    # Same verdict through the cold path, no dual pivots.
    assert warm.status is SolveStatus.FINITE_OPTIMUM
    assert warm.exact_objective == Fraction(-1)
    assert warm.stats.dual_iterations == 0


def test_batched_dual_warm_restart():
    """A perturbed-rhs scenario family warm-started from the base optimum:
    every scenario skips both phases; verdicts/objectives match cold
    single-LP solves."""
    from relp_tpu.parallel.batch_driver import solve_batch

    base = solve_relaxation(_provider([4, 6]), _cfg())
    scenarios = [[4, 1], [4, 3], [4, 6], [5, 7]]
    providers = [_provider(b) for b in scenarios]
    results = solve_batch(
        providers,
        _cfg(),
        certify=True,
        shared_structure=True,
        warm_start_basis=base.basis,
    )
    for r, b in zip(results, scenarios):
        cold = solve_relaxation(_provider(b), _cfg())
        assert r.status is SolveStatus.FINITE_OPTIMUM
        assert r.exact_objective == cold.exact_objective
        assert r.stats.phase1_iterations == 0
    # The tightened scenario needed at least one dual pivot.
    assert results[0].stats.dual_iterations >= 1


def test_batched_dual_infeasible_scenario_falls_back():
    from relp_tpu.parallel.batch_driver import solve_batch

    base = solve_relaxation(_interval_provider(1), _cfg())
    providers = [_interval_provider(lo) for lo in ["1/2", "9/5", 3]]
    results = solve_batch(
        providers,
        _cfg(),
        certify=True,
        shared_structure=True,
        warm_start_basis=base.basis,
    )
    assert results[0].status is SolveStatus.FINITE_OPTIMUM
    assert results[0].exact_objective == Fraction(1, 2)
    assert results[1].status is SolveStatus.FINITE_OPTIMUM
    assert results[1].exact_objective == Fraction(9, 5)
    # lo=3 contradicts x <= 2: the dual ray routes it to the single-LP
    # fallback, which proves infeasibility with the exact Farkas certificate.
    assert results[2].status is SolveStatus.INFEASIBLE
    assert results[2].stats.certified
    assert results[2].stats.batch_fallback


def test_dual_restart_netlib_scale():
    """AFIRO re-solved from its own optimal basis after a 1% rhs wobble:
    no phase 1, certified optimum equal to the cold solve's."""
    from tests.conftest import reference_problem
    from relp_tpu.io import mps_to_general_form, parse_fixed

    path = reference_problem("netlib", "AFIRO.SIF")
    with open(path) as f:
        gf = mps_to_general_form(parse_fixed(f.read()))
    gf.presolve()
    counts = gf.standardize()
    base_provider = gf.derive_matrix_data(counts)

    perturbed = copy.deepcopy(gf)
    for i in range(len(perturbed.b)):
        wobble = Fraction((i * 104729) % 2001 - 1000, 100_000)
        perturbed.b[i] = perturbed.b[i] * (1 + wobble)
    pert_provider = perturbed.derive_matrix_data(counts)

    cfg = _cfg(pad_to=64, chunk_size=100, refactor_period=100)
    base = solve_relaxation(base_provider, cfg)
    assert base.status is SolveStatus.FINITE_OPTIMUM

    warm = solve_relaxation(pert_provider, cfg, warm_start_basis=base.basis)
    cold = solve_relaxation(pert_provider, cfg)
    assert warm.status is SolveStatus.FINITE_OPTIMUM
    assert cold.status is SolveStatus.FINITE_OPTIMUM
    assert warm.stats.certified and cold.stats.certified
    assert warm.exact_objective == cold.exact_objective
    assert warm.stats.phase1_iterations == 0


def test_batched_warm_restart_engages_beyond_toy_scale():
    """ADLITTLE scenarios warm-started from the base optimum: the dual
    restart must ENGAGE (regression: the engagement gate recomputed reduced
    costs from the refactored f32 state, whose ~eps_f32*|pi| noise read as
    dual infeasibility at opt_tol and silently disengaged every
    netlib-scale warm restart) and beat the cold pivot count."""
    from tests.conftest import reference_problem
    from relp_tpu.io import mps_to_general_form, parse_fixed
    from relp_tpu.parallel.batch_driver import solve_batch

    path = reference_problem("netlib", "ADLITTLE.SIF")
    with open(path) as f:
        gf = mps_to_general_form(parse_fixed(f.read()))
    gf.presolve()
    counts = gf.standardize()
    cfg = _cfg(pad_to=128, chunk_size=150, refactor_period=150)
    base = solve_relaxation(gf.derive_matrix_data(counts), cfg)
    assert base.status is SolveStatus.FINITE_OPTIMUM

    providers = []
    for s in range(4):
        pert = copy.deepcopy(gf)
        for i in range(len(pert.b)):
            wobble = Fraction((s * 7919 + i * 104729) % 2001 - 1000, 100_000)
            pert.b[i] = pert.b[i] * (1 + wobble)
        providers.append(pert.derive_matrix_data(counts))

    warm = solve_batch(
        providers, cfg, certify=False, shared_structure=True,
        warm_start_basis=base.basis,
    )
    cold = solve_batch(providers, cfg, certify=False, shared_structure=True)
    assert all(r.status is SolveStatus.FINITE_OPTIMUM for r in warm)
    for w, c in zip(warm, cold):
        assert w.status is c.status
        assert abs(w.objective - c.objective) <= 1e-4 * (1 + abs(c.objective))
        assert w.stats.phase1_iterations == 0
    warm_pivots = sum(r.stats.iterations for r in warm)
    cold_pivots = sum(r.stats.iterations for r in cold)
    assert warm_pivots < cold_pivots / 2, (warm_pivots, cold_pivots)
