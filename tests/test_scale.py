"""Prescaler tests (reference: presolve/scale/rational/test.rs analog)."""

from fractions import Fraction

import numpy as np

from relp_tpu.data.elements import Objective, RangedConstraintRelation
from relp_tpu.data.scale import (
    equilibrate,
    scale_back_general_form,
    scale_general_form,
)
from relp_tpu.config import SolverConfig
from relp_tpu.simplex import SolveStatus, solve_general_form
from tests.test_presolve import make_gf

F = Fraction


def _copy_state(gf):
    return (
        [list(col) for col in gf.constraints.columns],
        list(gf.b),
        [(v.cost, v.lower_bound, v.upper_bound) for v in gf.variables],
        [
            (ct.kind, ct.range)
            for ct in gf.constraint_types
        ],
    )


def test_scale_roundtrip():
    gf = make_gf(
        [[4, 8], [2, F(1, 2)]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.ranged(F(6))],
        [16, 8],
        [12, 3],
        [(0, 4), (0, None)],
    )
    before = _copy_state(gf)
    scaling = scale_general_form(gf)
    after_scale = _copy_state(gf)
    assert after_scale != before  # something actually scaled
    scale_back_general_form(gf, scaling)
    assert _copy_state(gf) == before


def test_scale_reduces_prime_mass():
    # All coefficients share powers of 2; the scaler should strip them.
    gf = make_gf(
        [[4, 8], [16, 32]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.less()],
        [8, 64],
        [2, 4],
        [(0, None), (0, None)],
    )

    def prime_mass(gf, p=2):
        from relp_tpu.numbers.factorize import factorize_fraction

        total = 0
        for col in gf.constraints.columns:
            for _, v in col:
                total += abs(factorize_fraction(v).get(p, 0))
        return total

    before = prime_mass(gf)
    scale_general_form(gf)
    assert prime_mass(gf) < before


def test_scaled_solution_maps_back():
    """Solving the scaled problem + scale_back_solution == original solution."""
    gf = make_gf(
        [[4, 8], [12, 2]],
        [RangedConstraintRelation.less(), RangedConstraintRelation.less()],
        [16, 24],
        [-4, -4],
        [(0, None), (0, None)],
    )
    cfg = SolverConfig(pad_to=8, presolve=False)

    import copy

    gf_plain = copy.deepcopy(gf)
    result_plain, solution_plain = solve_general_form(gf_plain, cfg)
    assert result_plain.status is SolveStatus.FINITE_OPTIMUM

    scaling = scale_general_form(gf)
    counts = gf.standardize()
    data = gf.derive_matrix_data(counts)
    from relp_tpu.simplex import solve_relaxation

    result = solve_relaxation(data, cfg)
    reduced = data.reconstruct_solution(result.bfs)
    scaling.scale_back_solution(reduced)
    # Same objective once unscaled: c_orig . x_orig (costs were scaled by
    # col factor, values unscale with it, objective value must agree).
    x = reduced.to_dense()
    objective = sum(
        F(c) * x[j] for j, c in enumerate((-4, -4))
    )
    assert objective == solution_plain.objective_value


def test_equilibrate_pow2_and_shapes():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((16, 24)) * np.exp2(
        rng.integers(-8, 8, size=(16, 24))
    )
    A[rng.random((16, 24)) < 0.5] = 0.0
    row_scale, col_scale = equilibrate(A)
    # Factors are exact powers of two (never perturb mantissas).
    for v in np.concatenate([row_scale, col_scale]):
        assert v == 2.0 ** round(np.log2(v))
    scaled = row_scale[:, None] * A * col_scale[None, :]
    nz = scaled != 0
    # Nonzero magnitudes end up near 1 on a log scale.
    logs = np.abs(np.log2(np.abs(scaled[nz])))
    assert logs.mean() < np.abs(np.log2(np.abs(A[nz]))).mean()
