"""Prescaler tests (reference: presolve/scale/rational/test.rs analog)."""

from fractions import Fraction

import numpy as np

from relp_tpu.data.elements import Objective, RangedConstraintRelation
from relp_tpu.data.scale import (
    equilibrate,
    scale_back_general_form,
    scale_general_form,
)
from relp_tpu.data.scale.rational import exponent_mass
from relp_tpu.config import SolverConfig
from relp_tpu.simplex import SolveStatus, solve_general_form
from tests.test_presolve import make_gf

F = Fraction


# --- the reference's own fixtures, scale/rational/test.rs ---


def test_scale_nothing():
    """All unique primes: any scaling at best keeps things the same
    (reference: test_scale_nothing)."""
    gf = make_gf(
        [[1, 2]],
        [RangedConstraintRelation.equal()],
        [3],
        [19, 17],
        [(5, 7), (11, 13)],
    )
    scaling = scale_general_form(gf)
    assert scaling.cost_factor == 1
    assert scaling.constraint_row_factors == [F(1)]
    assert scaling.constraint_column_factors == [F(1), F(1)]


def test_scale_cost():
    """Duplicate factor 19 in the cost row only -> cost_factor 1/19
    (reference: test_scale_cost)."""
    gf = make_gf(
        [[1, 2]],
        [RangedConstraintRelation.equal()],
        [3],
        [17 * 19, 19],
        [(5, 7), (11, 13)],
    )
    scaling = scale_general_form(gf)
    assert scaling.cost_factor == F(1, 19)
    assert scaling.constraint_row_factors == [F(1)]
    assert scaling.constraint_column_factors == [F(1), F(1)]
    assert [v.cost for v in gf.variables] == [F(17), F(1)]


def test_scale_constraint():
    """Duplicate factor 2 in one constraint row only -> row factor 1/2
    (reference: test_scale_constraint)."""
    gf = make_gf(
        [[2 * 1, 2]],
        [RangedConstraintRelation.equal()],
        [2 * 3],
        [17, 19],
        [(5, 7), (11, 13)],
    )
    scaling = scale_general_form(gf)
    assert scaling.cost_factor == 1
    assert scaling.constraint_row_factors == [F(1, 2)]
    assert scaling.constraint_column_factors == [F(1), F(1)]
    assert gf.constraints.to_dense() == [[F(1), F(1)]]
    assert gf.b == [F(3)]


def test_scale_variable():
    """Duplicate factor 19 throughout one variable's column -> column factor
    (reference: test_scale_variable — which expects 19 from its
    sign-inverting combine_factors; the self-consistent materialization is
    1/19, and applying it actually cancels the factor, which we assert)."""
    gf = make_gf(
        [[1 * 19, 2]],
        [RangedConstraintRelation.equal()],
        [3],
        [17 * 19, 19],
        [(F(5, 19), F(7, 19)), (11, 13)],
    )
    before = exponent_mass(gf)
    scaling = scale_general_form(gf)
    assert scaling.cost_factor == 1
    assert scaling.constraint_row_factors == [F(1)]
    assert scaling.constraint_column_factors == [F(1, 19), F(1)]
    # The applied program has the factor fully cancelled.
    assert gf.constraints.to_dense() == [[F(1), F(2)]]
    assert gf.variables[0].cost == F(17)
    assert gf.variables[0].lower_bound == F(5)
    assert gf.variables[0].upper_bound == F(7)
    assert exponent_mass(gf) < before


def test_scale_variable_bound_vs_constraint():
    """Factors in the bounds outweigh a single coefficient: don't scale
    (reference: test_scale_variable_bound_vs_constraint)."""
    gf = make_gf(
        [[1 * 19, 2]],
        [RangedConstraintRelation.equal()],
        [3],
        [17, 19],
        [(5, 7), (11, 13)],
    )
    scaling = scale_general_form(gf)
    assert scaling.cost_factor == 1
    assert scaling.constraint_row_factors == [F(1)]
    assert scaling.constraint_column_factors == [F(1), F(1)]


def test_scale_reference_full():
    """The reference's main fixture (test_scale): row factors
    [1, 1/2, 1/7, 1/11], trivial column/cost factors, and the exact scaled
    program."""
    gf = make_gf(
        [[11, 2], [4, 6], [7, 14], [0, 11]],
        [
            RangedConstraintRelation.equal(),
            RangedConstraintRelation.less(),
            RangedConstraintRelation.greater(),
            RangedConstraintRelation.equal(),
        ],
        [3, 0, 21, 11],
        [4, 11],
        [(0, 6), (1, 2)],
    )
    import copy

    original = copy.deepcopy(gf)
    scaling = scale_general_form(gf)
    assert scaling.cost_factor == 1
    assert scaling.constraint_row_factors == [F(1), F(1, 2), F(1, 7), F(1, 11)]
    assert scaling.constraint_column_factors == [F(1), F(1)]
    assert gf.constraints.to_dense() == [
        [F(11), F(2)],
        [F(2), F(3)],
        [F(1), F(2)],
        [F(0), F(1)],
    ]
    assert gf.b == [F(3), F(0), F(3), F(1)]
    assert [v.cost for v in gf.variables] == [F(4), F(11)]

    scale_back_general_form(gf, scaling)
    assert gf.constraints.to_dense() == original.constraints.to_dense()
    assert gf.b == original.b
    assert [v.cost for v in gf.variables] == [
        v.cost for v in original.variables
    ]


def test_solve_single_reference():
    """Pin the greedy per-factor changes on the reference's
    test_solve_single_without_b fixture (same queues, same tie-breaks)."""
    from relp_tpu.data.scale.rational import (
        _Factorization,
        _solve_single,
    )

    fact = _Factorization(
        primes=[2, 3, 7, 11],
        b=[None, None, None, None],
        c=[{11: 1}, {2: 2}],
        bounds=[(None, None), (None, None)],
        constraints=[
            [(0, {}), (1, {2: 2}), (2, {7: 1})],
            [(0, {2: 1}), (1, {2: 1, 3: 1}), (2, {2: 1, 7: 1}), (3, {11: 1})],
        ],
    )
    by_row = [[] for _ in range(4)]
    for j, col in enumerate(fact.constraints):
        for i, f in col:
            by_row[i].append((j, f))

    expected = {
        11: (0, [0, 0, 0, -1], [0, 0]),
        7: (0, [0, 0, -1, 0], [0, 0]),
        3: (0, [0, 0, 0, 0], [0, 0]),
        2: (0, [0, -1, 0, 1], [0, -1]),
    }
    for prime, exp in expected.items():
        assert _solve_single(fact, prime, by_row) == exp, prime


def test_scale_range():
    """Ranges scale with their row (reference: test_range/test_big)."""
    gf = make_gf(
        [[7, -7], [1, 1]],
        [
            RangedConstraintRelation.ranged(F(2 * 7)),
            RangedConstraintRelation.less(),
        ],
        [7, 1],
        [2, 1],
        [(0, F(1, 2)), (F(1, 2), 1)],
    )
    import copy

    original = copy.deepcopy(gf)
    scaling = scale_general_form(gf)
    assert scaling.constraint_row_factors == [F(1, 7), F(1)]
    assert scaling.constraint_column_factors == [F(1), F(1)]
    assert gf.constraints.to_dense() == [[F(1), F(-1)], [F(1), F(1)]]
    assert gf.b == [F(1), F(1)]
    assert gf.constraint_types[0].range == F(2)

    scale_back_general_form(gf, scaling)
    assert gf.b == original.b
    assert gf.constraint_types[0].range == F(2 * 7)


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
