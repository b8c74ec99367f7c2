"""Differential fuzzing of the full pipeline against an independent solver.

Random small LPs — every relation kind (<=, >=, =, ranged), every bound
shape (free, lower, upper, boxed, fixed), both objective senses — are run
through the complete relp_tpu pipeline (presolve -> standardize -> device
simplex -> exact certification -> reconstruction) and cross-checked against
scipy's HiGHS ``linprog`` built independently from the same raw data.

This generalizes the reference's fixed pipeline fixtures
(reference: src/tests/problem_1.rs, src/tests/problem_2.rs) into a
property: for *any* well-posed instance the certified exact verdict and
objective must agree with an unrelated implementation.
"""

from fractions import Fraction

import numpy as np
import pytest

from relp_tpu.config import SolverConfig
from relp_tpu.data.elements import Objective, RangedConstraintRelation
from relp_tpu.data.general_form import GeneralForm, Variable, VariableType
from relp_tpu.linalg.sparse import SparseColumnMatrix
from relp_tpu.simplex import SolveStatus, solve_general_form

scipy_opt = pytest.importorskip("scipy.optimize")


def _random_instance(rng):
    """A random GeneralForm plus the raw data needed to rebuild it for scipy."""
    m = int(rng.integers(1, 6))
    n = int(rng.integers(1, 6))
    # Small integers keep the exact pipeline cheap and HiGHS exact-ish.
    A = rng.integers(-4, 5, size=(m, n))
    # Avoid all-zero rows: they only exercise the presolve empty-row rule,
    # which has its own tests, and scipy treats 0 <= b rows inconsistently.
    for i in range(m):
        if not A[i].any():
            A[i, int(rng.integers(0, n))] = int(rng.integers(1, 5))
    b = rng.integers(-6, 7, size=m)
    c = rng.integers(-5, 6, size=n)

    types = []
    for _ in range(m):
        k = int(rng.integers(0, 4))
        if k == 0:
            types.append(RangedConstraintRelation.less())
        elif k == 1:
            types.append(RangedConstraintRelation.greater())
        elif k == 2:
            types.append(RangedConstraintRelation.equal())
        else:
            types.append(RangedConstraintRelation.ranged(Fraction(int(rng.integers(1, 5)))))

    bounds = []
    for _ in range(n):
        k = int(rng.integers(0, 5))
        if k == 0:
            bounds.append((None, None))  # free
        elif k == 1:
            bounds.append((int(rng.integers(-3, 1)), None))
        elif k == 2:
            bounds.append((None, int(rng.integers(3, 7))))
        elif k == 3:
            lo = int(rng.integers(-2, 2))
            bounds.append((lo, lo + int(rng.integers(1, 6))))
        else:
            v = int(rng.integers(-2, 3))
            bounds.append((v, v))  # fixed

    sense = Objective.MINIMIZE if rng.integers(0, 2) == 0 else Objective.MAXIMIZE

    gf = GeneralForm(
        objective=sense,
        constraints=SparseColumnMatrix.from_dense(
            [[Fraction(int(v)) for v in row] for row in A]
        ),
        constraint_types=list(types),
        b=[Fraction(int(v)) for v in b],
        variables=[
            Variable(
                variable_type=VariableType.CONTINUOUS,
                cost=Fraction(int(cj)),
                lower_bound=None if lo is None else Fraction(lo),
                upper_bound=None if hi is None else Fraction(hi),
            )
            for cj, (lo, hi) in zip(c, bounds)
        ],
        variable_names=[f"x{j}" for j in range(n)],
    )
    return gf, (A, b, c, types, bounds, sense)


def _solve_with_highs(raw):
    """Independent ground truth: rebuild the instance for scipy.linprog."""
    A, b, c, types, bounds, sense = raw
    a_ub, b_ub, a_eq, b_eq = [], [], [], []
    for row, bi, rel in zip(A, b, types):
        row = row.astype(float)
        if rel.kind.name == "LESS":
            a_ub.append(row), b_ub.append(float(bi))
        elif rel.kind.name == "GREATER":
            a_ub.append(-row), b_ub.append(-float(bi))
        elif rel.kind.name == "EQUAL":
            a_eq.append(row), b_eq.append(float(bi))
        else:  # RANGE r: b - r <= <a, x> <= b  (elements.py:36)
            a_ub.append(row), b_ub.append(float(bi))
            a_ub.append(-row), b_ub.append(-(float(bi) - float(rel.range)))
    obj = c.astype(float)
    if sense is Objective.MAXIMIZE:
        obj = -obj
    res = scipy_opt.linprog(
        obj,
        A_ub=np.array(a_ub) if a_ub else None,
        b_ub=np.array(b_ub) if b_ub else None,
        A_eq=np.array(a_eq) if a_eq else None,
        b_eq=np.array(b_eq) if b_eq else None,
        bounds=bounds,
        method="highs",
        # HiGHS presolve collapses "infeasible or unbounded" to infeasible
        # on some unbounded instances (seen at seed 23); presolve off makes
        # the status trustworthy as ground truth.
        options={"presolve": False},
    )
    if res.status == 0:
        fun = -res.fun if sense is Objective.MAXIMIZE else res.fun
        return "optimal", fun
    if res.status == 2:
        return "infeasible", None
    if res.status == 3:
        return "unbounded", None
    return "other", None


def _random_mip(rng):
    """A random mixed-integer instance: boxed integer variables plus the
    usual continuous variety. Returns (gf, raw, integer_indices)."""
    gf, raw = _random_instance(rng)
    A, b, c, types, bounds, sense = raw
    n = len(c)
    n_int = int(rng.integers(1, n + 1))
    int_idx = sorted(rng.choice(n, size=n_int, replace=False).tolist())
    new_bounds = list(bounds)
    for j in int_idx:
        lo = int(rng.integers(-2, 2))
        hi = lo + int(rng.integers(0, 5))
        new_bounds[j] = (lo, hi)
        gf.variables[j].variable_type = VariableType.INTEGER
        gf.variables[j].lower_bound = Fraction(lo)
        gf.variables[j].upper_bound = Fraction(hi)
    raw = (A, b, c, types, new_bounds, sense)
    return gf, raw, int_idx


def _solve_mip_with_highs(raw):
    """Independent MIP ground truth via scipy.optimize.milp (HiGHS B&B).

    Returns the *minimize-form* optimum — the same reporting convention as
    ``MipResult.objective`` — so values compare directly for both senses.
    """
    A, b, c, types, bounds, sense, integrality = raw
    lb, ub = [], []
    for bi, rel in zip(b, types):
        if rel.kind.name == "LESS":
            lb.append(-np.inf), ub.append(float(bi))
        elif rel.kind.name == "GREATER":
            lb.append(float(bi)), ub.append(np.inf)
        elif rel.kind.name == "EQUAL":
            lb.append(float(bi)), ub.append(float(bi))
        else:  # RANGE r: b - r <= <a, x> <= b
            lb.append(float(bi) - float(rel.range)), ub.append(float(bi))
    obj = c.astype(float)
    if sense is Objective.MAXIMIZE:
        obj = -obj
    var_lb = np.array([-np.inf if lo is None else float(lo) for lo, _ in bounds])
    var_ub = np.array([np.inf if hi is None else float(hi) for _, hi in bounds])
    res = scipy_opt.milp(
        obj,
        constraints=scipy_opt.LinearConstraint(A.astype(float), lb, ub),
        integrality=integrality,
        bounds=scipy_opt.Bounds(var_lb, var_ub),
    )
    if res.status == 0:
        return "optimal", res.fun
    if res.status == 2:
        return "infeasible", None
    if res.status == 3:
        return "unbounded", None
    return "other", None


def _enumerate_mip_oracle(raw, int_idx):
    """Rigorous fallback oracle: enumerate every integer assignment (the
    generator gives integer variables small finite boxes) and solve the
    continuous LP for each with HiGHS ``linprog``.

    Used when ``milp``'s verdict is ambiguous (status 4, "infeasible or
    unbounded") or its objective disagrees with the exact solver beyond the
    tight tolerance — HiGHS B&B admits 1e-6 integer infeasibility, which can
    report an objective slightly *better* than the true exact optimum.
    Returns the minimize-form optimum like ``_solve_mip_with_highs``.
    """
    import itertools

    A, b, c, types, bounds, sense = raw
    a_ub, b_ub, a_eq, b_eq = [], [], [], []
    for row, bi, rel in zip(A, b, types):
        row = row.astype(float)
        if rel.kind.name == "LESS":
            a_ub.append(row), b_ub.append(float(bi))
        elif rel.kind.name == "GREATER":
            a_ub.append(-row), b_ub.append(-float(bi))
        elif rel.kind.name == "EQUAL":
            a_eq.append(row), b_eq.append(float(bi))
        else:
            a_ub.append(row), b_ub.append(float(bi))
            a_ub.append(-row), b_ub.append(-(float(bi) - float(rel.range)))
    obj = c.astype(float)
    if sense is Objective.MAXIMIZE:
        obj = -obj
    ranges = []
    for j in int_idx:
        lo, hi = bounds[j]
        assert lo is not None and hi is not None, "integer vars must be boxed"
        ranges.append(range(int(lo), int(hi) + 1))
    best = None
    saw_unbounded = False
    for assignment in itertools.product(*ranges):
        fixed = list(bounds)
        for j, v in zip(int_idx, assignment):
            fixed[j] = (v, v)
        res = scipy_opt.linprog(
            obj,
            A_ub=np.array(a_ub) if a_ub else None,
            b_ub=np.array(b_ub) if b_ub else None,
            A_eq=np.array(a_eq) if a_eq else None,
            b_eq=np.array(b_eq) if b_eq else None,
            bounds=fixed,
            method="highs",
            options={"presolve": False},
        )
        if res.status == 0:
            best = res.fun if best is None else min(best, res.fun)
        elif res.status == 3:
            saw_unbounded = True
        elif res.status != 2:
            return "other", None
    if saw_unbounded:
        return "unbounded", None
    if best is None:
        return "infeasible", None
    return "optimal", best


@pytest.mark.parametrize("seed", range(40, 70))
def test_random_mip_matches_highs(seed):
    """The exact branch & bound (beyond reference scope) against HiGHS B&B."""
    from relp_tpu.mip import solve_mip

    rng = np.random.default_rng(seed)
    gf, raw, int_idx = _random_mip(rng)
    n = len(raw[2])
    integrality = np.zeros(n)
    integrality[int_idx] = 1
    truth, obj = _solve_mip_with_highs(raw + (integrality,))
    if truth == "other":
        # milp collapsed "infeasible or unbounded" (or errored); resolve it
        # rigorously by enumerating the (small, boxed) integer lattice.
        truth, obj = _enumerate_mip_oracle(raw, int_idx)
    assert truth != "other", "both HiGHS oracles failed; shrink the generator"

    result = solve_mip(
        gf, SolverConfig(pad_to=8, chunk_size=50, refactor_period=50)
    )

    if truth == "optimal":
        assert result.status is SolveStatus.FINITE_OPTIMUM, (seed, result.status)
        assert result.certified, seed
        got = float(result.objective)
        if got != pytest.approx(obj, rel=1e-7, abs=1e-7):
            # HiGHS B&B admits ~1e-6 integer infeasibility, so its reported
            # optimum can beat the true exact one slightly (seeds 62, 63).
            # Re-derive the truth by exhaustive enumeration before failing.
            truth2, obj2 = _enumerate_mip_oracle(raw, int_idx)
            assert truth2 == "optimal", (seed, truth2)
            obj = obj2
        assert got == pytest.approx(obj, rel=1e-6, abs=1e-6), (
            seed,
            result.objective,
            obj,
        )
        # The exact incumbent must be exactly integral on integer variables.
        for j in int_idx:
            v = result.solution.value_of(f"x{j}")
            assert v.denominator == 1, (seed, j, v)
    elif truth == "infeasible":
        assert result.status is SolveStatus.INFEASIBLE, (seed, result.status)
    else:
        # Relaxation-unbounded MIPs: "unbounded" and "infeasible" can both
        # be legitimate refinements of HiGHS's combined verdict.
        assert result.status in (
            SolveStatus.UNBOUNDED,
            SolveStatus.INFEASIBLE,
        ), (seed, result.status)


@pytest.mark.parametrize("seed", range(40))
def test_random_lp_matches_highs(seed):
    rng = np.random.default_rng(seed)
    gf, raw = _random_instance(rng)
    truth, obj = _solve_with_highs(raw)
    assert truth != "other", "HiGHS itself failed; shrink the generator"

    result, solution = solve_general_form(gf, SolverConfig(pad_to=8))

    if truth == "optimal":
        assert result.status is SolveStatus.FINITE_OPTIMUM, (seed, result.status)
        assert result.stats.certified, seed
        assert solution is not None, seed
        got = float(solution.objective_value)
        # Reporting convention (reference parity, see cook fixture -143/2):
        # Solution carries the minimize-form objective, so maximize
        # problems report the negated optimum.
        if raw[5] is Objective.MAXIMIZE:
            obj = -obj
        assert got == pytest.approx(obj, rel=1e-7, abs=1e-7), (
            seed,
            solution.objective_value,
            obj,
        )
    elif truth == "infeasible":
        assert result.status is SolveStatus.INFEASIBLE, (seed, result.status)
    else:
        assert result.status is SolveStatus.UNBOUNDED, (seed, result.status)
