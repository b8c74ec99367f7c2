"""Jitted simplex kernels.

The hot loop (reference call stack SURVEY.md 3.3) as fused MXU work:

* pricing: ``d = c - pi A`` is one (M)x(M,N) matvec; Dantzig picks
  ``argmin d``, steepest-edge picks ``argmax d^2/gamma``
  (reference: strategy/pivot_rule.rs:153-297);
* FTRAN ``w = Binv a_q`` is an (M,M) matvec (reference: generate_column);
* the ratio test is a masked min + tie-break (reference:
  select_primal_pivot_row, tableau/mod.rs:287-313, Bland tie-break);
* the basis change is a rank-1 product-form update of the dense inverse
  (the BasisInverseRows semantics, basis_inverse_rows.rs:131-145) plus a
  recomputed ``pi = c_B Binv``;
* the steepest-edge gamma update follows Goldfarb 1977 exactly as the
  reference implements it (pivot_rule.rs:243-296): work vector
  ``v = w Binv_old``, new pivot row ``rho = Binv_new[r]``, and
  ``gamma_j' = max(gamma_j - 2 abar_j (v a_j) + abar_j^2 gamma_q,
  1 + abar_j^2)``.

Refactorization: gather B = A[:, basis], invert in f32 on the MXU, then
Newton-Schulz iterations in the working dtype (quadratic convergence to
~1e-13) — replacing the reference's sparse LU refactorization
(decomposition/mod.rs) with an MXU-native scheme.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from relp_tpu.simplex.state import (
    OPTIMAL,
    RUNNING,
    SINGULAR,
    UNBOUNDED,
    SimplexState,
)

# Pricing rule codes (static argument to the chunk runner).
PRICE_DANTZIG = 0
PRICE_STEEPEST = 1
PRICE_BLAND = 2  # first-profitable entering + lowest-index leaving
PRICE_FIRST = 3  # first profitable (reference: FirstProfitable)


def _select_entering(d, gamma, eligible, pricing: int, N: int):
    """Entering-column choice; returns (q, any_eligible)."""
    neg_inf = jnp.array(-jnp.inf, dtype=d.dtype)
    any_eligible = jnp.any(eligible)
    if pricing == PRICE_DANTZIG:
        score = jnp.where(eligible, -d, neg_inf)
        q = jnp.argmax(score)
    elif pricing == PRICE_STEEPEST:
        score = jnp.where(eligible, d * d / gamma, neg_inf)
        q = jnp.argmax(score)
    else:  # Bland / first-profitable: smallest eligible index
        idx = jnp.arange(N)
        q = jnp.min(jnp.where(eligible, idx, N))
        q = jnp.minimum(q, N - 1)
    return q, any_eligible


def _select_leaving(xB, w, basis, pricing: int, pivot_tol: float, M: int):
    """Ratio test; returns (r, any_positive).

    Normal mode breaks near-ties by the largest pivot element (stability);
    Bland mode by the smallest leaving basis index (anti-cycling,
    reference: tableau/mod.rs:294-309).
    """
    pos = w > pivot_tol
    big = jnp.array(jnp.inf, dtype=w.dtype)
    ratio = jnp.where(pos, xB / jnp.where(pos, w, 1.0), big)
    tmin = jnp.min(ratio)
    any_positive = jnp.any(pos)
    near = pos & (ratio <= tmin + 1e-9 * (1.0 + jnp.abs(tmin)))
    if pricing == PRICE_BLAND:
        r = jnp.argmin(jnp.where(near, basis, jnp.iinfo(jnp.int32).max))
    else:
        r = jnp.argmax(jnp.where(near, w, -big))
    return r, any_positive


def make_iteration(pricing: int, opt_tol: float, pivot_tol: float, degen_tol: float):
    """Build one fused simplex iteration (A, b, c, cand static-shape args)."""

    def iteration(state: SimplexState, A, c, candidate_mask) -> SimplexState:
        M, N = A.shape

        # --- pricing ---
        d = c - state.pi @ A
        eligible = candidate_mask & (~state.in_basis) & (d < -opt_tol)
        q, any_eligible = _select_entering(d, state.gamma, eligible, pricing, N)
        q = q.astype(jnp.int32)

        # --- FTRAN ---
        a_q = A[:, q]
        w = state.Binv @ a_q

        # --- ratio test ---
        r, any_positive = _select_leaving(
            state.xB, w, state.basis, pricing, pivot_tol, M
        )

        new_status = jnp.where(
            ~any_eligible,
            OPTIMAL,
            jnp.where(~any_positive, UNBOUNDED, RUNNING),
        ).astype(jnp.int32)
        do_pivot = new_status == RUNNING

        # --- basis change (product-form update) ---
        w_r = w[r]
        safe_w_r = jnp.where(do_pivot, w_r, 1.0)
        t = state.xB[r] / safe_w_r
        Binv_r = state.Binv[r] / safe_w_r
        Binv_new = state.Binv - jnp.outer(w, Binv_r)
        Binv_new = Binv_new.at[r].set(Binv_r)
        xB_new = state.xB - t * w
        xB_new = xB_new.at[r].set(t)

        leaving = state.basis[r]
        basis_new = state.basis.at[r].set(q)
        in_basis_new = state.in_basis.at[leaving].set(False).at[q].set(True)

        cB = c[basis_new]
        pi_new = cB @ Binv_new
        obj_new = cB @ xB_new

        # --- steepest-edge gamma update (Goldfarb; pivot_rule.rs:243-296) ---
        if pricing == PRICE_STEEPEST:
            gamma_q_val = 1.0 + w @ w
            v = w @ state.Binv  # work vector, OLD inverse
            abar = Binv_new[r] @ A  # pivot row of the updated tableau
            inner = v @ A
            gamma_new = state.gamma - 2.0 * abar * inner + (abar * abar) * gamma_q_val
            gamma_new = jnp.maximum(gamma_new, 1.0 + abar * abar)
            gamma_new = gamma_new.at[leaving].set(
                jnp.maximum(gamma_q_val / (safe_w_r * safe_w_r), 1.0)
            )
            gamma_new = gamma_new.at[q].set(1.0)
        else:
            gamma_new = state.gamma

        degenerate = t <= degen_tol
        degen_new = jnp.where(degenerate, state.degen_count + 1, 0).astype(jnp.int32)

        select = lambda new, old: jnp.where(do_pivot, new, old)
        return SimplexState(
            Binv=select(Binv_new, state.Binv),
            basis=select(basis_new, state.basis),
            xB=select(xB_new, state.xB),
            pi=select(pi_new, state.pi),
            obj=select(obj_new, state.obj),
            in_basis=select(in_basis_new, state.in_basis),
            gamma=select(gamma_new, state.gamma),
            iteration=state.iteration + do_pivot.astype(jnp.int32),
            status=new_status,
            degen_count=select(degen_new, state.degen_count),
            inner=state.inner + 1,
        )

    return iteration


@functools.partial(
    jax.jit, static_argnames=("pricing", "chunk", "opt_tol", "pivot_tol", "degen_tol")
)
def run_chunk(
    state: SimplexState,
    A,
    c,
    candidate_mask,
    *,
    pricing: int,
    chunk: int,
    opt_tol: float,
    pivot_tol: float,
    degen_tol: float,
) -> SimplexState:
    """Run up to ``chunk`` pivots on device without host round-trips."""
    iteration = make_iteration(pricing, opt_tol, pivot_tol, degen_tol)
    state = state._replace(inner=jnp.zeros((), jnp.int32))

    def cond(s: SimplexState):
        return (s.status == RUNNING) & (s.inner < chunk)

    def body(s: SimplexState):
        return iteration(s, A, c, candidate_mask)

    return jax.lax.while_loop(cond, body, state)


@functools.partial(jax.jit, static_argnames=("newton_steps",))
def refactorize(A, b, c, basis, *, newton_steps: int = 3):
    """Recompute the basis inverse from scratch.

    MXU-native: f32 inverse + Newton-Schulz refinement in the working dtype
    (replaces the reference's sparse LU refactorization,
    carry/mod.rs:584-591 + decomposition/mod.rs).

    Returns (Binv, xB, pi, obj, residual) — residual is
    ``max |B Binv - I|`` for breakdown detection.
    """
    M = A.shape[0]
    B = jnp.take(A, basis, axis=1)
    X = jnp.linalg.inv(B.astype(jnp.float32)).astype(A.dtype)
    eye = jnp.eye(M, dtype=A.dtype)
    for _ in range(newton_steps):
        X = X @ (2.0 * eye - B @ X)
    residual = jnp.max(jnp.abs(B @ X - eye))
    xB = X @ b
    cB = c[basis]
    pi = cB @ X
    obj = cB @ xB
    return X, xB, pi, obj, residual


@jax.jit
def recompute_gamma(Binv, A, in_basis):
    """Exact steepest-edge weights gamma_j = 1 + ||Binv a_j||^2
    (reference: initial_gamma, pivot_rule.rs:299-305)."""
    W = Binv @ A
    gamma = 1.0 + jnp.sum(W * W, axis=0)
    return jnp.where(in_basis, 1.0, gamma)


@jax.jit
def tableau_row(Binv, A, r):
    """Row r of the current tableau: Binv[r] @ A (used to drive artificials
    out of the basis; reference: remove_artificial_basis_variables)."""
    return Binv[r] @ A


@jax.jit
def reduced_costs(pi, A, c):
    return c - pi @ A


@functools.partial(jax.jit, donate_argnames=("state",))
def forced_pivot(state: SimplexState, A, c, q, r):
    """Pivot column q in at row r unconditionally (zero-level pivots while
    driving artificials out; reference: phase_one.rs:232-278)."""
    q = jnp.asarray(q, jnp.int32)
    r = jnp.asarray(r, jnp.int32)
    a_q = A[:, q]
    w = state.Binv @ a_q
    w_r = w[r]
    t = state.xB[r] / w_r
    Binv_r = state.Binv[r] / w_r
    Binv_new = state.Binv - jnp.outer(w, Binv_r)
    Binv_new = Binv_new.at[r].set(Binv_r)
    xB_new = state.xB - t * w
    xB_new = xB_new.at[r].set(t)
    leaving = state.basis[r]
    basis_new = state.basis.at[r].set(q)
    in_basis_new = state.in_basis.at[leaving].set(False).at[q].set(True)
    cB = c[basis_new]
    pi_new = cB @ Binv_new
    obj_new = cB @ xB_new
    return state._replace(
        Binv=Binv_new,
        basis=basis_new,
        xB=xB_new,
        pi=pi_new,
        obj=obj_new,
        in_basis=in_basis_new,
        iteration=state.iteration + 1,
    )
