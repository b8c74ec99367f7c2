"""LU + eta-file basis inverse backend.

TPU re-architecture of the reference's production backend
(``LUDecomposition`` + eta files + permutations, SURVEY.md comps 18-21):

* Refactorization: pivoted dense LU of the basis on the MXU
  (f32 ``lu_factor``; the reference runs sparse Markowitz elimination,
  decomposition/mod.rs:27-143 — dense-blocked is the TPU-native choice).
* FTRAN/BTRAN: triangular solves plus one step of f64 iterative refinement
  (replacing exact rational solves; reference: lower_upper/mod.rs:180-237).
* Updates: a fixed-capacity product-form eta ring — each pivot appends
  (w, r); applying the stack implements the same
  ``B_k = B_0 E_1 ... E_k`` composition the reference maintains via
  Forrest-Tomlin row replacements + rotate-to-back permutations
  (lower_upper/mod.rs:94-178).  The ring capacity plays the role of the
  "refactor after 30 updates" rule (should_refactor, :249-252).

Trade-off (documented honestly): on TPU, single-vector triangular solves are
latency-bound, so this backend is slower per iteration than the dense
product-form inverse (kernels.py) but has better numerical behavior between
refactorizations; it also serves as the cross-check backend, playing the
role the reference assigns to running both BasisInverseRows and
LUDecomposition over the same problems.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from relp_tpu.simplex.kernels import (
    PRICE_BLAND,
    PRICE_STEEPEST,
    _select_entering,
    _select_leaving,
)
from relp_tpu.simplex.state import OPTIMAL, RUNNING, UNBOUNDED


class LUState(NamedTuple):
    """Solver state with LU factors + eta ring instead of an explicit inverse."""

    lu: jnp.ndarray  # (M, M) packed LU factors of B0 (f32)
    piv: jnp.ndarray  # (M,) pivot permutation from lu_factor
    B0: jnp.ndarray  # (M, M) the refactorization-time basis matrix (full dtype)
    eta_vals: jnp.ndarray  # (K, M) product-form update columns w
    eta_rows: jnp.ndarray  # (K,) pivot rows
    eta_count: jnp.ndarray  # () int32
    basis: jnp.ndarray  # (M,) int32
    xB: jnp.ndarray  # (M,)
    pi: jnp.ndarray  # (M,)
    obj: jnp.ndarray  # ()
    in_basis: jnp.ndarray  # (N,) bool
    gamma: jnp.ndarray  # (N,)
    iteration: jnp.ndarray  # () int32
    status: jnp.ndarray  # () int32
    inner: jnp.ndarray  # () int32
    price_start: jnp.ndarray  # () int32 — round-robin pricing resume point


def _lu_solve(lu, piv, B0, rhs, trans: int, refine: bool = True):
    """Solve B0 x = rhs (trans=0) or B0^T x = rhs (trans=1) with the f32
    factors plus one f64 refinement step."""
    from jax.scipy.linalg import lu_solve

    x = lu_solve((lu, piv), rhs.astype(jnp.float32), trans=trans).astype(rhs.dtype)
    if refine:
        residual = rhs - (B0 @ x if trans == 0 else B0.T @ x)
        dx = lu_solve((lu, piv), residual.astype(jnp.float32), trans=trans)
        x = x + dx.astype(rhs.dtype)
    return x


def _apply_etas_ftran(eta_vals, eta_rows, eta_count, x):
    """x <- E_k^-1 ... E_1^-1 x for the product-form etas.

    E = I + (w - e_r) e_r^T, so E^-1 x = x - (x_r / w_r) (w - e_r)
    (reference analog: eta_file.rs apply_right).
    """
    K = eta_vals.shape[0]

    def body(k, x):
        def apply(x):
            w = eta_vals[k]
            r = eta_rows[k]
            factor = x[r] / w[r]
            x = x - factor * w
            return x.at[r].set(factor)

        return jax.lax.cond(k < eta_count, apply, lambda x: x, x)

    return jax.lax.fori_loop(0, K, body, x)


def _apply_etas_btran(eta_vals, eta_rows, eta_count, y):
    """y <- y E_k^-1 ... (row form), applied in reverse order
    (reference analog: eta_file.rs apply_left)."""
    K = eta_vals.shape[0]

    def body(i, y):
        k = eta_count - 1 - i

        def apply(y):
            w = eta_vals[k]
            r = eta_rows[k]
            # y' = y E^-1 = y - (y.(w - e_r)/w_r) e_r^T: only entry r moves.
            dot = y @ w
            new_r = y[r] - (dot - y[r]) / w[r]
            return y.at[r].set(new_r)

        return jax.lax.cond((k >= 0) & (k < eta_count), apply, lambda y: y, y)

    return jax.lax.fori_loop(0, K, body, y)


def lu_ftran(state: LUState, a):
    """w = B^-1 a through factors + eta ring (reference: FTRAN,
    lower_upper/mod.rs:180-210)."""
    x = _lu_solve(state.lu, state.piv, state.B0, a, trans=0)
    return _apply_etas_ftran(state.eta_vals, state.eta_rows, state.eta_count, x)


def lu_btran(state: LUState, y):
    """v = y B^-1 (row form; reference: BTRAN, lower_upper/mod.rs:213-237)."""
    y = _apply_etas_btran(state.eta_vals, state.eta_rows, state.eta_count, y)
    return _lu_solve(state.lu, state.piv, state.B0, y, trans=1)


@functools.partial(jax.jit, static_argnames=("eta_capacity",))
def lu_refactorize(A, b, c, basis, *, eta_capacity: int):
    """Fresh LU factors of the current basis; empty eta ring.

    Returns (LUState fields…, residual) — residual measures
    ``max |B x - e|`` on a probe solve for breakdown detection.
    """
    from jax.scipy.linalg import lu_factor

    M = A.shape[0]
    B = jnp.take(A, basis, axis=1)
    lu, piv = lu_factor(B.astype(jnp.float32))
    eta_vals = jnp.zeros((eta_capacity, M), dtype=A.dtype)
    eta_rows = jnp.zeros((eta_capacity,), dtype=jnp.int32)
    xB = _lu_solve(lu, piv, B, b, trans=0)
    cB = c[basis]
    pi = _lu_solve(lu, piv, B, cB, trans=1)
    obj = cB @ xB
    residual = jnp.max(jnp.abs(B @ xB - b)) / (1.0 + jnp.max(jnp.abs(b)))
    return lu, piv, B, eta_vals, eta_rows, xB, pi, obj, residual


def make_lu_iteration(pricing: int, opt_tol: float, pivot_tol: float, degen_tol: float):
    """One simplex pivot on the LU+eta state."""

    def iteration(state: LUState, A_scan, A_full, c, c_scan, candidate_mask) -> LUState:
        M, N = A_scan.shape
        scan_dtype = A_scan.dtype
        low_precision_scan = scan_dtype != A_full.dtype

        d = c_scan - state.pi.astype(scan_dtype) @ A_scan
        if low_precision_scan:
            noise = jnp.finfo(scan_dtype).eps * 8.0
            threshold = opt_tol + noise * (
                1.0 + jnp.max(jnp.abs(state.pi))
            ).astype(scan_dtype)
        else:
            threshold = jnp.asarray(opt_tol, scan_dtype)
        eligible = candidate_mask & (~state.in_basis) & (d < -threshold)
        gamma = state.gamma.astype(scan_dtype)
        q, any_eligible = _select_entering(
            d, gamma, eligible, pricing, N, start=state.price_start
        )
        q = q.astype(jnp.int32)

        a_q = A_full[:, q]
        w = lu_ftran(state, a_q)
        d_q_full = c[q] - state.pi @ a_q
        if low_precision_scan:
            any_eligible = any_eligible & (d_q_full < -opt_tol)

        r, any_positive = _select_leaving(
            state.xB, w, state.basis, pricing, pivot_tol, M
        )
        new_status = jnp.where(
            ~any_eligible,
            OPTIMAL,
            jnp.where(~any_positive, UNBOUNDED, RUNNING),
        ).astype(jnp.int32)
        do_pivot = new_status == RUNNING

        w_r = w[r]
        safe_w_r = jnp.where(do_pivot, w_r, 1.0)
        t = jnp.maximum(state.xB[r], 0.0) / safe_w_r
        xB_new = state.xB - t * w
        xB_new = xB_new.at[r].set(t)

        leaving = state.basis[r]
        basis_new = state.basis.at[r].set(q)
        in_basis_new = state.in_basis.at[leaving].set(False).at[q].set(True)

        # Append the product-form eta (reference: push (eta, q) on updates,
        # lower_upper/mod.rs:174).
        k = state.eta_count
        eta_vals = jax.lax.dynamic_update_index_in_dim(
            state.eta_vals, w, k, axis=0
        )
        eta_rows = jax.lax.dynamic_update_index_in_dim(
            state.eta_rows, r.astype(jnp.int32), k, axis=0
        )
        eta_count = k + 1

        # Duals: pi' = pi + (d_q / w_r) * (row r of the NEW inverse); the new
        # row is obtainable as BTRAN of e_r through the updated stack.
        e_r = jnp.zeros((M,), dtype=A_full.dtype).at[r].set(1.0)
        temp_state = state._replace(
            eta_vals=eta_vals, eta_rows=eta_rows, eta_count=eta_count
        )
        rho_new = lu_btran(temp_state, e_r)
        pi_new = state.pi + d_q_full * rho_new
        cB = c[basis_new]
        obj_new = cB @ xB_new

        if pricing == PRICE_STEEPEST:
            gamma_q_val = (1.0 + w @ w).astype(scan_dtype)
            v = lu_btran(state, w).astype(scan_dtype)
            abar = rho_new.astype(scan_dtype) @ A_scan
            inner = v @ A_scan
            gamma_new = gamma - 2.0 * abar * inner + (abar * abar) * gamma_q_val
            gamma_new = jnp.maximum(gamma_new, 1.0 + abar * abar)
            gamma_new = gamma_new.at[leaving].set(
                jnp.maximum(
                    gamma_q_val / (safe_w_r * safe_w_r).astype(scan_dtype), 1.0
                )
            )
            gamma_new = gamma_new.at[q].set(1.0)
            gamma_new = gamma_new.astype(state.gamma.dtype)
        else:
            gamma_new = state.gamma

        select = lambda new, old: jnp.where(do_pivot, new, old)
        return LUState(
            lu=state.lu,
            piv=state.piv,
            B0=state.B0,
            eta_vals=select(eta_vals, state.eta_vals),
            eta_rows=select(eta_rows, state.eta_rows),
            eta_count=select(eta_count, state.eta_count),
            basis=select(basis_new, state.basis),
            xB=select(xB_new, state.xB),
            pi=select(pi_new, state.pi),
            obj=select(obj_new, state.obj),
            in_basis=select(in_basis_new, state.in_basis),
            gamma=select(gamma_new, state.gamma),
            iteration=state.iteration + do_pivot.astype(jnp.int32),
            status=new_status,
            inner=state.inner + 1,
            price_start=select((q + 1) % N, state.price_start).astype(jnp.int32),
        )

    return iteration


@functools.partial(
    jax.jit,
    static_argnames=(
        "pricing", "chunk", "opt_tol", "pivot_tol", "degen_tol", "stop_at_zero"
    ),
)
def lu_run_chunk(
    state: LUState,
    A_scan,
    A_full,
    c,
    candidate_mask,
    *,
    pricing: int,
    chunk: int,
    opt_tol: float,
    pivot_tol: float,
    degen_tol: float,
    stop_at_zero: bool = False,
) -> LUState:
    """Run pivots until the eta ring fills, the chunk budget is spent, or the
    phase terminates (the ring capacity enforces the refactorization cadence,
    reference: should_refactor)."""
    iteration = make_lu_iteration(pricing, opt_tol, pivot_tol, degen_tol)
    state = state._replace(inner=jnp.zeros((), jnp.int32))
    capacity = state.eta_vals.shape[0]
    c_scan = c.astype(A_scan.dtype)

    def cond(s: LUState):
        running = (
            (s.status == RUNNING)
            & (s.inner < chunk)
            & (s.eta_count < capacity)
        )
        if stop_at_zero:
            running = running & (s.obj > 1e-9)
        return running

    def body(s: LUState):
        return iteration(s, A_scan, A_full, c, c_scan, candidate_mask)

    return jax.lax.while_loop(cond, body, state)
