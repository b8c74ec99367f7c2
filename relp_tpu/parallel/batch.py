"""Vmapped scenario batches — many LPs per chip / across the "batch" axis.

The DP analog for LP solving (SURVEY.md section 2 checklist): every state
member gains a leading batch dimension; all LPs advance in lockstep inside
one ``lax.while_loop`` with an active mask (finished LPs keep their terminal
state); the batch dimension shards across the mesh's "batch" axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from relp_tpu.simplex.kernels import make_iteration
from relp_tpu.simplex.state import RUNNING, SimplexState


def make_batch_state(states):
    """Stack per-LP states into one batched state."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pricing", "chunk", "opt_tol", "pivot_tol", "degen_tol", "stop_at_zero"
    ),
)
def batched_run_chunk(
    batch_state: SimplexState,
    A_scan,  # (B, M, N), possibly lower precision
    A_full,  # (B, M, N)
    c,  # (B, N)
    candidate_mask,  # (B, N)
    *,
    pricing: int,
    chunk: int,
    opt_tol: float,
    pivot_tol: float,
    degen_tol: float,
    stop_at_zero: bool = False,
) -> SimplexState:
    """Advance every LP in the batch by up to ``chunk`` pivots.

    ``stop_at_zero`` freezes an LP (status -> OPTIMAL) once its objective
    reaches zero — per-LP phase-1 termination.
    """
    from relp_tpu.simplex.state import OPTIMAL

    iteration = make_iteration(pricing, opt_tol, pivot_tol, degen_tol)
    v_iter = jax.vmap(iteration, in_axes=(0, 0, 0, 0, 0, 0))
    c_scan = c.astype(A_scan.dtype)
    # Refresh the carried per-LP reduced costs (pi may have changed between
    # chunks via the vmapped refactorization).
    d0 = c_scan - jnp.einsum(
        "bm,bmn->bn", batch_state.pi.astype(A_scan.dtype), A_scan
    )
    batch_state = batch_state._replace(
        inner=jnp.zeros_like(batch_state.inner),
        d=d0,
    )

    def active_mask(s):
        active = s.status == RUNNING
        if stop_at_zero:
            active = active & (s.obj > 1e-9)
        return active

    def cond(s: SimplexState):
        return jnp.any(active_mask(s) & (s.inner < chunk))

    def body(s: SimplexState):
        new = v_iter(s, A_scan, A_full, c, c_scan, candidate_mask)
        # Freeze LPs that already terminated.
        active = active_mask(s)

        def sel(n, o):
            extra = (1,) * (n.ndim - 1)
            return jnp.where(active.reshape((-1,) + extra), n, o)

        return jax.tree.map(sel, new, s)

    return jax.lax.while_loop(cond, body, batch_state)
