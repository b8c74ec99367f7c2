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

from relp_tpu.simplex.kernels import (
    _HI,
    PRICE_STEEPEST,
    make_iteration,
    noisy_f32_matmul,
)
from relp_tpu.simplex.state import RUNNING, SimplexState


def make_batch_state(states):
    """Stack per-LP states into one batched state."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def megakernel_run_chunk(
    batch_state: SimplexState,
    A,  # (B, M, N) f32 tableau (same-precision scans)
    c,  # (B, N)
    candidate_mask,  # (B, N)
    *,
    chunk: int,
    opt_tol: float,
    pivot_tol: float,
    degen_tol: float,
    stop_at_zero: bool = False,
    interpret: bool = False,
    hi_scan: bool = False,
) -> SimplexState:
    """Advance the batch by up to ``chunk`` pivots through the fused Pallas
    megakernel (relp_tpu/ops/pallas_batch.py) — per-LP VMEM-resident pivot
    loops instead of the vmapped XLA small-op chain.

    Same contract as :func:`batched_run_chunk` restricted to its production
    configuration: f32, same-precision scans, steepest-edge pricing.  The
    carried ``d`` is left stale (every chunk entry refreshes it anyway).
    """
    from relp_tpu.ops.pallas_batch import (
        batched_pivot_chunk,
        batched_pivot_chunk_blocked,
    )
    from relp_tpu.simplex.kernels import _NOISY_F32_EPS

    # Hardware Mosaic f32 dots are single-pass bf16: the kernel needs the
    # guarded-scan semantics (noise floor + pick recheck).  Interpret mode
    # computes exact f32 and stays bit-identical to the XLA path.
    noise_eps = (
        _NOISY_F32_EPS if (not interpret and noisy_f32_matmul()) else 0.0
    )
    variant, kw = _megakernel_variant(A.shape)
    impl = (
        batched_pivot_chunk
        if variant == "resident"
        else batched_pivot_chunk_blocked
    )
    Binv, xB, pi, basis, in_basis, gamma, status, iteration, degen = (
        impl(
            A,
            c,
            candidate_mask,
            batch_state.Binv,
            batch_state.xB,
            batch_state.pi,
            batch_state.basis,
            batch_state.in_basis,
            batch_state.gamma,
            batch_state.status,
            batch_state.iteration,
            batch_state.degen_count,
            chunk=chunk,
            opt_tol=opt_tol,
            pivot_tol=pivot_tol,
            degen_tol=degen_tol,
            stop_at_zero=stop_at_zero,
            interpret=interpret,
            noise_eps=noise_eps,
            hi_scan=hi_scan,
            **kw,
        )
    )
    cB = jnp.take_along_axis(c, basis, axis=1)
    obj = jnp.sum(cB * xB, axis=1)
    return batch_state._replace(
        Binv=Binv,
        xB=xB,
        pi=pi,
        basis=basis,
        in_basis=in_basis,
        gamma=gamma,
        status=status,
        iteration=iteration,
        degen_count=degen,
        obj=obj.astype(batch_state.obj.dtype),
        inner=jnp.full_like(batch_state.inner, chunk),
    )


# Usable VMEM measured at 16-24 MB on v5e (docs/ROADMAP.md); budgets leave
# headroom for Mosaic's pipeline double-buffering of the VMEM-blocked
# vector operands.
_RESIDENT_VMEM_BUDGET = 6 * 1024 * 1024
_BLOCKED_VMEM_BUDGET = 12 * 1024 * 1024


def _megakernel_variant(shape):
    """Pick the megakernel implementation for a (B, M, N) batch shape.

    Returns ("resident", {}) when the whole (M, N) tableau + carry fits
    VMEM (the round-2 kernel), ("blocked", {"col_block": BLK}) when only
    the (M, M) carry fits and the tableau must stream from HBM (the m>=1024
    shapes that used to fail outright — docs/results/batch_perf_r4.txt), or
    (None, {}) when even the carry is too big for VMEM.
    """
    _, M, N = shape
    if (M * N + 2 * M * M) * 4 <= _RESIDENT_VMEM_BUDGET:
        return "resident", {}
    for blk in (512, 256, 128):
        if N % blk:
            continue
        used = (M * M + 2 * M * blk + 128 * M + N) * 4
        if used <= _BLOCKED_VMEM_BUDGET:
            return "blocked", {"col_block": blk}
    return None, {}


def megakernel_applicable(A, cfg_dtype: str, scan_dtype: str, pricing: int, mesh=None) -> bool:
    """Shape/config gate for the fused batched megakernel."""
    B, M, N = A.shape
    return (
        mesh is None
        and pricing == PRICE_STEEPEST
        and cfg_dtype == "float32"
        and scan_dtype in ("float32", "same")
        and M % 8 == 0
        and N % 128 == 0
        and _megakernel_variant(A.shape)[0] is not None
    )


@functools.partial(
    jax.jit,
    static_argnames=("chunk", "opt_tol", "pivot_tol", "feas_tol", "noisy_scan"),
)
def batched_dual_run_chunk(
    batch_state: SimplexState,
    A_scan,  # (B, M, N)
    A_full,  # (B, M, N)
    c,  # (B, N)
    candidate_mask,  # (B, N)
    *,
    chunk: int,
    opt_tol: float,
    pivot_tol: float,
    feas_tol: float,
    noisy_scan: bool = False,
) -> SimplexState:
    """Advance every LP by up to ``chunk`` *dual* pivots (lockstep, per-LP
    freezing) — the batched warm-restart path for perturbed-rhs scenario
    families sharing one dual-feasible basis (the base problem's optimum).
    Terminal per-LP statuses: OPTIMAL (primal feasibility restored) or
    INFEASIBLE (dual ray; the driver routes those to the single-LP fallback
    for the exact Farkas certificate)."""
    from relp_tpu.simplex.kernels import make_dual_iteration

    iteration = make_dual_iteration(
        opt_tol, pivot_tol, feas_tol, noisy_scan=noisy_scan
    )
    v_iter = jax.vmap(iteration, in_axes=(0, 0, 0, 0, 0, 0))
    c_scan = c.astype(A_scan.dtype)
    # HIGHEST: the batched einsum is single-pass bf16 by default on
    # accelerators (scripts/probe_batched_precision.py) — noisy entry
    # reduced costs break dual-feasibility bookkeeping.
    d = c_scan - jnp.einsum(
        "bm,bmn->bn",
        batch_state.pi.astype(A_scan.dtype),
        A_scan,
        precision=_HI,
    )
    batch_state = batch_state._replace(
        inner=jnp.zeros_like(batch_state.inner), d=d
    )

    def cond(s):
        return jnp.any((s.status == RUNNING) & (s.inner < chunk))

    def body(s):
        new = v_iter(s, A_scan, A_full, c, c_scan, candidate_mask)
        active = s.status == RUNNING

        def sel(n, o):
            extra = (1,) * (n.ndim - 1)
            return jnp.where(active.reshape((-1,) + extra), n, o)

        return jax.tree.map(sel, new, s)

    return jax.lax.while_loop(cond, body, batch_state)


@functools.partial(
    jax.jit,
    static_argnames=(
        "pricing", "chunk", "opt_tol", "pivot_tol", "degen_tol", "stop_at_zero",
        "refactor_period", "newton_steps", "feas_tol", "noisy_scan", "hi_scan",
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
    refactor_period: int = 0,
    b=None,  # (B, M) right-hand sides, required when refactor_period > 0
    newton_steps: int = 1,
    feas_tol: float = 1e-9,
    noisy_scan: bool = False,
    hi_scan: bool = False,
) -> SimplexState:
    """Advance every LP in the batch by up to ``chunk`` pivots.

    ``stop_at_zero`` freezes an LP (status -> OPTIMAL) once its objective
    reaches zero — per-LP phase-1 termination.

    ``refactor_period > 0`` enables the *device-side* refactorization
    cadence: every ``refactor_period`` loop steps the basis inverses of all
    LPs are recomputed from scratch on device (vmapped f32 MXU inverse +
    Newton refinement, the same scheme the host uses) and the steepest-edge
    weights and reduced costs are refreshed — so a whole phase runs as ONE
    dispatch instead of a host round trip per chunk.  Dispatch/sync through
    the device tunnel costs ~35 ms each; the batched scenario driver was
    host-latency-bound without this (measured: 2.9k pivots/s end-to-end vs
    314k inside the loop).
    """
    from relp_tpu.simplex import kernels
    from relp_tpu.simplex.state import OPTIMAL

    iteration = make_iteration(
        pricing, opt_tol, pivot_tol, degen_tol,
        noisy_scan=noisy_scan, hi_scan=hi_scan,
    )
    v_iter = jax.vmap(iteration, in_axes=(0, 0, 0, 0, 0, 0))
    c_scan = c.astype(A_scan.dtype)

    def refresh_d(s):
        # HIGHEST: the batched einsum is single-pass bf16 by default on
        # accelerators — a noisy chunk-entry d fabricates candidates and
        # blocks OPTIMAL forever (scripts/probe_batched_precision.py).
        d = c_scan - jnp.einsum(
            "bm,bmn->bn", s.pi.astype(A_scan.dtype), A_scan, precision=_HI
        )
        return s._replace(d=d)

    # Refresh the carried per-LP reduced costs (pi may have changed between
    # chunks via the vmapped refactorization).
    batch_state = refresh_d(
        batch_state._replace(inner=jnp.zeros_like(batch_state.inner))
    )

    def active_mask(s):
        active = s.status == RUNNING
        if stop_at_zero:
            active = active & (s.obj > 1e-9)
        return active

    if refactor_period > 0:
        assert b is not None, "device-side refactorization needs b"
        # Newton-Schulz refresh of the carried inverses: batched linalg.inv
        # is pathologically slow on TPU (seconds per call at B=256).
        v_newton = jax.vmap(
            lambda Binv, A, bb, cc, basis: kernels.newton_refresh(
                Binv, A, bb, cc, basis, steps=max(2, newton_steps + 1)
            ),
            in_axes=(0, 0, 0, 0, 0),
        )
        v_gamma = jax.vmap(kernels.recompute_gamma, in_axes=(0, 0, 0))

        def refresh(s):
            Binv, xB, pi, obj, _residual = v_newton(
                s.Binv, A_full, b, c, s.basis
            )
            xB = jnp.where(xB > -feas_tol, jnp.maximum(xB, 0.0), xB)
            s = s._replace(Binv=Binv, xB=xB, pi=pi, obj=obj)
            if pricing == PRICE_STEEPEST:
                s = s._replace(gamma=v_gamma(Binv, A_scan, s.in_basis))
            return refresh_d(s)

    def cond(carry):
        k, s = carry
        return jnp.any(active_mask(s) & (s.inner < chunk))

    def body(carry):
        k, s = carry
        if refactor_period > 0:
            s = jax.lax.cond(
                (k > 0) & (k % refactor_period == 0),
                refresh,
                lambda x: x,
                s,
            )
        new = v_iter(s, A_scan, A_full, c, c_scan, candidate_mask)
        # Freeze LPs that already terminated.
        active = active_mask(s)

        def sel(n, o):
            extra = (1,) * (n.ndim - 1)
            return jnp.where(active.reshape((-1,) + extra), n, o)

        return k + 1, jax.tree.map(sel, new, s)

    _, out = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), batch_state)
    )
    return out
