"""Fused batched-pivot megakernel (Pallas TPU).

The scenario-batch axis is the framework's best TPU story (SURVEY.md §2
checklist: "vmapped scenario batch"), but the XLA-compiled batched step
pays ~120 us/pivot of diffuse small-op overhead — selection, Harris,
scatters over (B, N)/(B, M) arrays — against ~82 us of real work at
B=64, m=256 (docs/ROADMAP.md item 2, measured by marginal differencing).

This kernel runs a WHOLE CHUNK of pivots for one LP per grid step with the
entire working set VMEM-resident: the (M, N) tableau (512 KB at 256x512
f32), the (M, M) inverse, and all state vectors.  Between pivots nothing
touches HBM — the XLA path re-streams (B, M, N) and (B, M, M) through HBM
for every one of its small ops.

Semantics mirror ``relp_tpu.simplex.kernels.make_iteration`` exactly
(steepest-edge pricing, Harris two-pass ratio test with relative delta,
product-form rank-1 update, Goldfarb gamma update); equivalence is tested
against the vmapped XLA path in interpret mode on CPU.

All dynamic indexing is expressed as one-hot matvecs / iota masks (gathers
and dynamic scatters are not Mosaic-friendly); argmax ties break to the
lowest index like ``jnp.argmax``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from relp_tpu.simplex.state import OPTIMAL, RUNNING, UNBOUNDED

_NEG = np.float32(-3.0e38)  # ~-inf in f32, Mosaic-safe literal


def _argmax_first(score, ids, size):
    """Index of the first maximum of ``score`` (shape (1, K)).

    ``size`` must be a concrete np.int32: under jax_enable_x64 a bare
    Python int promotes the where to i64, and Mosaic's i64 conversion
    lowering recurses forever (see CLAUDE.md).
    """
    smax = jnp.max(score)
    return jnp.min(jnp.where(score == smax, ids, size)).astype(jnp.int32), smax


def _make_kernel(
    chunk, opt_tol, pivot_tol, degen_tol, stop_at_zero, M, N,
    noise_eps=0.0, hi_scan=False,
):
    # Concrete int32 copies of every Python-int constant used inside the
    # kernel: under jax_enable_x64 bare ints trace as i64 and Mosaic cannot
    # legalize the conversions (infinite recursion in its convert lowering).
    M32 = np.int32(M)
    N32 = np.int32(N)
    # ... and every float literal/tolerance as np.float32 (a bare Python
    # float is weak f64 under x64, and f64 scalars cannot be legalized by
    # Mosaic).
    f1 = np.float32(1.0)
    f0 = np.float32(0.0)
    fhalf = np.float32(0.5)
    f2 = np.float32(2.0)
    opt_tol = np.float32(opt_tol)
    pivot_tol = np.float32(pivot_tol)
    degen_tol = np.float32(degen_tol)
    harris_delta = np.float32(1e-7)
    zero_obj_tol = np.float32(1e-9)
    RUN32 = np.int32(RUNNING)
    OPT32 = np.int32(OPTIMAL)
    UNB32 = np.int32(UNBOUNDED)
    # noise_eps > 0 (hardware MXU): the in-loop d comes from the fast-path
    # single-pass-bf16 Goldfarb scan, so eligibility gets a noise-scaled
    # floor and the picked column a working-precision recheck — exactly
    # make_iteration's guarded-scan semantics.  0.0 in interpret mode keeps
    # the CPU equivalence tests bit-identical to the XLA path.  hi_scan
    # (polish mode) runs the Goldfarb scan at HIGHEST instead: exact
    # pricing, no guards needed — the optimality-tail terminator.
    guarded = float(noise_eps) > 0.0 and not hi_scan
    noise_eps = np.float32(noise_eps)

    # Matmul precision: Mosaic (like XLA) lowers f32 dots as SINGLE-PASS
    # bf16 on the MXU by default (~2e-3 relative error — measured on v5e,
    # scripts/probe_dot_precision.py).  The XLA iteration survives because
    # its state-critical ops are not matmuls: A[:, q] is an exact gather,
    # jnp.outer is an elementwise broadcast, and XLA matvecs default to
    # full f32.  Routing those through default-precision MXU dots corrupts
    # the carried inverse by ~bf16 noise PER PIVOT (measured: refactor
    # residual 1.8 after ~30 pivots; Newton-Schulz then diverges and phase 2
    # explodes).  So: every dot whose result enters the carried state runs
    # at HIGHEST (multi-pass, full f32 — verified supported by Mosaic);
    # only the wide Goldfarb/pricing scan (which feeds d/gamma, pricing
    # quality not state) keeps the fast single-pass path, exactly like the
    # XLA iteration's stacked P @ A_scan.
    HI = jax.lax.Precision.HIGHEST

    def kernel(
        A_ref, c_ref, cand_ref,
        Binv_in, xB_in, pi_in, cB_in, basis_in, inb_in, gamma_in, meta_in,
        Binv_out, xB_out, pi_out, cB_out, basis_out, inb_out, gamma_out,
        meta_out, d_scr,
    ):
        # Vector state arrives as (B, 1, K) with (1, 1, K) blocks (Mosaic
        # requires the last two block dims divisible by (8, 128) or equal to
        # the array dims); ref[0] yields the (1, K) working shape.
        A = A_ref[0]  # (M, N)
        c = c_ref[0]  # (1, N)
        cand = cand_ref[0]  # (1, N) f32 mask
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        mrow_ids = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
        mcol_ids = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        mm_row_ids = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)

        # Copy state in -> out once; the pivot loop then updates out in place.
        Binv_out[...] = Binv_in[...]
        xB_out[0] = xB_in[0]
        pi_out[0] = pi_in[0]
        cB_out[0] = cB_in[0]
        basis_out[0] = basis_in[0]
        inb_out[0] = inb_in[0]
        gamma_out[0] = gamma_in[0]
        meta_out[0] = meta_in[0]
        # Chunk-entry reduced-cost refresh (run_chunk does the same; XLA
        # lowers that vector-matrix product at full precision).
        d_scr[...] = c - jnp.dot(
            pi_in[0], A, preferred_element_type=jnp.float32, precision=HI
        )

        def body(k, carry):
            status = meta_out[0, 0, 0]
            obj = jnp.sum(cB_out[0] * xB_out[0])
            active = status == RUN32
            if stop_at_zero:
                active = active & (obj > zero_obj_tol)

            @pl.when(active)
            def _():
                Binv = Binv_out[0]  # (M, M)
                xB = xB_out[0]  # (1, M)
                pi = pi_out[0]  # (1, M)
                cB = cB_out[0]
                basis = basis_out[0]  # (1, M) i32
                inb = inb_out[0]  # (1, N) f32
                gamma = gamma_out[0]
                d = d_scr[...]

                # --- pricing (steepest edge) ---
                if guarded:
                    # k == 0 prices on the clean (HIGHEST-precision) entry
                    # d: the exact arbiter, mirroring make_iteration's
                    # inner == 0 exemption.
                    threshold = jnp.where(
                        k == np.int32(0),
                        opt_tol,
                        opt_tol + noise_eps * (f1 + jnp.max(jnp.abs(pi))),
                    )
                else:
                    threshold = opt_tol
                eligible = (cand > fhalf) & (inb < fhalf) & (d < -threshold)
                score = jnp.where(eligible, d * d / gamma, _NEG)
                q, smax = _argmax_first(score, col_ids, N32)
                any_eligible = smax > _NEG
                onehot_q = (col_ids == q).astype(jnp.float32)  # (1, N)

                # --- FTRAN (state-critical: full precision) ---
                # Column extraction as a masked VPU reduction: exact (the
                # mask is 0/1 so each output element is a single product)
                # and cheaper than the one-hot dot, which Mosaic lowers as
                # a 3-pass HIGHEST MXU matvec just to select a column.
                a_q = jnp.sum(
                    A * jnp.broadcast_to(onehot_q, (M, N)),
                    axis=1,
                    keepdims=True,
                )  # (M, 1)
                w = jnp.dot(
                    Binv, a_q, preferred_element_type=jnp.float32, precision=HI
                )
                # Working-precision recheck like make_iteration's d_q_full
                # (elementwise multiply + reduce: exact f32 on the VPU).
                c_q = jnp.sum(c * onehot_q)
                d_q = c_q - jnp.sum(pi * a_q.reshape(1, M))
                if guarded:
                    # A scan-noise phantom pick means nothing real is
                    # visible: freeze OPTIMAL; the driver re-verifies at the
                    # next clean chunk boundary and re-arms if needed.
                    any_eligible = any_eligible & (d_q < -opt_tol)

                # --- Harris two-pass ratio test (relative delta) ---
                wc = w  # (M, 1)
                pos = wc > pivot_tol
                xBc = xB.reshape(M, 1)
                xB_eff = jnp.maximum(xBc, f0)
                safe_w = jnp.where(pos, wc, f1)
                big = jnp.float32(3.0e38)
                ratio = jnp.where(pos, xB_eff / safe_w, big)
                delta = harris_delta * (f1 + xB_eff)
                relaxed = jnp.where(pos, (xB_eff + delta) / safe_w, big)
                theta = jnp.min(relaxed)
                ok = pos & (ratio <= theta)
                # jnp.any(bool) routes through an f64 conversion in Mosaic
                # under x64; reduce in f32 instead.
                any_positive = jnp.max(jnp.where(pos, f1, f0)) > fhalf
                wmax = jnp.max(jnp.where(ok, wc, _NEG))
                r = jnp.min(
                    jnp.where(ok & (wc == wmax), mrow_ids, M32)
                ).astype(jnp.int32)
                onehot_r = (mrow_ids == r).astype(jnp.float32)  # (M, 1)

                new_status = jnp.where(
                    ~any_eligible,
                    OPT32,
                    jnp.where(~any_positive, UNB32, RUN32),
                ).astype(jnp.int32)
                do = new_status == RUN32
                dof = do.astype(jnp.float32)

                # --- product-form rank-1 update ---
                w_r = jnp.sum(wc * onehot_r)
                safe_wr = jnp.where(do, w_r, f1)
                t = jnp.sum(xB_eff * onehot_r) / safe_wr
                # Row extraction as a masked VPU reduction (exact; see a_q).
                Binv_r = (
                    jnp.sum(
                        Binv * jnp.broadcast_to(onehot_r, (M, M)),
                        axis=0,
                        keepdims=True,
                    )
                    / safe_wr
                )  # (1, M)
                # Rank-1 update as an elementwise broadcast product (VPU,
                # exact f32) — a (M,1)x(1,M) MXU dot would truncate both
                # operands to bf16.
                Binv_new = Binv - (
                    jnp.broadcast_to(wc, (M, M))
                    * jnp.broadcast_to(Binv_r, (M, M))
                )
                Binv_new = jnp.where(
                    mm_row_ids == r, jnp.broadcast_to(Binv_r, (M, M)), Binv_new
                )
                w_row = wc.reshape(1, M)
                xB_new = xB - t * w_row
                xB_new = jnp.where(mcol_ids == r, t, xB_new)

                # Integer reductions route through an i64 accumulator under
                # x64 which Mosaic rejects; reduce in f32 (indices < 2^24
                # are exact) and cast back.
                leaving = jnp.sum(
                    jnp.where(mcol_ids == r, basis.astype(jnp.float32), f0)
                ).astype(jnp.int32)
                basis_new = jnp.where(mcol_ids == r, q, basis)
                inb_new = jnp.where(
                    col_ids == q,
                    f1,
                    jnp.where(col_ids == leaving, f0, inb),
                )
                cB_new = jnp.where(mcol_ids == r, c_q, cB)
                pi_new = pi + d_q * Binv_r

                # --- fused Goldfarb scan: one stacked (3, M) @ (M, N) ---
                gamma_q = f1 + jnp.sum(wc * wc)
                v = jax.lax.dot_general(
                    wc, Binv,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (1, M), OLD inverse
                P = jnp.concatenate([pi_new, v, Binv_r], axis=0)  # (3, M)
                S = jnp.dot(
                    P, A,
                    preferred_element_type=jnp.float32,
                    precision=HI if hi_scan else None,
                )
                d_next = c - S[0:1, :]
                inner = S[1:2, :]
                abar = S[2:3, :]
                gamma_new = jnp.maximum(
                    gamma - f2 * abar * inner + abar * abar * gamma_q,
                    f1 + abar * abar,
                )
                gamma_new = jnp.where(
                    col_ids == leaving,
                    jnp.maximum(gamma_q / (safe_wr * safe_wr), f1),
                    gamma_new,
                )
                gamma_new = jnp.where(col_ids == q, f1, gamma_new)

                sel = lambda new, old: jnp.where(do, new, old)
                Binv_out[0] = sel(Binv_new, Binv)
                xB_out[0] = sel(xB_new, xB)
                pi_out[0] = sel(pi_new, pi)
                cB_out[0] = sel(cB_new, cB)
                basis_out[0] = jnp.where(do, basis_new, basis)
                inb_out[0] = sel(inb_new, inb)
                gamma_out[0] = sel(gamma_new, gamma)
                d_scr[...] = sel(d_next, d)
                meta = meta_out[0]  # (1, 8) i32
                ids8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
                degen = meta_out[0, 0, 2]
                degen_new = jnp.where(
                    do,
                    jnp.where(t <= degen_tol, degen + np.int32(1), np.int32(0)),
                    degen,
                ).astype(jnp.int32)
                it_new = meta_out[0, 0, 1] + do.astype(jnp.int32)
                meta_new = jnp.where(ids8 == 0, new_status, meta)
                meta_new = jnp.where(ids8 == 1, it_new, meta_new)
                meta_new = jnp.where(ids8 == 2, degen_new, meta_new)
                meta_out[0] = meta_new

            return carry

        # Explicit int32-counter while_loop: fori_loop's internal counter is
        # i64 under jax_enable_x64 no matter the bound dtypes, which Mosaic
        # cannot legalize.
        chunk32 = np.int32(chunk)

        def step(k):
            body(k, jnp.int32(0))  # mutates the out/scratch refs
            return k + np.int32(1)

        jax.lax.while_loop(lambda k: k < chunk32, step, jnp.int32(0))

    return kernel


def _make_blocked_kernel(
    chunk, opt_tol, pivot_tol, degen_tol, stop_at_zero, M, N, BLK,
    noise_eps=0.0, hi_scan=False,
):
    """Row-blocked variant of :func:`_make_kernel` for shapes whose (M, N)
    tableau cannot stay VMEM-resident (m >= 1024 blows the 16-24 MB usable
    budget — docs/results/batch_perf_r4.txt).  The carry (B^-1 + all state
    vectors) stays VMEM-resident across the whole chunk via explicit DMA;
    the tableau stays in HBM and is *streamed* per pivot: one 128-wide
    column block for the entering column, then double-buffered (M, BLK)
    blocks for the fused Goldfarb/pricing scan — the same per-pivot HBM
    traffic as the XLA path but none of its per-op dispatch overhead, and
    the serial B^-1 chain never touches HBM.

    Pivot semantics are identical to :func:`_make_kernel` (same pricing
    guards, Harris test, rank-1 update, Goldfarb update); equivalence is
    pinned in interpret mode by tests/test_pallas_batch.py.
    """
    M32 = np.int32(M)
    N32 = np.int32(N)
    BLK32 = np.int32(BLK)
    nblk32 = np.int32(N // BLK)
    one32 = np.int32(1)
    two32 = np.int32(2)
    f1 = np.float32(1.0)
    f0 = np.float32(0.0)
    fhalf = np.float32(0.5)
    f2 = np.float32(2.0)
    opt_tol = np.float32(opt_tol)
    pivot_tol = np.float32(pivot_tol)
    degen_tol = np.float32(degen_tol)
    harris_delta = np.float32(1e-7)
    zero_obj_tol = np.float32(1e-9)
    RUN32 = np.int32(RUNNING)
    OPT32 = np.int32(OPTIMAL)
    UNB32 = np.int32(UNBOUNDED)
    guarded = float(noise_eps) > 0.0 and not hi_scan
    noise_eps = np.float32(noise_eps)
    HI = jax.lax.Precision.HIGHEST

    def kernel(
        A_hbm,  # (B, M, N) f32, stays in HBM
        c_ref, cand_ref,  # (1, 1, N) VMEM blocks
        Binv_hbm,  # (B, M, M) f32, HBM (aliased in/out)
        xB_in, pi_in, cB_in, basis_in, inb_in, gamma_in, meta_in,
        Binv_out_hbm,
        xB_out, pi_out, cB_out, basis_out, inb_out, gamma_out, meta_out,
        Binv_s,  # (M, M) VMEM scratch — the resident carry
        colbuf,  # (2, M, BLK) VMEM — double-buffered tableau stream
        qbuf,  # (M, 128) VMEM — entering-column block
        d_scr,  # (1, N) VMEM — resident reduced costs
        stream_sem,  # DMA (2,)
        q_sem,  # DMA ()
        state_sem,  # DMA ()
    ):
        bgrid = pl.program_id(0)
        c = c_ref[0]  # (1, N)
        cand = cand_ref[0]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
        blk_ids = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        mrow_ids = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
        mcol_ids = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
        mm_row_ids = jax.lax.broadcasted_iota(jnp.int32, (M, M), 0)

        # Carry in: B^-1 HBM -> VMEM scratch; small vectors in -> out blocks.
        dma_in = pltpu.make_async_copy(
            Binv_hbm.at[bgrid], Binv_s, state_sem
        )
        dma_in.start()
        xB_out[0] = xB_in[0]
        pi_out[0] = pi_in[0]
        cB_out[0] = cB_in[0]
        basis_out[0] = basis_in[0]
        inb_out[0] = inb_in[0]
        gamma_out[0] = gamma_in[0]
        meta_out[0] = meta_in[0]
        dma_in.wait()

        def stream_dma(slot, i):
            start = pl.multiple_of(i * BLK32, BLK)
            return pltpu.make_async_copy(
                A_hbm.at[bgrid, :, pl.ds(start, BLK)],
                colbuf.at[slot],
                stream_sem.at[slot],
            )

        def stream(compute_blk):
            """Run compute_blk(i, (M, BLK) tableau block) over all column
            blocks with double-buffered HBM->VMEM DMA."""
            stream_dma(jnp.int32(0), jnp.int32(0)).start()

            def body(i):
                slot = jax.lax.rem(i, two32)

                @pl.when(i + one32 < nblk32)
                def _():
                    stream_dma(jax.lax.rem(i + one32, two32), i + one32).start()

                stream_dma(slot, i).wait()
                compute_blk(i, colbuf[slot])
                return i + one32

            jax.lax.while_loop(lambda i: i < nblk32, body, jnp.int32(0))

        # Chunk-entry reduced-cost refresh (HIGHEST precision, matching the
        # resident kernel / run_chunk), streamed; skipped for frozen LPs.
        @pl.when(meta_in[0, 0, 0] == RUN32)
        def _():
            pi0 = pi_in[0]  # (1, M)

            def entry_blk(i, ablk):
                start = pl.multiple_of(i * BLK32, BLK)
                S = jnp.dot(
                    pi0, ablk, preferred_element_type=jnp.float32,
                    precision=HI,
                )  # (1, BLK)
                c_blk = c_ref[0, :, pl.ds(start, BLK)]
                d_scr[:, pl.ds(start, BLK)] = c_blk - S

            stream(entry_blk)

        def body(k, carry):
            status = meta_out[0, 0, 0]
            obj = jnp.sum(cB_out[0] * xB_out[0])
            active = status == RUN32
            if stop_at_zero:
                active = active & (obj > zero_obj_tol)

            @pl.when(active)
            def _():
                xB = xB_out[0]
                pi = pi_out[0]
                cB = cB_out[0]
                basis = basis_out[0]
                inb = inb_out[0]
                gamma = gamma_out[0]
                d = d_scr[...]

                # --- pricing (steepest edge) on the resident vectors ---
                if guarded:
                    threshold = jnp.where(
                        k == np.int32(0),
                        opt_tol,
                        opt_tol + noise_eps * (f1 + jnp.max(jnp.abs(pi))),
                    )
                else:
                    threshold = opt_tol
                eligible = (cand > fhalf) & (inb < fhalf) & (d < -threshold)
                score = jnp.where(eligible, d * d / gamma, _NEG)
                q, smax = _argmax_first(score, col_ids, N32)
                any_eligible = smax > _NEG

                # --- fetch the entering column's 128-wide block ---
                qb = jax.lax.div(q, np.int32(128))
                qstart = pl.multiple_of(qb * np.int32(128), 128)
                qdma = pltpu.make_async_copy(
                    A_hbm.at[bgrid, :, pl.ds(qstart, 128)], qbuf, q_sem
                )
                qdma.start()
                onehot_q = (col_ids == q).astype(jnp.float32)  # (1, N)
                c_q = jnp.sum(c * onehot_q)
                qdma.wait()
                lane = q - qb * np.int32(128)
                onehot_lane = (lane_ids == lane).astype(jnp.float32)
                a_q = jnp.sum(
                    qbuf[...] * jnp.broadcast_to(onehot_lane, (M, 128)),
                    axis=1,
                    keepdims=True,
                )  # (M, 1)

                # --- FTRAN (state-critical: full precision) ---
                w = jnp.dot(
                    Binv_s[...], a_q,
                    preferred_element_type=jnp.float32, precision=HI,
                )
                d_q = c_q - jnp.sum(pi * a_q.reshape(1, M))
                if guarded:
                    any_eligible = any_eligible & (d_q < -opt_tol)

                # --- Harris two-pass ratio test (relative delta) ---
                wc = w  # (M, 1)
                pos = wc > pivot_tol
                xBc = xB.reshape(M, 1)
                xB_eff = jnp.maximum(xBc, f0)
                safe_w = jnp.where(pos, wc, f1)
                big = jnp.float32(3.0e38)
                ratio = jnp.where(pos, xB_eff / safe_w, big)
                delta = harris_delta * (f1 + xB_eff)
                relaxed = jnp.where(pos, (xB_eff + delta) / safe_w, big)
                theta = jnp.min(relaxed)
                ok = pos & (ratio <= theta)
                any_positive = jnp.max(jnp.where(pos, f1, f0)) > fhalf
                wmax = jnp.max(jnp.where(ok, wc, _NEG))
                r = jnp.min(
                    jnp.where(ok & (wc == wmax), mrow_ids, M32)
                ).astype(jnp.int32)
                onehot_r = (mrow_ids == r).astype(jnp.float32)  # (M, 1)

                new_status = jnp.where(
                    ~any_eligible,
                    OPT32,
                    jnp.where(~any_positive, UNB32, RUN32),
                ).astype(jnp.int32)
                do = new_status == RUN32

                @pl.when(do)
                def _():
                    # --- product-form rank-1 update on the resident carry ---
                    w_r = jnp.sum(wc * onehot_r)
                    safe_wr = jnp.where(w_r != f0, w_r, f1)
                    t = jnp.sum(xB_eff * onehot_r) / safe_wr
                    Binv_old = Binv_s[...]
                    Binv_r = (
                        jnp.sum(
                            Binv_old * jnp.broadcast_to(onehot_r, (M, M)),
                            axis=0,
                            keepdims=True,
                        )
                        / safe_wr
                    )  # (1, M)
                    gamma_q = f1 + jnp.sum(wc * wc)
                    # v uses the OLD inverse — compute before the update.
                    v = jax.lax.dot_general(
                        wc, Binv_old,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1, M)
                    Binv_new = Binv_old - (
                        jnp.broadcast_to(wc, (M, M))
                        * jnp.broadcast_to(Binv_r, (M, M))
                    )
                    Binv_s[...] = jnp.where(
                        mm_row_ids == r,
                        jnp.broadcast_to(Binv_r, (M, M)),
                        Binv_new,
                    )
                    w_row = wc.reshape(1, M)
                    xB_new = xB - t * w_row
                    xB_out[0] = jnp.where(mcol_ids == r, t, xB_new)
                    leaving = jnp.sum(
                        jnp.where(mcol_ids == r, basis.astype(jnp.float32), f0)
                    ).astype(jnp.int32)
                    basis_out[0] = jnp.where(mcol_ids == r, q, basis)
                    inb_out[0] = jnp.where(
                        col_ids == q,
                        f1,
                        jnp.where(col_ids == leaving, f0, inb),
                    )
                    cB_out[0] = jnp.where(mcol_ids == r, c_q, cB)
                    pi_new = pi + d_q * Binv_r
                    pi_out[0] = pi_new

                    # --- streamed fused Goldfarb scan: (3, M) @ (M, BLK)
                    # per block, updating resident d/gamma in place ---
                    P = jnp.concatenate([pi_new, v, Binv_r], axis=0)  # (3, M)

                    def gf_blk(i, ablk):
                        start = pl.multiple_of(i * BLK32, BLK)
                        ids = i * BLK32 + blk_ids  # (1, BLK) global ids
                        S = jnp.dot(
                            P, ablk,
                            preferred_element_type=jnp.float32,
                            precision=HI if hi_scan else None,
                        )  # (3, BLK)
                        c_blk = c_ref[0, :, pl.ds(start, BLK)]
                        d_scr[:, pl.ds(start, BLK)] = c_blk - S[0:1, :]
                        inner = S[1:2, :]
                        abar = S[2:3, :]
                        g = gamma_out[0, :, pl.ds(start, BLK)]
                        g_new = jnp.maximum(
                            g - f2 * abar * inner + abar * abar * gamma_q,
                            f1 + abar * abar,
                        )
                        g_new = jnp.where(
                            ids == leaving,
                            jnp.maximum(gamma_q / (safe_wr * safe_wr), f1),
                            g_new,
                        )
                        g_new = jnp.where(ids == q, f1, g_new)
                        gamma_out[0, :, pl.ds(start, BLK)] = g_new

                    stream(gf_blk)

                    meta = meta_out[0]
                    ids8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
                    degen = meta_out[0, 0, 2]
                    degen_new = jnp.where(
                        t <= degen_tol, degen + np.int32(1), np.int32(0)
                    ).astype(jnp.int32)
                    it_new = meta_out[0, 0, 1] + np.int32(1)
                    meta_new = jnp.where(ids8 == 1, it_new, meta)
                    meta_new = jnp.where(ids8 == 2, degen_new, meta_new)
                    meta_out[0] = meta_new

                @pl.when(jnp.logical_not(do))
                def _():
                    meta = meta_out[0]
                    ids8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
                    meta_out[0] = jnp.where(ids8 == 0, new_status, meta)

            return carry

        chunk32 = np.int32(chunk)

        def step(k):
            body(k, jnp.int32(0))
            return k + np.int32(1)

        jax.lax.while_loop(lambda k: k < chunk32, step, jnp.int32(0))

        # Carry out: VMEM scratch -> HBM output slice.
        dma_out = pltpu.make_async_copy(
            Binv_s, Binv_out_hbm.at[bgrid], state_sem
        )
        dma_out.start()
        dma_out.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "opt_tol", "pivot_tol", "degen_tol", "stop_at_zero",
        "interpret", "noise_eps", "hi_scan", "col_block",
    ),
)
def batched_pivot_chunk_blocked(
    A,  # (B, M, N) f32
    c,  # (B, N)
    cand,  # (B, N) bool
    Binv,  # (B, M, M)
    xB,  # (B, M)
    pi,  # (B, M)
    basis,  # (B, M) int32
    in_basis,  # (B, N) bool
    gamma,  # (B, N)
    status,  # (B,) int32
    iteration,  # (B,) int32
    degen,  # (B,) int32
    *,
    chunk: int,
    opt_tol: float,
    pivot_tol: float,
    degen_tol: float,
    stop_at_zero: bool = False,
    interpret: bool = False,
    noise_eps: float = 0.0,
    hi_scan: bool = False,
    col_block: int = 512,
):
    """Row-blocked megakernel: same contract as :func:`batched_pivot_chunk`
    for shapes where the tableau cannot stay VMEM-resident (m >= 1024).
    The tableau is streamed from HBM per pivot; B^-1 and all vector state
    stay in VMEM for the whole chunk."""
    B, M, N = A.shape
    BLK = min(col_block, N)
    if N % BLK or BLK % 128 or M % 8:
        raise ValueError(f"blocked megakernel needs N%{BLK}==0, BLK%128==0, "
                         f"M%8==0 (got M={M}, N={N})")
    f32 = jnp.float32
    cB = jnp.take_along_axis(c, basis, axis=1).astype(f32)  # (B, M)
    meta = jnp.stack(
        [status, iteration, degen, jnp.zeros_like(status)], axis=1
    ).astype(jnp.int32)
    meta = jnp.concatenate(
        [meta, jnp.zeros((B, 4), jnp.int32)], axis=1
    )  # (B, 8)

    zero = np.int32(0)
    _b = lambda b: b
    full = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda b: (_b(b),) + (zero,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    vec_n = full((1, N))
    vec_m = full((1, M))
    vec_meta = full((1, 8))

    kernel = _make_blocked_kernel(
        chunk, opt_tol, pivot_tol, degen_tol, stop_at_zero, M, N, BLK,
        noise_eps=noise_eps, hi_scan=hi_scan,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, M, M), f32),
        jax.ShapeDtypeStruct((B, 1, M), f32),
        jax.ShapeDtypeStruct((B, 1, M), f32),
        jax.ShapeDtypeStruct((B, 1, M), f32),
        jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, N), f32),
        jax.ShapeDtypeStruct((B, 1, N), f32),
        jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
    ]
    lift = lambda x: x[:, None, :]
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            hbm,  # A (streamed)
            vec_n,  # c
            vec_n,  # cand
            hbm,  # Binv (DMA'd to scratch)
            vec_m,  # xB
            vec_m,  # pi
            vec_m,  # cB
            vec_m,  # basis
            vec_n,  # in_basis
            vec_n,  # gamma
            vec_meta,  # meta
        ],
        out_specs=[
            hbm,
            vec_m,
            vec_m,
            vec_m,
            vec_m,
            vec_n,
            vec_n,
            vec_meta,
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((M, M), f32),
            pltpu.VMEM((2, M, BLK), f32),
            pltpu.VMEM((M, 128), f32),
            pltpu.VMEM((1, N), f32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3, 7: 4, 8: 5, 9: 6,
                              10: 7},
        interpret=interpret,
    )(
        A.astype(f32),
        lift(c.astype(f32)),
        lift(cand.astype(f32)),
        Binv.astype(f32),
        lift(xB.astype(f32)),
        lift(pi.astype(f32)),
        lift(cB),
        lift(basis.astype(jnp.int32)),
        lift(in_basis.astype(f32)),
        lift(gamma.astype(f32)),
        lift(meta),
    )
    Binv_o, xB_o, pi_o, _cB_o, basis_o, inb_o, gamma_o, meta_o = outs
    return (
        Binv_o,
        xB_o[:, 0],
        pi_o[:, 0],
        basis_o[:, 0].astype(jnp.int32),
        inb_o[:, 0] > 0.5,
        gamma_o[:, 0],
        meta_o[:, 0, 0],
        meta_o[:, 0, 1],
        meta_o[:, 0, 2],
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk", "opt_tol", "pivot_tol", "degen_tol", "stop_at_zero",
        "interpret", "noise_eps", "hi_scan",
    ),
)
def batched_pivot_chunk(
    A,  # (B, M, N) f32
    c,  # (B, N)
    cand,  # (B, N) bool
    Binv,  # (B, M, M)
    xB,  # (B, M)
    pi,  # (B, M)
    basis,  # (B, M) int32
    in_basis,  # (B, N) bool
    gamma,  # (B, N)
    status,  # (B,) int32
    iteration,  # (B,) int32
    degen,  # (B,) int32
    *,
    chunk: int,
    opt_tol: float,
    pivot_tol: float,
    degen_tol: float,
    stop_at_zero: bool = False,
    interpret: bool = False,
    noise_eps: float = 0.0,
    hi_scan: bool = False,
):
    """Run up to ``chunk`` steepest-edge pivots for every LP in the batch.

    Returns (Binv, xB, pi, basis, in_basis, gamma, status, iteration, degen)
    updated — the same contract as the vmapped XLA path in
    ``relp_tpu.parallel.batch.batched_run_chunk`` (f32, same-precision
    scans, steepest pricing).
    """
    B, M, N = A.shape
    f32 = jnp.float32
    cB = jnp.take_along_axis(c, basis, axis=1).astype(f32)  # (B, M)
    meta = jnp.stack(
        [status, iteration, degen, jnp.zeros_like(status)], axis=1
    ).astype(jnp.int32)
    meta = jnp.concatenate(
        [meta, jnp.zeros((B, 4), jnp.int32)], axis=1
    )  # (B, 8)

    zero = np.int32(0)
    _b = lambda b: b
    # Mosaic requires the last two block dims divisible by (8, 128) or equal
    # to the array dims, so (B, K) vectors are lifted to (B, 1, K) with
    # (1, 1, K) blocks.
    full = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda b: (_b(b),) + (zero,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    vec_n = full((1, N))
    vec_m = full((1, M))
    vec_meta = full((1, 8))

    kernel = _make_kernel(
        chunk, opt_tol, pivot_tol, degen_tol, stop_at_zero, M, N,
        noise_eps=noise_eps, hi_scan=hi_scan,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((B, M, M), f32),
        jax.ShapeDtypeStruct((B, 1, M), f32),
        jax.ShapeDtypeStruct((B, 1, M), f32),
        jax.ShapeDtypeStruct((B, 1, M), f32),
        jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
        jax.ShapeDtypeStruct((B, 1, N), f32),
        jax.ShapeDtypeStruct((B, 1, N), f32),
        jax.ShapeDtypeStruct((B, 1, 8), jnp.int32),
    ]
    lift = lambda x: x[:, None, :]
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            full((M, N)),  # A
            vec_n,  # c
            vec_n,  # cand
            full((M, M)),  # Binv
            vec_m,  # xB
            vec_m,  # pi
            vec_m,  # cB
            vec_m,  # basis
            vec_n,  # in_basis
            vec_n,  # gamma
            vec_meta,  # meta
        ],
        out_specs=[
            full((M, M)),
            vec_m,
            vec_m,
            vec_m,
            vec_m,
            vec_n,
            vec_n,
            vec_meta,
        ],
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((1, N), f32)],
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3, 7: 4, 8: 5, 9: 6, 10: 7},
        interpret=interpret,
    )(
        A.astype(f32),
        lift(c.astype(f32)),
        lift(cand.astype(f32)),
        Binv.astype(f32),
        lift(xB.astype(f32)),
        lift(pi.astype(f32)),
        lift(cB),
        lift(basis.astype(jnp.int32)),
        lift(in_basis.astype(f32)),
        lift(gamma.astype(f32)),
        lift(meta),
    )
    Binv_o, xB_o, pi_o, _cB_o, basis_o, inb_o, gamma_o, meta_o = outs
    return (
        Binv_o,
        xB_o[:, 0],
        pi_o[:, 0],
        basis_o[:, 0].astype(jnp.int32),
        inb_o[:, 0] > 0.5,
        gamma_o[:, 0],
        meta_o[:, 0, 0],
        meta_o[:, 0, 1],
        meta_o[:, 0, 2],
    )
