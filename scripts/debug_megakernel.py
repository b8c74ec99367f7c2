"""Diagnose the megakernel batch path on real TPU hardware.

Replicates the scenario batch driver's phase-1/phase-2 chunk loop outside
jit (the axon tunnel has no debug-callback support), pulling per-chunk
status/obj/iteration to the host, so the end-to-end non-convergence (all
LPs falling back) can be localized: does the megakernel pivot at all, does
it cycle, or does the between-chunk Newton refresh undo its progress?

Usage: python scripts/debug_megakernel.py [--batch 8] [--xla]
"""

import argparse
import copy
import os
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--problem", default="ADLITTLE")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--xla", action="store_true", help="XLA path instead")
    parser.add_argument("--chunk", type=int, default=150)
    parser.add_argument("--max-chunks", type=int, default=12)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from relp_tpu.config import SolverConfig
    from relp_tpu.io import mps_to_general_form, parse_fixed
    from relp_tpu.parallel.batch import (
        batched_run_chunk,
        make_batch_state,
        megakernel_run_chunk,
    )
    from relp_tpu.simplex import kernels
    from relp_tpu.simplex.driver import _PRICING_CODES
    from relp_tpu.simplex.engine import DenseEngine
    from relp_tpu.simplex.kernels import PRICE_STEEPEST
    from relp_tpu.simplex.lowering import lower_provider
    from relp_tpu.simplex.state import RUNNING

    path = f"/root/reference/tests/netlib/problem_files/{args.problem}.SIF"
    base = mps_to_general_form(parse_fixed(open(path).read()))
    base.presolve()
    counts = base.standardize()
    print(f"device: {jax.devices()[0]}", flush=True)

    providers = []
    for s in range(args.batch):
        gf = copy.deepcopy(base)
        for i in range(len(gf.b)):
            wobble = Fraction((s * 7919 + i * 104729) % 2001 - 1000, 100_000)
            gf.b[i] = gf.b[i] * (1 + wobble)
        providers.append(gf.derive_matrix_data(counts))

    cfg = SolverConfig(pad_to=128, chunk_size=args.chunk)
    dtype = np.float32
    engine = DenseEngine()
    max_rows = max(p.nr_rows() for p in providers)
    from relp_tpu.linalg.device import pad_to_multiple

    probe_M = pad_to_multiple(max(max_rows, 1), cfg.pad_to)
    max_cols = max(p.nr_columns() + probe_M for p in providers)
    import dataclasses

    base_low = lower_provider(
        providers[0], dtype=dtype, pad_to=cfg.pad_to,
        equilibrate=cfg.prescale, min_rows=max_rows, min_cols=max_cols,
    )
    problems = []
    for p in providers:
        b_k = np.zeros(base_low.M, dtype=dtype)
        for i, v in enumerate(p.right_hand_side()):
            b_k[i] = float(v)
        if base_low.row_scale is not None:
            b_k *= base_low.row_scale
        problems.append(dataclasses.replace(base_low, b=b_k, provider=p))
    M, N = problems[0].M, problems[0].N
    print(f"lowered shape M={M} N={N} B={len(problems)}", flush=True)

    A = jnp.asarray(np.stack([pr.A for pr in problems]))
    b = jnp.asarray(np.stack([pr.b for pr in problems]))
    c1 = jnp.asarray(np.stack([pr.c_phase1 for pr in problems]))
    c2 = jnp.asarray(np.stack([pr.c_phase2 for pr in problems]))
    cand = jnp.asarray(np.stack([pr.candidate_mask for pr in problems]))
    batch = make_batch_state([engine.init_state(pr, cfg) for pr in problems])

    v_gamma = jax.jit(jax.vmap(kernels.recompute_gamma, in_axes=(0, 0, 0)))
    v_newton = jax.jit(
        jax.vmap(
            lambda Binv, A, b, c, basis: kernels.newton_refresh(
                Binv, A, b, c, basis, steps=2
            ),
            in_axes=(0, 0, 0, 0, 0),
        )
    )
    kw = dict(
        chunk=cfg.chunk_size, opt_tol=cfg.opt_tol,
        pivot_tol=cfg.pivot_tol, degen_tol=cfg.feas_tol,
    )

    def run_chunk(batch, c, stop_at_zero):
        if args.xla:
            return batched_run_chunk(
                batch, A, A, c, cand, stop_at_zero=stop_at_zero,
                pricing=PRICE_STEEPEST, **kw,
            )
        return megakernel_run_chunk(
            batch, A, c, cand, stop_at_zero=stop_at_zero, **kw
        )

    def show(tag, batch):
        st = np.asarray(batch.status)
        it = np.asarray(batch.iteration)
        obj = np.asarray(batch.obj)
        print(
            f"  [{tag}] running={int((st == RUNNING).sum())} "
            f"status={st.tolist()} iter=[{it.min()},{it.max()}] "
            f"obj=[{obj.min():.6g},{obj.max():.6g}]",
            flush=True,
        )

    def run_phase(batch, c, stop_at_zero, tag):
        batch = batch._replace(gamma=v_gamma(batch.Binv, A, batch.in_basis))
        for k in range(args.max_chunks):
            batch = run_chunk(batch, c, stop_at_zero)
            show(f"{tag} chunk{k}", batch)
            st = np.asarray(batch.status)
            obj = np.asarray(batch.obj)
            running = st == RUNNING
            if stop_at_zero:
                running = running & (obj > 1e-9)
            # Newton refresh like the driver's fused step.
            Binv, xB, pi, obj_j, res = v_newton(batch.Binv, A, b, c, batch.basis)
            xB = jnp.where(xB > -cfg.feas_tol, jnp.maximum(xB, 0.0), xB)
            batch = batch._replace(Binv=Binv, xB=xB, pi=pi, obj=obj_j)
            batch = batch._replace(gamma=v_gamma(Binv, A, batch.in_basis))
            print(f"    refresh residual={np.asarray(res).max():.3g}", flush=True)
            if not running.any():
                break
        return batch

    t0 = time.time()
    batch = run_phase(batch, c1, True, "p1")
    feasible = np.asarray(batch.obj) <= cfg.phase1_tol
    print(f"phase1 feasible: {feasible.tolist()}", flush=True)
    status = np.where(feasible, RUNNING, np.asarray(batch.status))
    batch = batch._replace(status=jnp.asarray(status.astype(np.int32)))
    batch = run_phase(batch, c2, False, "p2")
    print(f"total {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
