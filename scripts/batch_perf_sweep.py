"""Batched-pivot throughput sweep over (B, m) buckets (VERDICT r3 #7).

Measures, per shape bucket, marginal batched pivots/s of
  * the fused Pallas megakernel (ops/pallas_batch.py),
  * the vmapped XLA step (parallel/batch.batched_run_chunk),
  * the vmapped XLA step with the DEVICE-side refactorization cadence
    (refactor_period inside the jitted chunk, Newton-Schulz refresh) —
    untried on chip until round 4 (docs/ROADMAP.md).

Methodology: interleaved A/B chunk differencing with per-process entropy
(CLAUDE.md TPU benchmarking gotchas) — identical dispatches can be served
from the axon tunnel cache, and fixed dispatch overhead must cancel.

Usage: python scripts/batch_perf_sweep.py [--reps 4]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_ENTROPY = float(np.random.default_rng().uniform(0.5, 1.5))

SHAPES = [
    # (B, m, n)
    (64, 256, 512),   # the r3 bench shape (388k mega / 289k xla pivots/s)
    (128, 256, 512),
    (256, 256, 512),
    (64, 512, 1024),
    (128, 512, 1024),
    (32, 1024, 2048),
]


def measure(run_batch, reps, chunks=(10, 120)):
    for chunk in chunks:  # compile outside the timed region
        run_batch(chunk, -1)
    estimates = []
    d_big_all, i_b = [], 0
    for rep in range(reps):
        d_s, i_s = run_batch(chunks[0], rep)
        d_b, i_b = run_batch(chunks[1], rep)
        d_big_all.append(d_b)
        if i_b > i_s and d_b > d_s:
            estimates.append((d_b - d_s) / (i_b - i_s))
    if estimates:
        return float(np.median(estimates))
    if i_b > 0:
        return min(d_big_all) / i_b
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--shapes", default=None,
                    help="comma list like 64x256,128x512 to restrict")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import _make_state, _synthetic_problem
    from relp_tpu.parallel.batch import (
        batched_run_chunk,
        make_batch_state,
        megakernel_applicable,
        megakernel_run_chunk,
    )
    from relp_tpu.simplex import kernels
    from relp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)

    shapes = SHAPES
    if args.shapes:
        keep = set(args.shapes.split(","))
        shapes = [s for s in SHAPES if f"{s[0]}x{s[1]}" in keep]

    results = []
    for B, mb, nb in shapes:
        states, As, bs, cs, cands = [], [], [], [], []
        for s in range(B):
            Ab, bb, c1b, c2b, candb, basisb = _synthetic_problem(
                m=mb, n=nb, pad=128, seed=100 + s, dtype=np.float32
            )
            states.append(_make_state(Ab, bb, c1b, basisb))
            As.append(Ab)
            bs.append(bb)
            cs.append(c1b)
            cands.append(candb)
        batch = make_batch_state(states)
        A_b = jnp.asarray(np.stack(As))
        b_b = jnp.asarray(np.stack(bs))
        c_b = jnp.asarray(np.stack(cs))
        cand_b = jnp.asarray(np.stack(cands))
        common = dict(opt_tol=1e-7, pivot_tol=1e-7, degen_tol=1e-7)

        def run_mega(chunk, rep):
            st = batch._replace(xB=batch.xB + (_ENTROPY * 1e-9 * (rep + 1)))
            t0 = time.time()
            out = megakernel_run_chunk(
                st, A_b, c_b, cand_b, chunk=chunk, **common
            )
            total = int(np.asarray(out.iteration).sum())
            return time.time() - t0, total

        def run_xla(chunk, rep):
            st = batch._replace(xB=batch.xB + (_ENTROPY * 1e-9 * (rep + 1)))
            t0 = time.time()
            out = batched_run_chunk(
                st, A_b, A_b, c_b, cand_b,
                pricing=kernels.PRICE_STEEPEST, chunk=chunk, **common,
            )
            total = int(np.asarray(out.iteration).sum())
            return time.time() - t0, total

        def run_xla_cadence(chunk, rep):
            st = batch._replace(xB=batch.xB + (_ENTROPY * 1e-9 * (rep + 1)))
            t0 = time.time()
            out = batched_run_chunk(
                st, A_b, A_b, c_b, cand_b,
                pricing=kernels.PRICE_STEEPEST, chunk=chunk,
                refactor_period=60, b=b_b, newton_steps=1, **common,
            )
            total = int(np.asarray(out.iteration).sum())
            return time.time() - t0, total

        rec = {"B": B, "m": mb, "n": nb}
        if megakernel_applicable(A_b, "float32", "same",
                                 kernels.PRICE_STEEPEST):
            try:
                per = measure(run_mega, args.reps)
                rec["megakernel_pivots_per_s"] = (
                    round(1.0 / per, 1) if per else None
                )
            except Exception as exc:  # noqa: BLE001 — e.g. VMEM overflow
                rec["megakernel_pivots_per_s"] = f"failed: {type(exc).__name__}"
        per = measure(run_xla, args.reps)
        rec["xla_pivots_per_s"] = round(1.0 / per, 1) if per else None
        # Device cadence: chunk large enough to amortize + cross a refactor.
        per = measure(run_xla_cadence, args.reps)
        rec["xla_device_cadence_pivots_per_s"] = (
            round(1.0 / per, 1) if per else None
        )
        print(json.dumps(rec), flush=True)
        results.append(rec)

    if args.out:
        with open(args.out, "a") as f:
            for rec in results:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
