"""Measure the fused batched-pivot megakernel vs the vmapped XLA path.

Interleaved A/B runs (CLAUDE.md benchmarking rules: per-rep distinct
dispatches, chunk differencing to cancel the ~35 ms tunnel overhead,
median of positive per-rep estimates).

Usage:  python scripts/pallas_batch_probe.py [--batch 64] [--m 256] [--n 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--m", type=int, default=256)
    parser.add_argument("--n", type=int, default=512)
    parser.add_argument("--chunks", type=int, nargs=2, default=(10, 120))
    parser.add_argument("--reps", type=int, default=4)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_state, _synthetic_problem
    from relp_tpu.parallel.batch import (
        batched_run_chunk,
        make_batch_state,
        megakernel_run_chunk,
    )
    from relp_tpu.simplex.kernels import PRICE_STEEPEST

    B, m, n = args.batch, args.m, args.n
    states, As, cs, cands = [], [], [], []
    for s in range(B):
        A, b, c1, c2, cand, basis = _synthetic_problem(
            m=m, n=n, pad=128, seed=100 + s, dtype=np.float32
        )
        states.append(_make_state(A, b, c1, basis))
        As.append(A)
        cs.append(c1)
        cands.append(cand)
    batch = make_batch_state(states)
    A = jnp.asarray(np.stack(As))
    c = jnp.asarray(np.stack(cs))
    cand = jnp.asarray(np.stack(cands))
    print(f"B={B} shapes A={A.shape}", flush=True)

    tol = dict(opt_tol=1e-7, pivot_tol=1e-7, degen_tol=1e-7)
    interpret = jax.default_backend() == "cpu"

    def run_xla(chunk, rep):
        st = batch._replace(xB=batch.xB + 1e-9 * (rep + 2))
        t0 = time.time()
        out = batched_run_chunk(
            st, A, A, c, cand, pricing=PRICE_STEEPEST, chunk=chunk, **tol
        )
        total = int(np.asarray(out.iteration).sum())
        return time.time() - t0, total

    def run_pal(chunk, rep):
        st = batch._replace(xB=batch.xB + 1e-9 * (rep + 2))
        t0 = time.time()
        out = megakernel_run_chunk(
            st, A, c, cand, chunk=chunk, interpret=interpret, **tol
        )
        total = int(np.asarray(out.iteration).sum())
        return time.time() - t0, total

    # Compile both shapes for both paths outside the timed region; also
    # sanity-check the two paths agree on the work done.
    for chunk in args.chunks:
        _, i_x = run_xla(chunk, -1)
        _, i_p = run_pal(chunk, -1)
        print(f"chunk={chunk}: xla iters {i_x}, pallas iters {i_p}", flush=True)

    results = {}
    for name, runner in (("xla", run_xla), ("pallas", run_pal)):
        estimates, d_big_all, i_big = [], [], 0
        for rep in range(args.reps):
            d_s, i_s = runner(args.chunks[0], rep)
            d_b, i_big = runner(args.chunks[1], rep)
            d_big_all.append(d_b)
            if i_big > i_s and d_b > d_s:
                estimates.append((d_b - d_s) / (i_big - i_s))
        per = (
            float(np.median(estimates))
            if estimates
            else (min(d_big_all) / i_big if i_big else float("nan"))
        )
        results[name] = {
            "us_per_pivot": round(per * 1e6, 2),
            "pivots_per_s": round(1.0 / per, 1),
            "estimates_used": len(estimates),
        }
        print(name, results[name], flush=True)

    if "xla" in results and "pallas" in results:
        speedup = (
            results["xla"]["us_per_pivot"] / results["pallas"]["us_per_pivot"]
        )
        results["speedup"] = round(speedup, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
