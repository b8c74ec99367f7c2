"""Probe: where do the batched scenario chunks spend device time?

The bench's marginal in-loop rate (~280 us per lockstep iteration at
B=64, m=256, n=512) is ~50x faster than what scripts/batch_scenarios.py
achieves end-to-end per lockstep iteration.  This isolates the
configuration deltas one at a time on the same synthetic batch:

  noisy_scan True/False   (the TPU bf16-noise recheck in make_iteration)
  hi_scan True/False      (HIGHEST-precision full scans)
  refactor_period         (in-chunk vmapped Newton refresh)
  active-mask freezing    (most LPs done, a few stragglers running)

Usage: python scripts/probe_batch_overhead.py [--B 64] [--m 256] [--n 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--chunks", type=int, nargs=2, default=(10, 120))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_state, _synthetic_problem
    _ENTROPY = float(np.random.default_rng().uniform(0.5, 1.5))
    from relp_tpu.simplex import kernels
    from relp_tpu.parallel.batch import batched_run_chunk, make_batch_state

    print(f"device: {jax.devices()[0]}", flush=True)

    B, mb, nb = args.B, args.m, args.n
    states, As, cs, cands, bs = [], [], [], [], []
    for s in range(B):
        Ab, bb, c1b, c2b, candb, basisb = _synthetic_problem(
            m=mb, n=nb, pad=128, seed=100 + s, dtype=np.float32
        )
        states.append(_make_state(Ab, bb, c1b, basisb))
        As.append(Ab)
        cs.append(c1b)
        cands.append(candb)
        bs.append(bb)
    batch = make_batch_state(states)
    A_b = jnp.asarray(np.stack(As))
    c_b = jnp.asarray(np.stack(cs))
    cand_b = jnp.asarray(np.stack(cands))
    b_b = jnp.asarray(np.stack(bs))

    def run(chunk, rep, *, tols=1e-7, **kw):
        st = batch._replace(xB=batch.xB + (_ENTROPY * 1e-9 * (rep + 1)))
        t0 = time.time()
        out = batched_run_chunk(
            st, A_b, A_b, c_b, cand_b,
            pricing=kernels.PRICE_STEEPEST, chunk=chunk,
            opt_tol=tols, pivot_tol=tols, degen_tol=tols, **kw,
        )
        total = int(np.asarray(out.iteration).sum())
        return time.time() - t0, total

    def measure(label, *, chunks=None, **kw):
        small, big = chunks or args.chunks
        for chunk in (small, big):
            run(chunk, -1, **kw)
        ests = []
        for rep in range(3):
            d_s, i_s = run(small, rep, **kw)
            d_b, i_b = run(big, rep, **kw)
            if i_b > i_s and d_b > d_s:
                ests.append((d_b - d_s) / (i_b - i_s) * 1e6)
        med = float(np.median(ests)) if ests else float("nan")
        per_lockstep = med * B
        print(f"{label:55s} {med:9.2f} us/pivot  "
              f"({per_lockstep/1000:8.3f} ms/lockstep-iter)", flush=True)

    measure("plain (bench config)")
    measure("noisy_scan=True", noisy_scan=True)
    measure("hi_scan=True", hi_scan=True)
    # Chunks must straddle the period or the in-chunk refresh never fires.
    measure("noisy+refactor_period=150 (chunks 10/320)", noisy_scan=True,
            refactor_period=150, b=b_b, chunks=(10, 320))
    measure("tolerances 1e-5 (f32-clamped)", noisy_scan=True, tols=1e-5)


if __name__ == "__main__":
    main()
