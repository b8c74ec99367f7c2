"""Benchmark: simplex pivot throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: simplex iterations/s of the fused device hot loop (pricing
matvec + FTRAN + ratio test + rank-1 inverse update + steepest-edge update)
on a dense 1024x4096 standard-form tableau — the workload class where the
reference's netlib "#[ignore]d as too computationally intensive" problems
live.

Baseline: the reference publishes no numbers (BASELINE.md); as a proxy we
use 1,000 exact-rational iterations/s for single-core RELP on problems of
this size — generous for arbitrary-precision arithmetic on an m~1000 basis,
where a single sparse FTRAN/BTRAN plus a full pricing scan each touch
hundreds of thousands of rational multiplies with GMP-scale coefficients.
vs_baseline = measured / 1000.
"""

import json
import sys
import time

import numpy as np

RELP_PROXY_ITERS_PER_S = 1000.0


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import _make_state, _synthetic_problem
    from relp_tpu.simplex import kernels
    from relp_tpu.simplex.state import RUNNING

    m, n = 1024, 4096
    A, b, c1, c2, cand, basis = _synthetic_problem(m=m, n=n, pad=128, seed=7)
    state0 = _make_state(A, b, c1, basis)
    A_d = jnp.asarray(A)
    A_scan = A_d.astype(jnp.float32)
    c_d = jnp.asarray(c1)
    cand_d = jnp.asarray(cand)

    chunk = 100
    kwargs = dict(
        pricing=kernels.PRICE_STEEPEST,
        chunk=chunk,
        opt_tol=1e-9,
        pivot_tol=1e-9,
        degen_tol=1e-9,
    )

    # Warm up (compile) and confirm the loop actually pivots.
    state = kernels.run_chunk(state0, A_scan, A_d, c_d, cand_d, **kwargs)
    jax.block_until_ready(state)
    if int(state.iteration) == 0:
        print(
            json.dumps(
                {
                    "metric": "simplex_iterations_per_s",
                    "value": 0.0,
                    "unit": "iter/s",
                    "vs_baseline": 0.0,
                    "error": "no pivots taken",
                }
            )
        )
        return

    # Timed: repeatedly restart from the initial state (fresh pivots each
    # time; phase-1 on this problem takes >> 3*chunk iterations).
    reps = 3
    total_iters = 0
    t0 = time.time()
    for _ in range(reps):
        out = kernels.run_chunk(state0, A_scan, A_d, c_d, cand_d, **kwargs)
        jax.block_until_ready(out)
        total_iters += int(out.iteration)
    elapsed = time.time() - t0
    iters_per_s = total_iters / elapsed

    result = {
        "metric": "simplex_iterations_per_s",
        "value": round(iters_per_s, 2),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_s / RELP_PROXY_ITERS_PER_S, 3),
        "detail": {
            "problem": f"dense {m}x{n} standard form + {m} artificials",
            "pricing": "steepest-edge",
            "dtype": "float64 carry + float32 scans",
            "chunk": chunk,
            "reps": reps,
            "total_iterations": total_iters,
            "elapsed_s": round(elapsed, 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
