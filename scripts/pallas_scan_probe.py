"""Measure the Pallas fused pricing scan vs the XLA path on the chip.

Same marginal-chunk methodology as bench.py: per-pivot time of the fused
iteration with pallas_scan on/off at the bench shape (m=1024, n=4096).

Usage: python scripts/pallas_scan_probe.py [m] [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import _make_state, _synthetic_problem
    from relp_tpu.simplex import kernels

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    A, b, c1, c2, cand, basis = _synthetic_problem(
        m=m, n=n, pad=128, seed=7, dtype=np.float32
    )
    state0 = _make_state(A, b, c1, basis)
    A_d = jnp.asarray(A)
    c_d = jnp.asarray(c1)
    cand_d = jnp.asarray(cand)

    def measure(pallas, label, chunks=(10, 300)):
        kw = dict(
            pricing=kernels.PRICE_STEEPEST,
            opt_tol=1e-7,
            pivot_tol=1e-7,
            degen_tol=1e-7,
            pallas_scan=pallas,
        )

        def run(chunk, reps=3):
            out = kernels.run_chunk(state0, A_d, A_d, c_d, cand_d,
                                    chunk=chunk, **kw)
            _ = int(out.iteration)
            best = float("inf")
            iters = 0
            for _ in range(reps):
                t0 = time.time()
                out = kernels.run_chunk(state0, A_d, A_d, c_d, cand_d,
                                        chunk=chunk, **kw)
                iters = int(out.iteration)
                best = min(best, time.time() - t0)
            return best, iters

        d_s, i_s = run(chunks[0])
        d_b, i_b = run(chunks[1])
        per_it = (d_b - d_s) / (i_b - i_s) if i_b > i_s else float("nan")
        print(
            f"{label}: {per_it*1e6:.1f} us/pivot "
            f"({i_b} pivots, chunk wall {d_b*1e3:.1f} ms)",
            flush=True,
        )
        return per_it

    per_xla = measure(False, "XLA stacked scan")
    per_pallas = measure(True, "Pallas fused scan")
    if per_xla == per_xla and per_pallas == per_pallas:
        print(f"pallas speedup: {per_xla/per_pallas:.3f}x", flush=True)


if __name__ == "__main__":
    main()
