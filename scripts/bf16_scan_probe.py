"""One-off probe: bf16 pricing scans vs f32 on the chip.

The f32 fast path is memory-bound at ~1 full tableau read per pivot
(26.6 us at m=1024, n=5120 f32 = 21 MB over ~819 GB/s HBM).  bf16 scans
halve the scanned bytes; this measures the realized per-pivot speedup and
the iteration-count impact of the noisier pricing.

Usage: python scripts/bf16_scan_probe.py [m] [n]
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

    def measure(A_scan, label, chunks=(10, 300)):
        kw = dict(
            pricing=kernels.PRICE_STEEPEST,
            opt_tol=1e-7,
            pivot_tol=1e-7,
            degen_tol=1e-7,
        )

        def run(chunk, reps=3):
            out = kernels.run_chunk(state0, A_scan, A_d, c_d, cand_d,
                                    chunk=chunk, **kw)
            _ = int(out.iteration)
            best = float("inf")
            iters = 0
            for _ in range(reps):
                t0 = time.time()
                out = kernels.run_chunk(state0, A_scan, A_d, c_d, cand_d,
                                        chunk=chunk, **kw)
                iters = int(out.iteration)
                best = min(best, time.time() - t0)
            return best, iters

        d_s, i_s = run(chunks[0])
        d_b, i_b = run(chunks[1])
        per_it = (d_b - d_s) / (i_b - i_s) if i_b > i_s else float("nan")
        print(
            f"{label}: {per_it*1e6:.1f} us/pivot "
            f"({i_b} pivots in big chunk, {d_b*1e3:.1f} ms)",
            flush=True,
        )
        return per_it

    per_f32 = measure(A_d, "f32 scans")
    per_bf16 = measure(A_d.astype(jnp.bfloat16), "bf16 scans")
    if per_f32 == per_f32 and per_bf16 == per_bf16:
        print(f"speedup: {per_f32/per_bf16:.2f}x", flush=True)


if __name__ == "__main__":
    main()
