"""First-order (PDHG) throughput at scale on the TPU.

The PDHG inner loop is two MXU matvecs + a box projection per iteration —
no pivot sequencing, no basis, nothing host-bound — so it is the method
whose throughput actually scales with problem size on this hardware.
This probe measures steady-state PDHG iterations/s at growing (m, n) on a
synthetic feasible box LP, with the dispatch-count and cache effects
handled the way bench.py does (chunk differencing, per-process entropy).

Usage: python scripts/pdhg_scale_probe.py [--sizes 1024x4096 2048x8192 ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_box_lp(m, n, seed=0):
    """Feasible, bounded standard-form LP: A >= 0 dense-ish, b = A x_feas,
    box 0 <= x <= u with u finite on a third of the columns."""
    rng = np.random.default_rng(seed)
    A = np.abs(rng.standard_normal((m, n))).astype(np.float64) + 0.05
    x_feas = np.abs(rng.standard_normal(n))
    b = A @ x_feas
    c = rng.standard_normal(n)
    u = np.full(n, np.inf)
    u[::3] = np.abs(rng.standard_normal((n + 2) // 3)) * 2 + 1.0
    return A, b, c, u


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="*",
                    default=["1024x4096", "2048x8192", "4096x16384"])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from relp_tpu.firstorder.pdhg import (
        _pdhg_chunk_jitted,
        ruiz_equilibrate,
    )

    print(f"device: {jax.devices()[0]}", flush=True)
    entropy = float(np.random.default_rng().uniform(0.5, 1.5))

    for size in args.sizes:
        m, n = (int(v) for v in size.split("x"))
        A_np, b_np, c_np, u_np = synthetic_box_lp(m, n)
        As, dr, dc = ruiz_equilibrate(A_np)
        A = jnp.asarray(As, jnp.float32)
        b = jnp.asarray((b_np * dr), jnp.float32)
        c = jnp.asarray((c_np * dc), jnp.float32)
        u = jnp.asarray((u_np / dc), jnp.float32)
        x = jnp.zeros(n, jnp.float32)
        y = jnp.zeros(m, jnp.float32)
        chunk_fn = _pdhg_chunk_jitted()

        def run(chunk, rep):
            xs = x + jnp.asarray(entropy * 1e-9 * (rep + 1), jnp.float32)
            t0 = time.time()
            out = chunk_fn(
                xs, y, xs, y, 0.0, 1e-3, 1e-3, A, b, c, u, chunk=chunk
            )
            float(out[0][0])  # force
            return time.time() - t0

        for chunk in (20, 400):
            run(chunk, -1)  # compile
        ests = []
        for rep in range(args.reps):
            d_s = run(20, rep)
            d_b = run(400, rep)
            if d_b > d_s:
                ests.append((d_b - d_s) / 380.0)
        if not ests:
            print(f"{size}: contention, no estimate", flush=True)
            continue
        per_iter = float(np.median(ests))
        flops = 2 * 2 * m * n  # two matvecs
        print(
            f"{size:>12s}: {1.0 / per_iter:10.0f} PDHG iters/s  "
            f"({per_iter * 1e6:7.1f} us/iter, "
            f"{flops / per_iter / 1e12:6.2f} TFLOP/s sustained)",
            flush=True,
        )


if __name__ == "__main__":
    main()
