"""Where do big-bucket chunk exits spend their time?

Times, at netlib bucket shapes, the three per-chunk-exit device ops the
driver runs between fused chunks — full refactorize (jnp.linalg.inv +
Newton), newton_refresh from a warm inverse, and recompute_gamma — plus
their residuals, to answer:

1. does kernels.refactorize's f32 residual exceed the engine's 1e-6
   fallback gate at large m (sending every chunk exit through host LAPACK)?
2. what does each op cost at (512, 2304, 5120) rows?

Usage: python scripts/probe_refactor_cost.py [--rows 5120] [--cols 19200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="*", default=["512x2048", "2304x6912", "5120x19200"])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from relp_tpu.simplex import kernels
    from relp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)

    for shape in args.shapes:
        M, N = (int(v) for v in shape.split("x"))
        rng = np.random.default_rng(0)
        # Well-conditioned sparse-ish system with an identity block so the
        # random basis is representative of a netlib slack-heavy basis.
        A_np = np.zeros((M, N), dtype=np.float32)
        dens = rng.standard_normal((M, N)).astype(np.float32)
        mask = rng.random((M, N)) < 0.02
        A_np += dens * mask
        A_np[:, :M] += np.eye(M, dtype=np.float32) * 4.0
        b_np = np.abs(rng.standard_normal(M)).astype(np.float32)
        c_np = rng.standard_normal(N).astype(np.float32)
        basis = np.arange(M, dtype=np.int32)
        basis[: M // 3] = M + rng.choice(N - M, M // 3, replace=False)

        A = jnp.asarray(A_np)
        b = jnp.asarray(b_np)
        c = jnp.asarray(c_np)
        bas = jnp.asarray(basis)

        def timed(fn, *xs, reps=args.reps):
            out = fn(*xs)
            jax.block_until_ready(out)
            t0 = time.time()
            for _ in range(reps):
                out = fn(*xs)
                jax.block_until_ready(out)
            return out, (time.time() - t0) / reps

        out, t_full = timed(
            lambda: kernels.refactorize(A, b, c, bas, newton_steps=1)
        )
        Binv, _, _, _, res_full = out
        out2, t_refresh = timed(
            lambda: kernels.newton_refresh(Binv, A, b, c, bas, steps=2)
        )
        res_refresh = out2[-1]
        in_basis = np.zeros(N, dtype=bool)
        in_basis[basis] = True
        _, t_gamma = timed(
            lambda: kernels.recompute_gamma(Binv, A, jnp.asarray(in_basis))
        )
        # Host LAPACK fallback cost (what the engine does when res > 1e-6).
        B_h = A_np[:, basis].astype(np.float64)
        t0 = time.time()
        np.linalg.inv(B_h)
        t_host = time.time() - t0
        print(
            f"M={M:5d} N={N:6d}  refactorize={t_full*1e3:8.1f}ms "
            f"(res={float(res_full):.2e})  refresh={t_refresh*1e3:8.1f}ms "
            f"(res={float(res_refresh):.2e})  gamma={t_gamma*1e3:8.1f}ms  "
            f"host_inv={t_host*1e3:8.1f}ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
