"""Probe precision of the *batched* products the scenario batch driver uses.

Hypothesis: under vmap, the chunk-entry reduced-cost refresh
``einsum('bm,bmn->bn', pi, A)`` lowers as a batched MXU matmul with
single-pass bf16 inputs (unlike the single-LP (M,)@(M,N) matvec, which is
full f32) — so batched pricing carries ~1e-3-relative phantom reduced costs
even at chunk entry, and phase 2 never reaches OPTIMAL.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B, M, N = 8, 256, 512
    rng = np.random.default_rng(0)
    pi = rng.standard_normal((B, M)).astype(np.float32)
    A = rng.standard_normal((B, M, N)).astype(np.float32)
    exact = np.einsum("bm,bmn->bn", pi.astype(np.float64), A.astype(np.float64))
    scale = np.abs(exact).max()

    def err(out):
        return np.abs(np.asarray(out, np.float64) - exact).max() / scale

    f = jax.jit(lambda p, a: jnp.einsum("bm,bmn->bn", p, a))
    f_hi = jax.jit(
        lambda p, a: jnp.einsum(
            "bm,bmn->bn", p, a, precision=jax.lax.Precision.HIGHEST
        )
    )
    vm = jax.jit(jax.vmap(lambda p, a: p @ a))
    print(f"device: {jax.devices()[0]}")
    print(f"einsum default      max rel err = {err(f(pi, A)):.3e}")
    print(f"einsum HIGHEST      max rel err = {err(f_hi(pi, A)):.3e}")
    print(f"vmapped matvec      max rel err = {err(vm(pi, A)):.3e}")

    # The in-iteration stacked Goldfarb scan: (3, M) @ (M, N).
    P = rng.standard_normal((3, M)).astype(np.float32)
    A1 = A[0]
    exact_s = P.astype(np.float64) @ A1.astype(np.float64)
    scale_s = np.abs(exact_s).max()
    out_s = jax.jit(lambda p, a: p @ a)(P, A1)
    err_s = np.abs(np.asarray(out_s, np.float64) - exact_s).max() / scale_s
    print(f"stacked (3,M)@(M,N) max rel err = {err_s:.3e}")

    # The batched stacked scan (vmapped (3,M)@(M,N)).
    Pb = rng.standard_normal((B, 3, M)).astype(np.float32)
    exact_bs = np.einsum(
        "bkm,bmn->bkn", Pb.astype(np.float64), A.astype(np.float64)
    )
    out_bs = jax.jit(jax.vmap(lambda p, a: p @ a))(Pb, A)
    err_bs = (
        np.abs(np.asarray(out_bs, np.float64) - exact_bs).max()
        / np.abs(exact_bs).max()
    )
    print(f"batched stacked     max rel err = {err_bs:.3e}")


if __name__ == "__main__":
    main()
