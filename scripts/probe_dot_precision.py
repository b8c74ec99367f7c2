"""Probe f32 matmul precision: Mosaic (Pallas) vs XLA vs exact.

If Pallas lowers f32 dots as single-pass bf16 on the MXU, its error vs the
f64 reference will be ~1e-3 relative; a full-f32 (3-pass) product sits at
~1e-7.  Decides whether the batched megakernel needs explicit multi-pass
accumulation for its rank-1 updates.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def kernel_hi(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def kernel_outer(a_ref, b_ref, o_ref):
    # (M,1) x (1,M) broadcast multiply instead of a dot: stays on the VPU
    # at full f32.
    M = a_ref.shape[0]
    col = jnp.broadcast_to(a_ref[:, 0:1], (M, M))
    row = jnp.broadcast_to(b_ref[0:1, :], (M, M))
    o_ref[...] = col * row


def main():
    M = 256
    rng = np.random.default_rng(0)
    a = rng.standard_normal((M, M)).astype(np.float32)
    b = rng.standard_normal((M, M)).astype(np.float32)
    exact = a.astype(np.float64) @ b.astype(np.float64)

    out_p = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, M), jnp.float32),
        in_specs=[
            pl.BlockSpec((M, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, M), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, M), lambda: (0, 0), memory_space=pltpu.VMEM),
    )(jnp.asarray(a), jnp.asarray(b))

    out_ph = pl.pallas_call(
        kernel_hi,
        out_shape=jax.ShapeDtypeStruct((M, M), jnp.float32),
        in_specs=[
            pl.BlockSpec((M, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, M), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, M), lambda: (0, 0), memory_space=pltpu.VMEM),
    )(jnp.asarray(a), jnp.asarray(b))

    out_outer = pl.pallas_call(
        kernel_outer,
        out_shape=jax.ShapeDtypeStruct((M, M), jnp.float32),
        in_specs=[
            pl.BlockSpec((M, M), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, M), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, M), lambda: (0, 0), memory_space=pltpu.VMEM),
    )(jnp.asarray(a), jnp.asarray(b))
    exact_outer = np.outer(a[:, 0].astype(np.float64), b[0, :].astype(np.float64))
    err_outer = np.abs(np.asarray(out_outer, np.float64) - exact_outer).max() / np.abs(exact_outer).max()
    print(f"{'pallas-outer':12s} max rel err = {err_outer:.3e}")

    # matvec via XLA: is (M,M)@(M,) full precision by default?
    out_mv = jax.jit(lambda a, b: a @ b[:, 0])(jnp.asarray(a), jnp.asarray(b))
    exact_mv = a.astype(np.float64) @ b[:, 0].astype(np.float64)
    err_mv = np.abs(np.asarray(out_mv, np.float64) - exact_mv).max() / np.abs(exact_mv).max()
    print(f"{'xla-matvec':12s} max rel err = {err_mv:.3e}")

    out_x = jnp.asarray(a) @ jnp.asarray(b)
    out_hi = jax.jit(
        lambda a, b: jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST)
    )(jnp.asarray(a), jnp.asarray(b))

    scale = np.abs(exact).max()
    for name, out in [("pallas", out_p), ("pallas-hi", out_ph), ("xla-default", out_x), ("xla-highest", out_hi)]:
        err = np.abs(np.asarray(out, dtype=np.float64) - exact).max() / scale
        print(f"{name:12s} max rel err = {err:.3e}")

    # bf16 single-pass reference level:
    abf = a.astype(jnp.bfloat16).astype(np.float32)
    bbf = b.astype(jnp.bfloat16).astype(np.float32)
    err = np.abs(abf.astype(np.float64) @ bbf.astype(np.float64) - exact).max() / scale
    print(f"{'bf16-input':12s} max rel err = {err:.3e}")


if __name__ == "__main__":
    main()
