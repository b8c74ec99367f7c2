"""Fused steepest-edge pricing scan as a Pallas TPU kernel.

One pass over the tableau computes, per column j (reference semantics:
pivot_rule.rs:243-296, the Goldfarb 1977 update the XLA path mirrors):

    S     = P @ A          with P = [pi_new; v; rho]   (3, M) stacked scan
    d_j   = c_j - S[0, j]                              (next reduced costs)
    g_j   = max(gamma_j - 2 S[2,j] S[1,j] + S[2,j]^2 gamma_q, 1 + S[2,j]^2)

The XLA path materializes S (3, N) and runs the elementwise chain as
separate fused loops; this kernel keeps the per-tile S block in registers/
VMEM scratch and writes only the two (N,) results.  The tableau read — the
dominant, irreducible HBM traffic — is identical, so the expected gain is
bounded to the elementwise-side overheads (measured on chip; see
docs/ROADMAP.md).

The per-pivot gamma fixups at the entering/leaving columns (gamma_q, 1.0)
stay in XLA — they are O(1) scatters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(scalars_ref, P_ref, A_ref, c_ref, gamma_ref, d_ref, g_ref):
    """Grid step j: one (M, TILE_N) tile of the tableau."""
    gamma_q = scalars_ref[0]
    # (3, M) @ (M, TILE_N) on the MXU; accumulate in f32.
    S = jnp.dot(P_ref[:], A_ref[:], preferred_element_type=jnp.float32)
    S = S.astype(A_ref.dtype)
    d_ref[:] = c_ref[:] - S[0:1, :]
    inner = S[1:2, :]
    abar = S[2:3, :]
    g = gamma_ref[:] - 2.0 * abar * inner + (abar * abar) * gamma_q
    g_ref[:] = jnp.maximum(g, 1.0 + abar * abar)


def _pick_tile(N: int) -> int:
    for t in (2048, 1024, 512, 256, 128):
        if N % t == 0:
            return t
    return N


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_price_scan(P, A_scan, c_scan, gamma, gamma_q, *, interpret=False):
    """Fused (d_next, gamma_new) scan.

    Args:
      P: (3, M) stacked scan vectors [pi_new; v; rho] in scan dtype.
      A_scan: (M, N) tableau in scan dtype.
      c_scan: (N,) costs in scan dtype.
      gamma: (N,) current steepest-edge weights in scan dtype.
      gamma_q: scalar, 1 + ||w||^2 of the entering column.

    Returns:
      d_next: (N,) next reduced costs (c - pi_new A).
      gamma_new: (N,) Goldfarb-updated weights *before* the entering/leaving
        column fixups.
    """
    M, N = A_scan.shape
    tile = _pick_tile(N)
    dtype = A_scan.dtype
    # Row vectors as (1, N) blocks: TPU wants >=2D tiles with lane dim 128.
    c2 = c_scan.reshape(1, N)
    g2 = gamma.reshape(1, N)
    scalars = jnp.reshape(gamma_q.astype(dtype), (1,))

    # Index maps must return int32 — under jax_enable_x64 a bare Python 0
    # traces as i64, which Mosaic cannot legalize in the block transform.
    # (np scalars stay concrete: index maps may not capture traced values.)
    import numpy as _np

    zero = _np.int32(0)
    _j = lambda j: j
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // tile,),
        in_specs=[
            pl.BlockSpec((3, M), lambda j, *_: (zero, zero),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, tile), lambda j, *_: (zero, _j(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j, *_: (zero, _j(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j, *_: (zero, _j(j)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda j, *_: (zero, _j(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j, *_: (zero, _j(j)),
                         memory_space=pltpu.VMEM),
        ],
    )
    d2, gnew2 = pl.pallas_call(
        _scan_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, N), dtype),
            jax.ShapeDtypeStruct((1, N), dtype),
        ],
        interpret=interpret,
    )(scalars, P, A_scan, c2, g2)
    return d2.reshape(N), gnew2.reshape(N)
