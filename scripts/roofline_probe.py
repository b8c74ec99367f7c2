"""Roofline probe: per-pivot time vs tableau/carry size (VERDICT r2 item 8).

Model under test: in the XLA fused chunk loop the per-pivot HBM traffic is
ONE f32 stream of the padded tableau (M*N*4 bytes; the stacked pricing scan
is the only full-width pass), while the carry (Binv: M*M*4/8, xB, pi, d,
gamma) stays VMEM-resident across loop iterations (v5e VMEM 128 MiB).

  t_pivot ~= M*N*4 / BW_HBM        (BW_HBM = 819 GB/s on v5e)

Discriminating experiment: scale N at fixed M (traffic grows ~N) and scale
M at fixed N (if Binv streamed from HBM, the per-pivot time would grow by
an extra ~3*M^2*4 bytes of traffic — passes for FTRAN, the v-vector, and
the rank-1 update — i.e. super-linear in M; if VMEM-resident, still ~M*N).

Usage: python scripts/roofline_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(m, n, reps=5, chunks=(20, 620)):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_state, _synthetic_problem
    from relp_tpu.simplex import kernels

    A, b, c1, c2, cand, basis = _synthetic_problem(
        m=m, n=n, pad=128, seed=7, dtype=np.float32
    )
    state0 = _make_state(A, b, c1, basis)
    A_d = jnp.asarray(A)
    c_d = jnp.asarray(c1)
    cand_d = jnp.asarray(cand)
    kw = dict(
        pricing=kernels.PRICE_STEEPEST,
        opt_tol=1e-7,
        pivot_tol=1e-7,
        degen_tol=1e-9,
        stop_at_zero=False,
    )

    def run_once(chunk, rep):
        # Fold per-rep entropy into the state so the axon dispatch cache
        # cannot serve a repeat (CLAUDE.md: identical dispatches get cached).
        st = state0._replace(
            xB=state0.xB + jnp.float32(1e-7) * (rep + 1)
        )
        kw["chunk"] = chunk
        t0 = time.time()
        out = kernels.run_chunk(st, A_d, A_d, c_d, cand_d, **kw)
        out.xB.block_until_ready()
        return time.time() - t0, int(out.iteration)

    for chunk in chunks:  # compile outside the timed region
        run_once(chunk, -1)
    ests = []
    for rep in range(reps):
        d_small, i_small = run_once(chunks[0], rep)
        d_big, i_big = run_once(chunks[1], rep)
        # Require the big chunk to have actually run ~all its pivots —
        # an early OPTIMAL would make the delta meaningless.
        if i_big - i_small >= 0.8 * (chunks[1] - chunks[0]):
            per = (d_big - d_small) / (i_big - i_small)
            if per > 0:
                ests.append(per)
    if not ests:
        return None
    return float(np.median(np.asarray(ests)))


def main():
    import jax

    print(f"device: {jax.devices()[0]}", flush=True)
    BW = 819e9  # v5e HBM
    print(f"{'M':>6} {'N':>6} {'A MB':>8} {'Binv MB':>8} "
          f"{'us/pivot':>9} {'A-stream us':>12} {'A+3Binv us':>11}",
          flush=True)
    cases = [
        (1024, 1536),   # N=2560 after artificials
        (1024, 4096),   # N=5120 — the bench shape
        (1024, 9216),   # N=10240: N-scaling at fixed M
        (2048, 2048),   # N=4096, M doubled: M-scaling at ~fixed N
        (2048, 6144),   # N=8192
    ]
    for m, n in cases:
        M = ((m + 127) // 128) * 128
        N = ((n + M + 127) // 128) * 128
        per = measure(m, n)
        a_mb = M * N * 4 / 1e6
        binv_mb = M * M * 4 / 1e6
        a_us = M * N * 4 / BW * 1e6
        full_us = (M * N * 4 + 3 * M * M * 4) / BW * 1e6
        print(f"{M:>6} {N:>6} {a_mb:>8.1f} {binv_mb:>8.1f} "
              f"{(per or 0) * 1e6:>9.2f} {a_us:>12.2f} {full_us:>11.2f}",
              flush=True)


if __name__ == "__main__":
    main()
