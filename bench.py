"""Benchmark: simplex pivot throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: marginal simplex iterations/s of the fused device hot loop
(pricing scan + FTRAN + Harris ratio test + rank-1 inverse update +
steepest-edge update) on a dense 1024x4096 standard-form tableau in the f32
fast path (the production configuration: f32 device arithmetic with exact
rational certification and automatic f64 escalation on top).

Methodology: the time of a chunk of K pivots is measured for two K values
and differenced — the tunnel/dispatch fixed overhead (tens of ms on this
axon setup) cancels, leaving the true per-pivot device cost.

Baseline: the reference publishes no numbers (BASELINE.md); as a proxy we
use 1,000 exact-rational iterations/s for single-core RELP on problems of
this size — generous for arbitrary-precision arithmetic on an m~1000 basis.
vs_baseline = measured / 1000.
"""

import json
import os
import signal
import sys
import time

import numpy as np

RELP_PROXY_ITERS_PER_S = 1000.0

# Watchdog: the axon tunnel can stall indefinitely (observed: jax.devices()
# hanging for minutes during a pool outage).  Two layers:
#   1. the worker arms SIGALRM and prints whatever is measured so far —
#      but a Python signal handler cannot fire while the main thread is
#      stuck inside a C call (PJRT client init is exactly such a hang);
#   2. so by default bench.py runs as a SUPERVISOR that re-execs itself as
#      a worker (BENCH_SUPERVISED=1), enforces the deadline from outside
#      (SIGKILL on the exact child pid), and emits the one JSON line from
#      the worker's section-by-section partial file if the worker never
#      printed one.
BENCH_DEADLINE_S = int(os.environ.get("BENCH_DEADLINE_S", "480"))
_PARTIAL = {}


def _save_partial():
    """Persist _PARTIAL for the supervisor (after every finished section)."""
    path = os.environ.get("BENCH_PARTIAL_PATH")
    if not path:
        return
    try:
        with open(path, "w") as f:
            json.dump(_PARTIAL, f)
    except Exception:  # noqa: BLE001 — the side channel is best-effort
        pass


# No section finished after this many seconds => the worker is stuck in
# uninterruptible device/tunnel init (a healthy TPU worker lands its first
# section -- one compile + a few dispatches -- well inside this).
BENCH_STALL_S = int(os.environ.get("BENCH_STALL_S", "180"))


def _run_worker(env, partial_path, *, deadline_s, stall_s=None):
    """Run one supervised worker; returns (json_line or None, partial dict).

    ``stall_s``: kill early if the partial file is still empty after this
    many seconds (device init hang in C -- no signal can interrupt it; a
    half-dead axon pool even lists devices fine and then hangs on the
    first dispatch, so only "has any section finished" is a reliable
    health signal).
    """
    import subprocess

    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        stdout=subprocess.PIPE,
        text=True,
    )

    def read_partial():
        try:
            with open(partial_path) as f:
                return json.load(f)
        except Exception:  # noqa: BLE001
            return {}

    t0 = time.time()
    out = ""
    while True:
        try:
            out, _ = proc.communicate(timeout=5)
            break
        except subprocess.TimeoutExpired:
            elapsed = time.time() - t0
            if os.environ.get("BENCH_DEBUG"):
                print(f"[sup] tick {elapsed:.0f}s partial={read_partial()}",
                      file=sys.stderr)
            stalled = (
                stall_s is not None
                and elapsed > stall_s
                and not read_partial()
            )
            if stalled or elapsed > deadline_s:
                proc.kill()  # exact child pid only
                try:
                    out, _ = proc.communicate(timeout=10)
                except Exception:  # noqa: BLE001
                    out = out or ""
                break
    json_line = None
    for line in (out or "").splitlines():
        if line.startswith("{"):
            json_line = line
    return json_line, read_partial()


def _supervise() -> int:
    import tempfile

    fd, partial_path = tempfile.mkstemp(suffix=".bench.json")
    os.close(fd)
    env = dict(os.environ, BENCH_SUPERVISED="1", BENCH_PARTIAL_PATH=partial_path)
    try:
        json_line, partial = _run_worker(
            env,
            partial_path,
            deadline_s=BENCH_DEADLINE_S + 60,
            stall_s=BENCH_STALL_S,
        )
        cpu_fallback = False
        if (
            json_line is None
            and not partial
            # The baked environment always pins JAX_PLATFORMS=axon; only an
            # explicit CPU run should skip the fallback (nothing to fall
            # back TO in that case).
            and os.environ.get("JAX_PLATFORMS", "") != "cpu"
        ):
            # Nothing measured at all: the tunnel hung before the first
            # section.  Re-measure on CPU (honestly labeled) instead of
            # emitting a zero.
            print("[bench] TPU worker stalled; CPU fallback", file=sys.stderr)
            cpu_fallback = True
            env["PALLAS_AXON_POOL_IPS"] = ""
            env["JAX_PLATFORMS"] = "cpu"
            env["BENCH_DEADLINE_S"] = str(min(BENCH_DEADLINE_S, 340))
            json_line, partial = _run_worker(
                env, partial_path, deadline_s=min(BENCH_DEADLINE_S, 340) + 30
            )
        if json_line is not None:
            if cpu_fallback:
                result = json.loads(json_line)
                result.setdefault("detail", {})[
                    "tpu_tunnel_down_cpu_fallback"
                ] = True
                json_line = json.dumps(result)
            print(json_line)
            sys.stdout.flush()
            return 0
        if cpu_fallback:
            partial.setdefault("detail", {})[
                "tpu_tunnel_down_cpu_fallback"
            ] = True
        _emit(_result_from_partial(partial, timed_out=True))
        return 0
    finally:
        try:
            os.unlink(partial_path)
        except OSError:
            pass


def _emit(result):
    print(json.dumps(result))
    sys.stdout.flush()


def _result_from_partial(partial, *, timed_out):
    per_f32 = partial.get("per_f32")
    value = 1.0 / per_f32 if per_f32 else 0.0
    detail = dict(partial.get("detail", {}))
    if timed_out:
        detail["timed_out"] = f"watchdog at {BENCH_DEADLINE_S}s; partial sections"
    return {
        "metric": "simplex_iterations_per_s",
        "value": round(value, 1),
        "unit": "iter/s",
        "vs_baseline": round(value / RELP_PROXY_ITERS_PER_S, 2),
        "detail": detail,
    }


def _watchdog(signum, frame):  # noqa: ARG001
    _emit(_result_from_partial(_PARTIAL, timed_out=True))
    os._exit(0)


def _note(msg):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr)
    sys.stderr.flush()


_T0 = time.time()

# Per-PROCESS entropy folded into every timed dispatch: the axon tunnel's
# dispatch cache is keyed on (program, inputs) and persists ACROSS processes,
# so a fully deterministic bench re-run gets served entirely from cache and
# reports impossible numbers (measured: 327k "iter/s" on a re-run whose
# physical HBM-stream bound is ~50k).  A random sub-tolerance scale keeps
# every process's input buffers unique while leaving the pivot walk intact.
_ENTROPY = float(np.random.default_rng().uniform(0.5, 1.5))


def _perturb(state0, rep):
    """A per-rep, per-process distinct input state.

    No two timed dispatches may be identical — within a run or across runs:
    the axon tunnel can serve repeated identical dispatches from a cache
    (CLAUDE.md gotcha (a)), which would make the timed value a cache serve
    instead of device compute.  A tiny positive shift of the basic values
    keeps the pivot walk intact while making every dispatch's input buffer
    unique.
    """
    return state0._replace(xB=state0.xB + (_ENTROPY * 1e-9 * (rep + 1)))


def _measure(kernels, state0, A_scan, A_full, c, cand, pricing, chunks=(10, 300)):
    """Marginal per-pivot time via interleaved A/B chunk differencing.

    Small/large chunk runs are interleaved (A, B, A, B, ...) so slow drift
    in chip contention cancels in the per-rep differences; the median of the
    positive per-rep estimates is reported, with a conservative whole-run
    fallback when contention noise swamps the differencing.
    """
    kw = dict(
        pricing=pricing,
        chunk=chunks[0],
        opt_tol=1e-7,
        pivot_tol=1e-7,
        degen_tol=1e-7,
    )

    def run_once(chunk, rep):
        kw["chunk"] = chunk
        st = _perturb(state0, rep)
        t0 = time.time()
        out = kernels.run_chunk(st, A_scan, A_full, c, cand, **kw)
        iters = int(out.iteration)  # forcing sync through the tunnel
        return time.time() - t0, iters

    for chunk in chunks:  # compile both shapes outside the timed region
        kw["chunk"] = chunk
        out = kernels.run_chunk(state0, A_scan, A_full, c, cand, **kw)
        _ = int(out.iteration)

    reps = 4
    estimates = []
    d_big_all, i_big = [], 0
    for rep in range(reps):
        d_small, i_small = run_once(chunks[0], rep)
        d_big, i_big = run_once(chunks[1], rep)
        d_big_all.append(d_big)
        if i_big > i_small and d_big > d_small:
            estimates.append((d_big - d_small) / (i_big - i_small))
    if estimates:
        per_it = float(np.median(estimates))
    elif i_big > 0:
        # Contention noise: fall back to the conservative estimate that
        # includes the fixed dispatch overhead.
        per_it = min(d_big_all) / i_big
    else:
        return None, i_big
    return per_it, i_big


def main():
    if os.environ.get("BENCH_SUPERVISED") != "1":
        return _supervise()
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(BENCH_DEADLINE_S)

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from __graft_entry__ import _make_state, _synthetic_problem
    from relp_tpu.simplex import kernels
    from relp_tpu.utils.cache import enable_compilation_cache

    # Persistent compile cache: first-ever run pays the remote compiles,
    # every later run loads executables locally (~20 ms/signature).
    enable_compilation_cache()

    m, n = 1024, 4096
    detail = _PARTIAL.setdefault("detail", {})
    detail["problem"] = f"dense {m}x{n} standard form + {m} artificials"
    detail["pricing"] = "steepest-edge"
    detail["methodology"] = "marginal chunk differencing (10 vs 300 pivots)"
    _note(f"devices: {jax.devices()}")
    detail["device"] = str(jax.devices()[0])
    _save_partial()

    # --- fast path: f32 carry + f32 scans ---
    A, b, c1, c2, cand, basis = _synthetic_problem(
        m=m, n=n, pad=128, seed=7, dtype=np.float32
    )
    state0 = _make_state(A, b, c1, basis)
    A_d = jnp.asarray(A)
    per_f32, iters = _measure(
        kernels,
        state0,
        A_d,
        A_d,
        jnp.asarray(c1),
        jnp.asarray(cand),
        kernels.PRICE_STEEPEST,
    )
    _PARTIAL["per_f32"] = per_f32
    detail["fast_path_f32_ms_per_iter"] = (
        round(per_f32 * 1e3, 4) if per_f32 else None
    )
    _save_partial()
    _note(f"f32 section done: {detail['fast_path_f32_ms_per_iter']} ms/iter")

    # --- robust path: f64 carry + f32 scans ---
    A64, b64, c164, c264, cand64, basis64 = _synthetic_problem(
        m=m, n=n, pad=128, seed=7, dtype=np.float64
    )
    state64 = _make_state(A64, b64, c164, basis64)
    A64_d = jnp.asarray(A64)
    per_f64, _ = _measure(
        kernels,
        state64,
        A64_d.astype(jnp.float32),
        A64_d,
        jnp.asarray(c164),
        jnp.asarray(cand64),
        kernels.PRICE_STEEPEST,
    )
    detail["robust_path_f64_carry_iters_per_s"] = (
        round(1.0 / per_f64, 1) if per_f64 else None
    )
    _save_partial()
    _note(f"f64 section done: {detail['robust_path_f64_carry_iters_per_s']} it/s")

    # --- df32 carry: compensated two-f32 (the escalation rung that
    # replaces emulated f64 for drift-prone instances) ---
    from relp_tpu.ops.df32 import df_from_f64
    from relp_tpu.simplex.df_kernels import df_make_state, df_run_chunk

    class _DfShim:
        """Adapts df_run_chunk to the _measure interface."""

        def __init__(self, Ah, Al, ch, cl):
            self.Ah, self.Al, self.ch, self.cl = Ah, Al, ch, cl

        def run_chunk(self, st, A_scan, A_full, c, cand, *, pricing, chunk,
                      opt_tol, pivot_tol, degen_tol):
            return df_run_chunk(
                st, A_scan, self.Ah, self.Al, self.ch, self.cl, cand,
                pricing=pricing, chunk=chunk, opt_tol=opt_tol,
                pivot_tol=pivot_tol, degen_tol=degen_tol,
            )

    Ah, Al = df_from_f64(A64)
    ch_, cl_ = df_from_f64(c164)
    df_state0 = df_make_state(A64, b64, c164, basis64)
    per_df, _ = _measure(
        _DfShim(Ah, Al, ch_, cl_),
        df_state0,
        Ah,
        Ah,
        jnp.asarray(c164.astype(np.float32)),
        jnp.asarray(cand64),
        kernels.PRICE_STEEPEST,
    )
    detail["df32_carry_iters_per_s"] = (
        round(1.0 / per_df, 1) if per_df else None
    )
    _save_partial()
    _note(f"df32 section done: {detail['df32_carry_iters_per_s']} it/s")

    # --- scenario batch: 64 perturbed LPs in lockstep (dp analog) ---
    from relp_tpu.parallel.batch import (
        batched_run_chunk,
        make_batch_state,
        megakernel_applicable,
        megakernel_run_chunk,
    )

    B, mb, nb = 64, 256, 512
    states, As, cs, cands = [], [], [], []
    for s in range(B):
        Ab, bb, c1b, c2b, candb, basisb = _synthetic_problem(
            m=mb, n=nb, pad=128, seed=100 + s, dtype=np.float32
        )
        states.append(_make_state(Ab, bb, c1b, basisb))
        As.append(Ab)
        cs.append(c1b)
        cands.append(candb)
    batch = make_batch_state(states)
    A_b = jnp.asarray(np.stack(As))
    c_b = jnp.asarray(np.stack(cs))
    cand_b = jnp.asarray(np.stack(cands))

    def run_batch_xla(chunk, rep):
        st = batch._replace(xB=batch.xB + (_ENTROPY * 1e-9 * (rep + 1)))
        t0 = time.time()
        out = batched_run_chunk(
            st,
            A_b,
            A_b,
            c_b,
            cand_b,
            pricing=kernels.PRICE_STEEPEST,
            chunk=chunk,
            opt_tol=1e-7,
            pivot_tol=1e-7,
            degen_tol=1e-7,
        )
        total = int(np.asarray(out.iteration).sum())
        return time.time() - t0, total

    def run_batch_mega(chunk, rep):
        st = batch._replace(xB=batch.xB + (_ENTROPY * 1e-9 * (rep + 1)))
        t0 = time.time()
        out = megakernel_run_chunk(
            st,
            A_b,
            c_b,
            cand_b,
            chunk=chunk,
            opt_tol=1e-7,
            pivot_tol=1e-7,
            degen_tol=1e-7,
        )
        total = int(np.asarray(out.iteration).sum())
        return time.time() - t0, total

    def measure_batch(run_batch):
        """Interleaved A/B chunk differencing over the batch; never negative."""
        for chunk in (10, 120):  # compile outside the timed region
            run_batch(chunk, -1)
        batch_estimates = []
        d_big_all, i_b2 = [], 0
        for rep in range(4):
            d_s, i_s = run_batch(10, rep)
            d_b2, i_b2 = run_batch(120, rep)
            d_big_all.append(d_b2)
            if i_b2 > i_s and d_b2 > d_s:
                batch_estimates.append((d_b2 - d_s) / (i_b2 - i_s))
        if batch_estimates:
            return float(np.median(batch_estimates))
        if i_b2 > 0:
            # Contention fallback incl. dispatch overhead — never negative.
            return min(d_big_all) / i_b2
        return None

    try:
        # Production path: the fused Pallas megakernel (auto-selected by the
        # batch driver at this shape/config).
        if megakernel_applicable(A_b, "float32", "same", kernels.PRICE_STEEPEST):
            batch_per_pivot = measure_batch(run_batch_mega)
        else:
            batch_per_pivot = None
    except Exception:  # noqa: BLE001 — batch metric is best-effort detail
        batch_per_pivot = None
    _note(f"megakernel section done: {batch_per_pivot}")
    try:
        batch_xla_per_pivot = measure_batch(run_batch_xla)
    except Exception:  # noqa: BLE001
        batch_xla_per_pivot = None
    _note(f"batch-xla section done: {batch_xla_per_pivot}")
    if batch_per_pivot is None:
        batch_per_pivot = batch_xla_per_pivot

    detail["batched_64x_m256_pivots_per_s"] = (
        round(1.0 / batch_per_pivot, 1) if batch_per_pivot else None
    )
    detail["batched_64x_m256_xla_pivots_per_s"] = (
        round(1.0 / batch_xla_per_pivot, 1) if batch_xla_per_pivot else None
    )
    _save_partial()

    # --- larger batched bucket (r4): the megakernel's advantage grows with
    # m (docs/results/batch_perf_r4.txt: ~1.9x over vmapped XLA at m=512) —
    # report the strongest production batched configuration too.
    try:
        B2, mb2, nb2 = 128, 512, 1024
        states2, As2, cs2, cands2 = [], [], [], []
        for s in range(B2):
            Ab, bb, c1b, c2b, candb, basisb = _synthetic_problem(
                m=mb2, n=nb2, pad=128, seed=300 + s, dtype=np.float32
            )
            states2.append(_make_state(Ab, bb, c1b, basisb))
            As2.append(Ab)
            cs2.append(c1b)
            cands2.append(candb)
        batch2 = make_batch_state(states2)
        A_b2 = jnp.asarray(np.stack(As2))
        c_b2 = jnp.asarray(np.stack(cs2))
        cand_b2 = jnp.asarray(np.stack(cands2))

        def run_batch_mega2(chunk, rep):
            st = batch2._replace(
                xB=batch2.xB + (_ENTROPY * 1e-9 * (rep + 1))
            )
            t0 = time.time()
            out = megakernel_run_chunk(
                st, A_b2, c_b2, cand_b2, chunk=chunk,
                opt_tol=1e-7, pivot_tol=1e-7, degen_tol=1e-7,
            )
            total = int(np.asarray(out.iteration).sum())
            return time.time() - t0, total

        per512 = measure_batch(run_batch_mega2)
        detail["batched_128x_m512_pivots_per_s"] = (
            round(1.0 / per512, 1) if per512 else None
        )
    except Exception:  # noqa: BLE001 — best-effort detail
        detail["batched_128x_m512_pivots_per_s"] = None
    _note(
        f"batched m512 section done: "
        f"{detail['batched_128x_m512_pivots_per_s']}"
    )
    signal.alarm(0)
    _emit(_result_from_partial(_PARTIAL, timed_out=False))


if __name__ == "__main__":
    sys.exit(main())
