"""Persistent XLA compilation cache.

Remote TPU compiles through the axon tunnel cost 30-90 s per jit signature
and dominated round-3 end-to-end netlib wall times (AFIRO: 238 s device for
16 pivots — all compile).  JAX's persistent compilation cache stores the
serialized executable keyed by (HLO, platform); a warm cache turns every
subsequent signature into a ~20 ms local load, verified through the axon
tunnel (scripts use it via this helper; the probe measured 1.17 s cold ->
0.02 s warm for a fresh shape).

The reference has no analog (single-process CPU Rust compiles once at build
time); this is TPU-runtime plumbing.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "relp_tpu", "jax"
)

_enabled = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable the persistent JAX compilation cache (idempotent).

    ``path`` defaults to ``$RELP_TPU_COMPILE_CACHE`` or
    ``~/.cache/relp_tpu/jax``.  Setting ``RELP_TPU_COMPILE_CACHE=0``
    disables the cache entirely (returns None).  Only compiles slower than
    1 s are persisted, so CPU test runs with thousands of tiny jits don't
    churn the disk.
    """
    global _enabled
    env = os.environ.get("RELP_TPU_COMPILE_CACHE")
    if env == "0":
        return None
    if path is None:
        path = env or _DEFAULT_DIR
    if _enabled:
        return path
    import jax

    if jax.default_backend() == "cpu":
        # CPU compiles are cheap, and reloading CPU AOT results emits noisy
        # machine-feature-mismatch warnings (XLA pseudo-features like
        # prefer-no-scatter are recorded but not reported by the host).
        # The cache's value is the 30-90 s remote TPU compiles.
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
    return path
