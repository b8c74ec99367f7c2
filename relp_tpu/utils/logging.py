"""Observability.

The reference has no tracing at all (SURVEY.md section 5: a lone
TODO(LOGGING)); this framework adds structured per-solve counters
(:class:`~relp_tpu.simplex.result.SolveStats`), a standard-library logger,
and a JAX profiler context for XPlane traces of the device kernels.
"""

from __future__ import annotations

import contextlib
import logging
import os
from typing import Iterator, Optional

_LOGGER_NAME = "relp_tpu"


def get_logger(child: Optional[str] = None) -> logging.Logger:
    name = f"{_LOGGER_NAME}.{child}" if child else _LOGGER_NAME
    logger = logging.getLogger(name)
    if not logging.getLogger(_LOGGER_NAME).handlers:
        level = os.environ.get("RELP_TPU_LOG", "WARNING").upper()
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        root = logging.getLogger(_LOGGER_NAME)
        root.addHandler(handler)
        root.setLevel(level)
    return logger


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/relp_tpu_trace") -> Iterator[None]:
    """Capture a JAX profiler trace (XPlane) around a solve.

    View with TensorBoard or xprof; this is the kernel-level observability
    story for the device hot loop.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_solve_stats(stats, problem_name: str = "") -> None:
    logger = get_logger("solve")
    logger.info(
        "%s: %d iterations (%d phase-1), %d refactorizations, %d chunks, "
        "%d exact cleanup pivots, certified=%s, %.3fs",
        problem_name or "solve",
        stats.iterations,
        stats.phase1_iterations,
        stats.refactorizations,
        stats.chunks,
        stats.exact_cleanup_pivots,
        stats.certified,
        stats.wall_time_s,
    )
