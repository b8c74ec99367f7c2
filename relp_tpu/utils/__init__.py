"""Utilities: observability and debug printers."""

from relp_tpu.utils.logging import get_logger, profile_trace, log_solve_stats
from relp_tpu.utils.debug import format_state, format_problem

__all__ = [
    "get_logger",
    "profile_trace",
    "log_solve_stats",
    "format_state",
    "format_problem",
]
