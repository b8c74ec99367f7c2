"""Debug pretty-printers.

Analog of the reference's Display impls for Tableau / Carry / MatrixData
(tableau/mod.rs:359-441, carry/mod.rs:715-734, matrix_data.rs:694-742) — the
reference's only observability surface.
"""

from __future__ import annotations

import numpy as np


def format_state(state, max_rows: int = 16) -> str:
    """Human-readable snapshot of a device simplex state."""
    basis = np.asarray(state.basis)
    xB = np.asarray(state.xB)
    lines = [
        f"iteration={int(state.iteration)} status={int(state.status)} "
        f"obj={float(state.obj):.10g} degen={int(state.degen_count)}",
        f"{'row':>5s} {'basis col':>10s} {'value':>16s}",
    ]
    for i in range(min(len(basis), max_rows)):
        lines.append(f"{i:>5d} {int(basis[i]):>10d} {float(xB[i]):>16.8g}")
    if len(basis) > max_rows:
        lines.append(f"  ... ({len(basis) - max_rows} more rows)")
    return "\n".join(lines)


def format_problem(problem, max_cols: int = 12) -> str:
    """Summary of a lowered DeviceProblem."""
    return (
        f"DeviceProblem M={problem.M} N={problem.N} "
        f"(real {problem.m_real}x{problem.n_real}, artificials at "
        f"{problem.art_offset}); nnz={np.count_nonzero(problem.A)}; "
        f"equilibrated={problem.col_scale is not None}"
    )
