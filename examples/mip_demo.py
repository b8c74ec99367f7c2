"""Exact branch & bound on an MPS file with integer markers.

Beyond reference scope (its roadmap lists B&B as unimplemented): integer
programs solve to certified rational optimality, with node waves batched
through the scenario driver and dual-warm-restarted from the root basis.

    python examples/mip_demo.py problem.mps [--gap 0.01]
"""

import sys
from fractions import Fraction

from relp_tpu.io import load_general_form
from relp_tpu.mip import solve_mip


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    path = args[0] if args else "tests/data/knap6.mps"
    gap = 0.0
    if "--gap" in sys.argv:
        gap = float(sys.argv[sys.argv.index("--gap") + 1])

    gf = load_general_form(path)
    res = solve_mip(gf, rel_gap=gap)

    print("status:      ", res.status.value)
    if res.objective is not None:
        print("objective:   ", res.objective, f"(~{float(res.objective):.10g})")
    if res.best_bound is not None:
        print("best bound:  ", res.best_bound)
        print("exact gap:   ", res.gap, "(rigorous)" if res.best_bound_exact else "")
    print("certified:   ", res.certified)
    print("nodes:       ", res.nodes_solved, "solved /", res.nodes_pruned, "pruned")
    if res.solution is not None:
        nonzero = [(n, v) for n, v in res.solution.solution_values if v]
        for name, value in nonzero[:20]:
            print(f"  {name} = {value}")


if __name__ == "__main__":
    main()
