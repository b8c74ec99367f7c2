"""Import and solve an MPS file (mirror of reference examples/readme_demo.rs)."""

import sys

from relp_tpu.io import load_general_form
from relp_tpu.simplex import solve_general_form


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "my_program.mps"
    gf = load_general_form(path)
    result, solution = solve_general_form(gf)
    print("status:", result.status.value)
    if solution is not None:
        print("objective:", solution.objective_value)


if __name__ == "__main__":
    main()
