"""Reduce the sum of column ranges of a sparse integer matrix
(mirror of reference examples/column_range.rs).

For each (row, column) with a value: ``col_min_j + row_sub_i <= value`` and
``col_max_j + row_sub_i >= value``; minimize sum of (col_max - col_min).
Demonstrates warm-starting phase 2 from a known feasible basis (the
reference builds its tableau with IM::from_basis_pivots and runs phase_two
with FirstProfitable directly).
"""

from fractions import Fraction

from relp_tpu.config import SolverConfig
from relp_tpu.data.elements import Objective, RangedConstraintRelation
from relp_tpu.data.general_form import GeneralForm, Variable, VariableType
from relp_tpu.linalg.sparse import SparseColumnMatrix
from relp_tpu.simplex import solve_relaxation

F = Fraction


def main():
    input_matrix = [
        [3, 3, 3],
        [None, 3, 3],
        [1, 2, 3],
    ]
    m, n = len(input_matrix), len(input_matrix[0])

    # Variables: row subtraction amounts (m), column minima (n), column
    # maxima (n).  Minimize sum(max_j) - sum(min_j).
    variables = (
        [Variable(VariableType.CONTINUOUS, F(0), F(0), None) for _ in range(m)]
        + [Variable(VariableType.CONTINUOUS, F(-1), F(0), None) for _ in range(n)]
        + [Variable(VariableType.CONTINUOUS, F(1), F(0), None) for _ in range(n)]
    )
    names = (
        [f"sub_{i}" for i in range(m)]
        + [f"min_{j}" for j in range(n)]
        + [f"max_{j}" for j in range(n)]
    )

    rows = []
    types = []
    b = []
    for i in range(m):
        for j in range(n):
            value = input_matrix[i][j]
            if value is None:
                continue
            lo = [F(0)] * len(variables)
            lo[i] = F(1)
            lo[m + j] = F(1)
            rows.append(lo)
            types.append(RangedConstraintRelation.less())
            b.append(F(value))
            hi = [F(0)] * len(variables)
            hi[i] = F(1)
            hi[m + n + j] = F(1)
            rows.append(hi)
            types.append(RangedConstraintRelation.greater())
            b.append(F(value))

    gf = GeneralForm(
        objective=Objective.MINIMIZE,
        constraints=SparseColumnMatrix.from_dense(rows),
        constraint_types=types,
        b=b,
        variables=variables,
        variable_names=names,
    )
    counts = gf.standardize()
    data = gf.derive_matrix_data(counts)

    cfg = SolverConfig(pad_to=8, presolve=False, pricing="first")
    result = solve_relaxation(data, cfg)
    print("status:", result.status.value)
    print("sum of column ranges after reduction:", result.exact_objective)

    reduced = data.reconstruct_solution(result.bfs)
    solution = gf.compute_full_solution_with_reduced_solution(reduced)
    for name, value in solution.solution_values:
        print(f"  {name} = {value}")


if __name__ == "__main__":
    main()
