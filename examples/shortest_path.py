"""Shortest path as an LP via a custom MatrixProvider
(mirror of reference examples/shortest_path.rs)."""

from fractions import Fraction

from relp_tpu.config import SolverConfig
from relp_tpu.data.network import ShortestPathPrimal
from relp_tpu.simplex import solve_relaxation

F = Fraction


def main():
    # Example from Papadimitriou's Combinatorial Optimization:
    # adjacency[to][from] = arc length.
    adjacency = [
        #    s     a     b     t
        [F(0), F(0), F(0), F(0)],  # s
        [F(1), F(0), F(0), F(0)],  # a
        [F(2), F(2), F(0), F(0)],  # b
        [F(0), F(3), F(1), F(0)],  # t
    ]
    problem = ShortestPathPrimal(adjacency, s=0, t=3)
    result = solve_relaxation(problem, SolverConfig(pad_to=8))
    print("status:", result.status.value)
    print("shortest path length:", result.exact_objective)
    for j, value in result.bfs:
        if value:
            print("  arc", problem.arc_of_column(j), "flow", value)


if __name__ == "__main__":
    main()
