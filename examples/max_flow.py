"""Max flow as an LP via a custom MatrixProvider
(mirror of reference examples/max_flow.rs)."""

from fractions import Fraction

from relp_tpu.config import SolverConfig
from relp_tpu.data.network import MaxFlowPrimal
from relp_tpu.simplex import solve_relaxation

F = Fraction


def main():
    # adjacency[to][from] = arc capacity.
    adjacency = [
        #    s     a     b     t
        [F(0), F(0), F(0), F(0)],  # s
        [F(3), F(0), F(0), F(0)],  # a
        [F(2), F(1), F(0), F(0)],  # b
        [F(0), F(2), F(2), F(0)],  # t
    ]
    problem = MaxFlowPrimal(adjacency, s=0, t=3)
    result = solve_relaxation(problem, SolverConfig(pad_to=8))
    flows = problem.reconstruct_solution(result.bfs)
    print("status:", result.status.value)
    print("max flow:", problem.flow_value(flows))
    for j, value in flows:
        if value:
            print("  arc", problem.incidence.arcs[j], "flow", value)


if __name__ == "__main__":
    main()
