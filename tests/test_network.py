"""Network kit tests — mirrors the reference's example expectations
(examples/shortest_path.rs, examples/max_flow.rs)."""

from fractions import Fraction

from relp_tpu.data.network import IncidenceMatrix, MaxFlowPrimal, ShortestPathPrimal
from relp_tpu.simplex import SolveStatus, solve_relaxation


def F(v):
    return Fraction(v)


# Example from Papadimitriou's Combinatorial Optimization (reference:
# examples/shortest_path.rs main): adjacency[to][from].
PAPADIMITRIOU = [
    #    s  a  b  t
    [F(0), F(0), F(0), F(0)],  # s
    [F(1), F(0), F(0), F(0)],  # a
    [F(2), F(2), F(0), F(0)],  # b
    [F(0), F(3), F(1), F(0)],  # t
]


def test_incidence_matrix():
    inc = IncidenceMatrix(PAPADIMITRIOU, removed=[0])
    # Arcs in from-major order: s->a, s->b, a->b, a->t, b->t.
    assert inc.arcs == [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    assert inc.values == [F(1), F(2), F(2), F(3), F(1)]
    assert inc.nr_rows == 3
    # s->a with s removed: only the incoming +1 at shifted a (=0).
    assert inc.column(0) == [(0, F(1))]
    # a->b: outgoing at a(0), incoming at b(1).
    assert inc.column(2) == [(0, F(-1)), (1, F(1))]


def test_shortest_path(cpu_config):
    problem = ShortestPathPrimal(PAPADIMITRIOU, s=0, t=3)
    result = solve_relaxation(problem, cpu_config)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    # Reference expectation: arcs s->b and b->t selected, length 3.
    assert result.exact_objective == F(3)
    bfs = problem.reconstruct_solution(result.bfs)
    assert bfs.to_dense() == [F(0), F(1), F(0), F(0), F(1)]


def test_max_flow(cpu_config):
    # Classic max-flow example: capacities.
    #      s  a  b  t
    adjacency = [
        [F(0), F(0), F(0), F(0)],  # s
        [F(3), F(0), F(0), F(0)],  # a
        [F(2), F(1), F(0), F(0)],  # b
        [F(0), F(2), F(2), F(0)],  # t
    ]
    problem = MaxFlowPrimal(adjacency, s=0, t=3)
    result = solve_relaxation(problem, cpu_config)
    assert result.status is SolveStatus.FINITE_OPTIMUM
    # Max flow: s->a(3 cap) + s->b(2 cap); a->t 2, a->b 1, b->t 2 -> flow 4.
    assert result.exact_objective == F(-4)
    flows = problem.reconstruct_solution(result.bfs)
    assert problem.flow_value(flows) == F(4)
