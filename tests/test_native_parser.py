"""Native C++ parser equivalence tests: same MPS semantics as the Python
parser on real netlib/miplib files (group names aside, which are synthetic
in the native path and semantically irrelevant)."""

import time

import pytest

from tests.conftest import reference_problem
from relp_tpu.io import mps_to_general_form, parse_fixed, parse_free
from relp_tpu.io.native import native_available, parse_native


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native parser not built"
)


def _compare(path: str, fixed: bool):
    with open(path) as f:
        text = f.read()
    py = parse_fixed(text) if fixed else parse_free(text)
    cc = parse_native(text, fixed)

    assert cc.name == py.name
    assert cc.objective == py.objective
    assert cc.cost_row_name == py.cost_row_name
    assert cc.cost_values == py.cost_values
    assert [(r.name, r.constraint_type) for r in cc.rows] == [
        (r.name, r.constraint_type) for r in py.rows
    ]
    assert [(c.name, c.variable_type, c.values) for c in cc.columns] == [
        (c.name, c.variable_type, c.values) for c in py.columns
    ]
    # Group names are synthetic in the native path; compare flattened values.
    assert [v for g in cc.rhss for v in g.values] == [
        v for g in py.rhss for v in g.values
    ]
    assert [v for g in cc.ranges for v in g.values] == [
        v for g in py.ranges for v in g.values
    ]
    assert [v for g in cc.bounds for v in g.values] == [
        v for g in py.bounds for v in g.values
    ]

    # And the converted GeneralForms must be identical.
    g1 = mps_to_general_form(py)
    g2 = mps_to_general_form(cc)
    assert g1.b == g2.b
    assert g1.constraints.columns == g2.constraints.columns
    assert g1.constraint_types == g2.constraint_types
    assert [
        (v.cost, v.lower_bound, v.upper_bound) for v in g1.variables
    ] == [(v.cost, v.lower_bound, v.upper_bound) for v in g2.variables]


@pytest.mark.parametrize(
    "name",
    ["AFIRO.SIF", "ADLITTLE.SIF", "BLEND.SIF", "BOEING1.SIF", "E226.SIF",
     "FINNIS.SIF", "SCTAP1.SIF", "STANDATA.SIF"],
)
def test_native_matches_python_netlib(name):
    _compare(reference_problem("netlib", name), fixed=True)


def test_native_matches_python_free():
    _compare(reference_problem("burkardt", "testprob.mps"), fixed=False)
    _compare(reference_problem("miplib", "50v-10.mps"), fixed=False)


def test_native_speedup():
    path = reference_problem("netlib", "25FV47.SIF")
    with open(path) as f:
        text = f.read()
    # Warm both (ctypes load, allocator) then take best-of-3; the Fraction
    # assembly is shared cost, the native win is the tokenize/intern/
    # number-scan stage.  Generous margin: CI boxes run under load.
    parse_fixed(text)
    parse_native(text, True)

    def best_of(fn, n=3):
        times = []
        for _ in range(n):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return min(times)

    python_s = best_of(lambda: parse_fixed(text))
    native_s = best_of(lambda: parse_native(text, True))
    assert native_s < python_s * 1.2
