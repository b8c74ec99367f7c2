"""CLI (`python -m relp_tpu solve`) — mirror of the reference's relp-bin
companion crate (SURVEY.md §5: CLI)."""

import json
import os

import pytest

from relp_tpu.__main__ import main

DATA = os.path.join(os.path.dirname(__file__), "data")
NETLIB = "/root/reference/tests/netlib/problem_files"


def test_cli_lp_json(capsys):
    rc = main(["solve", "--json", os.path.join(NETLIB, "AFIRO.SIF")])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["status"] == "finite_optimum"
    assert out["objective"] == "-406659/875"
    assert out["certified"] is True


def test_cli_mip_json(capsys):
    rc = main(
        [
            "solve",
            "--mip",
            "--json",
            "--values",
            os.path.join(DATA, "knap6.mps"),
        ]
    )
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["status"] == "finite_optimum"
    assert out["objective"] == "-30"  # knapsack optimum 30, minimize sense
    assert out["certified"] is True
    assert out["gap"] == "0"
    assert out["best_bound"] == "-30"
    picked = {k: v for k, v in out["values"].items() if v != "0"}
    assert all(v == "1" for v in picked.values())


def test_cli_mip_gap_and_limits(capsys):
    rc = main(
        [
            "solve", "--mip", "--json", "--gap", "0.5",
            "--time-limit", "120", "--branching", "most_fractional",
            "--cut-rounds", "1",
            os.path.join(DATA, "knap6.mps"),
        ]
    )
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["status"] == "finite_optimum"


def test_cli_first_order_json(capsys):
    rc = main(
        ["solve", "--first-order", "--json", os.path.join(NETLIB, "AFIRO.SIF")]
    )
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["status"] == "finite_optimum"
    assert out["objective"] == "-406659/875"
    assert out["certified"] is True
