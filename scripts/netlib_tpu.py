"""End-to-end netlib solves ON THE TPU with shape bucketing.

All problems lower to one padded shape so jitted kernels compile once and
are reused across the whole set (remote compiles through the axon tunnel
cost ~30-90 s each; per-problem shapes would dominate the wall clock).

Usage: python scripts/netlib_tpu.py [--rows 512] [--cols 2048] [names...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from netlib_expected import NETLIB_EXPECTED

PROBLEM_DIR = "/root/reference/tests/netlib/problem_files"

DEFAULT_SET = [
    "AFIRO", "KB2", "SC50A", "SC50B", "SC105", "ADLITTLE", "BLEND",
    "SHARE2B", "SHARE1B", "SC205", "RECIPELP", "BEACONFD", "STOCFOR1",
    "SCAGR7", "ISRAEL", "BRANDY", "E226", "LOTFI", "BORE3D",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=512)
    parser.add_argument("--cols", type=int, default=2048)
    parser.add_argument("--budget", type=float, default=300.0)
    parser.add_argument("names", nargs="*")
    args = parser.parse_args()
    names = args.names or DEFAULT_SET

    import jax

    jax.config.update("jax_enable_x64", True)

    from relp_tpu.config import SolverConfig
    from relp_tpu.data.elements import LinearProgramError, LPStatus
    from relp_tpu.io import mps_to_general_form, parse_fixed
    from relp_tpu.simplex import driver as drv
    from relp_tpu.simplex.lowering import lower_provider

    # Force one common shape through the lowering.
    orig_lower = lower_provider

    def bucketed_lower(provider, **kw):
        kw.setdefault("min_rows", args.rows)
        kw.setdefault("min_cols", args.cols)
        kw["pad_to"] = max(kw.get("pad_to", 128), 128)
        return orig_lower(provider, **kw)

    drv.lower_provider = bucketed_lower

    cfg = SolverConfig(pad_to=128, chunk_size=200, refactor_period=200)
    print(f"device: {jax.devices()[0]}", flush=True)

    total_pass = 0
    total_t = 0.0
    for name in names:
        expected, tol, ignored = NETLIB_EXPECTED[name]
        path = os.path.join(PROBLEM_DIR, f"{name}.SIF")
        gf = mps_to_general_form(parse_fixed(open(path).read()))
        if gf.nr_constraints() > args.rows:
            # The bucket check applies to the problem the solver lowers —
            # i.e. after presolve (GREENBEA: 2392 raw rows -> 2218).
            # Presolving here is fine: solve_general_form's own presolve
            # pass then starts from the already-reduced fixpoint.
            try:
                gf.presolve()
            except LinearProgramError as exc:
                print(f"PASS {name}: decided by presolve ({exc.status})",
                      flush=True)
                continue
        if gf.nr_constraints() > args.rows:
            print(f"SKIP {name}: too many rows for the bucket", flush=True)
            continue
        t0 = time.time()
        try:
            result, solution = drv.solve_general_form(gf, cfg)
            dt = time.time() - t0
            if solution is not None:
                value = float(solution.objective_value)
                ok = abs(value - expected) < tol
            else:
                value, ok = None, False
            total_pass += ok
            total_t += dt
            print(
                f"{'PASS' if ok else 'FAIL'} {name:10s} obj={value!s:>20s} "
                f"iters={result.stats.iterations:>6d} t={dt:7.2f}s "
                f"certified={result.stats.certified}",
                flush=True,
            )
        except LinearProgramError as exc:
            print(f"FAIL {name}: {exc.status}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {type(exc).__name__}: {exc}", flush=True)

    print(f"\n{total_pass}/{len(names)} passed, total solve wall {total_t:.1f}s", flush=True)


if __name__ == "__main__":
    main()
