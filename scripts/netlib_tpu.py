"""End-to-end netlib solves ON THE TPU with shape bucketing.

All problems lower to one padded shape so jitted kernels compile once and
are reused across the whole set (remote compiles through the axon tunnel
cost ~30-90 s each; per-problem shapes would dominate the wall clock).

Per-problem time accounting splits the wall clock into parse / presolve /
device (pivots + compile) / exact certification, so tail latencies are
attributable (VERDICT r2: SCRS8 806 s, BNL2 341 s were unexplained).

Usage: python scripts/netlib_tpu.py [--rows 512] [--cols 2048]
                                    [--out FILE.json] [names...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from netlib_expected import NETLIB_EXPECTED, NETLIB_EXTRA

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
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--carry", default="native")
    parser.add_argument("--scan-dtype", default="float32")
    parser.add_argument("--chunk", type=int, default=200)
    parser.add_argument("--refactor", type=int, default=200)
    parser.add_argument("--out", default=None,
                        help="append per-problem JSON records to this file")
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

    cfg = SolverConfig(
        pad_to=128, chunk_size=args.chunk, refactor_period=args.refactor,
        dtype=args.dtype, carry=args.carry, scan_dtype=args.scan_dtype,
    )
    print(f"device: {jax.devices()[0]}", flush=True)
    print(
        f"{'':5s}{'name':10s} {'objective':>20s} {'iters':>6s} "
        f"{'parse':>7s} {'presol':>7s} {'device':>8s} {'certify':>8s} "
        f"{'total':>8s}  cert",
        flush=True,
    )

    records = []
    total_pass = 0
    total_t = 0.0
    for name in names:
        if name in NETLIB_EXPECTED:
            expected, tol, ignored = NETLIB_EXPECTED[name]
        else:
            expected, tol = NETLIB_EXTRA[name]
            ignored = None
            if expected is None:
                expected, tol = float("nan"), 0.0  # certification-only gate
        rec = {"name": name, "expected": expected, "tol": tol}
        t_parse = time.time()
        path = os.path.join(PROBLEM_DIR, f"{name}.SIF")
        gf = mps_to_general_form(parse_fixed(open(path).read()))
        rec["parse_s"] = round(time.time() - t_parse, 2)
        presolve_s = 0.0
        if gf.nr_constraints() > args.rows:
            # The bucket check applies to the problem the solver lowers —
            # i.e. after presolve (GREENBEA: 2392 raw rows -> 2218).
            # Presolving here is fine: solve_general_form's own presolve
            # pass then starts from the already-reduced fixpoint.
            t_pre = time.time()
            try:
                gf.presolve()
            except LinearProgramError as exc:
                print(f"PASS {name}: decided by presolve ({exc.status})",
                      flush=True)
                rec.update(status="presolve", ok=True)
                records.append(rec)
                total_pass += 1
                continue
            presolve_s = time.time() - t_pre
        if gf.nr_constraints() > args.rows:
            print(f"SKIP {name}: too many rows for the bucket "
                  f"({gf.nr_constraints()})", flush=True)
            rec.update(status="skip_bucket", rows=gf.nr_constraints())
            records.append(rec)
            continue
        t0 = time.time()
        try:
            result, solution = drv.solve_general_form(gf, cfg)
            dt = time.time() - t0
            certify_s = result.stats.certify_time_s
            if solution is not None:
                value = float(solution.objective_value)
                ok = abs(value - expected) < tol
            else:
                value, ok = None, False
            total_pass += ok
            total_t += dt
            rec.update(
                status=result.status.value,
                objective=value,
                ok=bool(ok),
                iterations=result.stats.iterations,
                certified=bool(result.stats.certified),
                presolve_s=round(presolve_s, 2),
                device_s=round(dt - certify_s, 2),
                certify_s=round(certify_s, 2),
                total_s=round(dt, 2),
                cleanup_pivots=result.stats.exact_cleanup_pivots,
                escalations=result.stats.escalations,
            )
            print(
                f"{'PASS' if ok else 'FAIL'} {name:10s} {value!s:>20s} "
                f"{result.stats.iterations:>6d} {rec['parse_s']:>7.2f} "
                f"{presolve_s:>7.2f} {dt - certify_s:>8.2f} "
                f"{certify_s:>8.2f} {dt:>8.2f}  "
                f"{result.stats.certified}",
                flush=True,
            )
        except LinearProgramError as exc:
            print(f"FAIL {name}: {exc.status}", flush=True)
            rec.update(status=f"lp_error:{exc.status}", ok=False)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {type(exc).__name__}: {exc}", flush=True)
            rec.update(status=f"error:{type(exc).__name__}: {exc}", ok=False)
        records.append(rec)

    print(f"\n{total_pass}/{len(names)} passed, total solve wall {total_t:.1f}s",
          flush=True)
    if args.out:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
