"""End-to-end netlib solves ON THE TPU with shape bucketing.

Round-4 design (VERDICT r3 #1):

* **Compile time is split from pivot time.**  The persistent XLA
  compilation cache (`relp_tpu.utils.cache`) makes every jit signature a
  one-time cost; a `--warmup` pass solves a tiny synthetic LP at each
  bucket shape/config before the timed problems, and its wall time is
  recorded separately (`__warmup__` records) instead of being lumped into
  the first problem's `device` column (round 3: AFIRO "238 s" for 16
  pivots was all compile).
* **Per-problem escalation-rung routing.**  `--routes FILE.json` maps a
  problem name to config overrides (`carry`, `dtype`, `chunk_size`,
  `refactor_period`, `rows`, `cols`).  A routed problem starts at the rung
  that certified it last time instead of re-climbing (and re-failing) the
  f32 -> df32 -> f64 ladder; the committed table is
  `docs/results/netlib_tpu_routes.json`.  `--update-routes` rewrites the
  file from this run's outcomes, so the routing is learned, not
  hand-configured.
* **Automatic bucket assignment.**  Problems are parsed + presolved, then
  assigned to the smallest shape bucket their row count fits; one
  invocation sweeps the whole suite.

Usage: python scripts/netlib_tpu.py [--out FILE.jsonl] [names...]
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
DEFAULT_ROUTES = os.path.join(
    os.path.dirname(__file__), "..", "docs", "results",
    "netlib_tpu_routes.json",
)

# (rows, cols) shape buckets; a problem lands in the smallest bucket whose
# row count covers it after presolve.  One compile per (bucket, config).
BUCKETS = [(512, 2048), (1024, 4096), (2304, 6912), (5120, 19200)]

DEFAULT_SET = [
    # bucket A (<=512 rows post-presolve)
    "AFIRO", "KB2", "SC50A", "SC50B", "SC105", "ADLITTLE", "BLEND",
    "SHARE2B", "SHARE1B", "SC205", "RECIPELP", "BEACONFD", "STOCFOR1",
    "SCAGR7", "ISRAEL", "BRANDY", "E226", "LOTFI", "BORE3D",
    # bucket B
    "SCSD1", "GROW7", "BOEING2", "VTP-BASE", "CAPRI", "SCTAP1", "BANDM",
    "SCFXM1", "BOEING1", "STAIR", "STANDATA", "SCORPION", "ETAMACRO",
    "STANDMPS", "AGG", "SCRS8", "FINNIS", "AGG2", "AGG3", "GFRD-PNC",
    "BNL1", "MODSZK1", "25FV47", "CZPROB",
    # bucket C
    "CYCLE", "BNL2", "GREENBEA", "GREENBEB",
    # bucket D
    "80BAU3B",
]


def _route_cfg_keys(route: dict) -> dict:
    """SolverConfig overrides from a route entry (bucket keys excluded)."""
    return {
        k: v
        for k, v in route.items()
        if k in ("carry", "dtype", "chunk_size", "refactor_period",
                 "scan_dtype", "max_iterations", "pricing",
                 "gamma_refresh_period", "prescale")
    }


def _final_rung(cfg, escalations) -> str:
    if escalations:
        return escalations[-1]
    return "df32" if cfg.carry == "df32" else cfg.dtype


def _rung_to_route(rung: str) -> dict:
    if rung == "df32":
        return {"carry": "df32", "chunk_size": 100, "refactor_period": 100}
    if rung == "float64":
        return {"dtype": "float64", "chunk_size": 60, "refactor_period": 60}
    return {}


def _warmup(drv, make_cfg, cfg_variants, rows, cols, log):
    """Compile the solver's jit signatures at this bucket shape by solving a
    tiny LP (equalities force phase 1) padded up to the bucket.  With the
    persistent compile cache this is a one-time cost per (shape, config)."""
    from relp_tpu.io import mps_to_general_form, parse_free

    tiny = """NAME WARMUP
ROWS
 N  COST
 E  R1
 E  R2
COLUMNS
    X1 COST 1.0 R1 1.0
    X2 COST 2.0 R2 1.0
    X3 COST 1.0 R1 1.0
    X3 R2 2.0
RHS
    RHS R1 4.0 R2 6.0
BOUNDS
ENDATA
"""
    t0 = time.time()
    for variant in cfg_variants:
        gf = mps_to_general_form(parse_free(tiny))
        cfg = make_cfg(**variant)
        try:
            drv.solve_general_form(gf, cfg)
        except Exception as exc:  # noqa: BLE001 — warmup must not abort the sweep
            log(f"  warmup variant {variant} failed: {exc}")
    return time.time() - t0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--budget", type=float, default=300.0)
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--carry", default="native")
    parser.add_argument("--scan-dtype", default="float32")
    parser.add_argument("--chunk", type=int, default=200)
    parser.add_argument("--refactor", type=int, default=200)
    parser.add_argument("--routes", default=DEFAULT_ROUTES,
                        help="per-problem config routing table (JSON)")
    parser.add_argument("--update-routes", action="store_true",
                        help="rewrite the routes file from this run")
    parser.add_argument("--no-warmup", action="store_true")
    parser.add_argument("--out", default=None,
                        help="append per-problem JSON records to this file")
    parser.add_argument("names", nargs="*")
    args = parser.parse_args()
    names = args.names or DEFAULT_SET

    import jax

    jax.config.update("jax_enable_x64", True)

    from relp_tpu.config import SolverConfig
    from relp_tpu.data.elements import LinearProgramError
    from relp_tpu.io import mps_to_general_form, parse_fixed
    from relp_tpu.simplex import driver as drv
    from relp_tpu.simplex.lowering import lower_provider
    from relp_tpu.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()

    routes = {}
    if args.routes and os.path.exists(args.routes):
        with open(args.routes) as f:
            routes = json.load(f)

    def log(msg):
        print(msg, flush=True)

    log(f"device: {jax.devices()[0]}  compile-cache: {cache_dir}")
    log(f"routes: {sum(1 for n in names if n in routes)}/{len(names)} "
        f"problems routed ({args.routes})")

    # --- parse + presolve every problem, assign buckets ---
    parsed = {}
    bucket_of = {}
    records = []
    for name in names:
        rec = {"name": name}
        t_parse = time.time()
        path = os.path.join(PROBLEM_DIR, f"{name}.SIF")
        gf = mps_to_general_form(parse_fixed(open(path).read()))
        rec["parse_s"] = round(time.time() - t_parse, 2)
        t_pre = time.time()
        try:
            gf.presolve()
        except LinearProgramError as exc:
            log(f"PASS {name}: decided by presolve ({exc.status})")
            rec.update(status="presolve", ok=True)
            records.append(rec)
            continue
        rec["presolve_s"] = round(time.time() - t_pre, 2)
        rows = gf.nr_constraints()
        route = routes.get(name, {})
        if "rows" in route:
            bucket = (route["rows"], route["cols"])
        else:
            bucket = next((b for b in BUCKETS if rows <= b[0]), None)
        if bucket is None:
            log(f"SKIP {name}: {rows} rows exceed the largest bucket")
            rec.update(status="skip_bucket", rows=rows)
            records.append(rec)
            continue
        parsed[name] = (gf, rec, route)
        bucket_of[name] = bucket

    # --- per-bucket solve loops ---
    orig_lower = lower_provider
    total_pass = 0
    total_t = 0.0
    hdr = (f"{'':5s}{'name':10s} {'objective':>20s} {'iters':>6s} "
           f"{'parse':>7s} {'presol':>7s} {'device':>8s} {'certify':>8s} "
           f"{'total':>8s}  rung      cert")

    for bucket in sorted(set(bucket_of.values())):
        rows_b, cols_b = bucket
        in_bucket = [n for n in names if bucket_of.get(n) == bucket]
        if not in_bucket:
            continue

        def bucketed_lower(provider, **kw):
            kw.setdefault("min_rows", rows_b)
            kw.setdefault("min_cols", cols_b)
            kw["pad_to"] = max(kw.get("pad_to", 128), 128)
            return orig_lower(provider, **kw)

        drv.lower_provider = bucketed_lower

        def make_cfg(**overrides):
            base = dict(
                pad_to=128, chunk_size=args.chunk,
                refactor_period=args.refactor, dtype=args.dtype,
                carry=args.carry, scan_dtype=args.scan_dtype,
            )
            base.update(overrides)
            return SolverConfig(**base)

        # one warmup per distinct effective config in this bucket
        variants = []
        seen = set()
        for n in in_bucket:
            keys = _route_cfg_keys(parsed[n][2])
            sig = tuple(sorted(keys.items()))
            if sig not in seen:
                seen.add(sig)
                variants.append(keys)
        if any(not parsed[n][2] for n in in_bucket):
            # Unrouted problems may climb the escalation ladder mid-solve;
            # pre-compile the ladder rung configs too so a first failure
            # doesn't pay cold rung compiles inside its device_s column.
            for rung in (
                {"carry": "df32", "chunk_size": 100, "refactor_period": 100},
                {"dtype": "float64", "chunk_size": 60, "refactor_period": 60},
                # pivot_tol matches the ladder's conservative rung exactly —
                # tolerances are STATIC jit args, so a differing value would
                # compile a different executable than the rung actually uses.
                {"dtype": "float64", "chunk_size": 30, "refactor_period": 30,
                 "scan_dtype": "same", "pivot_tol": 1e-7},
            ):
                sig = tuple(sorted(rung.items()))
                if sig not in seen:
                    seen.add(sig)
                    variants.append(rung)
        log(f"## bucket rows={rows_b} cols={cols_b}: "
            f"{len(in_bucket)} problems, {len(variants)} config variants")
        if not args.no_warmup:
            t_w = _warmup(drv, make_cfg, variants, rows_b, cols_b, log)
            log(f"warmup: {t_w:.1f}s (compile; cached persistently)")
            records.append({
                "name": "__warmup__", "bucket": list(bucket),
                "variants": len(variants), "warmup_s": round(t_w, 1),
            })
        log(hdr)

        for name in in_bucket:
            gf, rec, route = parsed[name]
            rec["bucket"] = list(bucket)
            if name in NETLIB_EXPECTED:
                expected, tol, _ignored = NETLIB_EXPECTED[name]
            else:
                expected, tol = NETLIB_EXTRA[name]
                if expected is None:
                    expected, tol = float("nan"), 0.0  # certification-only
            rec.update(expected=expected, tol=tol, route=route or None)
            cfg = make_cfg(**_route_cfg_keys(route))
            presolve_s = rec.get("presolve_s", 0.0)
            t0 = time.time()
            try:
                result, solution = drv.solve_general_form(gf, cfg)
                dt = time.time() - t0
                certify_s = result.stats.certify_time_s
                rung = _final_rung(cfg, result.stats.escalations)
                if solution is not None:
                    value = float(solution.objective_value)
                    if expected != expected:  # NaN: certification-only gate
                        ok = bool(result.stats.certified)
                    else:
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
                    device_s=round(dt - certify_s, 2),
                    certify_s=round(certify_s, 2),
                    total_s=round(dt, 2),
                    rung=rung,
                    cleanup_pivots=result.stats.exact_cleanup_pivots,
                    escalations=result.stats.escalations,
                )
                log(
                    f"{'PASS' if ok else 'FAIL'} {name:10s} {value!s:>20s} "
                    f"{result.stats.iterations:>6d} {rec['parse_s']:>7.2f} "
                    f"{presolve_s:>7.2f} {dt - certify_s:>8.2f} "
                    f"{certify_s:>8.2f} {dt:>8.2f}  {rung:8s}  "
                    f"{result.stats.certified}"
                )
                if args.update_routes and ok:
                    new_route = _rung_to_route(rung)
                    if "rows" in route:  # keep explicit bucket overrides
                        new_route.update(
                            rows=route["rows"], cols=route["cols"]
                        )
                    if new_route:
                        routes[name] = new_route
                    else:
                        routes.pop(name, None)
            except LinearProgramError as exc:
                log(f"FAIL {name}: {exc.status}")
                rec.update(status=f"lp_error:{exc.status}", ok=False)
            except Exception as exc:  # noqa: BLE001
                log(f"FAIL {name}: {type(exc).__name__}: {exc}")
                rec.update(status=f"error:{type(exc).__name__}: {exc}",
                           ok=False)
            records.append(rec)

    drv.lower_provider = orig_lower
    n_solved = len(parsed)
    log(f"\n{total_pass}/{n_solved} passed, total solve wall {total_t:.1f}s")
    if args.update_routes and args.routes:
        with open(args.routes, "w") as f:
            json.dump(routes, f, indent=1, sort_keys=True)
        log(f"routes updated: {args.routes}")
    if args.out:
        with open(args.out, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
