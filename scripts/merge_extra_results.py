"""Merge extras sweep shard JSONs into one netlib_extra artifact.

Usage: python scripts/merge_extra_results.py out.txt out.json shard1.json ...
"""

import json
import sys

sys.path.insert(0, "tests")
from netlib_expected import NETLIB_EXTRA  # noqa: E402


def main():
    out_txt, out_json = sys.argv[1], sys.argv[2]
    merged = {}
    for path in sys.argv[3:]:
        with open(path) as f:
            merged.update(json.load(f))
    missing = sorted(set(NETLIB_EXTRA) - set(merged))
    lines = []
    passed = certified = 0
    for name in sorted(NETLIB_EXTRA):
        e = merged.get(name)
        if e is None:
            lines.append(f"MISS {name:10s} (not swept)")
            continue
        ok = e.get("pass")
        passed += bool(ok)
        certified += bool(e.get("certified"))
        lines.append(
            f"{'PASS' if ok else 'FAIL'} {name:10s} "
            f"{e.get('status','?'):16s} obj={e.get('objective','-')!s:>20s} "
            f"iters={e.get('iterations','-')!s:>7s} "
            f"t={e.get('solve_s','-')!s:>8s}s "
            f"certified={e.get('certified','-')!s:>5s} "
            f"certify_s={e.get('certify_s','-')!s:>7s}"
        )
    summary = (
        f"{passed}/{len(NETLIB_EXTRA)} passed, {certified} exactly certified"
        + (f", missing: {missing}" if missing else "")
    )
    with open(out_txt, "w") as f:
        f.write("\n".join(lines) + "\n\n" + summary + "\n")
    with open(out_json, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(summary)


if __name__ == "__main__":
    main()
