#!/usr/bin/env python3
"""Reproducibility check between two bench records: two consecutive
sweeps of the SAME build agree on a query when the ratio stays inside
a band (default +/-15%) OR the absolute delta is under `--floor`
seconds (default 0.4 s — on a shared local[32] box, deltas at that
scale are JVM/page-cache noise regardless of the ratio they imply).

Usage: bench_agree.py A.json B.json [--band 0.15] [--floor 0.4]
Exit 0 iff every query agrees.
"""
import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), "")
                for a in sys.argv[1:] if a.startswith("--"))
    band = float(opts.get("band", 0.15))
    floor = float(opts.get("floor", 0.4))
    a = json.load(open(args[0]))["queries"]
    b = json.load(open(args[1]))["queries"]
    names = sorted(set(a) & set(b))
    missing = sorted(set(a) ^ set(b))
    bad = []
    for n in names:
        ta, tb = a[n], b[n]
        if ta < 0 or tb < 0:
            bad.append((n, ta, tb, "error sentinel"))
            continue
        ratio = tb / ta if ta > 0 else float("inf")
        exempt = abs(tb - ta) < floor
        flag = "" if abs(ratio - 1) <= band else ("noise-exempt" if exempt else "DISAGREE")
        print(f"{n:28s} {ta:8.3f} {tb:8.3f} {ratio:6.2f}x {flag}")
        if flag == "DISAGREE":
            bad.append((n, ta, tb, f"{ratio:.2f}x"))
    ta, tb = sum(v for v in a.values() if v >= 0), sum(v for v in b.values() if v >= 0)
    print(f"{'TOTAL':28s} {ta:8.1f} {tb:8.1f} {tb / ta:6.2f}x")
    if missing:
        print("only in one record:", ", ".join(missing))
    print(f"AGREE={len(names) - len(bad)} DISAGREE={len(bad)} band=+/-{band:.0%} floor={floor}s")
    return 1 if bad or missing else 0


if __name__ == "__main__":
    sys.exit(main())
