"""Bench regression gate (VERDICT r2 ask #9): compare two bench results
query-by-query and fail on >RATIO_GATE regressions over shared queries.

Usage:
    python tools/bench_compare.py BASE.json NEW.json [gate]

Accepts either a raw ``bench.py`` headline/detail JSON ({"queries": {...}})
or a driver ``BENCH_r{N}.json`` wrapper ({"parsed": {"queries": ...}}).
Cross-ROUND caveat (BENCH_NOTES.md): machine drift between rounds is up to
~1.4x, so the gate defaults to 2.0 and the table is the real signal —
same-session A/B comparisons are the trustworthy use.
"""

from __future__ import annotations

import json
import sys

RATIO_GATE = 2.0


def _queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    if d.get("parsed") and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    raise SystemExit(f"{path}: no queries dict found (keys: {list(d)[:6]})")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    base = _queries(sys.argv[1])
    new = _queries(sys.argv[2])
    gate = float(sys.argv[3]) if len(sys.argv) > 3 else RATIO_GATE
    shared = sorted(set(base) & set(new))
    if not shared:
        raise SystemExit("no shared queries between the two files")
    bad = []
    print(f"{'query':40s} {'base':>7s} {'new':>7s} {'ratio':>6s}")
    for name in shared:
        b, n = base[name], new[name]
        ratio = n / b if b > 0 else float("inf")
        flag = " <-- REGRESSION" if ratio > gate else ""
        print(f"{name:40s} {b:7.2f} {n:7.2f} {ratio:6.2f}{flag}")
        if ratio > gate:
            bad.append(name)
    tb, tn = sum(base[q] for q in shared), sum(new[q] for q in shared)
    print(
        f"\nshared {len(shared)} queries: base {tb:.2f}s new {tn:.2f}s "
        f"ratio {tn / tb:.2f}; gate {gate}x; regressions: {len(bad)} {bad}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
