"""Evidence-age report for the driver rotation (r9 VERDICT ask #3).

Prints, for the current tree's CORRECTNESS_r*.json files, how stale each
registered query's latest official witness is and what the next driver
window will refresh.  Run at round close and paste the table into
COVERAGE.md's "Official evidence age" section.

Usage: python tools/evidence_age.py [current_round]
"""
from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from azure_func_forem_data_etl_spark.plans.registry import (
        _latest_round,
        load_all,
    )

    reg = load_all()
    age = _latest_round()
    if not age and len(sys.argv) <= 1:
        # fresh checkout: no CORRECTNESS_r*.json yet and no explicit round
        print(f"registry: {len(reg)} names — no official evidence yet")
        raise SystemExit(0)
    current = int(sys.argv[1]) if len(sys.argv) > 1 else max(age.values())
    never = [n for n in reg if n not in age]
    rounds = Counter(age[n] for n in reg if n in age)
    window = list(reg)[:50]

    print(f"registry: {len(reg)} names, never-checked: {len(never)}")
    print(f"| last official round | names | age (rounds, vs r{current}) |")
    print("|---|---|---|")
    for r in sorted(rounds):
        print(f"| r{r} | {rounds[r]} | {current - r} |")
    if age:
        oldest = min(age.values())
        print(
            f"max evidence age: {current - oldest} rounds "
            f"(oldest witness r{oldest})"
        )
    else:
        print("max evidence age: n/a (no official evidence yet)")
    print(
        f"next driver window: {sum(reg[n].oracle is not None for n in window)}/50 "
        f"oracle-checkable; refreshes rounds "
        f"{sorted({age.get(n, 0) for n in window})}"
    )
    if never:
        print(f"never-checked: {sorted(never)}")


if __name__ == "__main__":
    main()
