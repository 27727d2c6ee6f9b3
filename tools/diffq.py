"""Diff a query's Spark result against its DuckDB oracle on any fixture.

Usage: python tools/diffq.py <sf_dir> <name> [name ...]

Prints row counts plus the first three differing canonical rows (and the
set difference when counts mismatch) — the first tool to reach for when
a sweep leg or the driver sim reports MISMATCH.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from azure_func_forem_data_etl_spark.plans.registry import load_all  # noqa: E402
from azure_func_forem_data_etl_spark.session import get_spark  # noqa: E402
from tests.oracle import canonical_rows, run_oracle  # noqa: E402


def main() -> int:
    sf = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="diffq", shuffle_partitions=8)
    reg = load_all()
    rc = 0
    for name in names:
        q = reg[name]
        got = canonical_rows(q.fn(spark, sf).toPandas())
        if q.oracle is None:
            print(f"=== {name}: spark {len(got)} rows (no oracle)")
            continue
        want = canonical_rows(run_oracle(q.oracle, sf))
        print(f"=== {name}: spark {len(got)} rows, oracle {len(want)} rows")
        shown = 0
        for g, w in zip(got, want):
            if g != w:
                print("  spark :", g)
                print("  oracle:", w)
                shown += 1
                rc = 1
                if shown >= 3:
                    break
        if len(got) != len(want):
            rc = 1
            sg, sw = set(got), set(want)
            print("  only-spark:", list(sg - sw)[:2])
            print("  only-oracle:", list(sw - sg)[:2])
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
