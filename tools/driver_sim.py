"""Simulate the correctness driver: run every registered query at sf0.01
against its DuckDB oracle, with per-query wall time.

Usage: python tools/driver_sim.py [sf_dir] [name_filter ...]

Prints one line per query: status, seconds, rows; then a slowest-10 table.
The point is twofold: (1) pre-verify CORRECTNESS_r02 will be all-green,
(2) find queries slow enough to starve the driver's (time-bounded) run.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from azure_func_forem_data_etl_spark.plans.registry import load_all  # noqa: E402
from azure_func_forem_data_etl_spark.session import get_spark  # noqa: E402
from tests.oracle import canonical_rows, run_oracle  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]
    spark = get_spark(app_name="driver-sim", shuffle_partitions=32)
    registry = load_all()
    if name_filter and name_filter[0].startswith("--first"):
        # --first N: run the first N queries in DRIVER order (load_all
        # registration order) — exactly the official CORRECTNESS window.
        n = int(name_filter[0].split("=")[1]) if "=" in name_filter[0] else 50
        names = list(registry)[:n]
    else:
        names = [
            n for n in sorted(registry) if not name_filter or any(f in n for f in name_filter)
        ]
    results: dict[str, dict] = {}
    t_all = time.time()
    for name in names:
        q = registry[name]
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            pdf = df.toPandas()
            spark_rows = len(pdf)
            if q.oracle is None:
                status = "rows_only"
            else:
                opdf = run_oracle(q.oracle, sf_dir)
                ok = (
                    spark_rows == len(opdf)
                    and sorted(pdf.columns) == sorted(opdf.columns)
                    and canonical_rows(pdf) == canonical_rows(opdf)
                )
                status = "pass" if ok else "MISMATCH"
        except Exception as e:  # noqa: BLE001
            status = f"ERROR: {type(e).__name__}: {e}"[:200]
            spark_rows = -1
        dt = time.time() - t0
        results[name] = {"status": status, "sec": round(dt, 2), "rows": spark_rows}
        print(f"{name:45s} {status:10s} {dt:6.2f}s rows={spark_rows}")
    total = time.time() - t_all
    bad = {n: r for n, r in results.items() if r["status"] not in ("pass", "rows_only")}
    slow = sorted(results.items(), key=lambda kv: -kv[1]["sec"])[:10]
    print(f"\nTOTAL {total:.1f}s over {len(names)} queries; failures: {len(bad)}")
    for n, r in slow:
        print(f"  slow: {n:45s} {r['sec']:6.2f}s")
    if bad:
        print(json.dumps(bad, indent=2))
    Path("/tmp/driver_sim_results.json").write_text(json.dumps(results, indent=2))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
