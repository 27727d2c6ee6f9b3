"""Profile the canonical entity read (VERDICT r13 item 1). Guide §1.

Times, with the noop sink and a warm session:
  a) raw scan + explicit repartition (no agg)
  b) the full entity_table (scan -> repartition -> min_by)
  c) entity_table_pinned (eager localCheckpoint)
and prints the aggregate node type in the plan.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_func_forem_data_etl_spark.session import get_spark
from azure_func_forem_data_etl_spark.sources import tables as T

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "7"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn):
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    print(f"{label:45s} min={min(times):.3f} med={sorted(times)[len(times)//2]:.3f}")


def main():
    spark = get_spark(app_name="prof-entity")
    sc = spark.sparkContext

    for name in ("documents", "embeddings"):
        df = T.table(spark, SF, name)
        key = "doc_id" if name == "documents" else "vec_id"
        width = sc.defaultParallelism

        # warmup
        noop(T.entity_table(spark, SF, name))

        sc.setJobDescription(f"{name}: scan only")
        timeit(f"{name}: scan only", lambda: noop(T.table(spark, SF, name)))
        sc.setJobDescription(f"{name}: scan+repartition")
        timeit(
            f"{name}: scan+repartition({width})",
            lambda: noop(T.table(spark, SF, name).repartition(width, key)),
        )
        sc.setJobDescription(f"{name}: entity_table")
        timeit(f"{name}: entity_table", lambda: noop(T.entity_table(spark, SF, name)))
        sc.setJobDescription(f"{name}: pinned")
        timeit(
            f"{name}: entity_table_pinned",
            lambda: T.entity_table_pinned(spark, SF, name),
        )
        sc.setJobDescription(None)

        # plan: which aggregate exec?
        plan = T.entity_table(spark, SF, name)._jdf.queryExecution().executedPlan().toString()
        aggs = [ln.strip()[:110] for ln in plan.splitlines() if "Aggregate" in ln]
        print(f"{name} aggregate nodes:")
        for a in aggs:
            print("   ", a)

    # dup-rate at this SF
    from pyspark.sql import functions as F

    d = T.table(spark, SF, "documents")
    total = d.count()
    uniq = d.select("doc_id").distinct().count()
    print(f"documents rows={total} distinct_ids={uniq} dups={total-uniq}")
    e = T.table(spark, SF, "embeddings")
    total = e.count()
    uniq = e.select("vec_id").distinct().count()
    print(f"embeddings rows={total} distinct_ids={uniq} dups={total-uniq}")
    spark.stop()


if __name__ == "__main__":
    main()
