"""Decompose the canonical read's per-invocation planning cost."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.session import get_spark
from azure_func_forem_data_etl_spark.sources import tables as T

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = 7


def phase(label, fn):
    ts = []
    for _ in range(N):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:55s} min={ts[0]*1000:7.1f}ms med={ts[N//2]*1000:7.1f}ms")


def main():
    spark = get_spark(app_name="prof-entity3")
    width = spark.sparkContext.defaultParallelism

    # warm everything once
    T.entity_table(spark, SF, "documents")._jdf.queryExecution().executedPlan()

    phase("read.parquet (reader build only)", lambda: spark.read.parquet(f"{SF}/documents.parquet"))
    phase("T.table() (incl ensure_query_session_conf)", lambda: T.table(spark, SF, "documents"))

    def plan_only(df):
        df._jdf.queryExecution().executedPlan()

    phase("scan: executedPlan", lambda: plan_only(T.table(spark, SF, "documents")))
    phase(
        "scan+repartition: executedPlan",
        lambda: plan_only(T.table(spark, SF, "documents").repartition(width, "doc_id")),
    )
    phase(
        "scan+repart+count agg: executedPlan",
        lambda: plan_only(
            T.table(spark, SF, "documents")
            .repartition(width, "doc_id")
            .groupBy("doc_id")
            .count()
        ),
    )
    phase(
        "entity_table: executedPlan",
        lambda: plan_only(T.entity_table(spark, SF, "documents")),
    )

    et = T.entity_table(spark, SF, "documents")

    def phases(df):
        qe = df._jdf.queryExecution()
        t0 = time.perf_counter()
        qe.analyzed()
        t1 = time.perf_counter()
        qe.optimizedPlan()
        t2 = time.perf_counter()
        qe.executedPlan()
        t3 = time.perf_counter()
        return t1 - t0, t2 - t1, t3 - t2

    for i in range(3):
        a, o, p = phases(T.entity_table(spark, SF, "documents"))
        print(f"entity_table phases rep{i}: analyze={a*1000:.1f}ms optimize={o*1000:.1f}ms physical={p*1000:.1f}ms")

    # execution-only: reuse one planned df, noop it repeatedly
    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    phase("entity_table: noop on PRE-BUILT df (reps reuse df)", lambda: noop(et))
    fresh = lambda: noop(T.entity_table(spark, SF, "documents"))
    phase("entity_table: noop on FRESH df", fresh)
    spark.stop()


if __name__ == "__main__":
    main()
