"""Profile bpe_merge_learn (r14, VERDICT item 5): job count, phase times,
and the effect of the working-width (coalesce n_part) choice."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_func_forem_data_etl_spark.session import get_spark
from azure_func_forem_data_etl_spark.sources.tables import table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "7"))


def main():
    spark = get_spark(app_name="prof-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    from azure_func_forem_data_etl_spark.operators import tokenize as tk

    # corpus shape
    docs = table(spark, SF, "documents")
    wt = tk.word_type_table(docs)
    n_types = wt.count()
    grams = tk._gram_counts(
        wt.select("n", tk.F.split("word", "").alias("s"))
    ).count()
    print(f"word types={n_types} distinct 2+3-grams={grams}")

    def run(stats=None):
        return tk.bpe_learn(table(spark, SF, "documents"), stats=stats)

    # warm
    run()

    times = []
    for _ in range(REPS):
        j0 = len(st.getJobIdsForGroup() or [])
        stats = {}
        t0 = time.perf_counter()
        df = run(stats)
        df.collect()
        times.append(time.perf_counter() - t0)
    times.sort()
    jall = st.getJobIdsForGroup()
    print(
        f"bpe_learn end-to-end: min={times[0]:.3f} med={times[len(times)//2]:.3f}"
        f" rounds={stats.get('rounds')}"
    )

    # phase decomposition (single run, labeled)
    t0 = time.perf_counter()
    syms = (
        tk.word_type_table(table(spark, SF, "documents"))
        .select(tk.F.col("n"), tk.F.split("word", "").alias("s"))
        .coalesce(spark.sparkContext.defaultParallelism)
    )
    from pyspark import StorageLevel

    syms.persist(StorageLevel.MEMORY_AND_DISK)
    rows = tk._gram_counts(syms).collect()
    t1 = time.perf_counter()
    print(f"stats job (persist+grams collect): {t1-t0:.3f}s rows={len(rows)}")
    syms.unpersist(blocking=True)

    # same but narrow width
    for width in (2, 8):
        t0 = time.perf_counter()
        syms = (
            tk.word_type_table(table(spark, SF, "documents"))
            .select(tk.F.col("n"), tk.F.split("word", "").alias("s"))
            .coalesce(width)
        )
        syms.persist(StorageLevel.MEMORY_AND_DISK)
        rows = tk._gram_counts(syms).collect()
        print(f"stats job at coalesce({width}): {time.perf_counter()-t0:.3f}s")
        syms.unpersist(blocking=True)

    spark.stop()


if __name__ == "__main__":
    main()
