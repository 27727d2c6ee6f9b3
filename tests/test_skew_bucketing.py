"""Skew-salting equivalence and bucketed co-located joins — the two
explicit shuffle-shape tools beyond AQE (SURVEY.md §4.2 / 100 TB design).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    """1000 rows, 90% on one hot key."""
    rows = [(i, "hot" if i % 10 else f"cold{i}", float(i % 97)) for i in range(1000)]
    return spark.createDataFrame(rows, "row_id bigint, k string, value double")


def test_salted_agg_equals_direct_agg(spark, skewed):
    direct = {
        (r["k"]): (r["n"], r["s"])
        for r in skewed.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("s"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["sum_value"])
        for r in salted_agg(skewed, key="k", unique_col="row_id").collect()
    }
    assert salted == direct


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold10", "C1"), ("cold30", "C3")], "k string, label string"
    )
    plain = sorted(
        (r["row_id"], r["label"]) for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r["row_id"], r["label"])
        for r in salted_join(skewed, dim, key="k", fact_unique_col="row_id").collect()
    )
    assert salted == plain
    assert len(plain) == 900 + 1 + 1  # hot matches + two cold keys


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """bucketBy co-location: joining two tables bucketed on the join key
    reads bucket-aligned partitions — zero Exchange in the join plan."""
    import re

    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 7).alias("o_custkey")
    )
    items = spark.range(0, 4000).select(
        (F.col("id") % 1000).alias("l_orderkey"), (F.col("id") % 50).alias("l_qty")
    )
    # external tables: bucketing metadata in the catalog, data under tmp
    # (spark.sql.warehouse.dir is static config, unchangeable per-test)
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        items.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_items"))
        .mode("overwrite")
        .saveAsTable("b_items")
    )
    # merge hint: these toy tables would otherwise broadcast; the point is
    # the bucket-aligned SMJ that a fact-fact join would use at scale.
    joined = spark.table("b_orders").hint("merge").join(
        spark.table("b_items").hint("merge"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert not re.search(r"Exchange hashpartitioning", plan), plan[:2000]
    assert joined.count() == 4000
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_range_partitioned_silver_write_enables_file_skipping(spark, sf_dir, tmp_path):
    """Range-repartition + sort-within-partitions before the silver write:
    each output file owns a disjoint ts range (parquet min/max footers then
    skip whole files for time-window predicates at 100 TB)."""
    import pyarrow.parquet as pq
    from azure_func_forem_data_etl_spark.sources.tables import table
    from pyspark.sql import functions as F

    out = str(tmp_path / "silver_range")
    # int64 micros column: Spark may write timestamps as INT96, which has
    # no parquet min/max statistics — the 100 TB deployment sets
    # outputTimestampType=TIMESTAMP_MICROS for the same reason.
    events = table(spark, sf_dir, "events").withColumn(
        "ts", F.unix_micros("ts")
    )
    (
        events.repartitionByRange(4, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    import glob
    spans = []
    for f in glob.glob(out + "/part-*.parquet"):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "ts"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    spans.sort()
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file ts ranges overlap - no skipping possible"
