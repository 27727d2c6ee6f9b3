"""Continuous silver maintenance: bronze file stream -> keyed upsert into
the deduplicated silver table.

This closes the loop the reference leaves open: its sink is append-only
blobs with duplicate articles possible across runs (at-least-once,
fetch_articles.py:128-136, SURVEY.md §4.3); consumers are left to dedup.
Here every micro-batch *upserts* by article id — newest version wins — so
silver is always exactly-one-row-per-id.

Merge strategy: current-silver ANTI-JOIN batch ids, union the batch, write
to a fresh directory, atomic-rename over the old one (same pattern as
sources/state.py).  That is a full-table rewrite per batch — correct and
crash-safe on any filesystem, and the right *shape* for the test scale.
The 100 TB production swap-in is a transactional table format (Delta/
Iceberg MERGE INTO), which turns the same logical plan into touched-file
rewrites; partitioning silver by a stable hash of id would likewise bound
each batch's rewrite to the partitions its ids hash into.  The dataflow
around the merge (stream, checkpoint, dedup-within-batch) is unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from azure_func_forem_data_etl_spark.session import ensure_query_session_conf
from azure_func_forem_data_etl_spark.sources.bronze import BRONZE_SCHEMA


def _latest_per_id(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("id").orderBy(
        F.try_to_timestamp("published_at").desc_nulls_last(),
        F.try_to_timestamp("edited_at").desc_nulls_last(),
    )
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def upsert_batch(spark: SparkSession, batch: DataFrame, silver_dir: str) -> None:
    """Keyed merge: newest batch version per id replaces the silver row."""
    fresh = _latest_per_id(batch.filter(F.col("id").isNotNull()))
    if os.path.exists(silver_dir):
        current = spark.read.parquet(silver_dir)
        keep = current.join(fresh.select("id"), "id", "left_anti")
        merged = keep.unionByName(fresh.select(*current.columns))
    else:
        merged = fresh
    tmp = f"{silver_dir}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{silver_dir}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(silver_dir):
        os.rename(silver_dir, old)
    os.rename(tmp, silver_dir)
    shutil.rmtree(old, ignore_errors=True)


def run_streaming_silver(
    spark: SparkSession,
    landing_dir: str,
    silver_dir: str,
    checkpoint_dir: str,
    multi_line: bool = True,
) -> int:
    """Drain new bronze blobs, upsert each micro-batch into silver by id;
    returns rows upserted this run."""
    ensure_query_session_conf(spark)
    stream = (
        spark.readStream.schema(BRONZE_SCHEMA)
        .option("multiLine", multi_line)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(landing_dir)
    )
    seen = {"rows": 0}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        seen["rows"] += n
        upsert_batch(spark, batch_df.drop("_corrupt_record"), silver_dir)

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return seen["rows"]
