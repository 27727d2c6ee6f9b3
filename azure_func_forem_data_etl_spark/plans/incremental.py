"""Incremental ingest pipeline — the reference's flagship path (EP1,
SURVEY.md §3) as a Spark batch job.

Reference semantics preserved:
- watermark restore; None => cold start ingests everything (S4);
- strict ``published_at > watermark`` filter (F1 — rows AT the watermark
  are dropped, fetch_articles.py:102);
- malformed rows quarantined, not fatal (F2);
- empty-batch suppression: no data => no state write (L2,
  fetch_articles.py:148-150);
- data committed BEFORE watermark state (L1, fetch_articles.py:128-136)
  => at-least-once; silver compaction dedups by id (§4.3).

Spark-shaped differences (deliberate):
- pages fetch in parallel chunks; enumeration stops after a chunk
  contributes zero new rows — the distributed analog of the reference's
  per-article short-circuit (fetch_articles.py:102-104).  The reference
  assumes newest-first API order; chunking makes the same assumption at
  chunk granularity, and late/out-of-order data is handled explicitly by
  the streaming variant's watermark instead of silently dropped.
- bronze is line-delimited JSON partitioned by ingest_date (splittable;
  the reference's pretty-printed multiLine arrays are not — §7 risk
  register).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from azure_func_forem_data_etl_spark.sources.paginated import (
    FetchPolicy,
    PageFetcher,
    fetch_pages_raw,
    parse_raw_articles,
)
from azure_func_forem_data_etl_spark.sources.state import load_watermark, save_watermark


@dataclass
class IncrementalResult:
    n_ingested: int
    n_quarantined: int
    pages_fetched: int
    watermark: dt.datetime | None


def run_incremental(
    spark: SparkSession,
    fetcher: PageFetcher,
    bronze_dir: str,
    state_path: str,
    policy: FetchPolicy = FetchPolicy(),
    chunk_pages: int = 8,
    max_pages: int = 64,
) -> IncrementalResult:
    watermark = load_watermark(spark, state_path)
    total_new = 0
    total_bad = 0
    pages_fetched = 0
    max_ts: dt.datetime | None = None

    page = 1
    while page <= max_pages:
        chunk = list(range(page, min(page + chunk_pages, max_pages + 1)))
        raw = fetch_pages_raw(spark, chunk, fetcher, policy)
        parsed = parse_raw_articles(raw).withColumn(
            "published_at_ts", F.try_to_timestamp("published_at")
        )
        # cache: one fetch, two consumers (stats + write)
        parsed = parsed.cache()
        try:
            bad_cond = F.col("is_corrupt") | F.col("published_at_ts").isNull()
            fresh_cond = ~bad_cond
            if watermark is not None:
                fresh_cond = fresh_cond & (F.col("published_at_ts") > F.lit(watermark))
            # one driver action per chunk: all chunk statistics in a single
            # conditional aggregation (vs separate count/agg/bad-count jobs)
            stats = parsed.agg(
                F.count("*").alias("n_rows"),
                F.count_if(bad_cond).alias("n_bad"),
                F.count_if(fresh_cond).alias("n_new"),
                F.max(F.when(fresh_cond, F.col("published_at_ts"))).alias("mx"),
            ).collect()[0]
            if stats["n_rows"] == 0:
                break  # F3: end of pagination
            fresh = parsed.filter(fresh_cond)
            n_new, chunk_max = stats["n_new"], stats["mx"]
            total_bad += stats["n_bad"]
            pages_fetched += len(chunk)
            if n_new == 0:
                # Stop only when the chunk had VALID rows all at-or-below
                # the watermark (F1 analog).  A fully-quarantined chunk
                # proves nothing about pagination order — the reference
                # skips malformed rows and keeps going (F2,
                # fetch_articles.py:98-100), so we keep paging too.
                if stats["n_rows"] > stats["n_bad"]:
                    break
            else:
                # L1: data BEFORE state, date-partitioned, line-delimited
                (
                    fresh.withColumn("ingest_date", F.current_date())
                    .drop("published_at_ts")
                    .write.mode("append")
                    .partitionBy("ingest_date")
                    .json(bronze_dir)
                )
                total_new += n_new
                if max_ts is None or (chunk_max is not None and chunk_max > max_ts):
                    max_ts = chunk_max
        finally:
            parsed.unpersist()
        page += chunk_pages

    # L2: empty batch => no state write; else commit watermark AFTER data
    if total_new > 0:
        save_watermark(spark, state_path, max_ts)
    return IncrementalResult(
        n_ingested=total_new,
        n_quarantined=total_bad,
        pages_fetched=pages_fetched,
        watermark=max_ts if total_new > 0 else watermark,
    )


def compact_silver(
    spark: SparkSession,
    bronze_dir: str,
    silver_dir: str,
    max_records_per_file: int = 500_000,
) -> int:
    """Bronze -> silver: dedup by id (at-least-once replay cleanup,
    SURVEY.md §4.3), columnar parquet, bounded file sizes (the intent of
    the reference's dead ``MAX_FILE_SIZE_MB``, fetch_articles_backfill.py:18).

    Keeps the newest version per id (latest published_at, then edited_at)
    deterministically.
    """
    from azure_func_forem_data_etl_spark.sources.bronze import BRONZE_SCHEMA

    # partition column comes back from the directory layout on read
    bronze = spark.read.schema(BRONZE_SCHEMA).option("basePath", bronze_dir).json(
        f"{bronze_dir}/ingest_date=*"
    )
    w = Window.partitionBy("id").orderBy(
        F.try_to_timestamp("published_at").desc_nulls_last(),
        F.try_to_timestamp("edited_at").desc_nulls_last(),
    )
    silver = (
        bronze.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_corrupt_record")
    )
    (
        silver.withColumn("ingest_date", F.current_date())
        .repartition("ingest_date")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("ingest_date")
        .parquet(silver_dir)
    )
    return spark.read.parquet(silver_dir).count()
