"""Backfill pipeline — the reference's EP2 (SURVEY.md §3) as a bounded
Spark batch job.

Reference semantics preserved:
- cursor restore: default 1, clamped (S6, fetch_articles_backfill.py:36-44);
- bounded micro-batch: at most ``max_pages_per_run`` pages per invocation
  (L3, MAX_PAGES_PER_RUN = 15, fetch_articles_backfill.py:20,88);
- raw pass-through: no filtering, no per-row parse — pages land verbatim
  (fetch_articles_backfill.py:95);
- empty-page stop: pagination ends at the first empty page (F3); rows
  from pages after it (fetched speculatively in parallel) are discarded
  so cursor semantics match the sequential reference exactly;
- single flush per run, then cursor commit (data before state,
  fetch_articles_backfill.py:101-112).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.sources.paginated import (
    FetchPolicy,
    PageFetcher,
    fetch_pages_raw,
)
from azure_func_forem_data_etl_spark.sources.state import load_cursor, save_cursor

MAX_PAGES_PER_RUN = 15  # reference constant, fetch_articles_backfill.py:20


@dataclass
class BackfillResult:
    n_ingested: int
    first_page: int
    next_page: int
    exhausted: bool


def run_backfill(
    spark: SparkSession,
    fetcher: PageFetcher,
    bronze_dir: str,
    state_path: str,
    policy: FetchPolicy = FetchPolicy(),
    max_pages_per_run: int = MAX_PAGES_PER_RUN,
) -> BackfillResult:
    start = load_cursor(spark, state_path)
    pages = list(range(start, start + max_pages_per_run))
    raw = fetch_pages_raw(spark, pages, fetcher, policy).cache()
    try:
        page_counts = {
            r["page"]: r["n"]
            for r in raw.groupBy("page").agg(F.count("*").alias("n")).collect()
        }
        # first empty page ends the run (F3); later pages are discarded
        first_empty = next((p for p in pages if page_counts.get(p, 0) == 0), None)
        if first_empty is not None:
            keep = [p for p in pages if p < first_empty]
            next_page = first_empty
            exhausted = True
        else:
            keep = pages
            next_page = start + max_pages_per_run
            exhausted = False

        kept = raw.filter(F.col("page").isin(keep)) if keep else None
        n = kept.count() if kept is not None else 0
        if n > 0:
            # single flush, date-stamped like the reference's
            # "{YYYY-MM-DD}/backfill_{ts}.json" naming
            (
                kept.withColumn("ingest_date", F.current_date())
                .write.mode("append")
                .partitionBy("ingest_date")
                .json(bronze_dir)
            )
        # cursor commit AFTER data (same ordering as the reference)
        if next_page != start:
            save_cursor(spark, state_path, next_page)
        return BackfillResult(
            n_ingested=n, first_page=start, next_page=next_page, exhausted=exhausted
        )
    finally:
        raw.unpersist()
