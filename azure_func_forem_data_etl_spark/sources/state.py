"""Pipeline state: the watermark and cursor records the reference keeps in
well-known blobs, as one-row parquet state tables.

Reference semantics preserved exactly:
- watermark: ``{"latest_timestamp": iso8601}``; any read failure => None
  => cold start ingests everything (fetch_articles.py:33-44); write
  overwrites, no-op for None (fetch_articles.py:47-55).
- cursor: ``{"page": int}``; default 1, clamped ``max(1, page)``
  (fetch_articles_backfill.py:36-44); write overwrites, no-op for falsy
  page (fetch_articles_backfill.py:47-55).

Write protocol matches the reference's at-least-once ordering — data
committed BEFORE state (fetch_articles.py:128-136, SURVEY.md §4.3) — so
a crash between the two duplicates a batch; downstream silver dedups by
id.  The streaming jobs replace this file-state entirely with the
checkpoint's atomic offset/commit logs.

Writes go to a temp dir + atomic rename so a torn write can't corrupt
state (object stores give this per-blob; local FS needs the rename).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import uuid

from pyspark.sql import Row, SparkSession


def _overwrite_atomic(spark: SparkSession, row: Row, path: str) -> None:
    tmp = f"{path}__tmp_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame([row]).coalesce(1).write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def load_watermark(spark: SparkSession, path: str) -> dt.datetime | None:
    """None on any failure => cold start (fetch_articles.py:41-43)."""
    try:
        rows = spark.read.parquet(path).collect()
        return rows[0]["latest_timestamp"] if rows else None
    except Exception:
        return None


def save_watermark(spark: SparkSession, path: str, ts: dt.datetime | None) -> None:
    """No-op for None (fetch_articles.py:48-49); overwrite otherwise."""
    if ts is None:
        return
    _overwrite_atomic(spark, Row(latest_timestamp=ts), path)


def load_cursor(spark: SparkSession, path: str) -> int:
    """Default 1; clamp max(1, page) (fetch_articles_backfill.py:41-44)."""
    try:
        rows = spark.read.parquet(path).collect()
        page = int(rows[0]["page"]) if rows else 1
        return max(1, page)
    except Exception:
        return 1


def save_cursor(spark: SparkSession, path: str, page: int | None) -> None:
    """No-op for falsy page (fetch_articles_backfill.py:48-49)."""
    if not page:
        return
    _overwrite_atomic(spark, Row(page=int(page)), path)
