"""Bronze small-file compaction — the maintenance job every incremental
ingest eventually needs: each run of plans/incremental.py appends one
ld-JSON file per page batch (the reference appends one blob per page:
fetch_articles.py:126), so a partition accumulates hundreds of KB-sized
files whose per-file open/list overhead eventually dominates scan cost.

Compaction rewrites a partition's many small files into few target-sized
ones — same rows, same schema, same partition — atomically:

1. read the live partition (pinned schema, no inference),
2. write the compacted layout to a staging dir next to it,
3. swap staging over live with two renames (old dir kept as `.pre-compact`
   until the swap completes, then removed).

The swap is the same write-then-rename idempotence pattern the state
writer uses (sources/state.py); a crash before the final rename leaves
the original partition untouched, a crash after it leaves the compacted
one — never a mix.  Row-count equality is checked before the swap and
the job aborts (leaving live data untouched) on any mismatch.

At 100 TB this runs per-partition (ingest_date), so compaction
parallelism and blast radius are both one day of data; a lakehouse
format (Delta/Iceberg) replaces the rename dance with a metadata commit,
which is the documented production upgrade.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import SparkSession

from azure_func_forem_data_etl_spark.sources.bronze import BRONZE_SCHEMA


def compact_bronze_partition(
    spark: SparkSession,
    bronze_dir: str,
    ingest_date: str,
    target_records_per_file: int = 100_000,
) -> dict:
    """Compact one ``ingest_date=<d>`` bronze partition in place.

    Returns a stats dict: files before/after, rows (unchanged by
    construction — verified before the swap).
    """
    part = Path(bronze_dir) / f"ingest_date={ingest_date}"
    if not part.exists():
        return {"files_before": 0, "files_after": 0, "rows": 0, "compacted": False}
    files_before = [p for p in part.glob("*.json") if p.is_file()]
    if len(files_before) <= 1:
        return {
            "files_before": len(files_before),
            "files_after": len(files_before),
            "rows": None,
            "compacted": False,
        }

    live = spark.read.schema(BRONZE_SCHEMA).json(str(part))
    rows_before = live.count()

    staging = part.with_name(part.name + ".compact-staging")
    backup = part.with_name(part.name + ".pre-compact")
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(backup, ignore_errors=True)
    (
        live.coalesce(max(1, rows_before // target_records_per_file or 1))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_records_per_file)
        .json(str(staging))
    )
    rows_after = spark.read.schema(BRONZE_SCHEMA).json(str(staging)).count()
    if rows_after != rows_before:  # abort: leave live partition untouched
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch for {part}: {rows_before} -> {rows_after}"
        )
    part.rename(backup)
    staging.rename(part)
    shutil.rmtree(backup)
    files_after = [p for p in part.glob("*.json") if p.is_file()]
    return {
        "files_before": len(files_before),
        "files_after": len(files_after),
        "rows": rows_before,
        "compacted": True,
    }
