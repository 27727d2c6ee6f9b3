"""Streaming upsert (latest-wins merge) via ``foreachBatch`` — the
lakehouse silver-table pattern: each micro-batch is reduced to one row per
key and merged into a persistent state table, so the sink always holds the
CURRENT row per key no matter how many times a key re-appears across
batches (the reference overwrites whole blobs per run,
fetch_articles.py:120-133; this is the per-key version of that contract).

On a production cluster the merge step is a Delta/Iceberg ``MERGE INTO``
(file-format-level upsert); on plain parquet we express the identical
semantics as read-state -> union -> keep-latest -> atomic directory swap.
State size is O(distinct keys), not stream length, and the per-batch cost
is one keyed window over (existing keys + batch keys).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.streaming.core import (
    _stream_scratch_dir,
    stream_table,
)


def latest_per_key(
    df: DataFrame, key: str = "user_id", order: tuple[str, ...] = ("ts", "event_id")
) -> DataFrame:
    """One row per key: greatest (order...) wins, deterministic ties."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def run_upsert_stream(
    spark: SparkSession, source: DataFrame, state_root: str
) -> str:
    """Drive ``source`` to completion, merging each micro-batch into the
    parquet state table under ``state_root``; returns the state path."""
    state_path = os.path.join(state_root, "state")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        latest = latest_per_key(batch_df)
        if os.path.isdir(state_path):
            current = batch_df.sparkSession.read.parquet(state_path)
            merged = latest_per_key(current.unionByName(latest))
        else:
            merged = latest
        # Write-then-swap: the new state is fully materialized to a side
        # directory before the old one is replaced, so a crashed batch
        # never leaves a half-written table (same data-before-state
        # ordering as sources/state.py).
        tmp = f"{state_path}__b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{state_path}__old{batch_id}"
        if os.path.isdir(state_path):
            os.rename(state_path, old)
        os.rename(tmp, state_path)
        shutil.rmtree(old, ignore_errors=True)

    ckpt = os.path.join(state_root, "ckpt")
    (
        source.writeStream.foreachBatch(merge)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return state_path


@register(
    "streaming_upsert_latest",
    oracle="""
    SELECT user_id,
           event_type AS last_event_type,
           ts AS last_ts,
           value AS last_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
    doc="foreachBatch latest-wins upsert: stream events into a keyed "
    "parquet state table (read-merge-swap per micro-batch); final table "
    "is the current row per user.",
)
def streaming_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT routed through stream_session: the per-batch merge is a batch
    # window whose shuffle AQE already coalesces; the r14 interleaved A/B
    # measured the clone at ×1.07 (no win to keep).
    events = stream_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="forem_etl_upsert_", dir=_stream_scratch_dir())
    state = run_upsert_stream(spark, events, root)
    if not os.path.isdir(state):
        # zero micro-batches ran (empty source): no state table was ever
        # written — the current-state view is simply empty.
        return spark.createDataFrame(
            [],
            "user_id bigint, last_event_type string, "
            "last_ts timestamp, last_value double",
        )
    return spark.read.parquet(state).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("ts").alias("last_ts"),
        F.col("value").alias("last_value"),
    )
