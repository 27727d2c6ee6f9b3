"""Continuous time-bucket rollup — the "hypertable rollup" pattern: a
materialized hourly aggregate table maintained incrementally as event
files land, so dashboard queries read the (tiny) rollup instead of
re-scanning raw events.

Each micro-batch partially aggregates to (bucket, event_type) and merges
into the rollup by key: existing counts/sums add, new keys insert.
Decomposable aggregates only — count and decimal sum re-aggregate exactly,
so the rollup equals the from-scratch aggregate at every point in time
(tested).  Merge commits via the same atomic directory swap as
streaming/silver.py.

At 100 TB: the batch side is a partial agg of just the new files; the
merge touches one rollup row per (bucket x type) seen in the batch —
bounded by time, not corpus size.  A transactional format (Delta MERGE)
replaces the swap; the dataflow is unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.session import ensure_query_session_conf

ROLLUP_BUCKET = "1 hour"


def _batch_partial(batch: DataFrame) -> DataFrame:
    return (
        batch.groupBy(
            F.window("ts", ROLLUP_BUCKET).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def merge_rollup(spark: SparkSession, partial: DataFrame, rollup_dir: str) -> None:
    """Add the batch partials into the rollup table (insert-or-accumulate)."""
    if os.path.exists(rollup_dir):
        current = spark.read.parquet(rollup_dir)
        merged = (
            current.unionByName(partial)
            .groupBy("bucket_start", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )
    else:
        merged = partial
    tmp = f"{rollup_dir}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{rollup_dir}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(rollup_dir):
        os.rename(rollup_dir, old)
    os.rename(tmp, rollup_dir)
    shutil.rmtree(old, ignore_errors=True)


def run_streaming_rollup(
    spark: SparkSession,
    events_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    schema: str = "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string",
) -> int:
    """Drain new event files into the hourly rollup; returns rows consumed."""
    ensure_query_session_conf(spark)
    stream = spark.readStream.schema(schema).parquet(events_dir)
    seen = {"rows": 0}

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        seen["rows"] += n
        merge_rollup(spark, _batch_partial(batch_df), rollup_dir)

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return seen["rows"]


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """The dashboard-facing view: final DOUBLE sums, one row per bucket/type."""
    return spark.read.parquet(rollup_dir).select(
        "bucket_start",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# registry query: the maintained rollup must equal the batch aggregate

from azure_func_forem_data_etl_spark.functions.exact import sql_dsum  # noqa: E402
from azure_func_forem_data_etl_spark.plans.registry import register  # noqa: E402
from azure_func_forem_data_etl_spark.streaming.core import (  # noqa: E402
    _stream_scratch_dir,
    stream_session,
    stream_table,
)
import tempfile  # noqa: E402


@register(
    "streaming_hypertable_rollup",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Continuous hourly rollup maintained by foreachBatch merges; the "
    "oracle is the from-scratch aggregate — incremental == batch, exactly.",
)
def streaming_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the real maintenance loop — event stream drained AvailableNow,
    each micro-batch partially aggregated and merged into the rollup
    table by key — then returns the rollup.  Matching the DuckDB
    from-scratch aggregate hash-exactly IS the correctness contract of
    incremental view maintenance: count and decimal sum are decomposable,
    so merge order and batch boundaries can't change the result."""
    # input-sized shuffle width for the per-batch partial aggregates and
    # rollup merges — see streaming_tumbling_window (r14)
    spark = stream_session(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="forem_etl_rollup_q_", dir=_stream_scratch_dir())
    rollup_dir = f"{base}/rollup"
    ckpt = f"{base}/ckpt"
    stream = stream_table(spark, sf_dir, "events")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_rollup(spark, _batch_partial(batch_df), rollup_dir)

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(rollup_dir):  # empty source
        return spark.createDataFrame(
            [], "bucket_start timestamp, event_type string, "
            "n_events bigint, sum_value double"
        )
    return read_rollup(spark, rollup_dir)
