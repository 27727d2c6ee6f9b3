"""Parquet table loaders for the driver-generated test tables (TESTDATA.md).

At 100 TB these reads are partitioned cloud-storage scans; everything here
is a plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
column pruning and partition pruning (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.session import ensure_query_session_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. Lazy — no I/O until an action runs.

    ``events.ts`` normalization: the generated parquet has shipped as both
    TIMESTAMP(NANOS) (reads as int64 under legacy nanosAsLong) and
    TIMESTAMP(MICROS, ntz) (reads as TIMESTAMP_NTZ).  Either way we
    normalize to a session-TZ TIMESTAMP in UTC wall time — NTZ carries no
    zone, and the session TZ is pinned UTC (ensure_query_session_conf),
    so the cast is value-preserving and matches DuckDB's naive reading.
    Event-time ops (withWatermark, unix_micros, window()) require the
    zoned TIMESTAMP type, which is why NTZ can't flow through raw.
    """
    ensure_query_session_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every test table as a dict of lazy DataFrames."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a session temp view for the ``spark.sql``
    entry path — the same names the DuckDB oracle pre-registers, so a
    single ANSI SQL string can run verbatim on both engines."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def scale_out(df: DataFrame, *by: str) -> DataFrame:
    """Widen an under-partitioned input to the session's parallelism.

    A small source (one parquet file at test SFs, one under-split blob in
    production) scans as a single partition, serializing every downstream
    expensive transform (shingling, hashing, vector math).  One narrow
    shuffle of the *input* rows buys full parallelism for the heavy work
    after it; hashing by key keeps later same-key aggregations co-located.
    No-op when the scan is already wide enough — at 100 TB the file splits
    themselves provide the parallelism and this adds nothing.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    # inputFiles() is a listing, not a plan compile (df.rdd would be); file
    # count under-estimates splits (row groups) but only near the boundary.
    if len(df.inputFiles()) >= max(2, target // 2):
        return df
    return df.repartition(target, *by) if by else df.repartition(target)
