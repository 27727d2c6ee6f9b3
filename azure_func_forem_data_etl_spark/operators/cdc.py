"""Change-data-capture / slowly-changing-dimension shapes over the events
stream — the lakehouse silver-layer patterns a production deployment of the
reference's ingest would grow into (the reference lands raw batches only;
SURVEY.md §4.3 notes dedup/versioning is left to downstream).

``scd2_user_state`` is the classic SCD Type-2 collapse: per user, the
event_type stream becomes contiguous validity intervals
(valid_from/valid_to, NULL = current).  Pure window functions — two
ordered passes over the same (user_id, ts) partitioning, which Spark
executes as ONE shuffle feeding both Window operators; at 100 TB this is
the cheapest possible shape for state-history derivation (no join, no
second exchange)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table


@register(
    "scd2_user_state",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id,
           event_type AS state,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           CAST(lead(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL AS INT)
               AS is_current
    FROM changes
    """,
    doc="SCD Type-2 state history: consecutive identical event_types "
    "collapse into validity intervals (valid_from/valid_to, open = "
    "current) — lag-filter + lead over one (user_id, ts) partitioning.",
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both window passes share the (user_id) partitioning and (ts,
    event_id) ordering, so Catalyst plans a single sort-shuffle; the
    change-filter between them is row-local.  event_id breaks ts ties
    deterministically (same tiebreak as the oracle)."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(wc)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().cast("int").alias("is_current"),
    )
