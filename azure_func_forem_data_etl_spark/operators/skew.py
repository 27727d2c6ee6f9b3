"""Skew mitigation: salted two-phase aggregation and salted broadcast-side
replication join.

AQE's skew-join splitting (enabled in session.py) handles sort-merge skew
at runtime; these are the *explicit* tools for the cases AQE can't fix —
a hot grouping key whose single reducer becomes the straggler, and a
broadcast-too-big / hot-key shuffle join.

``salted_agg``: phase 1 groups on (key, salt) so the hot key's rows spread
over ``n_salt`` reducers and partial-aggregate there; phase 2 re-aggregates
the ``n_salt`` partials per key.  Decomposable aggregates only
(count/sum/min/max); the salt is a deterministic hash of a unique column,
so results are reproducible run-to-run.

``salted_join``: the left (fact) side salts each row; the right (dim) side
is replicated once per salt value via an explicit salt-array explode; the
equi-join key becomes (key, salt).  The hot key's matches now land on
``n_salt`` tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.functions.exact import dsum, sql_dsum
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table

N_SALT = 16


def _salt(unique_col: str, n_salt: int) -> Column:
    return F.pmod(F.xxhash64(unique_col), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    key: str,
    unique_col: str,
    n_salt: int = N_SALT,
) -> DataFrame:
    """(key, n, sum_value) via two-phase salted aggregation of ``value``."""
    phase1 = (
        df.withColumn("__salt", _salt(unique_col, n_salt))
        .groupBy(key, "__salt")
        .agg(
            F.count("*").alias("__n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("__sum"),
        )
    )
    return phase1.groupBy(key).agg(
        F.sum("__n").alias("n"),
        F.sum("__sum").cast("double").alias("sum_value"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_unique_col: str,
    n_salt: int = N_SALT,
) -> DataFrame:
    """Skew-safe equi-join: fact rows salt deterministically; dim rows
    replicate across all salt values; join on (key, salt)."""
    f = fact.withColumn("__salt", _salt(fact_unique_col, n_salt))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = f.join(d, [key, "__salt"])
    return out.drop("__salt")


@register(
    "salted_agg_events",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY event_type
    """,
    doc="Two-phase salted aggregation — result identical to the direct agg; "
    "the salt only changes the shuffle shape (hot key spread over 16 reducers).",
)
def salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return salted_agg(events, key="event_type", unique_col="event_id")


@register(
    "salted_join_cohorts",
    oracle=f"""
    WITH dim AS (
        SELECT user_id,
               strftime(MIN(CAST(date_trunc('day', ts) AS DATE)), '%Y-%m')
                   AS cohort
        FROM events GROUP BY user_id
    )
    SELECT e.event_type, d.cohort,
           COUNT(*) AS n,
           {sql_dsum('e.value')} AS sum_value
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY e.event_type, d.cohort
    """,
    doc="Skew-safe salted fact-dim join: the user dim replicates across "
    "16 salts, fact rows salt deterministically, join on (key, salt) — "
    "result identical to the plain join, hot users spread over 16 tasks.",
)
def salted_join_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit-salt twin of AQE's skew-join split, for hot FACT keys
    a broadcast can't fix (dim too big) and AQE won't (hash join).  Dim
    replication is a map-side ×n_salt explode — bounded, no shuffle of
    its own; the join shuffle then spreads each hot user over n_salt
    reducers.  The cohort agg afterwards proves result-identity against
    the unsalted oracle join."""
    events = table(spark, sf_dir, "events")
    dim = (
        events.select(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .groupBy("user_id")
        .agg(F.date_format(F.min("day"), "yyyy-MM").alias("cohort"))
    )
    joined = salted_join(
        events.select("event_id", "user_id", "event_type", "value"),
        dim,
        key="user_id",
        fact_unique_col="event_id",
    )
    return joined.groupBy("event_type", "cohort").agg(
        F.count("*").alias("n"), dsum("value").alias("sum_value")
    )
