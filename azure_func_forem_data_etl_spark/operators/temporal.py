"""Temporal joins Spark lacks as single operators: as-of join and range
join, composed from shuffles Spark already does well (SURVEY.md §2b).

As-of join strategy (scale-first): the classic distributed formulation —
union both sides tagged, one shuffle on the join key, a single ordered
window pass carrying the last-seen right payload forward.  No range
explosion, no per-key collect, O(n log n) per partition.  This is how
kdb-style ``aj`` is expressed on a shuffle engine.

Range join strategy: equi-join on the key (hash/SMJ — Catalyst picks) with
the range predicate evaluated as a join residual, so the shuffle is keyed
and bounded; never a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.functions.exact import (
    dround,
    dsum,
    sql_dround,
    sql_dsum,
)
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row with the
    greatest ``right_ts <= left_ts`` within the same ``on`` key.

    Right payload columns come back NULL when no prior right row exists.
    ``tiebreak`` orders right rows that share (key, ts); the greatest wins.
    """
    pay = F.struct(*[F.col(c) for c in [right_ts, *right_payload]])
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        pay.alias("__rpay"),
        *(
            [F.col(tiebreak).alias("__tb")]
            if tiebreak
            else [F.lit(0).alias("__tb")]
        ),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__rpay"].dataType).alias("__rpay"),
        F.lit(0).alias("__tb"),
    )
    # Right rows sort before left rows at equal ts => inclusive (<=) match.
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__is_left", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r, allowMissingColumns=True).withColumn(
        "__match", F.last("__rpay", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("__is_left") == 1)
    for c in [right_ts, *right_payload]:
        out = out.withColumn(c, F.col("__match").getField(c))
    return out.drop("__ts", "__is_left", "__rpay", "__tb", "__match")


@register(
    "asof_join_purchase",
    oracle="""
    WITH p AS (
        -- identified purchases only (r11 null-FK sweep): an anonymous
        -- purchase attributes to no one — the SQL equality join drops
        -- it anyway, but Spark's NULL-pooling window partition would
        -- hand it to every other anonymous event
        SELECT user_id, p_ts, p_event_id FROM (
            SELECT user_id, ts AS p_ts, event_id AS p_event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events
            WHERE event_type = 'purchase' AND user_id IS NOT NULL
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts, p.p_ts, p.p_event_id
    FROM events e
    ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.p_ts
    """,
    doc="As-of join: each event annotated with the user's most recent purchase at-or-before it.",
)
def asof_join_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    purchases = (
        # identified purchases only — see the oracle note (null-FK sweep)
        events.filter(
            (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_event_id"),
        )
    )
    return asof_join(
        events.select("event_id", "user_id", "ts"),
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_payload=["p_event_id"],
    ).select("event_id", "user_id", "ts", "p_ts", "p_event_id")


@register(
    "range_join_followup",
    oracle="""
    SELECT s.event_id AS signup_event_id,
           s.user_id,
           COUNT(e.event_id) AS n_followup
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
    LEFT JOIN events e
      ON e.user_id = s.user_id
     AND e.ts > s.ts
     AND e.ts <= s.ts + INTERVAL '1 hour'
    GROUP BY s.event_id, s.user_id
    """,
    doc="Range join: events within 1h after each signup, keyed on user (equi-join + range residual).",
)
def range_join_followup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("s_ts"),
    )
    e = events.select(
        F.col("event_id").alias("e_event_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
    )
    cond = (
        (e.e_user_id == signups.s_user_id)
        & (e.e_ts > signups.s_ts)
        & (e.e_ts <= signups.s_ts + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        signups.join(e, cond, "left")
        .groupBy("signup_event_id", F.col("s_user_id").alias("user_id"))
        .agg(F.count("e_event_id").alias("n_followup"))
    )


@register(
    "gapfill_hourly_locf",
    oracle=f"""
    WITH span AS (
        SELECT event_type,
               time_bucket(INTERVAL '1 hour', MIN(ts)) AS h0,
               time_bucket(INTERVAL '1 hour', MAX(ts)) AS h1
        FROM events GROUP BY event_type
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour_start
        FROM span
    ),
    agg AS (
        SELECT event_type,
               time_bucket(INTERVAL '1 hour', ts) AS hour_start,
               COUNT(*) AS n,
               {sql_dsum('value')} AS sv
        FROM events GROUP BY 1, 2
    )
    SELECT s.event_type, s.hour_start,
           COALESCE(a.n, 0) AS n_events,
           CAST(a.n IS NULL AS INT) AS was_gap,
           last_value(a.sv IGNORE NULLS) OVER (
               PARTITION BY s.event_type ORDER BY s.hour_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
    FROM spine s LEFT JOIN agg a USING (event_type, hour_start)
    """,
    doc="Hypertable-style gap-fill: dense hourly spine per series (explode of "
    "sequence(min,max)) + LOCF of the last observed hourly sum.",
)
def gapfill_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + last-observation-carried-forward, all narrow after one agg.

    The spine derives from a per-series min/max aggregate and an
    ``explode(sequence(...))`` — no cross join, no driver-side loop, so the
    plan scales with #series x #hours, never with raw event count.  The
    reference's date-partitioned sink (fetch_articles.py:126) is the
    degenerate daily version of this: its "missing day" is simply an absent
    partition; here the gap becomes an explicit zero row plus carried value.
    """
    events = table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count("*").alias("n"), dsum("value").alias("sv"))
    spine = (
        events.groupBy("event_type")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias(
                "hour_start"
            ),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(hourly, ["event_type", "hour_start"], "left").select(
        "event_type",
        "hour_start",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.col("n").isNull().cast("int").alias("was_gap"),
        F.last("sv", ignorenulls=True).over(w).alias("filled_sum"),
    )


#: Linear-interpolation CASE shared with the oracle f-string below —
#: observed hours pass through, interior gaps lerp between neighbours,
#: edges fall back to the nearest observed value.
_INTERP_CASE = """CASE
               WHEN sv IS NOT NULL THEN sv
               WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   pv + (nv - pv)
                        * (CAST(date_diff('hour', ph, hour_start) AS DOUBLE)
                           / CAST(date_diff('hour', ph, nh) AS DOUBLE))
               ELSE COALESCE(pv, nv)
           END"""


@register(
    "gapfill_hourly_interp",
    oracle=f"""
    WITH span AS (
        SELECT event_type,
               time_bucket(INTERVAL '1 hour', MIN(ts)) AS h0,
               time_bucket(INTERVAL '1 hour', MAX(ts)) AS h1
        FROM events GROUP BY event_type
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour_start
        FROM span
    ),
    agg AS (
        SELECT event_type,
               time_bucket(INTERVAL '1 hour', ts) AS hour_start,
               {sql_dsum('value')} AS sv
        FROM events GROUP BY 1, 2
    ),
    ctx AS (
        SELECT s.event_type, s.hour_start, a.sv,
               last_value(a.sv IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN a.sv IS NOT NULL THEN s.hour_start END
                          IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
               first_value(a.sv IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour_start
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN a.sv IS NOT NULL THEN s.hour_start END
                           IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour_start
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        FROM spine s LEFT JOIN agg a USING (event_type, hour_start)
    )
    SELECT event_type, hour_start,
           CAST(sv IS NULL AS INT) AS was_gap,
           -- shortest-repr rounding, see exact.sql_dround (r11 magnitude
           -- sweep: scaled round flips the 6th dp at 1e9 magnitudes)
           {sql_dround(_INTERP_CASE, 6)} AS filled_sum
    FROM ctx
    """,
    doc="Gap-fill with LINEAR interpolation between neighboring observed "
    "hourly sums (LOCF's sibling; edges fall back to nearest value).",
)
def gapfill_hourly_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across gaps: each missing hour gets
    ``prev + (next - prev) * elapsed/gap_width``; leading/trailing gaps
    fall back to the nearest observed value (LOCF/NOCB).

    Same dense-spine construction as ``gapfill_hourly_locf`` (explode of
    per-series sequence — never a cross join) plus ONE window over the
    spine providing all four context values (prev/next value and hour) in
    a single sort: the forward and backward frames share the partition
    ordering, so Catalyst plans one exchange + two sorts, costs that scale
    with #series × #hours.  The interpolation weight is a ratio of exact
    integer hour deltas; the arithmetic runs on decimal-exact doubles —
    engine-stable under round(6)."""
    events = table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(dsum("value").alias("sv"))
    spine = (
        events.groupBy("event_type")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h0"),
            F.date_trunc("hour", F.max("ts")).alias("h1"),
        )
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias(
                "hour_start"
            ),
        )
    )
    back = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the NOCB side runs as a RUNNING frame over the REVERSED order, not
    # first() over (currentRow, unboundedFollowing): Spark evaluates an
    # unbounded-FOLLOWING frame by rescanning current..end for every row
    # — O(n^2) per series, 36 minutes on a 10-year hourly spine (r11
    # long-span probe) — while the running frame is incremental O(n)
    fwd_desc = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("hour_start"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_hour = F.when(F.col("sv").isNotNull(), F.col("hour_start"))
    ctx = (
        spine.join(hourly, ["event_type", "hour_start"], "left")
        .withColumn("pv", F.last("sv", ignorenulls=True).over(back))
        .withColumn("ph", F.last(obs_hour, ignorenulls=True).over(back))
        .withColumn("nv", F.last("sv", ignorenulls=True).over(fwd_desc))
        .withColumn("nh", F.last(obs_hour, ignorenulls=True).over(fwd_desc))
    )
    frac = F.expr("timestampdiff(HOUR, ph, hour_start)").cast("double") / F.expr(
        "timestampdiff(HOUR, ph, nh)"
    ).cast("double")
    return ctx.select(
        "event_type",
        "hour_start",
        F.col("sv").isNull().cast("int").alias("was_gap"),
        # shortest-repr rounding (exact.dround): Spark's exact-expansion
        # round and duckdb's scaled round disagree on 1e9-magnitude
        # interpolated values (r11 magnitude sweep)
        dround(
            F.when(F.col("sv").isNotNull(), F.col("sv"))
            .when(
                F.col("pv").isNotNull() & F.col("nv").isNotNull(),
                F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
            )
            .otherwise(F.coalesce("pv", "nv")),
            6,
        ).alias("filled_sum"),
    )


@register(
    "time_weighted_avg_events",
    oracle="""
    WITH o AS (
        SELECT event_type, value, ts,
               lead(ts) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS next_ts
        FROM events
    ),
    seg AS (
        SELECT event_type,
               CAST(date_diff('second', ts, next_ts) AS BIGINT) AS dt,
               CAST(value AS DECIMAL(18,4)) AS v
        FROM o WHERE next_ts IS NOT NULL
    )
    SELECT event_type,
           -- STRING round-trip: the value x seconds decimal sum's
           -- scale-4 integer form passes 2^53 on large-magnitude values,
           -- where duckdb's direct decimal->double cast is 1 ulp off
           -- Spark's correctly-rounded cast (see exact.sql_dsum)
           -- the v factor widens to DECIMAL(26,4) FIRST: duckdb multiplies
           -- in the narrower operand's storage domain, and an int64-backed
           -- DECIMAL(18,4) x seconds product overflows at value*dt ~ 1e15
           -- (r13 combo leg: 1e9-magnitude values x 21-hour gaps); Spark
           -- already promotes the product to an int128-backed DECIMAL(31,4)
           CAST(CAST(SUM(CAST(v AS DECIMAL(26,4)) * CAST(dt AS DECIMAL(12,0)))
                     AS STRING) AS DOUBLE)
               / CAST(SUM(dt) AS DOUBLE) AS twa_value,
           CAST(SUM(dt) AS BIGINT) AS total_seconds
    FROM seg GROUP BY event_type
    -- degenerate contract (r12 const-ts probe): a series whose
    -- observations span ZERO seconds has no time-weighted average
    -- (Spark ANSI raises DIVIDE_BY_ZERO, DuckDB returns inf) — no
    -- rows, both engines
    HAVING SUM(dt) > 0
    """,
    doc="Time-weighted average per series: each value weighted by the "
    "seconds until the next observation (hypertable time_weight).",
)
def time_weighted_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The timeseries mean that irregular sampling actually needs: a
    value that held for an hour outweighs one that held a second —
    ``avg(value)`` can't see that.  Last observation per series carries
    no duration and is excluded (the standard hypertable time_weight
    "LOCF until next point" definition).

    One window (per-series sort) + one aggregation, both keyed on
    event_type.  Weights are exact integer seconds; weighted products
    stay in the decimal domain — engine-exact division at the end."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    o = events.withColumn("next_ts", F.lead("ts").over(w)).filter(
        F.col("next_ts").isNotNull()
    )
    seg = o.select(
        "event_type",
        (
            F.unix_timestamp("next_ts") - F.unix_timestamp("ts")
        ).cast("long").alias("dt"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    # zero-span series contract (see oracle; r12 const-ts probe): the
    # division is CASE-guarded because ANSI evaluates it inside the
    # aggregate projection, before any post-agg filter
    tot = F.sum("dt")
    return (
        seg.groupBy("event_type")
        .agg(
            F.when(
                tot > 0,
                F.sum(F.col("v") * F.col("dt").cast("decimal(12,0)")).cast(
                    "double"
                )
                / tot.cast("double"),
            ).alias("twa_value"),
            tot.cast("long").alias("total_seconds"),
        )
        .filter(F.col("total_seconds") > 0)
    )


@register(
    "rolling_distinct_users",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           COUNT(DISTINCT u.user_id) AS users_7d
    FROM days d JOIN du u
      ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY strftime(d.day, '%Y-%m-%d')
    """,
    doc="Rolling 7-day distinct users per day (the DAU/WAU shape): "
    "day-spine range join over the deduped (day, user) relation.",
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct counts don't decompose over sliding frames (a user active
    on 3 days must count once), so the rolling window is re-expressed as
    a bounded EXPLODE: dedup to (day, user) first — the ONLY pass over
    raw events — then each (day, user) row contributes to the 7 report
    days it falls into (sequence+explode, map-side), an equi semi-join
    against the observed-day spine drops report days with no events, and
    one distinct-agg per report day finishes.

    Scale shape: the (day, user) relation is ≤ days × active-users (≪
    events); fanout is a hard ×7; every join is equi (broadcast spine —
    a range-condition spine join would compile to BroadcastNestedLoopJoin,
    banned by the plan lint).  At a larger horizon the exact path swaps
    for per-day HLL sketch unions (hll_sketch_union) — same query,
    mergeable state."""
    events = table(spark, sf_dir, "events")
    du = events.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct().withColumnRenamed("day", "spine_day")
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("spine_day"),
        "user_id",
    )
    return (
        contrib.join(F.broadcast(days), "spine_day", "left_semi")
        .groupBy(F.date_format("spine_day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


@register(
    "sessionize_gap_islands",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, SUM(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS session_no
        FROM marked
    )
    SELECT user_id,
           CAST(session_no AS INT) AS session_no,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           {sql_dsum("value")} AS total_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
    doc="Batch sessionization (gap-and-islands): 30-min inactivity gap "
    "starts a new session; lag-mark + running-sum island ids + one "
    "per-session aggregate.",
)
def sessionize_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin of ``streaming_sessionize_state``: both window
    passes (gap mark, island number) and the final groupBy all key on
    user_id, so Catalyst plans ONE shuffle feeding two Window operators
    and a partial-aggregated groupBy — the cheapest shape for
    sessionization at rest.  Contrast with the streaming path, which
    needs per-key state because it cannot see the whole timeline.
    event_id breaks ts ties exactly like the oracle's WINDOW clause."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Exact-microsecond gap compare (unix_micros, not ts.cast('long') which
    # truncates to whole seconds): the oracle's `ts - lag(ts) <= INTERVAL
    # 30 MINUTE` is full-precision, so a sub-second fractional gap straddling
    # the 1800 s boundary (e.g. 1800.5 s) must split the session on BOTH
    # sides — same pattern as peak_concurrent_sessions.
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = events.withColumn(
        "is_start",
        F.when(gap_us <= 30 * 60 * 1_000_000, F.lit(0)).otherwise(F.lit(1)),
    )
    numbered = marked.withColumn(
        "session_no", F.sum("is_start").over(w).cast("int")
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
    )


@register(
    "seasonality_dow_profile",
    oracle=f"""
    WITH per AS (
        SELECT event_type,
               -- DuckDB: Sunday=0..Saturday=6; Spark dayofweek: Sunday=1..7
               CAST(dayofweek(ts) + 1 AS INT) AS dow,
               COUNT(*) AS n_events,
               {sql_dsum("value")} AS sum_value
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS type_n
        FROM per GROUP BY event_type
    )
    SELECT p.event_type, p.dow, p.n_events, p.sum_value,
           (CAST(p.n_events AS DOUBLE) * 7.0) / t.type_n AS dow_load_factor
    FROM per p JOIN tot t ON p.event_type = t.event_type
    """,
    doc="Day-of-week seasonality profile: per-type x weekday event counts "
    "and exact value sums plus the load factor (x7 vs a flat week) — the "
    "detrending input for capacity planning / anomaly baselines.",
)
def seasonality_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two nested aggs over the same event_type key: the weekly profile
    reduces to <=7 rows per type before the totals join, so the second
    exchange moves almost nothing.  The load factor (n·7 / type_total)
    is integer-ratio float math, mirrored with the oracle."""
    events = table(spark, sf_dir, "events")
    per = events.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("sum_value"),
    )
    tot = per.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("type_n")
    )
    return per.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        "n_events",
        "sum_value",
        (
            (F.col("n_events").cast("double") * F.lit(7.0)) / F.col("type_n")
        ).alias("dow_load_factor"),
    )


@register(
    "time_to_conversion_cohort",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
               min(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS purchase_ts
        FROM events
        WHERE event_type IN ('signup', 'purchase')
        GROUP BY user_id
    ),
    conv AS (
        SELECT date_trunc('day', signup_ts) AS cohort_day,
               (epoch_us(purchase_ts) - epoch_us(signup_ts)) / 60000000.0
                   AS minutes
        FROM firsts
        WHERE signup_ts IS NOT NULL AND purchase_ts IS NOT NULL
              AND purchase_ts >= signup_ts
    )
    SELECT cohort_day,
           CAST(count(*) AS BIGINT) AS n_converted,
           round(median(minutes), 4) AS median_minutes,
           round(min(minutes), 4) AS min_minutes,
           round(max(minutes), 4) AS max_minutes
    FROM conv GROUP BY cohort_day
    """,
    doc="Time-to-conversion by signup cohort: per user, first signup -> "
    "first purchase latency; per-cohort-day count and median/min/max "
    "minutes (microsecond-exact diffs).",
)
def time_to_conversion_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The activation metric growth teams watch: how long from signup to
    first purchase, cohorted by signup day.  Timestamp differences go
    through microsecond integers (``unix_micros`` / ``epoch_us``) on
    both engines — no truncation-rule drift.

    Scale shape: the event stream is pre-filtered to the two relevant
    types (predicate reaches the scan), aggregated once per user
    (conditional-min — no join between the two event types), then rolled
    up to cohort days.  Exact median per cohort sorts only the per-user
    latencies (users ≪ events); the approx_percentile swap applies at
    extreme scale."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "signup_ts"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "purchase_ts"
        ),
    )
    minutes = (
        F.unix_micros("purchase_ts") - F.unix_micros("signup_ts")
    ) / F.lit(60_000_000.0)
    conv = firsts.filter(
        F.col("signup_ts").isNotNull()
        & F.col("purchase_ts").isNotNull()
        & (F.col("purchase_ts") >= F.col("signup_ts"))
    ).select(
        F.date_trunc("day", "signup_ts").alias("cohort_day"),
        minutes.alias("minutes"),
    )
    return conv.groupBy("cohort_day").agg(
        F.count("*").alias("n_converted"),
        F.round(F.percentile("minutes", 0.5), 4).alias("median_minutes"),
        F.round(F.min("minutes"), 4).alias("min_minutes"),
        F.round(F.max("minutes"), 4).alias("max_minutes"),
    )


# ---------------------------------------------------------------------------
# time-series similarity search: z-normalized sliding-window pattern match
# (the Spark shape of distributed subsequence search, cf. "Time Series
# Similarity Search for Streaming Data in Distributed Systems", EDBT 2019)

TS_WINDOW = 24  # hours per subsequence
#: z-normalized "rising ramp" query pattern (generated from range(1, 25),
#: rounded 6dp; identical constants embedded in the oracle SQL).
TS_PATTERN = [
    -1.661325, -1.516862, -1.372399, -1.227936, -1.083473, -0.93901,
    -0.794547, -0.650084, -0.505621, -0.361158, -0.216695, -0.072232,
    0.072232, 0.216695, 0.361158, 0.505621, 0.650084, 0.794547,
    0.93901, 1.083473, 1.227936, 1.372399, 1.516862, 1.661325,
]
TS_TOPK = 10


def _ts_pattern_sql() -> str:
    return "[" + ", ".join(str(v) for v in TS_PATTERN) + "]"


@register(
    "ts_pattern_similarity",
    oracle=f"""
    WITH span AS (
        SELECT event_type,
               time_bucket(INTERVAL '1 hour', MIN(ts)) AS h0,
               time_bucket(INTERVAL '1 hour', MAX(ts)) AS h1
        FROM events GROUP BY event_type
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL '1 hour'))
                   AS hour_start
        FROM span
    ),
    agg AS (
        SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour_start,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT s.event_type, s.hour_start,
               CAST(COALESCE(a.n, 0) AS DOUBLE) AS v
        FROM spine s LEFT JOIN agg a USING (event_type, hour_start)
    ),
    win AS (
        SELECT event_type, hour_start AS window_end,
               list(v) OVER (
                   PARTITION BY event_type ORDER BY hour_start
                   ROWS BETWEEN {TS_WINDOW - 1} PRECEDING AND CURRENT ROW
               ) AS w,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY hour_start
               ) AS rn
        FROM series
    ),
    stats AS (
        SELECT event_type, window_end, w,
               list_sum(w) / {TS_WINDOW}.0 AS m,
               sqrt(list_sum(list_transform(w,
                        x -> (x - list_sum(w) / {TS_WINDOW}.0)
                           * (x - list_sum(w) / {TS_WINDOW}.0)))
                    / {TS_WINDOW}.0) AS sd
        FROM win WHERE rn >= {TS_WINDOW}
    ),
    dist AS (
        SELECT event_type, window_end,
               round(sqrt(list_sum(list_transform(
                   range(1, {TS_WINDOW} + 1),
                   i -> ((w[i] - m) / sd - ({_ts_pattern_sql()})[i])
                      * ((w[i] - m) / sd - ({_ts_pattern_sql()})[i])
               ))), 6) AS znorm_dist
        FROM stats WHERE sd > 0
    )
    SELECT event_type, window_end, znorm_dist
    FROM dist
    ORDER BY znorm_dist, event_type, window_end
    LIMIT {TS_TOPK}
    """,
    doc=f"Time-series subsequence search: z-normalized euclidean distance "
    f"of every {TS_WINDOW}h sliding window of the hourly event-count "
    f"series against a ramp query pattern; global top-{TS_TOPK} matches.",
)
def ts_pattern_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed subsequence similarity search (EDBT'19 family): find
    where each series looked most like a query shape.  Z-normalization
    makes the match amplitude/offset-invariant — the standard preprocessing
    for subsequence matching (UCR suite).

    Scale shape: the dense spine comes from explode(sequence) per series
    (no cross join); windows assemble via collect_list over a bounded
    24-row frame (state O(W) per series partition); distance is a JVM
    array fold; the global top-k compiles to TakeOrderedAndProject.  At
    100 TB-of-events everything is keyed by series and the per-window
    arithmetic is O(W) — the classic distributed MASS/UCR trade where
    Spark parallelizes across series and windows rather than FFT within
    one series."""
    ev = table(spark, sf_dir, "events")
    span = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = span.select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias(
            "hour_start"
        ),
    )
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count("*").alias("n"))
    series = spine.join(agg, ["event_type", "hour_start"], "left").select(
        "event_type",
        "hour_start",
        F.coalesce("n", F.lit(0)).cast("double").alias("v"),
    )
    w_frame = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(-(TS_WINDOW - 1), 0)
    )
    w_rn = Window.partitionBy("event_type").orderBy("hour_start")
    win = series.select(
        "event_type",
        F.col("hour_start").alias("window_end"),
        F.collect_list("v").over(w_frame).alias("w"),
        F.row_number().over(w_rn).alias("rn"),
    ).filter(F.col("rn") >= TS_WINDOW)
    wsum = F.aggregate(
        "w", F.lit(0.0), lambda acc, x: acc + x
    )
    m = (wsum / float(TS_WINDOW)).alias("m")
    stats = win.select("event_type", "window_end", "w", m)
    sd = F.sqrt(
        F.aggregate(
            "w",
            F.lit(0.0),
            lambda acc, x: acc + (x - F.col("m")) * (x - F.col("m")),
        )
        / float(TS_WINDOW)
    ).alias("sd")
    stats = stats.select("event_type", "window_end", "w", "m", sd).filter(
        F.col("sd") > 0
    )
    pat = F.lit(TS_PATTERN)  # 24 doubles: cheap literal
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    "w", pat, lambda a, b: ((a - F.col("m")) / F.col("sd") - b)
                ),
                F.lit(0.0),
                lambda acc, d: acc + d * d,
            )
        ),
        6,
    ).alias("znorm_dist")
    return (
        stats.select("event_type", "window_end", dist)
        .orderBy("znorm_dist", "event_type", "window_end")
        .limit(TS_TOPK)
    )


@register(
    "interevent_time_profile",
    oracle="""
    WITH d AS (
        SELECT event_type,
               (epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ))) / 60000000.0 AS gap_min
        FROM events
    )
    SELECT event_type,
           CAST(count(gap_min) AS BIGINT) AS n_gaps,
           round(median(gap_min), 4) AS p50_min,
           round(quantile_cont(gap_min, 0.9), 4) AS p90_min,
           round(max(gap_min), 4) AS max_min
    FROM d
    WHERE gap_min IS NOT NULL
    GROUP BY event_type
    """,
    doc="Inter-event time distribution per event type: per-(user, type) "
    "lag gaps in minutes (microsecond-exact), median/p90/max per type.",
)
def interevent_time_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cadence profile behind session-gap and retention thresholds:
    how long between consecutive events of the same type for the same
    user.  Feeds directly into choosing the sessionization gap (see
    ``sessionize_gap_islands``) instead of hard-coding it.

    Scale shape: one window (partition by user x type — high cardinality,
    well-distributed), then an exact-percentile agg per type over the
    gap rollup.  Timestamp diffs go through microsecond integers on both
    engines."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ev = table(spark, sf_dir, "events")
    gap = (
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
        / F.lit(60_000_000.0)
    ).alias("gap_min")
    d = ev.select("event_type", gap).filter(F.col("gap_min").isNotNull())
    return d.groupBy("event_type").agg(
        F.count("gap_min").alias("n_gaps"),
        F.round(F.percentile("gap_min", 0.5), 4).alias("p50_min"),
        F.round(F.percentile("gap_min", 0.9), 4).alias("p90_min"),
        F.round(F.max("gap_min"), 4).alias("max_min"),
    )


LATENESS_BOUNDS_MIN = (10, 60)


@register(
    "watermark_lateness_audit",
    oracle=f"""
    WITH l AS (
        SELECT event_type,
               (epoch_us(max(ts) OVER (
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )) - epoch_us(ts)) / 60000000.0 AS late_min
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_min > {LATENESS_BOUNDS_MIN[0]}
                    THEN 1 ELSE 0 END) AS BIGINT) AS late_over_10m,
           CAST(sum(CASE WHEN late_min > {LATENESS_BOUNDS_MIN[1]}
                    THEN 1 ELSE 0 END) AS BIGINT) AS late_over_60m,
           round(max(late_min), 4) AS max_late_min
    FROM l GROUP BY event_type
    """,
    doc="Watermark-lateness audit: per arrival order (event_id), how far "
    "each event trails the running max event time; counts beyond 10/60 "
    "min bounds say what a watermark setting would drop.",
)
def watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measurement that turns watermark choice from folklore into
    data: replay the stream in arrival order (event_id as the arrival
    proxy), track the running max event time, and measure each event's
    lateness against it.  The 10/60-minute exceedance counts are exactly
    the rows ``withWatermark('ts', ...)`` at those settings would drop —
    the engine-side version of the reference's silent out-of-order drop
    (fetch_articles.py:102-104, SURVEY §2a F1 gap).

    Scale shape: the running max is a single global arrival-order window
    — honest for an audit REPLAY (production tracks it per partition in
    the streaming engine itself); the exceedance rollup is one tiny
    agg.  Microsecond-integer time math on both engines."""
    ev = table(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    late = (
        (F.unix_micros(F.max("ts").over(w)) - F.unix_micros("ts"))
        / F.lit(60_000_000.0)
    ).alias("late_min")
    lo, hi = LATENESS_BOUNDS_MIN
    return (
        ev.select("event_type", late)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("late_min") > lo).cast("int")).cast("long").alias(
                "late_over_10m"
            ),
            F.sum((F.col("late_min") > hi).cast("int")).cast("long").alias(
                "late_over_60m"
            ),
            F.round(F.max("late_min"), 4).alias("max_late_min"),
        )
    )


@register(
    "ohlc_hourly_bars",
    oracle="""
    WITH b AS (
        SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour_start,
               value, ts, event_id
        FROM events
    ),
    r AS (
        SELECT *,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, hour_start ORDER BY ts, event_id
               ) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, hour_start ORDER BY ts DESC, event_id DESC
               ) AS rn_d
        FROM b
    )
    SELECT event_type, hour_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS volume
    FROM r GROUP BY event_type, hour_start
    """,
    doc="OHLC candlestick bars: per (event_type, hour) open/high/low/close/volume with a deterministic (ts, event_id) tie-break.",
)
def ohlc_hourly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series bar aggregation (the financial-rollup classic).  open/
    close are `min_by`/`max_by` against the total order (ts, event_id) —
    selections of existing doubles, so exact cross-engine; high/low/volume
    are plain min/max/count.  One map-combine hash aggregate, shuffle keyed
    on (event_type, hour): at 100 TB the per-group state is five scalars,
    and a year of hourly bars per type is ~9k rows out."""
    ev = table(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour_start"),
            "value",
            order_key.alias("ok"),
        )
        .groupBy("event_type", "hour_start")
        .agg(
            F.min_by("value", F.col("ok")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("ok")).alias("close"),
            F.count("*").alias("volume"),
        )
    )


ATTR_WINDOW_H = 24  # touches within this many hours before a purchase


@register(
    "attribution_multi_touch",
    oracle=f"""
    -- first-write-wins by event_id (r11 dup-keys sweep): at-least-once
    -- delivery re-emits an id with a drifted payload, and grouping by a
    -- non-deduped purchase_id merges two payloads with an
    -- engine-arbitrary ANY_VALUE pick; the earliest (ts, value, user_id)
    -- row is the deterministic representative on both engines: user_id
    -- joins the ORDER BY (r12 ADVICE) so a key-drifted re-delivery tying
    -- on (ts, value) still picks one total-ordered row, and every key is
    -- pinned NULLS FIRST (Spark's ASC default; DuckDB defaults NULLS
    -- LAST) so a NULL payload cannot flip the pick cross-engine
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, ts AS p_ts, value FROM (
            SELECT event_id, user_id, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY event_id
                                      ORDER BY ts NULLS FIRST,
                                               value NULLS FIRST,
                                               user_id NULLS FIRST) AS rn
            FROM events WHERE event_type = 'purchase'
        ) WHERE rn = 1
    ),
    c AS (
        SELECT event_id AS touch_id, user_id, ts AS c_ts FROM (
            SELECT event_id, user_id, ts,
                   ROW_NUMBER() OVER (PARTITION BY event_id
                                      ORDER BY ts NULLS FIRST,
                                               value NULLS FIRST,
                                               user_id NULLS FIRST) AS rn
            FROM events WHERE event_type = 'click'
        ) WHERE rn = 1
    ),
    m AS (
        SELECT p.purchase_id, p.user_id, p.value,
               c.touch_id, c.c_ts
        FROM p JOIN c ON c.user_id = p.user_id
            AND c.c_ts < p.p_ts
            AND c.c_ts >= p.p_ts - INTERVAL {ATTR_WINDOW_H} HOUR
    ),
    -- r10 fix: MIN(x ORDER BY y) silently ignores the ORDER BY for
    -- MIN/MAX in DuckDB, so the old oracle picked the smallest/largest
    -- touch ID rather than the earliest/latest touch — invisible on the
    -- fixtures (event_id correlates with ts there), caught by the
    -- random-fixture sweep where ids are shuffled.  True argmin/argmax
    -- on the (c_ts, touch_id) total order via row_number, mirroring the
    -- Spark side's min_by/max_by struct key exactly.
    r AS (
        SELECT *,
               row_number() OVER (PARTITION BY purchase_id
                                  ORDER BY c_ts, touch_id) AS rf,
               row_number() OVER (PARTITION BY purchase_id
                                  ORDER BY c_ts DESC, touch_id DESC) AS rl
        FROM m
    )
    SELECT purchase_id, user_id,
           COUNT(*) AS n_touches,
           MAX(CASE WHEN rf = 1 THEN touch_id END) AS first_touch_id,
           MAX(CASE WHEN rl = 1 THEN touch_id END) AS last_touch_id,
           ANY_VALUE(value) / COUNT(*) AS credit_per_touch
    FROM r GROUP BY purchase_id, user_id
    """,
    doc=f"Linear multi-touch attribution: each purchase splits credit across the user's clicks in the prior {ATTR_WINDOW_H}h; first/last touch identified.",
)
def attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution, the range-join classic: purchases equi-join
    the same user's clicks with a bounded time residual (never a cross
    join — the shuffle is keyed on user_id and the window bound is a join
    residual), then one keyed agg picks first/last touch on the total
    order (c_ts, touch_id) and splits the purchase value linearly.  Credit
    division runs in the decimal domain so the split is bit-exact
    cross-engine.  100 TB: same shape as range_join_followup — per-user
    event lists are small, skew capped by the join residual window."""
    ev = table(spark, sf_dir, "events")
    # first-write-wins by event_id (see oracle note): deterministic
    # representative for at-least-once re-deliveries of the same id,
    # applied per filtered leg exactly like the oracle CTEs.  user_id
    # completes the total order over every output-visible column (r12
    # ADVICE: key drift tying on ts+value), NULLS FIRST pinned on both
    # engines (Spark's ASC default, made explicit).
    fw = Window.partitionBy("event_id").orderBy(
        F.asc_nulls_first("ts"),
        F.asc_nulls_first("value"),
        F.asc_nulls_first("user_id"),
    )

    def first_write(leg):
        return (
            leg.withColumn("__rn", F.row_number().over(fw))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    p = first_write(ev.filter(F.col("event_type") == "purchase")).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    c = first_write(ev.filter(F.col("event_type") == "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    m = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {ATTR_WINDOW_H} HOURS")),
    )
    ok = F.struct(F.col("c_ts"), F.col("touch_id"))
    return m.groupBy("purchase_id", "user_id").agg(
        F.count("*").alias("n_touches"),
        F.min_by("touch_id", ok).alias("first_touch_id"),
        F.max_by("touch_id", ok).alias("last_touch_id"),
        # plain double / bigint division: identical IEEE operands on both
        # engines -> bit-exact quotient (a decimal-domain divide is NOT,
        # because the two engines pick different quotient scales)
        (F.any_value(F.col("value")) / F.count("*")).alias("credit_per_touch"),
    )


#: event_type -> single char for sequence encoding (CEP pattern alphabet)
_SEQ_CASE_SQL = (
    "CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c' "
    "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' "
    "WHEN 'error' THEN 'e' ELSE 'o' END"
)
#: signup, then purchase, with no error in between (non-overlapping scan)
SEQ_PATTERN = "s[^ep]*p"


@register(
    "event_pattern_regex",
    oracle=f"""
    WITH seq AS (
        SELECT user_id,
               string_agg({_SEQ_CASE_SQL}, '' ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           length(s) AS n_events,
           len(regexp_extract_all(s, '{SEQ_PATTERN}')) AS n_matches
    FROM seq
    WHERE len(regexp_extract_all(s, '{SEQ_PATTERN}')) > 0
    """,
    doc="CEP-lite pattern matching: per-user ordered event sequence as a char string, regex-counted occurrences of signup->(no error)->purchase.",
)
def event_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing via regex over encoded sequences — the
    MATCH_RECOGNIZE workaround every SQL engine without it uses: encode
    each event as one char, order deterministically by (ts, event_id),
    and let the regex engine do the state machine.  Both engines scan
    leftmost-non-overlapping with Perl semantics (Java regex / RE2 agree
    on this alphabet), so counts are exact.  Scale: one user_id-keyed agg;
    per-user sequences are session-sized (chars, not rows) — a 100 TB
    corpus shuffles only (user, seq-string) pairs.  Unbounded per-key
    sequences would cap via sessionized sub-sequences first."""
    ev = table(spark, sf_dir, "events")
    enc = F.expr(_SEQ_CASE_SQL)
    seq = (
        ev.select("user_id", F.struct("ts", "event_id").alias("ok"), enc.alias("ch"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(ok, ch))), x -> x.ch)"),
                "",
            ).alias("s")
        )
    )
    n_matches = F.size(F.regexp_extract_all("s", F.lit(SEQ_PATTERN), 0))
    return (
        seq.select(
            "user_id",
            F.length("s").alias("n_events"),
            n_matches.alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
    )


@register(
    "session_bounce_rate_daily",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, SUM(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS session_no
        FROM marked
    ),
    sess AS (
        SELECT user_id, session_no,
               strftime(MIN(ts), '%Y-%m-%d') AS day,
               COUNT(*) AS n_events
        FROM numbered GROUP BY user_id, session_no
    )
    SELECT day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           round(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate
    FROM sess GROUP BY day
    """,
    doc="Daily bounce rate: share of 30-min-gap sessions containing exactly one event, keyed by session start day.",
)
def session_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engagement KPI on top of gap-island sessionization: a session
    with one event is a bounce.  Same single user_id shuffle feeding both
    windows and the session agg as sessionize_gap_islands, plus a
    |days|-row re-agg; the rate is one double division of exact counts."""
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact-micros gap (see sessionize_gap_islands): matches the oracle's
    # full-precision INTERVAL compare at fractional-second boundaries
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    numbered = (
        events.withColumn(
            "is_start",
            F.when(gap_us <= 30 * 60 * 1_000_000, F.lit(0)).otherwise(F.lit(1)),
        )
        .withColumn(
            "session_no",
            F.sum("is_start").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    sess = numbered.groupBy("user_id", "session_no").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("day"),
        F.count("*").alias("n_events"),
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sess.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        bounces.cast("long").alias("n_bounces"),
        F.round(bounces.cast("double") / F.count("*"), 6).alias("bounce_rate"),
    )


@register(
    "period_over_period_revenue",
    oracle="""
    WITH weekly AS (
        SELECT date_trunc('week', o_orderdate) AS week_start,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS revenue
        FROM orders GROUP BY 1
    )
    SELECT week_start, n_orders, revenue,
           lag(revenue) OVER (ORDER BY week_start) AS prev_revenue,
           round(revenue / lag(revenue) OVER (ORDER BY week_start) - 1.0, 6)
               AS wow_change
    FROM weekly
    """,
    doc="Week-over-week revenue: weekly decimal-exact totals with a lag ratio (NULL on the first week).",
)
def period_over_period_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The period-over-period report every dashboard carries.  Weekly
    totals are decimal-domain (partition-order-independent); the WoW
    ratio is one double division of two such exact totals.  The unkeyed
    lag window runs over |weeks| rows — aggregate-sized, not fact-sized —
    so the single-partition Window is fine at any corpus scale."""
    orders = table(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.date_trunc("week", "o_orderdate").alias("week_start")
    ).agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    w = Window.orderBy("week_start")
    prev = F.lag("revenue").over(w)
    return weekly.select(
        "week_start",
        "n_orders",
        "revenue",
        prev.alias("prev_revenue"),
        F.round(F.col("revenue") / prev - 1.0, 6).alias("wow_change"),
    )


@register(
    "rollup_cascade_daily",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Pre-aggregation cascade: minute partials -> hour partials -> day rollup, all merges on mergeable state; oracle computes directly from raw events.",
)
def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized-rollup cascade every metrics store runs: aggregate
    raw events ONCE at the finest grain (minute), then derive each coarser
    grain from the previous partials — (count, decimal sum) is mergeable
    state, so hour = merge(minutes) and day = merge(hours) are exact.
    The oracle aggregates raw->day directly; hash equality proves the
    cascade loses nothing.  At 100 TB the raw table is scanned once per
    day instead of once per dashboard query, and each cascade level is
    ~60x smaller than the one below it."""
    ev = table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("m"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_dec"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "m").alias("h"), "event_type"
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_dec").alias("sum_dec"),
    )
    day = hour.groupBy(
        F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_dec").cast("double").alias("sum_value"),
    )
    return day


SEASONAL_RESID_Z = 2.0


@register(
    "seasonal_residual_anomalies",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hr,
               CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    prof AS (
        SELECT hod,
               CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_n,
               COUNT(*) AS n_buckets,
               CAST(SUM(n) AS DOUBLE) AS sum_n,
               CAST(SUM(n * n) AS DOUBLE) AS sum_n2
        FROM hourly GROUP BY hod
    ),
    scored AS (
        SELECT h.hr, h.hod, h.n, p.mean_n,
               sqrt(greatest(p.sum_n2 / p.n_buckets
                    - (p.sum_n / p.n_buckets) * (p.sum_n / p.n_buckets),
                    1e-12)) AS sd
        FROM hourly h JOIN prof p ON h.hod = p.hod
    )
    SELECT strftime(hr, '%Y-%m-%d %H:00') AS hour_start, hod, n,
           round(mean_n, 6) AS expected,
           round((n - mean_n) / sd, 4) AS z_score
    FROM scored
    WHERE abs((n - mean_n) / sd) >= {SEASONAL_RESID_Z}
    """,
    doc=f"Seasonality-aware anomaly detection: hourly counts vs their hour-of-day profile, flagged at |z| >= {SEASONAL_RESID_Z}.",
)
def seasonal_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deseasonalized anomaly detection — the upgrade over a global
    threshold (operators/profile.py MAD flags): traffic has an hour-of-day
    shape, so 'unusual' means unusual FOR THAT HOUR.  Population moments
    per hour-of-day come from exact integer sums (sum, sum-of-squares) so
    mean/sd are identical IEEE expressions on both engines; the z-score
    is computed per bucket from those exact operands.  Two keyed aggs +
    one 24-row broadcast join; at 100 TB the raw scan happens once and
    the profile is a constant-size dimension."""
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hr"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count("*").alias("n"))
    prof = hourly.groupBy("hod").agg(
        (F.sum("n").cast("double") / F.count("*")).alias("mean_n"),
        F.count("*").alias("n_buckets"),
        F.sum("n").cast("double").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("sum_n2"),
    )
    sd = F.sqrt(
        F.greatest(
            F.col("sum_n2") / F.col("n_buckets")
            - (F.col("sum_n") / F.col("n_buckets"))
            * (F.col("sum_n") / F.col("n_buckets")),
            F.lit(1e-12),
        )
    )
    z = (F.col("n") - F.col("mean_n")) / F.col("sd")
    return (
        hourly.join(F.broadcast(prof), "hod")
        .withColumn("sd", sd)
        .filter(F.abs(z) >= SEASONAL_RESID_Z)
        .select(
            F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour_start"),
            "hod",
            "n",
            F.round("mean_n", 6).alias("expected"),
            F.round(z, 4).alias("z_score"),
        )
    )


SMAPE_LAG_DAYS = 7  # seasonal-naive horizon: forecast = same weekday last week


@register(
    "forecast_smape_naive",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, {sql_dsum("value")} AS actual
        FROM events GROUP BY 1
    ),
    fc AS (
        SELECT day, actual,
               lag(actual, {SMAPE_LAG_DAYS}) OVER (ORDER BY day) AS forecast
        FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, actual, forecast,
           round(abs(actual - forecast)
                 / ((abs(actual) + abs(forecast)) / 2.0), 6) AS smape_term
    FROM fc WHERE forecast IS NOT NULL
    """,
    doc=f"Seasonal-naive forecast eval: lag-{SMAPE_LAG_DAYS} daily revenue "
    "as the forecast, per-day sMAPE terms.",
)
def forecast_smape_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy baseline every pipeline should publish before
    shipping a fancier model: the seasonal-naive forecast (value of the
    same weekday last week) scored with symmetric MAPE per day.  Any real
    forecaster must beat this table to justify itself (the M-competition
    sanity check).

    Scale shape: corpus aggregates to one row per day first (decimal-
    exact sum), so the lag window runs over a days-count-bounded series —
    the unpartitioned window is grain-bounded, never event-bounded.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("actual")
    )
    w = Window.orderBy("day")
    fc = daily.withColumn("forecast", F.lag("actual", SMAPE_LAG_DAYS).over(w))
    return fc.filter(F.col("forecast").isNotNull()).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "actual",
        "forecast",
        F.round(
            F.abs(F.col("actual") - F.col("forecast"))
            / ((F.abs("actual") + F.abs("forecast")) / 2.0),
            6,
        ).alias("smape_term"),
    )


EWMA_ALPHA = 0.2


@register(
    "ewma_user_value",
    # Promoted rows-only -> oracle in r5: like CUSUM (streaming/drift.py),
    # the recurrence IS SQL-expressible — here as a RECURSIVE CTE stepping
    # rank-by-rank within each user.  pandas ewm(alpha, adjust=False) is
    # bit-identical to the literal recurrence s' = (1.0-a)*s + a*x
    # (verified over 200k values plus the full sf0.01 corpus), and the
    # CTE step uses the identical expression, so the 6dp rounding on both
    # sides compares bit-equal doubles.  Known rounding-mode asymmetry,
    # assessed harmless here: numpy rounds half-to-even, DuckDB half-away
    # — they differ only when the unrounded value is an EXACTLY
    # REPRESENTABLE 6dp midpoint, which (a) cannot happen for first
    # events (s = v, and the corpus values are non-negative 2-decimal
    # quantized, never a 7th-digit half) and (b) is measure-zero for
    # arithmetic-derived s.  NOTE: the CUSUM-style list_reduce encoding
    # is NOT usable here — duckdb 1.0's list_reduce mis-evaluates a
    # sibling-field read of the accumulator (a.s) from the third
    # iteration on when the same arithmetic appears in two result fields
    # (minimal repro in the round-5 notes); the recursive CTE has no such
    # aliasing.
    oracle=f"""
    WITH RECURSIVE ordered AS (
      -- identified users only (r11 null-FK sweep): a per-USER smoothing
      -- over pooled anonymous traffic is meaningless, and the recursive
      -- join's NULL = NULL never advances while Spark's groupBy pools
      -- measured events only (r12 NULL-heavy sweep): an unmeasured
      -- (NULL value) event is not a sample of the series — SQL's NULL
      -- recurrence would poison s forever while pandas' NaN handling
      -- resumes; excluding it keeps one well-defined series on both
      SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
    ),
    ew(user_id, rn, event_id, ts, v, s) AS (
      SELECT user_id, rn, event_id, ts, v, v AS s FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn, o.event_id, o.ts, o.v,
             (1.0 - {EWMA_ALPHA}) * e.s + {EWMA_ALPHA} * o.v AS s
      FROM ew e JOIN ordered o
        ON o.user_id = e.user_id AND o.rn = e.rn + 1
    )
    -- shortest-repr rounding (exact.sql_dround): at 1e9-magnitude
    -- smoothed values the scaled round (x*1e6 then half-away) and
    -- numpy's scaled half-even can land on DIFFERENT 6dp neighbours of
    -- the same bit-identical s (r11 magnitude sweep) — both sides now
    -- round the double's shortest decimal repr instead
    SELECT user_id, event_id, ts, v AS value,
           {sql_dround("s", 6)} AS ewma
    FROM ew
    """,
    doc=f"Per-user EWMA (alpha={EWMA_ALPHA}) of event values via grouped "
    "Arrow batches — the recursive smoothing no window frame can "
    "express; hash-matched against a DuckDB recursive-CTE fold with the "
    "identical IEEE operation order.",
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user — the smoothing
    behind latency dashboards and anomaly baselines.  The recurrence
    s_i = α·x_i + (1-α)·s_{i-1} depends on EVERY prior row, so no SQL
    window frame computes it; this is the textbook case for
    ``applyInPandas``: one Arrow batch per user, a vectorized
    ``ewm(alpha, adjust=False)`` inside.

    Scale shape: one shuffle on user_id; per-group memory is that user's
    event history (bounded by per-user activity, not corpus size —
    monthly partitioning would bound it further).  Output rounds to 6dp
    for reproducibility; the recurrence itself is sequential-exact
    within a group regardless of partitioning because each group is
    processed whole.
    """
    # identified users with measured events only — see the oracle notes
    # (r11 null-FK sweep; r12 NULL-heavy sweep)
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
    )

    def smooth(pdf):
        pdf = pdf.sort_values(["ts", "event_id"])
        pdf["ewma"] = pdf["value"].ewm(alpha=EWMA_ALPHA, adjust=False).mean()
        return pdf

    # 6dp rounding happens OUTSIDE pandas via the shortest-repr contract
    # (exact.dround): numpy's scaled half-even and duckdb's scaled
    # half-away can disagree on 1e9-magnitude values (r11 magnitude
    # sweep) even though the unrounded recurrence is bit-identical
    return ev.groupBy("user_id").applyInPandas(
        smooth, schema="user_id long, event_id long, ts timestamp, value double, ewma double"
    ).withColumn("ewma", dround(F.col("ewma"), 6))


@register(
    "autocorr_daily_revenue",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, {sql_dsum("value")} AS rev
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT CAST(rev AS DECIMAL(18,4)) AS y,
               CAST(lag(rev) OVER (ORDER BY day) AS DECIMAL(18,4)) AS x
        FROM daily
    ),
    m AS (
        -- widen one factor to DECIMAL(38,4): duckdb evaluates a
        -- DECIMAL(18)*DECIMAL(18) product in the narrow operand width
        -- and overflows on 1e13-scale daily revenues (r11 magnitude
        -- sweep); the VARCHAR round-trips make the decimal->double
        -- casts correctly rounded past 2^53 (see exact.sql_dsum)
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(x) AS STRING) AS DOUBLE) AS sx,
               CAST(CAST(SUM(y) AS STRING) AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(x AS DECIMAL(38,4)) * y) AS STRING) AS DOUBLE) AS sxy,
               CAST(CAST(SUM(CAST(x AS DECIMAL(38,4)) * x) AS STRING) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(y AS DECIMAL(38,4)) * y) AS STRING) AS DOUBLE) AS syy
        FROM pairs WHERE x IS NOT NULL
    )
    SELECT n,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
               AS autocorr_lag1
    FROM m
    -- degenerate contract (r10 random sweep): with < 2 pairs or a
    -- zero-variance side the denominator is 0 — no rows, both engines
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    doc="Lag-1 autocorrelation of daily revenue via decimal-exact moment "
    "sums (explicit Pearson formula, not engine corr()).",
)
def autocorr_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is today's revenue predictive of tomorrow's?  Lag-1 Pearson
    autocorrelation on the daily series — the one-number stationarity
    screen read before trusting any day-over-day forecast (companion to
    ``forecast_smape_naive``).

    Engine corr() implementations disagree in last ulps (Welford vs
    naive accumulation orders), so the moments are accumulated as exact
    DECIMAL sums over the days-bounded pair table and Pearson is applied
    once at the end — bit-identical in any engine and partition order.

    Scale shape: corpus aggregates to one row per day first; everything
    after runs on the ~30-row series.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("rev")
    )
    w = Window.orderBy("day")
    pairs = daily.select(
        F.col("rev").cast("decimal(18,4)").alias("y"),
        F.lag(F.col("rev").cast("decimal(18,4)")).over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    m = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    # degenerate contract (see oracle): positive variance on both sides
    m = m.filter(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
    )
    return m.select("n", F.round(num / den, 6).alias("autocorr_lag1"))


# --- round 7: Holt double-exponential smoothing & Theil-Sen trend ----------

HOLT_ALPHA = 0.3
HOLT_BETA = 0.1


@register(
    "holt_linear_forecast",
    # Like ewma_user_value, the recurrence is replayed by a recursive CTE
    # whose step uses the LITERAL IEEE expressions of the Python fold:
    #   l' = a*x + (1-a)*(l+b);  b' = g*(l'-l) + (1-g)*b
    # (l' recomputed textually in the b' term — identical double both
    # times).  Seed l=x_1, b=0.  Outputs are floor-quantized to 6dp, NOT
    # round()ed: with 2-decimal inputs and finite-decimal smoothing
    # factors (0.3/0.7, 0.1/0.9) the early-round states are EXACT finite
    # decimals, so 7th-digit midpoints genuinely occur and Python's
    # half-even disagrees with DuckDB's half-away there (hit by the
    # random-series property test at seed 0).  floor(x*1e6)/1e6 has no
    # midpoint: both engines floor the same bit-identical double.
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT CAST(ts AS DATE) AS day, {sql_dsum("value")} AS rev
        FROM events GROUP BY 1
    ),
    ordered AS (
        SELECT day, rev, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    h(rn, day, rev, l, b) AS (
      SELECT rn, day, rev, rev AS l, CAST(0.0 AS DOUBLE) AS b
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.rn, o.day, o.rev,
             {HOLT_ALPHA} * o.rev + (1.0 - {HOLT_ALPHA}) * (h.l + h.b) AS l,
             {HOLT_BETA} * (({HOLT_ALPHA} * o.rev
                             + (1.0 - {HOLT_ALPHA}) * (h.l + h.b)) - h.l)
                 + (1.0 - {HOLT_BETA}) * h.b AS b
      FROM h JOIN ordered o ON o.rn = h.rn + 1
    )
    SELECT CAST(day AS VARCHAR) AS day, rev,
           floor(l * 1000000) / 1000000 AS level,
           floor(b * 1000000) / 1000000 AS trend,
           floor((l + b) * 1000000) / 1000000 AS forecast_next
    FROM h
    """,
    doc=f"Holt double-exponential smoothing (alpha={HOLT_ALPHA}, "
    f"beta={HOLT_BETA}) of daily revenue: level, trend, and one-step "
    "forecast per day.",
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trend-aware smoothing — the step past EWMA every forecasting
    dashboard takes (EWMA lags a trending series; Holt tracks it with an
    explicit trend state).  Sequential by nature, so it runs as a
    per-series ``applyInPandas`` fold exactly like ewma_user_value; here
    the series is the day-grain revenue rollup, which is already tiny
    (one Arrow batch), and multi-series use partitions by the series key.
    The distributed work is the one day-grain aggregation (exact decimal
    sums); the fold is O(days).
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("rev")
    )

    # forecast_next comes from the UNROUNDED states (round(l+b) !=
    # round(round(l)+round(b)) in general), so the fold emits it directly.
    def fold(pdf):
        import math

        def q6(v: float) -> float:  # floor-quantize: no rounding midpoints
            # NULL/NaN state (a day whose revenue is entirely
            # unmeasured poisons the recurrence on both engines) stays
            # NULL (r12 NULL-heavy sweep)
            if v is None or math.isnan(v):
                return None
            return math.floor(v * 1e6) / 1e6

        pdf = pdf.sort_values("day").reset_index(drop=True)
        # day goes out as an ISO string: DuckDB's pandas bridge renders
        # DATE as midnight timestamps, so a date-typed column would
        # canonicalize differently on the two sides
        pdf["day"] = pdf["day"].map(lambda d: d.isoformat())
        a, g = HOLT_ALPHA, HOLT_BETA
        lvl, trd, fc = [], [], []
        l = b = None
        for x in pdf["rev"]:
            if l is None:
                l, b = x, 0.0
            else:
                l_new = a * x + (1.0 - a) * (l + b)
                b = g * (l_new - l) + (1.0 - g) * b
                l = l_new
            lvl.append(q6(l))
            trd.append(q6(b))
            fc.append(q6(l + b))
        pdf["level"] = lvl
        pdf["trend"] = trd
        pdf["forecast_next"] = fc
        return pdf

    return daily.groupBy(F.lit(1).alias("__series")).applyInPandas(
        fold,
        schema="day string, rev double, level double, trend double, "
        "forecast_next double",
    )


@register(
    "theil_sen_daily_trend",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, {sql_dsum("value")} AS rev
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT rev, row_number() OVER (ORDER BY day) AS i FROM daily
    ),
    slopes AS (
        SELECT (b.rev - a.rev) / (b.i - a.i) AS slope
        FROM idx a JOIN idx b ON b.i > a.i
    ),
    ranked AS (
        SELECT slope,
               row_number() OVER (ORDER BY slope) AS rn,
               COUNT(*) OVER () AS m
        FROM slopes
    )
    -- GROUP BY the joined totals row (not an ungrouped aggregate): on a
    -- degenerate single-day input the slopes set is empty and BOTH
    -- engines must return 0 rows (the Spark side crossJoins the n_days
    -- scalar into the mid rows, so it yields nothing when mid is empty)
    SELECT CAST(t.n_days AS BIGINT) AS n_days,
           CAST(MAX(m) AS BIGINT) AS n_pairs,
           round(AVG(slope), 6) AS theil_slope
    FROM ranked
    CROSS JOIN (SELECT COUNT(*) AS n_days FROM idx) t
    WHERE rn IN ((m + 1) // 2, (m + 2) // 2)
    GROUP BY t.n_days
    """,
    doc="Theil-Sen robust trend of daily revenue: exact median of all "
    "pairwise day-index slopes (outlier-resistant OLS alternative).",
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust trend estimation — the median-of-slopes estimator shrugs
    off the single-day spikes that wreck an OLS fit
    (regression_value_trend is its least-squares sibling).

    Scale shape: the pairwise self-join runs on the DAY-GRAIN rollup
    (<= 366 rows -> <= 67k pairs, broadcast), never on raw events; the
    corpus is touched by one exact-decimal aggregation.  The median is
    the exact middle element (mean of the two middles for even counts)
    selected by row_number — identical IEEE doubles and identical
    ordering on both engines.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("rev")
    ).localCheckpoint(eager=True)  # <=366 rows, pair-joined below
    idx = daily.select(
        "rev", F.row_number().over(Window.orderBy("day")).alias("i")
    )
    a = idx.select(F.col("rev").alias("rev_a"), F.col("i").alias("i_a"))
    b = idx.select(F.col("rev").alias("rev_b"), F.col("i").alias("i_b"))
    slopes = (
        F.broadcast(a)
        .join(b, F.col("i_b") > F.col("i_a"))
        .select(
            ((F.col("rev_b") - F.col("rev_a")) / (F.col("i_b") - F.col("i_a"))).alias(
                "slope"
            )
        )
    )
    ranked = slopes.select(
        "slope",
        F.row_number().over(Window.orderBy("slope")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("m"),
    )
    n_days = idx.agg(F.count("*").alias("n_days"))
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("m") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
    )
    return mid.crossJoin(F.broadcast(n_days)).groupBy("n_days").agg(
        F.max("m").alias("n_pairs"),
        F.round(F.avg("slope"), 6).alias("theil_slope"),
    )


@register(
    "kendall_tau_daily",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, {sql_dsum("value")} AS rev,
               CAST(COUNT(*) AS BIGINT) AS n_ev
        FROM events GROUP BY 1
    ),
    p AS (
        SELECT CAST(SUM(CASE WHEN (b.rev - a.rev) * (b.n_ev - a.n_ev) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS nc,
               CAST(SUM(CASE WHEN (b.rev - a.rev) * (b.n_ev - a.n_ev) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS nd,
               -- standard tau-b correction: tx counts ALL pairs tied on x
               -- and ty all pairs tied on y, INCLUDING both-tied pairs
               -- (scipy's n1/n2 convention)
               CAST(SUM(CASE WHEN b.rev = a.rev
                             THEN 1 ELSE 0 END) AS BIGINT) AS tx,
               CAST(SUM(CASE WHEN b.n_ev = a.n_ev
                             THEN 1 ELSE 0 END) AS BIGINT) AS ty,
               CAST(COUNT(*) AS BIGINT) AS n0
        FROM daily a JOIN daily b ON b.day > a.day
    )
    SELECT nc, nd, n0 AS n_pairs,
           round((nc - nd) / sqrt(CAST(n0 - tx AS DOUBLE) * (n0 - ty)), 6)
               AS tau_b
    FROM p
    """,
    doc="Kendall tau-b rank correlation between daily revenue and daily "
    "event count (concordant/discordant pair counts, tie-corrected).",
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-association test that ignores magnitudes entirely —
    robust where Pearson (agg_correlation) is leverage-sensitive.
    Concordance counting is pure integer arithmetic over the day-grain
    pair join (<= 67k broadcast pairs after one exact-decimal corpus
    aggregation), so only the final tau expression touches floats.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("rev"), F.count("*").alias("n_ev")
    ).localCheckpoint(eager=True)  # <=366 rows, self-joined below
    a = daily.select(
        F.col("day").alias("day_a"), F.col("rev").alias("rev_a"), F.col("n_ev").alias("ev_a")
    )
    b = daily.select(
        F.col("day").alias("day_b"), F.col("rev").alias("rev_b"), F.col("n_ev").alias("ev_b")
    )
    dr = F.col("rev_b") - F.col("rev_a")
    de = F.col("ev_b") - F.col("ev_a")
    p = (
        F.broadcast(a)
        .join(b, F.col("day_b") > F.col("day_a"))
        .agg(
            F.sum(F.when(dr * de > 0, 1).otherwise(0)).alias("nc"),
            F.sum(F.when(dr * de < 0, 1).otherwise(0)).alias("nd"),
            # scipy's n1/n2 convention: tx = ALL pairs tied on x, ty = ALL
            # pairs tied on y — both-tied pairs count toward both
            F.sum(
                F.when(F.col("rev_b") == F.col("rev_a"), 1).otherwise(0)
            ).alias("tx"),
            F.sum(
                F.when(F.col("ev_b") == F.col("ev_a"), 1).otherwise(0)
            ).alias("ty"),
            F.count("*").alias("n0"),
        )
    )
    return p.select(
        "nc",
        "nd",
        F.col("n0").alias("n_pairs"),
        F.round(
            (F.col("nc") - F.col("nd"))
            / F.sqrt(
                (F.col("n0") - F.col("tx")).cast("double") * (F.col("n0") - F.col("ty"))
            ),
            6,
        ).alias("tau_b"),
    )


@register(
    "changepoint_binary_split",
    oracle=f"""
    WITH daily AS (
        -- rev stays in the decimal domain end-to-end: the old
        -- double-and-round detour re-rounded 1e13-scale sums on the
        -- scaled path (r11 combined-extremes probe)
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS rev
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT day, rev, row_number() OVER (ORDER BY day) AS i,
               SUM(rev) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(rev) OVER () AS s,
               COUNT(*) OVER () AS n
        FROM daily
    ),
    gains AS (
        SELECT day, i, n,
               -- between-segment SS for split after position i:
               -- k*(m1-m)^2 + (n-k)*(m2-m)^2, all from exact prefix
               -- sums; decimal->double via STRING (exact.sql_dsum: the
               -- scale-4 prefix integers pass 2^53 at 1e13 daily sums)
               i * (CAST(CAST(cum AS STRING) AS DOUBLE) / i
                    - CAST(CAST(s AS STRING) AS DOUBLE) / n)
                 * (CAST(CAST(cum AS STRING) AS DOUBLE) / i
                    - CAST(CAST(s AS STRING) AS DOUBLE) / n)
               + (n - i) * (CAST(CAST(s - cum AS STRING) AS DOUBLE) / (n - i)
                            - CAST(CAST(s AS STRING) AS DOUBLE) / n)
                 * (CAST(CAST(s - cum AS STRING) AS DOUBLE) / (n - i)
                    - CAST(CAST(s AS STRING) AS DOUBLE) / n) AS gain,
               CAST(CAST(cum AS STRING) AS DOUBLE) / i AS mean_left,
               CAST(CAST(s - cum AS STRING) AS DOUBLE) / (n - i) AS mean_right
        FROM idx WHERE i < n
    )
    SELECT CAST(day AS VARCHAR) AS split_day, i AS split_idx,
           CAST(n AS BIGINT) AS n_days,
           {sql_dround("gain", 4)} AS gain,
           {sql_dround("mean_left", 4)} AS mean_left,
           {sql_dround("mean_right", 4)} AS mean_right
    FROM gains
    ORDER BY gain DESC, i LIMIT 1
    """,
    doc="Binary-segmentation changepoint on daily revenue: the split "
    "maximizing between-segment sum of squares, via exact prefix sums.",
)
def changepoint_binary_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First step of binary-segmentation changepoint detection: scan every
    split of the daily series and keep the one with the largest
    between-segment SS (equivalently the largest within-SS reduction).
    Prefix sums over the day-grain rollup are exact decimals, so each
    candidate's gain is one deterministic double expression and the
    argmax (gain desc, index asc) picks identically in both engines.
    One corpus aggregation; everything else is day-grain.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        # pure decimal rev (see oracle note): no double detour
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("rev")
    )
    w_ord = Window.orderBy("day")
    idx = daily.select(
        "day",
        F.row_number().over(w_ord).alias("i"),
        F.sum("rev").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("rev").over(Window.partitionBy()).alias("s"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    i, n = F.col("i"), F.col("n")
    m = F.col("s").cast("double") / n
    m1 = F.col("cum").cast("double") / i
    m2 = (F.col("s") - F.col("cum")).cast("double") / (n - i)
    gains = idx.filter(i < n).select(
        "day",
        "i",
        "n",
        (i * (m1 - m) * (m1 - m) + (n - i) * (m2 - m) * (m2 - m)).alias("gain"),
        m1.alias("mean_left"),
        m2.alias("mean_right"),
    )
    return (
        gains.orderBy(F.col("gain").desc(), "i")
        .limit(1)
        .select(
            F.col("day").cast("string").alias("split_day"),
            F.col("i").alias("split_idx"),
            F.col("n").alias("n_days"),
            dround(F.col("gain"), 4).alias("gain"),
            dround(F.col("mean_left"), 4).alias("mean_left"),
            dround(F.col("mean_right"), 4).alias("mean_right"),
        )
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
        FROM events GROUP BY 1
    ),
    sized AS (
        SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM firsts GROUP BY 1
    ),
    rev AS (
        SELECT f.cohort,
               CAST(floor(date_diff('day', f.cohort,
                                    date_trunc('week', e.ts)) / 7) AS BIGINT)
                   AS age_weeks,
               SUM(CAST(e.value AS DECIMAL(18,4))) AS wk_rev
        FROM events e JOIN firsts f ON f.user_id = e.user_id
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT r.cohort, r.age_weeks, s.n_users,
               SUM(r.wk_rev) OVER (PARTITION BY r.cohort ORDER BY r.age_weeks
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        FROM rev r JOIN sized s ON s.cohort = r.cohort
    )
    SELECT CAST(CAST(cohort AS DATE) AS VARCHAR) AS cohort_week,
           age_weeks, n_users,
           round(CAST(cum_rev AS DOUBLE), 4) AS cum_revenue,
           round(CAST(cum_rev AS DOUBLE) / n_users, 6) AS ltv_per_user
    FROM cum
    """,
    doc="Cohort lifetime-value curve: cumulative revenue per signup-week "
    "cohort by cohort age in weeks, normalized per user.",
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue companion to retention_cohorts (which counts active
    users): how much cumulative value each signup-week cohort has
    produced by age N weeks.  Two corpus-grain aggregations (first-touch
    per user; revenue per cohort-age cell) and a running sum over the
    BOUNDED cohort x age grid; revenue stays in exact decimals until the
    final per-user normalization.
    """
    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    ).localCheckpoint(eager=True)  # user-grain; consumed by sized + join
    sized = firsts.groupBy("cohort").agg(F.count("*").alias("n_users"))
    rev = (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
            ).alias("age_weeks"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("wk_rev"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        rev.join(sized, "cohort")
        .select(
            "cohort", "age_weeks", "n_users", F.sum("wk_rev").over(w).alias("cum_rev")
        )
    )
    return cum.select(
        F.col("cohort").cast("date").cast("string").alias("cohort_week"),
        "age_weeks",
        "n_users",
        F.round(F.col("cum_rev").cast("double"), 4).alias("cum_revenue"),
        F.round(F.col("cum_rev").cast("double") / F.col("n_users"), 6).alias(
            "ltv_per_user"
        ),
    )


@register(
    "asof_join_nearest",
    defer=True,
    oracle="""
    WITH ev AS MATERIALIZED (
        -- surrogate row key: the back/fwd directions are re-paired row
        -- by row below, and event_id alone fans out on at-least-once
        -- inputs where the same id is delivered twice (r11 dup-keys
        -- sweep); identical full rows make any rid assignment
        -- output-equivalent
        SELECT ROW_NUMBER() OVER (ORDER BY event_id, ts, value) AS rid,
               event_id, user_id, ts, event_type
        FROM events
    ),
    p AS (
        -- identified purchases only (r11 null-FK sweep, same contract
        -- as asof_join_purchase)
        SELECT user_id, p_ts, p_event_id FROM (
            SELECT user_id, ts AS p_ts, event_id AS p_event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events
            WHERE event_type = 'purchase' AND user_id IS NOT NULL
        ) WHERE rn = 1
    ),
    back AS (
        SELECT e.rid, e.event_id, e.user_id, e.ts, p.p_ts AS b_ts,
               p.p_event_id AS b_id
        FROM ev e
        ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.p_ts
    ),
    fwd AS (
        SELECT e.rid, p.p_ts AS f_ts, p.p_event_id AS f_id
        FROM ev e
        ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.p_ts
    ),
    paired AS (
        SELECT b.event_id, b.user_id, b.ts, b.b_ts, b.b_id, f.f_ts, f.f_id,
               epoch_us(b.ts) - epoch_us(b.b_ts) AS db,
               epoch_us(f.f_ts) - epoch_us(b.ts) AS df
        FROM back b JOIN fwd f ON f.rid = b.rid
    )
    SELECT event_id, user_id, ts,
           CASE WHEN db IS NOT NULL AND (df IS NULL OR db <= df)
                THEN b_id ELSE f_id END AS p_event_id,
           CASE WHEN db IS NOT NULL AND (df IS NULL OR db <= df)
                THEN db ELSE df END AS dist_us,
           CASE WHEN COALESCE(LEAST(db, df), db, df) = 0 THEN 'at'
                WHEN db IS NOT NULL AND (df IS NULL OR db <= df)
                THEN 'backward' ELSE 'forward' END AS direction
    FROM paired
    """,
    doc="Nearest-direction as-of join: each event annotated with the "
    "user's CLOSEST purchase in either direction (ties -> the earlier "
    "one), its microsecond distance, and the match direction.",
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third as-of direction (backward and range joins exist;
    'nearest' is what feature pipelines want for label attachment when
    the causal direction is unknown).  One shuffle: events and the
    deduped purchases union into a single per-user sort, and TWO frames
    over that one sort produce the at-or-before and at-or-after
    candidates (last/first non-null payload); the nearer one wins,
    backward on distance ties.  The backward frame here is exclusive at
    equal ts (the right row sorts after the left one), which is
    indistinguishable in the output: an equal-ts purchase is the forward
    candidate at distance 0 and direction reports 'at'.
    """
    events = table(spark, sf_dir, "events")
    purchases = (
        # identified purchases only — see the oracle note (null-FK sweep)
        events.filter(
            (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
    )
    pay = F.struct(F.col("p_ts"), F.col("p_id"))
    r = purchases.select(
        "user_id",
        F.col("p_ts").alias("__ts"),
        F.lit(0).alias("__is_left"),
        pay.alias("__rpay"),
    )
    l = events.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts").alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__rpay"].dataType).alias("__rpay"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # one sort: right rows AFTER left rows at equal ts, so the following
    # frame (forward match) is inclusive and the preceding frame is
    # exclusive — see docstring for why that is output-equivalent
    order = Window.partitionBy("user_id").orderBy("__ts", F.desc("__is_left"))
    w_back = order.rowsBetween(Window.unboundedPreceding, 0)
    # forward match as a RUNNING frame over the reversed order (right
    # rows first at equal ts, so the left row's frame still includes the
    # same-ts purchase): an unbounded-FOLLOWING frame is O(n^2) per user
    # in Spark (rescans current..end per row) — quadratic on exactly the
    # hot users skew concentrates (r11 long-span probe, gapfill find)
    order_desc = Window.partitionBy("user_id").orderBy(
        F.desc("__ts"), F.asc("__is_left")
    )
    w_fwd = order_desc.rowsBetween(Window.unboundedPreceding, 0)
    m = (
        u.withColumn("__b", F.last("__rpay", ignorenulls=True).over(w_back))
        .withColumn("__f", F.last("__rpay", ignorenulls=True).over(w_fwd))
        .filter(F.col("__is_left") == 1)
    )
    db = F.unix_micros("ts") - F.unix_micros(F.col("__b.p_ts"))
    df_ = F.unix_micros(F.col("__f.p_ts")) - F.unix_micros("ts")
    back_wins = F.col("__b").isNotNull() & (F.col("__f").isNull() | (db <= df_))
    dist = F.when(back_wins, db).otherwise(df_)
    return m.select(
        "event_id",
        "user_id",
        "ts",
        F.when(back_wins, F.col("__b.p_id")).otherwise(F.col("__f.p_id")).alias(
            "p_event_id"
        ),
        dist.alias("dist_us"),
        F.when(dist == 0, "at")
        .when(back_wins, "backward")
        .otherwise("forward")
        .alias("direction"),
    )


@register(
    "spearman_rho_daily",
    defer=True,
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, {sql_dsum("value")} AS rev,
               CAST(COUNT(*) AS BIGINT) AS n_ev
        FROM events GROUP BY 1
    ),
    ranked AS (
        -- average ranks held as exact integers (twice the rank): Spearman
        -- is scale-invariant, so rho on 2r equals rho on r
        SELECT CAST(2 * rank() OVER (ORDER BY rev)
                    + COUNT(*) OVER (PARTITION BY rev) - 1 AS BIGINT) AS a,
               CAST(2 * rank() OVER (ORDER BY n_ev)
                    + COUNT(*) OVER (PARTITION BY n_ev) - 1 AS BIGINT) AS b
        FROM daily
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
               CAST(SUM(a * b) AS BIGINT) AS sab,
               CAST(SUM(a * a) AS BIGINT) AS saa,
               CAST(SUM(b * b) AS BIGINT) AS sbb
        FROM ranked
    )
    SELECT n AS n_days,
           round((n * sab - sa * sb)
                 / sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                        * (n * sbb - sb * sb)), 6) AS spearman_rho
    FROM s
    -- degenerate contract (r11 single-row sweep): rho is undefined when
    -- either rank variance is 0 (one day, or all-tied ranks) — no rows
    WHERE n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
    """,
    doc="Spearman rank correlation (revenue vs event count, day grain): "
    "Pearson on tie-averaged ranks held as exact integers.",
)
def spearman_rho_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-transform sibling of kendall_tau_daily: O(n log n) via
    two rank windows instead of O(n^2) pair counting, and directly
    comparable to the Pearson value (agg_correlation).  Average ranks
    are carried as twice-ranks so every moment sum is exact integer
    arithmetic; only the final rho expression is floating point.  One
    corpus aggregation; windows run on the day-grain rollup.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("rev"), F.count("*").alias("n_ev")
    )
    ranked = daily.select(
        (
            2 * F.rank().over(Window.orderBy("rev"))
            + F.count("*").over(Window.partitionBy("rev"))
            - 1
        ).alias("a"),
        (
            2 * F.rank().over(Window.orderBy("n_ev"))
            + F.count("*").over(Window.partitionBy("n_ev"))
            - 1
        ).alias("b"),
    )
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    n, sa, sb, sab, saa, sbb = (F.col(c) for c in ("n", "sa", "sb", "sab", "saa", "sbb"))
    # degenerate contract (see oracle): zero rank variance => no rows;
    # the filter precedes the rho projection so ANSI never divides
    return s.filter(
        (n * saa - sa * sa > 0) & (n * sbb - sb * sb > 0)
    ).select(
        n.alias("n_days"),
        F.round(
            (n * sab - sa * sb)
            / F.sqrt((n * saa - sa * sa).cast("double") * (n * sbb - sb * sb)),
            6,
        ).alias("spearman_rho"),
    )


ACF_MAX_LAG = 7


@register(
    "acf_daily_revenue_lags",
    defer=True,
    oracle=f"""
    WITH daily AS (
        -- DECIMAL(19,4): width > 18 forces DuckDB's int128 backing so the
        -- x*y products below cannot overflow the int64 fast path
        SELECT CAST(ts AS DATE) AS day,
               CAST({sql_dsum("value")} AS DECIMAL(19,4)) AS rev
        FROM events GROUP BY 1
    ),
    idx AS (SELECT rev, row_number() OVER (ORDER BY day) AS rn FROM daily),
    lags AS (SELECT UNNEST(range(1, {ACF_MAX_LAG} + 1)) AS lag),
    pairs AS (
        SELECT l.lag, a.rev AS x, b.rev AS y
        FROM lags l
        JOIN idx a ON TRUE
        JOIN idx b ON b.rn = a.rn + l.lag
    ),
    m AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM pairs GROUP BY lag
    )
    SELECT lag, n AS n_pairs,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS acf
    FROM m
    -- degenerate contract (r10 random sweep): lags with a zero-variance
    -- side (e.g. lag >= n_days - 1) are dropped on BOTH engines
    WHERE (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
    """,
    doc=f"Autocorrelation of daily revenue at lags 1..{ACF_MAX_LAG} "
    "(decimal-exact moments per lag) — the weekly-seasonality "
    "diagnostic.",
)
def acf_daily_revenue_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-lag extension of autocorr_daily_revenue (lag-1 only): the
    full short-range correlogram, where a lag-7 peak is the weekly
    cycle.  The lag pairing is a self-join of the <=366-row day index
    against a 7-row lag spine (broadcast); per-lag moments run in the
    exact decimal domain, so each acf value is one deterministic double
    expression.  One corpus aggregation total.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").cast("decimal(19,4)").alias("rev")
    ).localCheckpoint(eager=True)  # self-joined per lag below
    idx = daily.select(
        "rev", F.row_number().over(Window.orderBy("day")).alias("rn")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = idx.select(F.col("rev").alias("x"), F.col("rn").alias("rn_a"))
    b = idx.select(F.col("rev").alias("y"), F.col("rn").alias("rn_b"))
    pairs = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("rn_b") == F.col("rn_a") + F.col("lag"))
    )
    m = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    # degenerate contract (see oracle): zero-variance lags are dropped
    m = m.filter((n * sxx - sx * sx) * (n * syy - sy * sy) > 0)
    return m.select(
        "lag",
        n.alias("n_pairs"),
        F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("acf"),
    )


PH_DELTA = 500.0  # magnitude tolerance (currency units)
PH_LAMBDA = 20000.0  # alarm threshold on the PH gap


@register(
    "page_hinkley_value_drift",
    defer=True,
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, {sql_dsum("value")} AS rev
        FROM events GROUP BY 1
    ),
    pre AS (
        SELECT day, rev,
               CAST(SUM(CAST(rev AS DECIMAL(18,4))) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE)
                 / row_number() OVER (ORDER BY day) AS mean_t
        FROM daily
    ),
    terms AS (
        SELECT day,
               CAST(round(rev - mean_t - {PH_DELTA}, 6) AS DECIMAL(18,6))
                   AS term
        FROM pre
    ),
    ph AS (
        SELECT day,
               CAST(SUM(term) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS m_t
        FROM terms
    ),
    gap AS (
        SELECT day, m_t,
               m_t - MIN(m_t) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        FROM ph
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           round(MAX(g), 4) AS max_ph_gap,
           CAST(MIN(CASE WHEN g > {PH_LAMBDA} THEN day END) AS VARCHAR)
               AS first_alarm_day,
           CAST(SUM(CASE WHEN g > {PH_LAMBDA} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alarm_days
    FROM gap
    """,
    doc=f"Page-Hinkley upward mean-shift detector on daily revenue "
    f"(delta={PH_DELTA}, lambda={PH_LAMBDA}): PH gap vs running minimum, "
    "first alarm day.",
)
def page_hinkley_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second classic sequential change detector beside CUSUM
    (streaming_cusum_drift) — but unlike CUSUM's clamp-at-zero fold, the
    PH statistic is WINDOW-EXPRESSIBLE: the cumulative term sum minus
    its running minimum needs no recursion, just three ordered frames
    over the day series.  Per-day terms are 6dp-quantized so the
    cumulative sums are exact decimal; the gap, alarms, and first-alarm
    day follow deterministically.  One corpus aggregation; windows at
    day grain.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("rev")
    )
    w_ord = Window.orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        "rev",
        (
            F.sum(F.col("rev").cast("decimal(18,4)")).over(w_cum).cast("double")
            / F.row_number().over(w_ord)
        ).alias("mean_t"),
    )
    terms = pre.select(
        "day",
        F.round(F.col("rev") - F.col("mean_t") - PH_DELTA, 6)
        .cast("decimal(18,6)")
        .alias("term"),
    )
    ph = terms.select(
        "day", F.sum("term").over(w_cum).cast("double").alias("m_t")
    )
    gap = ph.select(
        "day", (F.col("m_t") - F.min("m_t").over(w_cum)).alias("g")
    )
    return gap.agg(
        F.count("*").alias("n_days"),
        F.round(F.max("g"), 4).alias("max_ph_gap"),
        F.min(F.when(F.col("g") > PH_LAMBDA, F.col("day")))
        .cast("string")
        .alias("first_alarm_day"),
        F.sum(F.when(F.col("g") > PH_LAMBDA, 1).otherwise(0)).alias("n_alarm_days"),
    )


MARKOV_ITERS = 20
_MK_SCALE = 10**15  # stationary vector held as scaled integers


@register(
    "markov_stationary_event_mix",
    defer=True,
    # The whole chain is a <=5x5 integer count matrix, so the power
    # iteration runs in EXACT scaled-integer arithmetic: pi holds
    # probabilities at scale 10^15 and each step is
    #   pi'_j = SUM_i divru(pi_i * c_ij, r_i)      (HALF_UP int division)
    # — pure integer ops a DuckDB recursive CTE replays verbatim in
    # HUGEINT (pi*c ~ 10^21 exceeds int64; products stay far under
    # 2^127).  Same replay family as the PageRank oracle.
    oracle=f"""
    WITH RECURSIVE seq AS (
        -- typed events only (r12 NULL-heavy sweep): a NULL event_type is
        -- not a chain state (python sorted() can't even order it among
        -- strings); both engines drop those rows BEFORE the lead window
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events WHERE event_type IS NOT NULL
    ),
    c AS (
        SELECT event_type AS i, next_type AS j,
               CAST(COUNT(*) AS HUGEINT) AS c_ij
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    r AS (SELECT i, CAST(SUM(c_ij) AS HUGEINT) AS r_i FROM c GROUP BY 1),
    -- state set = union of sources AND targets: a type appearing only as
    -- next_type (absorbing last-event state) must still carry pi mass.
    -- DISTINCT is explicit, NOT via UNION: inside a WITH RECURSIVE block
    -- DuckDB 1.0 runs a non-self-referencing ``A UNION B`` member as
    -- UNION ALL (no dedup!).  It went unnoticed for ten rounds because
    -- with UNIFORM per-state duplicate counts the pi anchor's duplicated
    -- rows re-sum to exactly SCALE/k under the first GROUP BY; the r11
    -- extreme-timestamp sweep produced a corpus with NON-uniform
    -- duplicates (era-clustered types) and skewed the initial vector.
    states AS (SELECT DISTINCT s FROM (
        SELECT i AS s FROM c UNION ALL SELECT j AS s FROM c)),
    n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS k FROM states),
    pi(iter, s, v) AS (
        -- '//' not '/': DuckDB's '/' is FLOAT division even on integers,
        -- which would silently demote the whole recursion to doubles
        SELECT 0, s, CAST({_MK_SCALE} AS HUGEINT) // (SELECT k FROM n)
        FROM states
        UNION ALL
        -- LEFT JOIN: a state with no outgoing transitions keeps its mass
        -- (implicit self-loop), mirroring the Python fold exactly
        SELECT p.iter + 1, COALESCE(c.j, p.s),
               CAST(SUM(CASE WHEN c.i IS NULL THEN p.v
                             ELSE (2 * p.v * c.c_ij + r.r_i) // (2 * r.r_i)
                        END) AS HUGEINT)
        FROM pi p
        LEFT JOIN c ON c.i = p.s
        LEFT JOIN r ON r.i = p.s
        WHERE p.iter < {MARKOV_ITERS}
        GROUP BY 1, 2
    )
    -- 6dp output via exact integer HALF_UP, then a float division of a
    -- <=10^6 integer (exact in double): no engine round() in the path
    SELECT s AS event_type,
           CAST((2 * v + 1000000000) // 2000000000 AS DOUBLE) / 1000000.0
               AS stationary_prob
    FROM pi WHERE iter = {MARKOV_ITERS}
    """,
    doc=f"Stationary distribution of the event-type Markov chain "
    f"({MARKOV_ITERS} exact scaled-integer power iterations over the "
    "transition counts).",
)
def markov_stationary_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where user behavior settles: the stationary mix of the event-type
    transition chain — the model-based answer that raw event frequencies
    (one aggregation) approximate only if behavior is memoryless.  The
    corpus reduces to a <=5x5 transition-count matrix in one pass (lead
    window per user); the power iteration then runs DRIVER-SIDE on that
    bounded matrix in exact scaled-integer arithmetic (Python ints), so
    it is bit-reproducible and the DuckDB recursive CTE replays the
    identical integer recurrence in HUGEINT.
    """
    from pyspark.sql import types as T

    # typed events only — see the oracle note (r12 NULL-heavy sweep)
    ev = table(spark, sf_dir, "events").filter(F.col("event_type").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    cells = (
        seq.groupBy(F.col("event_type").alias("i"), F.col("next_type").alias("j"))
        .agg(F.count("*").alias("c_ij"))
        .collect()
    )
    c: dict = {}
    r: dict = {}
    for row in cells:
        c[(row["i"], row["j"])] = row["c_ij"]
        r[row["i"]] = r.get(row["i"], 0) + row["c_ij"]
    # union of sources and targets: a type seen only as next_type (an
    # absorbing last-event state) still carries pi mass — it keeps it via
    # an implicit self-loop, mirrored by the oracle's LEFT JOIN term
    states = sorted(set(r) | {j for (_, j) in c})
    k = len(states)
    pi = {s: _MK_SCALE // k for s in states}
    for _ in range(MARKOV_ITERS):
        nxt = {s: 0 for s in states}
        for (i, j), cij in c.items():
            nxt[j] += (2 * pi[i] * cij + r[i]) // (2 * r[i])  # divru HALF_UP
        for s in states:
            if s not in r:
                nxt[s] += pi[s]
        pi = nxt
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("stationary_prob", T.DoubleType()),
        ]
    )
    # 6dp via exact integer HALF_UP (see oracle note): engine round()
    # differs at true decimal midpoints, which exact integers CAN hit
    return ev.sparkSession.createDataFrame(
        [(s, ((2 * pi[s] + 10**9) // (2 * 10**9)) / 10**6) for s in states],
        schema,
    )


@register(
    "order_to_ship_latency",
    defer=True,
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority AS priority,
               CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    r AS (
        SELECT priority, d,
               row_number() OVER (PARTITION BY priority ORDER BY d) AS rn,
               COUNT(*) OVER (PARTITION BY priority) AS n
        FROM lat
    )
    SELECT priority,
           CAST(MAX(n) AS BIGINT) AS n_lineitems,
           CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN d END) AS BIGINT)
               AS median_days,
           CAST(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN d END) AS BIGINT)
               AS p90_days,
           CAST(MAX(d) AS BIGINT) AS max_days
    FROM r GROUP BY priority
    """,
    doc="Order-to-ship latency profile per priority: lower median, lower "
    "p90 (exact rank selection), and max days from order date to line "
    "shipment.",
)
def order_to_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational SLA question the priority column exists for: do
    URGENT orders actually ship faster?  Latency is an exact integer day
    difference; the median/p90 are exact rank selections (lower
    convention at rank ceil(q*n)) — actual data values, no
    interpolation, so the comparison is integer end-to-end.  One
    fact-fact join on orderkey + per-priority sort windows.
    """
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    lat = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("d"),
    )
    w = Window.partitionBy("priority").orderBy("d")
    r = lat.select(
        "priority",
        "d",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("priority")).alias("n"),
    )
    return r.groupBy("priority").agg(
        F.max("n").alias("n_lineitems"),
        F.min(
            F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("d"))
        ).alias("median_days"),
        F.min(
            F.when(F.col("rn") == F.floor((9 * F.col("n") + 9) / 10), F.col("d"))
        ).alias("p90_days"),
        F.max("d").alias("max_days"),
    )


@register(
    "markov_entropy_rate",
    defer=True,
    oracle="""
    WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    c AS (
        SELECT event_type AS i, next_type AS j, CAST(COUNT(*) AS BIGINT) AS c_ij
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    r AS (SELECT i, CAST(SUM(c_ij) AS BIGINT) AS r_i FROM c GROUP BY 1),
    t AS (SELECT CAST(SUM(r_i) AS BIGINT) AS total FROM r),
    terms AS (
        -- H(next|cur) = -sum_ij p(i) p(j|i) log2 p(j|i), 10dp-quantized
        SELECT CAST(round((c.c_ij / CAST(t.total AS DOUBLE))
                          * log2(r.r_i / CAST(c.c_ij AS DOUBLE)), 10)
                    AS DECIMAL(18,10)) AS h_ij
        FROM c JOIN r ON r.i = c.i CROSS JOIN t
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_transitions_seen,
           (SELECT CAST(total AS BIGINT) FROM t) AS n_steps,
           round(CAST(SUM(h_ij) AS DOUBLE), 6) AS entropy_rate_bits
    FROM terms
    -- degenerate contract (r11 single-row sweep): a corpus with no
    -- observed transition has no chain — 0 rows on BOTH engines (the
    -- Spark side's group-on-total naturally vanishes on empty input)
    HAVING COUNT(*) > 0
    """,
    doc="Entropy rate of the event-type Markov chain: H(next|current) in "
    "bits from the empirical transition matrix.",
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How predictable is the NEXT event given the current one — the
    conditional-entropy companion to markov_stationary_event_mix (where
    does behavior settle) and user_event_entropy (marginal diversity).
    A rate near log2(5) means the chain adds nothing over the marginal;
    near 0 means deterministic flows.  One lead-window pass to the
    bounded transition matrix; per-cell terms 10dp-quantized before the
    exact sum.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy(F.col("event_type").alias("i"), F.col("next_type").alias("j")).agg(
        F.count("*").alias("c_ij")
    ).localCheckpoint(eager=True)  # shared by r, t, terms
    r = c.groupBy("i").agg(F.sum("c_ij").alias("r_i"))
    t = r.agg(F.sum("r_i").alias("total"))
    n_cells = c.count()
    terms = c.join(F.broadcast(r), "i").crossJoin(F.broadcast(t)).select(
        F.round(
            (F.col("c_ij") / F.col("total").cast("double"))
            * F.log2(F.col("r_i") / F.col("c_ij").cast("double")),
            10,
        )
        .cast("decimal(18,10)")
        .alias("h_ij"),
        "total",
    )
    return terms.groupBy("total").agg(
        F.lit(n_cells).cast("long").alias("n_transitions_seen"),
        F.max("total").alias("n_steps"),
        F.round(F.sum("h_ij").cast("double"), 6).alias("entropy_rate_bits"),
    ).drop("total")


HW_ALPHA = 0.3
HW_BETA = 0.1
HW_GAMMA = 0.2
HW_PERIOD = 7


@register(
    "holt_winters_seasonal",
    defer=True,
    # Triple-exponential replay: the recursive CTE carries the FULL state
    # — (level, trend, seasonal LIST of 7) — and every step uses the
    # literal IEEE expressions of the Python fold (l' appears textually
    # twice, computing the identical double).  Seed: l = first-week mean
    # (exact decimal sum cast to double, then one /7), b = 0, s_i =
    # x_i - l.  Outputs floor-quantized (engine round() diverges at
    # midpoints; see holt_linear_forecast).
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS rev
        FROM events GROUP BY 1
    ),
    ordered AS (
        SELECT day, CAST(rev AS DOUBLE) AS x,
               row_number() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    seed AS (
        SELECT CAST((SELECT SUM(rev) FROM (
                       SELECT rev FROM daily ORDER BY day
                       LIMIT {HW_PERIOD}) t) AS DOUBLE) / {HW_PERIOD} AS l0
    ),
    s0 AS (
        SELECT list(o.x - s.l0 ORDER BY o.rn) AS sl
        FROM ordered o, seed s WHERE o.rn <= {HW_PERIOD}
    ),
    hw(rn, day, x, l, b, sl) AS (
        SELECT o.rn, o.day, o.x, s.l0, CAST(0.0 AS DOUBLE), s0.sl
        FROM ordered o, seed s, s0 WHERE o.rn = {HW_PERIOD}
        UNION ALL
        SELECT o.rn, o.day, o.x,
               {HW_ALPHA} * (o.x - h.sl[1])
                 + (1.0 - {HW_ALPHA}) * (h.l + h.b) AS l,
               {HW_BETA} * (({HW_ALPHA} * (o.x - h.sl[1])
                             + (1.0 - {HW_ALPHA}) * (h.l + h.b)) - h.l)
                 + (1.0 - {HW_BETA}) * h.b AS b,
               list_append(h.sl[2:{HW_PERIOD}],
                   {HW_GAMMA} * (o.x - ({HW_ALPHA} * (o.x - h.sl[1])
                                 + (1.0 - {HW_ALPHA}) * (h.l + h.b)))
                   + (1.0 - {HW_GAMMA}) * h.sl[1]) AS sl
        FROM hw h JOIN ordered o ON o.rn = h.rn + 1
    )
    SELECT CAST(day AS VARCHAR) AS day, x AS rev,
           floor(l * 1000000) / 1000000 AS level,
           floor(b * 1000000) / 1000000 AS trend,
           floor(sl[{HW_PERIOD}] * 1000000) / 1000000 AS seasonal
    FROM hw WHERE rn > {HW_PERIOD}
    """,
    doc=f"Holt-Winters additive seasonal smoothing (alpha={HW_ALPHA}, "
    f"beta={HW_BETA}, gamma={HW_GAMMA}, period={HW_PERIOD}) of daily "
    "revenue: level, trend, and the day's updated seasonal component.",
)
def holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full seasonal forecaster (holt_linear_forecast tracks trend but
    a weekly cycle shows up in its residuals): additive Holt-Winters
    carries a {HW_PERIOD}-slot seasonal state alongside level and trend.
    Same execution pattern as the other sequential folds — the
    distributed work is one exact-decimal day-grain aggregation, the
    fold is an applyInPandas over the (tiny) series — and the oracle
    replays the ENTIRE vector state in a recursive CTE whose seasonal
    list rotates via slice+append, exercising list-typed recursion the
    scalar replays (EWMA, CUSUM, Holt) never touch.  First-week seed:
    level = week mean, trend = 0, seasonal_i = x_i - level; outputs
    floor-quantized to 6dp.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(18,4)").alias("rev")
    )

    def fold(pdf):
        import math
        from collections import deque

        def q6(v: float) -> float:
            # NULL/NaN recurrence state stays NULL (r12 NULL-heavy sweep)
            if v is None or math.isnan(v):
                return None
            return math.floor(v * 1e6) / 1e6

        pdf = pdf.sort_values("day").reset_index(drop=True)
        pdf["day"] = pdf["day"].map(lambda d: d.isoformat())
        m = HW_PERIOD
        if len(pdf) <= m:
            return pdf.head(0).assign(rev=0.0, level=0.0, trend=0.0, seasonal=0.0)[
                ["day", "rev", "level", "trend", "seasonal"]
            ]
        # seed from the first week: exact scaled-integer sum, two float
        # divisions (each correctly rounded) to mirror the SQL
        # CAST(SUM(decimal) AS DOUBLE) / 7.  A day with NO measured
        # revenue carries a NULL rev: SQL SUM skips it (divisor stays 7)
        # and every later state expression NULL-propagates — mirrored
        # here as NaN poison through the recurrence (r12 NULL-heavy
        # sweep); q6 maps NaN back to NULL on output.
        xs = [
            float("nan") if v is None else float(v) for v in pdf["rev"]
        ]
        seed_meas = [x for x in xs[:m] if not math.isnan(x)]
        if seed_meas:
            scaled = sum(round(x * 10000) for x in seed_meas)
            l = (scaled / 10000) / m
        else:
            l = float("nan")  # SUM over an all-NULL week is NULL
        b = 0.0
        sl = deque(x - l for x in xs[:m])
        a, g, c = HW_ALPHA, HW_BETA, HW_GAMMA
        out = []
        for t in range(m, len(xs)):
            x = xs[t]
            s_old = sl[0]
            l_new = a * (x - s_old) + (1.0 - a) * (l + b)
            b = g * (l_new - l) + (1.0 - g) * b
            s_new = c * (x - l_new) + (1.0 - c) * s_old
            sl.popleft()
            sl.append(s_new)
            l = l_new
            out.append(
                (pdf["day"][t], x, q6(l), q6(b), q6(s_new))
            )
        import pandas as pd

        return pd.DataFrame(
            out, columns=["day", "rev", "level", "trend", "seasonal"]
        )

    return daily.groupBy(F.lit(1).alias("__series")).applyInPandas(
        fold,
        schema="day string, rev double, level double, trend double, "
        "seasonal double",
    )


@register(
    "weekly_seasonal_strength",
    defer=True,
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, isodow(CAST(ts AS DATE)) AS dow,
               {sql_dsum("value")} AS rev
        FROM events GROUP BY 1, 2
    ),
    dev AS (
        -- detrended = rev - overall mean; deseasoned = rev - dow mean;
        -- both means from exact decimal sums (STRING round-trips: the
        -- scale-4 sums pass 2^53 on the magnitude-spread domain).
        -- Deviations quantize to WHOLE units before squaring (the anova
        -- pattern): at 1e13-magnitude daily revenues a scale-6 square
        -- needs 40+ digits — past DECIMAL(38) on both engines — and
        -- sub-unit scaled round() diverges past 2^53 anyway
        SELECT CAST(round(rev - CAST(CAST(SUM(CAST(rev AS DECIMAL(18,4)))
                                          OVER () AS STRING)
                                     AS DOUBLE) / COUNT(*) OVER (), 0)
                    AS DECIMAL(20,0)) AS d_all,
               CAST(round(rev - CAST(CAST(SUM(CAST(rev AS DECIMAL(18,4)))
                                          OVER (PARTITION BY dow) AS STRING)
                                     AS DOUBLE)
                                / COUNT(*) OVER (PARTITION BY dow), 0)
                    AS DECIMAL(20,0)) AS d_dow
        FROM daily
    ),
    v AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(CAST(d_all AS DECIMAL(38,0)) * d_all)
                         AS STRING) AS DOUBLE) AS ss_all,
               CAST(CAST(SUM(CAST(d_dow AS DECIMAL(38,0)) * d_dow)
                         AS STRING) AS DOUBLE) AS ss_dow
        FROM dev
    )
    SELECT n AS n_days,
           -- shortest-repr rounds (exact.sql_dround): plain round's
           -- scale-then-divide re-rounds 1e25-magnitude doubles
           {sql_dround("ss_all / n", 4)} AS var_detrended,
           {sql_dround("ss_dow / n", 4)} AS var_deseasoned,
           {sql_dround("GREATEST(0.0, 1.0 - ss_dow / ss_all)", 6)}
               AS seasonal_strength
    FROM v
    -- degenerate contract (r11 single-row sweep): zero detrended
    -- variance (one day, or a perfectly flat series) leaves the strength
    -- ratio undefined — no rows on BOTH engines
    WHERE ss_all > 0
    """,
    doc="Weekly seasonal strength of daily revenue: 1 - Var(residual "
    "after day-of-week means) / Var(residual after the overall mean), "
    "clamped at 0.",
)
def weekly_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-number answer to \"is there a weekly cycle worth
    modeling\" (the STL seasonal-strength statistic, computed against
    day-of-week means instead of a loess fit): near 0 = the dow profile
    explains nothing, near 1 = revenue is almost purely weekly.
    Deviations from both means are 6dp-quantized so the two sums of
    squares are exact decimal; one corpus aggregation, day-grain windows.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        (F.weekday(F.col("ts").cast("date")) + 1).alias("dow"),
    ).agg(dsum("value").alias("rev"))
    w_all = Window.partitionBy()
    w_dow = Window.partitionBy("dow")
    mean_all = (
        F.sum(F.col("rev").cast("decimal(18,4)")).over(w_all).cast("double")
        / F.count("*").over(w_all)
    )
    mean_dow = (
        F.sum(F.col("rev").cast("decimal(18,4)")).over(w_dow).cast("double")
        / F.count("*").over(w_dow)
    )
    # whole-unit quantization before squaring (anova pattern, see the
    # oracle note): scale-6 squares overflow 38 digits at 1e13-magnitude
    # daily revenues, and sub-unit scaled round() diverges past 2^53
    dev = daily.select(
        F.round(F.col("rev") - mean_all, 0).cast("decimal(20,0)").alias("d_all"),
        F.round(F.col("rev") - mean_dow, 0).cast("decimal(20,0)").alias("d_dow"),
    )
    sq = lambda c: F.sum(
        F.col(c).cast("decimal(38,0)") * F.col(c)
    ).cast("double")
    v = dev.agg(
        F.count("*").alias("n"), sq("d_all").alias("ss_all"), sq("d_dow").alias("ss_dow")
    )
    # degenerate contract (see oracle): flat/one-day series => no rows;
    # the filter precedes the ratio projection so ANSI never divides
    return v.filter(F.col("ss_all") > 0).select(
        F.col("n").alias("n_days"),
        dround(F.col("ss_all") / F.col("n"), 4).alias("var_detrended"),
        dround(F.col("ss_dow") / F.col("n"), 4).alias("var_deseasoned"),
        dround(
            F.greatest(F.lit(0.0), 1.0 - F.col("ss_dow") / F.col("ss_all")), 6
        ).alias("seasonal_strength"),
    )


#: Churn definition: no activity in the final CHURN_QUIET_WEEKS of the
#: observation window.
CHURN_QUIET_WEEKS = 2


@register(
    "user_churn_hazard",
    defer=True,
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('week', MIN(ts)) AS w0, date_trunc('week', MAX(ts)) AS wz
        FROM events
    ),
    u AS (
        SELECT e.user_id,
               CAST(floor(date_diff('day', b.w0,
                          date_trunc('week', MIN(e.ts))) / 7) AS BIGINT)
                   AS first_w,
               CAST(floor(date_diff('day', b.w0,
                          date_trunc('week', MAX(e.ts))) / 7) AS BIGINT)
                   AS last_w,
               CAST(floor(date_diff('day', b.w0, b.wz) / 7) AS BIGINT) AS wz
        FROM events e, bounds b
        GROUP BY e.user_id, b.w0, b.wz
    ),
    lif AS (
        -- churned = quiet for the final {CHURN_QUIET_WEEKS}+ weeks;
        -- lifetime measured in weeks since the user's first week
        SELECT last_w - first_w AS life_w,
               CASE WHEN last_w <= wz - {CHURN_QUIET_WEEKS} THEN 1 ELSE 0 END
                   AS churned
        FROM u
    ),
    grid AS (
        SELECT l.life_w, CAST(COUNT(*) AS BIGINT) AS ended,
               CAST(SUM(l.churned) AS BIGINT) AS churns
        FROM lif l GROUP BY 1
    ),
    haz AS (
        SELECT life_w, churns, ended,
               SUM(ended) OVER (ORDER BY life_w DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS at_risk
        FROM grid
    )
    SELECT life_w AS week, CAST(at_risk AS BIGINT) AS n_at_risk,
           churns AS n_churned,
           round(churns / CAST(at_risk AS DOUBLE), 6) AS hazard
    FROM haz
    """,
    doc=f"Discrete-time churn hazard by user lifetime week: churns (quiet "
    f"for the final {CHURN_QUIET_WEEKS}+ weeks) over users still at risk "
    "at each lifetime.",
)
def user_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survival-analysis view of retention (retention_cohorts counts
    actives; the hazard says WHEN users leave): for each lifetime week,
    the fraction of still-present users whose activity ends there and
    who then stay quiet through the end of the window.  Users active in
    the final {CHURN_QUIET_WEEKS} weeks end their observed lifetime
    without churning (right-censored — they count in the at-risk
    denominator, not the churn numerator).  Integer counting: one
    per-user min/max pass, a lifetime histogram, and a reverse
    cumulative sum for the at-risk curve.
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("week", F.min("ts")).alias("w0"),
        F.date_trunc("week", F.max("ts")).alias("wz"),
    )
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", "w0", "wz")
        .agg(
            F.floor(
                F.datediff(F.date_trunc("week", F.min("ts")), F.col("w0")) / 7
            ).alias("first_w"),
            F.floor(
                F.datediff(F.date_trunc("week", F.max("ts")), F.col("w0")) / 7
            ).alias("last_w"),
        )
        .select(
            (F.col("last_w") - F.col("first_w")).alias("life_w"),
            (
                F.col("last_w")
                <= F.floor(F.datediff(F.col("wz"), F.col("w0")) / 7)
                - CHURN_QUIET_WEEKS
            )
            .cast("int")
            .alias("churned"),
        )
    )
    grid = u.groupBy("life_w").agg(
        F.count("*").alias("ended"), F.sum("churned").alias("churns")
    )
    w_risk = Window.orderBy(F.desc("life_w")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    haz = grid.select(
        F.col("life_w").alias("week"),
        "churns",
        F.sum("ended").over(w_risk).alias("at_risk"),
    )
    return haz.select(
        "week",
        F.col("at_risk").alias("n_at_risk"),
        F.col("churns").alias("n_churned"),
        F.round(F.col("churns") / F.col("at_risk").cast("double"), 6).alias("hazard"),
    )


MOBILITY_N_TILES = 5


@register(
    "customer_decile_mobility",
    defer=True,
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
    ),
    halves AS (
        -- measured values only (r12 NULL-heavy sweep): an all-NULL-value
        -- user has a NULL half-total, which NTILE orders engine-opposite
        SELECT e.user_id,
               CASE WHEN epoch_us(e.ts) < (b.lo + b.hi) // 2 THEN 0 ELSE 1 END
                   AS half,
               CAST(e.value AS DECIMAL(18,4)) AS v
        FROM events e, bounds b
        WHERE e.value IS NOT NULL
    ),
    uv AS (
        SELECT user_id, half, SUM(v) AS val FROM halves GROUP BY 1, 2
    ),
    t AS (
        -- quintile within each half over a TOTAL order (value, user_id)
        SELECT user_id, half,
               NTILE({MOBILITY_N_TILES}) OVER (PARTITION BY half
                   ORDER BY val, user_id) AS q
        FROM uv
    ),
    m AS (
        SELECT a.q AS q_before, b.q AS q_after
        FROM t a JOIN t b ON b.user_id = a.user_id
        WHERE a.half = 0 AND b.half = 1
    )
    SELECT q_before, q_after, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM m GROUP BY 1, 2
    """,
    doc=f"Customer value-quintile mobility matrix between window halves "
    f"(NTILE {MOBILITY_N_TILES} over a total order; users present in "
    "both halves).",
)
def customer_decile_mobility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are high-value users STAYING high-value — the transition matrix of
    per-user value quintiles between the two window halves (a diagonal
    matrix = sticky value tiers, uniform rows = value is noise).  NTILE
    runs over the TOTAL order (value, user_id) so tile assignment is
    engine-reproducible; values sum as exact decimals; users absent from
    either half drop out via the inner self-join.  One corpus pass, then
    user-grain windows.
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    )
    mid = F.floor((F.col("lo") + F.col("hi")) / 2)
    # measured values only — see the oracle note (r12 NULL-heavy sweep);
    # the window bounds stay over ALL events like the oracle's bounds CTE
    uv = (
        ev.filter(F.col("value").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .groupBy(
            "user_id",
            F.when(F.unix_micros("ts") < mid, 0).otherwise(1).alias("half"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("val"))
    )
    t = uv.select(
        "user_id",
        "half",
        F.ntile(MOBILITY_N_TILES)
        .over(Window.partitionBy("half").orderBy("val", "user_id"))
        .alias("q"),
    )
    a = t.filter(F.col("half") == 0).select("user_id", F.col("q").alias("q_before"))
    b = t.filter(F.col("half") == 1).select("user_id", F.col("q").alias("q_after"))
    return a.join(b, "user_id").groupBy("q_before", "q_after").agg(
        F.count("*").alias("n_users")
    )


@register(
    "weekend_effect_did",
    defer=True,
    oracle="""
    WITH bounds AS (
        SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
    ),
    d AS (
        SELECT CASE WHEN epoch_us(e.ts) < (b.lo + b.hi) // 2 THEN 0 ELSE 1 END
                   AS period,
               CASE WHEN isodow(e.ts) >= 6 THEN 1 ELSE 0 END AS is_we,
               CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events e, bounds b
    ),
    cell AS (
        SELECT period, is_we, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS k
        FROM d GROUP BY 1, 2
    ),
    r AS (
        SELECT MAX(CASE WHEN period = 0 AND is_we = 1 THEN k / CAST(n AS DOUBLE) END) AS we0,
               MAX(CASE WHEN period = 0 AND is_we = 0 THEN k / CAST(n AS DOUBLE) END) AS wd0,
               MAX(CASE WHEN period = 1 AND is_we = 1 THEN k / CAST(n AS DOUBLE) END) AS we1,
               MAX(CASE WHEN period = 1 AND is_we = 0 THEN k / CAST(n AS DOUBLE) END) AS wd1,
               CAST(SUM(n) AS BIGINT) AS n_events
        FROM cell
    )
    SELECT n_events,
           round(we0 - wd0, 6) AS weekend_gap_p0,
           round(we1 - wd1, 6) AS weekend_gap_p1,
           round((we1 - wd1) - (we0 - wd0), 6) AS did_estimate
    FROM r
    """,
    doc="Difference-in-differences: did the weekend purchase-rate gap "
    "change between the first and second half of the window (2x2 rate "
    "table, exact integer counts)?",
)
def weekend_effect_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The causal-inference primitive for before/after questions with a
    control group: the change in the weekend-vs-weekday purchase-rate
    gap across periods nets out both the secular trend (hits both day
    types) and the static weekend effect (present in both periods).
    Four rates from one integer-count aggregation; the DiD is
    closed-form.
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    )
    mid = F.floor((F.col("lo") + F.col("hi")) / 2)
    cell = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            F.when(F.unix_micros("ts") < mid, 0).otherwise(1).alias("period"),
            (F.weekday("ts") + 1 >= 6).cast("int").alias("is_we"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "k"
            ),
        )
    )
    rate = lambda p, w: F.max(
        F.when(
            (F.col("period") == p) & (F.col("is_we") == w),
            F.col("k") / F.col("n").cast("double"),
        )
    )
    r = cell.agg(
        rate(0, 1).alias("we0"),
        rate(0, 0).alias("wd0"),
        rate(1, 1).alias("we1"),
        rate(1, 0).alias("wd1"),
        F.sum("n").alias("n_events"),
    )
    return r.select(
        "n_events",
        F.round(F.col("we0") - F.col("wd0"), 6).alias("weekend_gap_p0"),
        F.round(F.col("we1") - F.col("wd1"), 6).alias("weekend_gap_p1"),
        F.round(
            (F.col("we1") - F.col("wd1")) - (F.col("we0") - F.col("wd0")), 6
        ).alias("did_estimate"),
    )


@register(
    "daily_peak_hour_profile",
    defer=True,
    oracle="""
    WITH h AS (
        SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    peak AS (
        -- per-day argmax hour, earliest hour on count ties
        SELECT day, hr FROM (
            SELECT day, hr,
                   row_number() OVER (PARTITION BY day
                                      ORDER BY n DESC, hr) AS rn
            FROM h
        ) WHERE rn = 1
    )
    SELECT hr AS peak_hour, CAST(COUNT(*) AS BIGINT) AS n_days
    FROM peak GROUP BY hr
    """,
    doc="Distribution of each day's peak activity hour (argmax with "
    "earliest-hour tie-break) — the load-shape stability profile.",
)
def daily_peak_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity-planning shape check: if the peak hour wanders across the
    day, autoscaling schedules built on 'the' peak are fiction.  Pure
    integer counting — one (day, hour) aggregation, a per-day argmax
    window with a deterministic tie-break, and a 24-row histogram.
    """
    ev = table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.col("ts").cast("date").alias("day"), F.hour("ts").cast("long").alias("hr")
    ).agg(F.count("*").alias("n"))
    peak = (
        h.select(
            "day",
            "hr",
            F.row_number()
            .over(Window.partitionBy("day").orderBy(F.desc("n"), "hr"))
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    return peak.groupBy(F.col("hr").alias("peak_hour")).agg(
        F.count("*").alias("n_days")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier user survival (round 8)

KM_CHURN_GAP_DAYS = 14   # silent this long before corpus end => observed churn
_KM_SCALE = 10**12       # survival held as a scaled integer


@register(
    "kaplan_meier_survival",
    defer=2,
    # Exact integer replay: the survival product folds as
    #   S_k = S_{k-1} * (n_k - d_k) // n_k          (floor, scale 10^12)
    # over event-duration steps ascending — the same scaled-integer
    # recurrence family as the Markov/PageRank oracles; the final /1e12
    # is ONE correctly-rounded double division of identical operands.
    oracle=f"""
    WITH RECURSIVE u AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS f, MAX(CAST(ts AS DATE)) AS l
        FROM events GROUP BY 1
    ),
    per AS (
        SELECT date_diff('day', f, l) AS t,
               CASE WHEN date_diff('day', l, (SELECT MAX(l) FROM u))
                         >= {KM_CHURN_GAP_DAYS}
                    THEN 1 ELSE 0 END AS obs
        FROM u
    ),
    hist AS (
        SELECT t, CAST(COUNT(*) AS HUGEINT) AS n_all,
               CAST(SUM(obs) AS HUGEINT) AS d
        FROM per GROUP BY 1
    ),
    steps AS (
        SELECT t, d,
               SUM(n_all) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n,
               row_number() OVER (ORDER BY t) AS rn
        FROM hist
    ),
    ev AS (
        SELECT t, d, n, row_number() OVER (ORDER BY t) AS rn
        FROM steps WHERE d > 0
    ),
    km(rn, t, n, d, s) AS (
        SELECT 0, CAST(-1 AS BIGINT), CAST(0 AS HUGEINT), CAST(0 AS HUGEINT),
               CAST({_KM_SCALE} AS HUGEINT)
        UNION ALL
        SELECT e.rn, e.t, e.n, e.d, (km.s * (e.n - e.d)) // e.n
        FROM km JOIN ev e ON e.rn = km.rn + 1
    )
    SELECT t AS duration_days, CAST(n AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_churned,
           CAST(s AS DOUBLE) / 1000000000000.0 AS survival
    FROM km WHERE rn > 0
    """,
    doc=f"Kaplan-Meier survival over user activity spans: duration = days "
    f"between first and last event, churn observed when the user is "
    f"silent >= {KM_CHURN_GAP_DAYS} days before corpus end (else "
    "censored); exact scaled-integer product-limit estimate.",
)
def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survival-analysis answer to 'how long do users stay': the
    product-limit estimator handles the users still active at corpus end
    (right-censored) that a naive duration histogram silently miscounts
    as churned.  The corpus reduces to a <=duration-grain (t, n, d)
    table in two keyed aggs; the product fold then runs DRIVER-SIDE on
    that bounded table in exact scaled-integer arithmetic (Python ints,
    floor at each step), bit-reproducible and replayed verbatim by the
    oracle's recursive CTE in HUGEINT.
    """
    from pyspark.sql import types as T

    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("f"),
        F.max(F.col("ts").cast("date")).alias("l"),
    )
    horizon = u.agg(F.max("l")).collect()[0][0]
    per = u.select(
        F.datediff("l", "f").alias("t"),
        (F.datediff(F.lit(horizon), F.col("l")) >= KM_CHURN_GAP_DAYS)
        .cast("int")
        .alias("obs"),
    )
    hist = sorted(
        (r["t"], r["n_all"], r["d"])
        for r in per.groupBy("t")
        .agg(F.count("*").alias("n_all"), F.sum("obs").alias("d"))
        .collect()
    )
    # driver fold over <= duration-grain rows: n_at_risk via reverse
    # cumulative count; survival as exact scaled-integer product-limit
    total = sum(n for _, n, _ in hist)
    rows, seen, s = [], 0, _KM_SCALE
    for t, n_all, d in hist:
        n_risk = total - seen
        seen += n_all
        if d > 0:
            s = (s * (n_risk - d)) // n_risk
            rows.append((t, n_risk, d, s / _KM_SCALE))
    schema = T.StructType(
        [
            T.StructField("duration_days", T.IntegerType()),
            T.StructField("n_at_risk", T.LongType()),
            T.StructField("n_churned", T.LongType()),
            T.StructField("survival", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Croston intermittent-demand forecast (round 8)

CROSTON_ALPHA = 0.2


@register(
    "croston_intermittent_demand",
    defer=2,
    # Literal-IEEE fold replay (the Holt pattern): the recursive CTE
    # carries (z, p) and every update uses the exact double expressions
    # of the Python fold; daily quantities are whole numbers so their
    # sums are order-independent-exact in double.  The fold steps over
    # DEMAND DAYS only — zero days enter as the datediff interval, which
    # is both the classic Croston formulation and ~50x fewer recursion
    # steps than a day-spine fold.  Outputs floor-quantized (engine
    # round() diverges at 7th-digit midpoints).
    oracle=f"""
    WITH RECURSIVE tgt AS (
        SELECT l_partkey FROM lineitem
        GROUP BY 1 ORDER BY COUNT(*) DESC, l_partkey LIMIT 1
    ),
    ship AS (
        SELECT CAST(l_shipdate AS DATE) AS day, SUM(l_quantity) AS q
        FROM lineitem WHERE l_partkey = (SELECT l_partkey FROM tgt)
        GROUP BY 1
    ),
    -- MATERIALIZED: referenced from the recursive term; an inlined CTE
    -- would re-build the windowed series once per fold step
    series AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY day) AS rn, q,
               CAST(date_diff('day', lag(day) OVER (ORDER BY day), day)
                    AS DOUBLE) AS iv
        FROM ship
    ),
    n AS MATERIALIZED (SELECT MAX(rn) AS nmax FROM series),
    cr(rn, z, p) AS (
        -- CAST the seeds: DuckDB types recursive columns from the anchor
        -- literal (1.0 => DECIMAL(2,1), which the fold then overflows)
        SELECT 1, CAST(q AS DOUBLE), CAST(1.0 AS DOUBLE)
        FROM series WHERE rn = 1
        UNION ALL
        SELECT s.rn,
               {CROSTON_ALPHA} * s.q + (1.0 - {CROSTON_ALPHA}) * cr.z,
               {CROSTON_ALPHA} * s.iv + (1.0 - {CROSTON_ALPHA}) * cr.p
        FROM cr JOIN series s ON s.rn = cr.rn + 1
        WHERE cr.rn < (SELECT nmax FROM n)
    )
    SELECT (SELECT l_partkey FROM tgt) AS part_key,
           (SELECT CAST(date_diff('day', MIN(day), MAX(day)) + 1 AS BIGINT)
            FROM ship) AS n_days,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ship) AS n_demand_days,
           floor(z * 1000000) / 1000000 AS demand_size_z,
           floor(p * 1000000) / 1000000 AS interval_p,
           floor(z / p * 1000000) / 1000000 AS croston_forecast
    FROM cr WHERE rn = (SELECT nmax FROM n)
    """,
    doc="Croston's method on the most-shipped part's daily quantity "
    "series: separate exponential smoothing of demand size and "
    "inter-demand interval (alpha=0.2); forecast = z/p per day.",
)
def croston_intermittent_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE forecasting method for intermittent demand — SES on the raw
    series chases zeros; Croston smooths the nonzero demand SIZES and
    the INTERVALS between them separately (p seeded at 1.0, the standard
    no-prior convention).  The corpus reduces to one part's demand-day
    series (dozens of rows); the fold runs DRIVER-SIDE with the
    identical IEEE expressions the oracle's recursive CTE replays.
    """
    from pyspark.sql import types as T

    li = table(spark, sf_dir, "lineitem")
    tgt = (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "l_partkey")
        .limit(1)
        .collect()[0]["l_partkey"]
    )
    ship = sorted(
        (r["day"], r["q"])
        for r in li.filter(F.col("l_partkey") == tgt)
        .groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(F.sum("l_quantity").alias("q"))
        .collect()
    )
    a = CROSTON_ALPHA
    z = p = prev = None
    for day, q in ship:
        if prev is None:
            z, p = q, 1.0
        else:
            z = a * q + (1.0 - a) * z
            p = a * float((day - prev).days) + (1.0 - a) * p
        prev = day

    def q6(v: float) -> float:
        import math

        return math.floor(v * 1e6) / 1e6

    n_days = (ship[-1][0] - ship[0][0]).days + 1
    schema = T.StructType(
        [
            T.StructField("part_key", T.LongType()),
            T.StructField("n_days", T.LongType()),
            T.StructField("n_demand_days", T.LongType()),
            T.StructField("demand_size_z", T.DoubleType()),
            T.StructField("interval_p", T.DoubleType()),
            T.StructField("croston_forecast", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(
        [(tgt, n_days, len(ship), q6(z), q6(p), q6(z / p))], schema
    )


# ---------------------------------------------------------------------------
# Largest-Triangle-Three-Buckets downsampling (round 8)

LTTB_POINTS = 20  # output size: first + last + 18 bucketed selections


@register(
    "lttb_downsample_daily",
    defer=2,
    # Exact integer replay: x = day rank, y = revenue scaled to 1e4; the
    # triangle area vs the PREVIOUS selection and the NEXT bucket's
    # centroid is cross-multiplied by the next bucket's size, so every
    # comparison is integer-exact; argmax+low-x tie-break is encoded as
    # MAX(area * 4096 + (4095 - x)) and decoded by modulus.  Buckets are
    # iterated by DENSE rank so sparse series (fewer middle points than
    # buckets) skip no recursion step.
    oracle=f"""
    WITH RECURSIVE daily AS (
        -- measured days only (r12 NULL-heavy sweep): a day with no
        -- measured revenue has no y-value to subtend a triangle
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS HUGEINT)
                   AS ys
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    pts AS MATERIALIZED (
        SELECT CAST(day AS VARCHAR) AS day, ys,
               row_number() OVER (ORDER BY day) AS x,
               COUNT(*) OVER () AS n
        FROM daily
    ),
    mid AS (
        SELECT day, ys, x, n,
               ((x - 2) * {LTTB_POINTS - 2}) // (n - 2) AS raw_bucket
        FROM pts WHERE x > 1 AND x < n
    ),
    cand AS MATERIALIZED (
        SELECT day, ys, x,
               dense_rank() OVER (ORDER BY raw_bucket) - 1 AS b
        FROM mid
    ),
    nb AS (SELECT MAX(b) + 1 AS nbuckets FROM cand),
    -- centroid sums of the bucket AFTER b (the last bucket's "next" is
    -- the series' final point)
    cent AS MATERIALIZED (
        SELECT b - 1 AS b, CAST(COUNT(*) AS HUGEINT) AS nn,
               CAST(SUM(x) AS HUGEINT) AS sxn, CAST(SUM(ys) AS HUGEINT) AS syn
        FROM cand WHERE b > 0 GROUP BY 1
        UNION ALL
        SELECT (SELECT nbuckets FROM nb) - 1, 1,
               CAST((SELECT MAX(x) FROM pts) AS HUGEINT),
               (SELECT ys FROM pts WHERE x = (SELECT MAX(x) FROM pts))
    ),
    rec(b, ax, ay) AS (
        SELECT -1, CAST(1 AS HUGEINT),
               (SELECT ys FROM pts WHERE x = 1)
        UNION ALL
        SELECT q.b, CAST(4095 - (q.best % 4096) AS HUGEINT),
               (SELECT c2.ys FROM cand c2
                WHERE c2.x = 4095 - (q.best % 4096))
        FROM (
            SELECT s.b + 1 AS b,
                   MAX(abs((s.ax * ct.nn - ct.sxn) * (c.ys - s.ay)
                           - (s.ax - c.x) * (ct.syn - s.ay * ct.nn)) * 4096
                       + (4095 - c.x)) AS best
            FROM rec s
                JOIN cand c ON c.b = s.b + 1
                JOIN cent ct ON ct.b = s.b + 1
            WHERE s.b + 1 < (SELECT nbuckets FROM nb)
            GROUP BY s.b + 1
        ) q
    )
    SELECT p.day, CAST(p.ys AS DOUBLE) / 10000 AS rev
    FROM pts p
    WHERE p.x = 1 OR p.x = (SELECT MAX(x) FROM pts)
       OR p.x IN (SELECT CAST(ax AS BIGINT) FROM rec WHERE b >= 0)
    """,
    doc=f"LTTB downsampling of daily revenue to {LTTB_POINTS} points "
    "(Steinarsson 2013): per bucket, keep the point maximizing the "
    "triangle area with the previous selection and the next bucket's "
    "centroid; exact integer areas.",
)
def lttb_downsample_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE downsampling algorithm for time-series dashboards: unlike
    every-kth-point it preserves visual extremes (spikes survive because
    they subtend large triangles).  The corpus reduces to the day-grain
    series; the sequential bucket fold (each selection depends on the
    previous one) runs DRIVER-SIDE on that bounded series in exact
    integer arithmetic, replayed verbatim by the oracle's recursive CTE.
    """
    from pyspark.sql import types as T

    # measured days only — see the oracle note (r12 NULL-heavy sweep)
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = sorted(
        (str(r["day"]), int(r["ys"]))
        for r in ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(18,4)")) * 10000)
            .cast("long")
            .alias("ys")
        )
        .collect()
    )
    n = len(daily)
    schema = T.StructType(
        [T.StructField("day", T.StringType()), T.StructField("rev", T.DoubleType())]
    )

    def row(i: int) -> tuple:
        return (daily[i][0], daily[i][1] / 10000)

    if n <= LTTB_POINTS:
        return spark.createDataFrame([row(i) for i in range(n)], schema)
    nb_target = LTTB_POINTS - 2
    mid = list(range(1, n - 1))  # 0-based indices of middle points
    raw = [((i - 1) * nb_target) // (n - 2) for i in mid]
    # dense bucket ids (sparse series can skip raw ids)
    uniq = sorted(set(raw))
    dense = {r: j for j, r in enumerate(uniq)}
    buckets: list[list[int]] = [[] for _ in uniq]
    for i, r in zip(mid, raw):
        buckets[dense[r]].append(i)
    sel = []
    ax, ay = 1, daily[0][1]  # x is 1-based rank
    for bi, bucket in enumerate(buckets):
        if bi + 1 < len(buckets):
            nxt = buckets[bi + 1]
            nn = len(nxt)
            sxn = sum(i + 1 for i in nxt)
            syn = sum(daily[i][1] for i in nxt)
        else:
            nn, sxn, syn = 1, n, daily[n - 1][1]
        best = None
        for i in bucket:
            px, py = i + 1, daily[i][1]
            area = abs((ax * nn - sxn) * (py - ay) - (ax - px) * (syn - ay * nn))
            enc = area * 4096 + (4095 - px)
            if best is None or enc > best:
                best = enc
        wx = 4095 - (best % 4096)
        ax, ay = wx, daily[wx - 1][1]
        sel.append(wx - 1)
    keep = [0] + sel + [n - 1]
    return spark.createDataFrame([row(i) for i in keep], schema)


# ---------------------------------------------------------------------------
# Peak concurrent sessions via sweep line (round 8)

SESSION_GAP_MIN = 30  # inactivity gap that closes a session


@register(
    "peak_concurrent_sessions",
    defer=2,
    oracle=f"""
    WITH marks AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > {SESSION_GAP_MIN} * 60 * 1000000
                         OR lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    sess AS (
        SELECT user_id,
               SUM(new_sess) OVER (PARTITION BY user_id
                   ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS sid,
               ts
        FROM marks
    ),
    spans AS (
        SELECT MIN(ts) AS t0, MAX(ts) AS t1
        FROM sess GROUP BY user_id, sid
    ),
    -- sweep line: ends sort BEFORE starts at the same instant (a session
    -- ending exactly when another starts does not overlap it)
    sweep AS (
        SELECT t0 AS t, 0 AS is_start, 1 AS delta FROM spans
        UNION ALL
        SELECT t1, -1 AS is_start, -1 AS delta FROM spans
    ),
    curve AS (
        SELECT t, SUM(delta) OVER (ORDER BY t, is_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        FROM sweep
    )
    SELECT CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           CAST(MIN(t) FILTER (WHERE conc = (SELECT MAX(conc) FROM curve))
                AS VARCHAR) AS peak_at,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM spans) AS n_sessions
    FROM curve
    """,
    doc=f"Peak concurrent sessions ({SESSION_GAP_MIN}-minute inactivity "
    "gap): sweep-line over session spans, ends ordered before starts at "
    "equal instants; earliest peak instant reported.",
)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity planning's first number: the maximum number of sessions
    open at once.  Sessionization is the standard gap rule; the sweep
    line turns spans into +1/-1 marks and takes the running-sum maximum.
    Tie discipline: an end coinciding with a start decrements first, and
    the earliest instant achieving the peak is reported; all arithmetic
    is integer/timestamp-exact.

    Distributed shape (VERDICT r8 "what's wrong" #1): the naive sweep is
    ONE global ordered window over 2 rows per session — a single task
    holding the whole corpus's sweep at 100 TB.  This is the standard
    two-phase parallel prefix sum instead: phase 1 runs the running sum
    per calendar-day partition (``date(t)`` is monotone in ``t``, so day
    boundaries respect the global order and the (t, is_start) tie rule is
    purely intra-day); phase 2 computes one total per day, prefix-sums
    those offsets on the bounded day grain (≤ corpus span in days), and
    broadcast-joins the offset back.  Global running sum = day offset +
    intra-day running sum, exactly — same pattern as the skyline's
    partition-then-survivors sweep (relational.py::skyline_orders_2d).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > SESSION_GAP_MIN * 60 * 1000000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = marks.select(
        "user_id",
        "ts",
        F.sum("new_sess")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("sid"),
    )
    spans = sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    n_sessions = spans.count()
    sweep = spans.select(
        F.col("t0").alias("t"), F.lit(0).alias("is_start"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.col("t1").alias("t"),
            F.lit(-1).alias("is_start"),
            F.lit(-1).alias("delta"),
        )
    )
    # --- two-phase prefix sum ------------------------------------------
    # phase 1: intra-day running sums (keyed window; parallel across days)
    marked = sweep.withColumn("d", F.to_date("t"))
    local = marked.select(
        "d",
        "t",
        F.sum("delta")
        .over(
            Window.partitionBy("d")
            .orderBy("t", "is_start")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("lcum"),
    )
    # phase 2: one row per day → prefix-sum the offsets on the bounded
    # day grain (the only global window left runs over ≤ span-in-days rows)
    offsets = (
        marked.groupBy("d")
        .agg(F.sum("delta").alias("dtot"))
        .select(
            "d",
            F.coalesce(
                F.sum("dtot").over(
                    Window.orderBy("d").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("off"),
        )
    )
    curve = (
        local.join(F.broadcast(offsets), "d")
        .select("t", (F.col("off") + F.col("lcum")).alias("conc"))
        .localCheckpoint(eager=True)  # consumed by max + argmin-at-max
    )
    peak = curve.agg(F.max("conc")).collect()[0][0]
    return (
        curve.filter(F.col("conc") == peak)
        .agg(
            F.lit(int(peak)).cast("long").alias("peak_concurrency"),
            F.min("t").cast("string").alias("peak_at"),
            F.lit(n_sessions).cast("long").alias("n_sessions"),
        )
    )


# ---------------------------------------------------------------------------
# Window funnel (round 9)

FUNNEL_STEPS = ("view", "click", "purchase")  # ordered step event types
FUNNEL_WINDOW_US = 24 * 3600 * 1_000_000  # chain must complete within 24h


@register(
    "window_funnel_steps",
    defer=3,
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t1
        FROM events WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
        FROM events e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = '{FUNNEL_STEPS[1]}'
          AND epoch_us(e.ts) > s1.t1
          AND epoch_us(e.ts) <= s1.t1 + {FUNNEL_WINDOW_US}
        GROUP BY 1
    ),
    s3 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
        FROM events e
            JOIN s2 ON s2.user_id = e.user_id
            JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = '{FUNNEL_STEPS[2]}'
          AND epoch_us(e.ts) > s2.t2
          AND epoch_us(e.ts) <= s1.t1 + {FUNNEL_WINDOW_US}
        GROUP BY 1
    )
    SELECT CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                WHEN s1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS funnel_depth,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM u
        LEFT JOIN s1 ON s1.user_id = u.user_id
        LEFT JOIN s2 ON s2.user_id = u.user_id
        LEFT JOIN s3 ON s3.user_id = u.user_id
    GROUP BY 1
    """,
    doc=f"Window funnel (ClickHouse windowFunnel / Amplitude first-touch "
    f"semantics): deepest {'->'.join(FUNNEL_STEPS)} chain anchored at the "
    "user's FIRST step-1 event, whole chain within 24h; user-count "
    "histogram per reached depth (0 = never entered).",
)
def window_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product-analytics funnel operator Spark lacks natively: for
    each user, how deep did the ordered step chain get, with every step
    inside a fixed window anchored at the first step-1 event?  First-touch
    semantics make it deterministic (each step extends from the EARLIEST
    qualifying predecessor — no search over alternative chains) and
    decomposable: step k is one keyed agg over events joined to the
    (user-grain, tiny) step k-1 frame.  All timestamp math is integer
    microseconds; every join is user-keyed — at 100 TB the step frames
    are user-grain rollups that shrink monotonically with depth, and the
    events scan is filtered to one step type before each shuffle.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    users = ev.select("user_id").distinct()
    # The step frames are user-grain and consumed by every later step
    # plus the depth join — pin each once, or Spark re-runs its filtered
    # corpus scan per reference (s1 x3, s2 x2 = 16 scans unpinned).
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
        .localCheckpoint(eager=True)
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(
            (F.col("us") > F.col("t1"))
            & (F.col("us") <= F.col("t1") + F.lit(FUNNEL_WINDOW_US))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
        .localCheckpoint(eager=True)
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .join(s1, "user_id")
        .filter(
            (F.col("us") > F.col("t2"))
            & (F.col("us") <= F.col("t1") + F.lit(FUNNEL_WINDOW_US))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    depth = (
        users.join(s1.select("user_id", F.lit(1).alias("d1")), "user_id", "left")
        .join(s2.select("user_id", F.lit(1).alias("d2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(1).alias("d3")), "user_id", "left")
        .select(
            F.when(F.col("d3").isNotNull(), 3)
            .when(F.col("d2").isNotNull(), 2)
            .when(F.col("d1").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_depth")
        )
    )
    return depth.groupBy("funnel_depth").agg(F.count("*").alias("n_users"))


# ---------------------------------------------------------------------------
# Session path analysis (round 9)

PATH_GAP_MIN = 30   # session gap, matching sessionize_gap_islands
PATH_DEPTH = 5      # first-K event types define the path
PATH_TOPK = 20      # report the K most common paths


@register(
    "session_path_topk",
    defer=3,
    oracle=f"""
    WITH marked AS (
        -- typed events only (r12 NULL-heavy sweep): an all-NULL-type
        -- session aggregates to path NULL via string_agg but '' via
        -- Spark's array_join — NULL types are not path steps
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL {PATH_GAP_MIN} MINUTE
                    THEN 0 ELSE 1 END AS is_start
        FROM events WHERE event_type IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, SUM(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS session_no
        FROM marked
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_no
                                     ORDER BY ts, event_id) AS rn
        FROM numbered
    ),
    paths AS (
        SELECT user_id, session_no,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM ranked WHERE rn <= {PATH_DEPTH}
        GROUP BY user_id, session_no
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOPK}
    """,
    doc=f"Top-{PATH_TOPK} session journeys: {PATH_GAP_MIN}-min gap "
    f"sessionization, path = first {PATH_DEPTH} event types in "
    "(ts, event_id) order joined with '>', counted across all sessions — "
    "the Sankey/flow view product analytics builds on sessionized events.",
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composes the gap-and-islands sessionizer with an ordered path
    rollup.  All three window passes (gap mark, island number, in-session
    rank) share the user_id partitioning, so Catalyst plans ONE shuffle
    feeding three Window operators; the path assembly then groups on
    (user, session) — a refinement of the same key, no second corpus
    shuffle.  ``sort_array(collect_list(struct(...)))`` over at most
    {PATH_DEPTH} rows per session makes the concatenation
    order-deterministic without trusting collect order.  The final
    count + top-k runs on the path grain (bounded by the event-type
    alphabet ^ depth, not the corpus) with a rank tie-break on the path
    string so row {PATH_TOPK} is stable.  Cf. sessionize_gap_islands
    (same session definition, aggregate view).
    """
    # typed events only — see the oracle note (r12 NULL-heavy sweep)
    events = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact-micros gap (see sessionize_gap_islands): matches the oracle's
    # full-precision INTERVAL compare at fractional-second boundaries
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = events.withColumn(
        "is_start",
        F.when(gap_us <= PATH_GAP_MIN * 60 * 1_000_000, F.lit(0)).otherwise(F.lit(1)),
    )
    numbered = marked.withColumn("session_no", F.sum("is_start").over(w))
    ws = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    ranked = numbered.withColumn("rn", F.row_number().over(ws))
    paths = (
        ranked.filter(F.col("rn") <= PATH_DEPTH)
        .groupBy("user_id", "session_no")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOPK)
    )


# ---------------------------------------------------------------------------
# DAU / WAU / MAU stickiness (round 9)

WAU_WINDOW_DAYS = 7   # WAU(x) counts users active in [x-6, x]
MAU_WINDOW_DAYS = 28  # MAU(x) counts users active in [x-27, x]


def _active_user_sweep(ud: DataFrame, window_days: int) -> DataFrame:
    """(d, delta) sweep marks whose day-ordered prefix sum equals the
    number of DISTINCT users active within the trailing ``window_days``
    at each day — WITHOUT a distinct-over-sliding-window.

    Each user-day d makes the user count toward days [d, d+W-1].  Per
    user, overlapping/touching contribution intervals are merged into
    islands (gap rule: a new island starts when the previous active day
    is more than W days back — intervals [d1, d1+W-1] and [d2, d2+W-1]
    are disjoint iff d2 - d1 > W), so no user is ever double-counted;
    each island then emits +1 at its start and -1 one day past its end.
    Everything is keyed by user until the final day-grain aggregation.
    """
    w = Window.partitionBy("user_id").orderBy("d")
    islands = ud.select(
        "user_id",
        "d",
        F.coalesce(
            (F.datediff(F.col("d"), F.lag("d").over(w)) > window_days).cast("int"),
            F.lit(1),
        ).alias("new_island"),
    ).select(
        "user_id",
        "d",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    spans = islands.groupBy("user_id", "island").agg(
        F.min("d").alias("start"),
        F.date_add(F.max("d"), window_days).alias("stop"),  # first day PAST
    ).localCheckpoint(eager=True)  # consumed twice by the +1/-1 union
    return spans.select(
        F.col("start").alias("d"), F.lit(1).alias("delta")
    ).unionByName(spans.select(F.col("stop").alias("d"), F.lit(-1).alias("delta")))


@register(
    "dau_mau_stickiness",
    defer=3,
    oracle=f"""
    WITH ud AS MATERIALIZED (
        -- identified users only (r11 null-FK sweep): "active users"
        -- cannot count anonymous traffic — and the old mixed NULL
        -- handling even disagreed with ITSELF (dau's COUNT(*) counted
        -- the NULL row, wau/mau's COUNT(DISTINCT) dropped it)
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        WHERE user_id IS NOT NULL
    ),
    dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d),
    wau AS (
        SELECT dy.d, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
        FROM (SELECT DISTINCT d FROM ud) dy
            JOIN ud u ON u.d BETWEEN dy.d - {WAU_WINDOW_DAYS - 1} AND dy.d
        GROUP BY dy.d
    ),
    mau AS (
        SELECT dy.d, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
        FROM (SELECT DISTINCT d FROM ud) dy
            JOIN ud u ON u.d BETWEEN dy.d - {MAU_WINDOW_DAYS - 1} AND dy.d
        GROUP BY dy.d
    )
    SELECT CAST(a.d AS VARCHAR) AS day, a.dau, w.wau, m.mau,
           1000000 * a.dau // w.wau AS dau_wau_ppm,
           1000000 * a.dau // m.mau AS dau_mau_ppm
    FROM dau a JOIN wau w ON w.d = a.d JOIN mau m ON m.d = a.d
    """,
    doc=f"Product-health stickiness: per active day, DAU plus trailing "
    f"{WAU_WINDOW_DAYS}-day WAU and {MAU_WINDOW_DAYS}-day MAU (distinct "
    "users) and the integral DAU/WAU, DAU/MAU ppm ratios — computed via "
    "per-user interval merge + day-grain sweep, no distinct-over-"
    "sliding-window.",
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DAU/MAU board metric, computed the only way that scales: a
    trailing-window COUNT(DISTINCT user) per day is not decomposable
    (the naive day x user window join re-materializes the corpus W
    times), but each user's contribution to "active in the last W days"
    is a union of intervals.  Merge each user's overlapping intervals
    into islands with one keyed window (the sessionization gap rule on
    the day grain), emit +1/-1 sweep marks per island, and the day-
    ordered prefix sum of the marks IS the trailing distinct count —
    exactly, with nothing larger than user-day grain ever shuffled.
    The two prefix sums (WAU, MAU) run on the bounded day grain
    (corpus span + W rows), the same grain-bounded single window the
    peak-concurrency sweep's phase 2 uses (temporal.py:3600).  This is
    the 100 TB tier of ``rolling_distinct_users``' day-spine range join
    (which re-scans the user-day relation once per window day) — same
    trailing-distinct semantics, one pass.
    """
    # identified users only — see the oracle note (r11 null-FK sweep)
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    # Five consumers (dau x2 via the spine, two island windows) — pin the
    # user-day grain once or Spark re-runs the corpus distinct per branch
    # (aggregation subplans are not reused across references).
    ud = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    curves = []
    for colname, wdays in (("wau", WAU_WINDOW_DAYS), ("mau", MAU_WINDOW_DAYS)):
        sweep = _active_user_sweep(ud, wdays)
        # spine = sweep-change days + active days (zero-delta markers) so
        # the prefix sum is evaluated exactly at every output day
        spine = sweep.unionByName(
            dau.select("d", F.lit(0).alias("delta"))
        )
        curves.append(
            spine.groupBy("d")
            .agg(F.sum("delta").alias("delta"))
            .select("d", F.sum("delta").over(wd).alias(colname))
        )
    out = (
        dau.join(curves[0], "d")
        .join(curves[1], "d")
        .select(
            F.col("d").cast("string").alias("day"),
            "dau",
            "wau",
            "mau",
            F.expr("1000000 * dau div wau").alias("dau_wau_ppm"),
            F.expr("1000000 * dau div mau").alias("dau_mau_ppm"),
        )
    )
    return out
