"""Time-window aggregations over the events table — the batch-equivalent
semantics of the streaming jobs in ``streaming/`` (tumbling, sliding,
session), oracle-checkable in SQL.

The reference's implicit windowing is its date-partitioned sink
(fetch_articles.py:126 — one partition per UTC day); these generalize that
to arbitrary tumbling/sliding/session windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.functions.exact import dsum, sql_dsum
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table


@register(
    "tumbling_window_agg",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h windows per event type (epoch-aligned, same as streaming window()).",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_window_agg",
    oracle=f"""
    WITH w AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM events
    )
    SELECT window_start,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM w
    GROUP BY 1
    """,
    doc="Sliding windows (1h length, 30m slide): each event lands in exactly two windows.",
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "session_window_agg",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         < INTERVAL '10 minutes'
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ), grp AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '10 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM grp
    GROUP BY user_id, session_id
    """,
    doc="Session windows, 10-minute gap, per user (merge iff next < prev + gap, like session_window).",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "window_range_frame",
    oracle=f"""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_last_hour
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
    )
    """,
    doc="RANGE window frame: per-user trailing-1h count/sum (value-based, not row-based).",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = table(spark, sf_dir, "events")
    # rangeBetween needs a numeric ordering column: order on epoch MICROS
    # (sub-second ties would otherwise merge into peer groups the
    # µs-precision SQL frame keeps distinct), frame = [-1h, 0] in µs.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    # dsum() can't be used directly: .over() must attach to the SUM, with
    # the decimal->double cast applied to the windowed result.
    wsum = F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_last_hour"),
        wsum.alias("sum_last_hour"),
    )


@register(
    "window_value_functions",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER w_full AS last_price,
           lead(o_orderkey, 1) OVER w AS next_orderkey,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ),
    w_full AS (
        PARTITION BY o_custkey ORDER BY o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
    doc="Value window functions (first/last/lead/ntile) with explicit frames; "
    "unique orderkey ordering keeps every output deterministic.",
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_ord = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.lead("o_orderkey", 1).over(w_ord).alias("next_orderkey"),
        F.ntile(4).over(w_ord).alias("quartile"),
    )


@register(
    "window_rank_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           ROUND(percent_rank() OVER w, 9) AS pct_rank,
           ROUND(cume_dist()    OVER w, 9) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="Ranking-distribution window functions (rank/dense_rank/percent_rank/"
    "cume_dist) with a unique-keyed deterministic ordering.",
)
def window_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hash shuffle on the partition key + one in-partition sort serves
    all four ranking functions (a single Window physical node).  The order
    key ends in the unique o_orderkey so every rank is deterministic; the
    two distribution values are integer-ratio doubles, identical on any
    IEEE-754 engine."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@register(
    "event_transition_counts",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM s
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
    doc="Per-user event transition matrix: lag window -> (prev, next) "
    "pair counts (Markov-chain edge weights over the event stream).",
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix — the aggregate behind session-flow
    analysis and Markov churn models.  One shuffle partitions by user for
    the lag window ((ts, event_id) ordering is unique so lag is
    deterministic), then the pair count reuses partial map-side agg; the
    output is |event_types|^2 rows regardless of corpus size."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return (
        s.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )


@register(
    "cumulative_new_users",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT first_day AS day, COUNT(*) AS new_users
        FROM firsts GROUP BY first_day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           new_users,
           -- DuckDB window SUM(BIGINT) -> HUGEINT (floats in pandas); pin BIGINT
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM daily
    """,
    doc="User-acquisition curve: first-seen day per user, daily new-user "
    "counts, and the running cumulative total.",
)
def cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT users over time without a distinct-over-frame
    (which neither engine supports): each user collapses to a first-seen
    day (one keyed agg), then the running sum is an ordinary window.  The
    unpartitioned window runs over #days rows — already reduced, so the
    single-partition sort is trivial at any corpus scale."""
    events = table(spark, sf_dir, "events")
    firsts = (
        events.select(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day")
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


RFM_ANCHOR = "2001-09-01"  # just past the generated orderdate range


@register(
    "customer_rfm_scores",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey AS c_custkey,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                         DATE '{RFM_ANCHOR}') AS recency_days,
               CAST(count(*) AS INT) AS n_orders,
               round(sum(o_totalprice), 2) AS monetary
        FROM orders GROUP BY 1
    )
    SELECT c_custkey, recency_days, n_orders, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, c_custkey)
                AS INT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY n_orders, c_custkey) AS INT)
               AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary, c_custkey) AS INT)
               AS m_score
    FROM base
    """,
    doc="RFM customer segmentation: recency/frequency/monetary quintiles "
    "via ntile(5) with deterministic tie-breaks; higher score = better.",
)
def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic marketing-analytics segmentation — three ntile windows
    over one per-customer aggregate.  Tie-breaks pin bucket assignment so
    replays and engines agree (NTILE splits equal-size-first in both).

    Scale shape: one aggregation keyed on custkey, then three GLOBAL
    ntile sorts over the customer-grain rollup (customers ≪ orders).  At
    100 TB-of-orders the rollup is still customer-sized; if customers
    themselves outgrow a single sort, swap ntile for percent_rank binning
    over approx quantile bounds — same output contract."""
    orders = table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.datediff(
            F.lit(RFM_ANCHOR).cast("date"),
            F.max(F.col("o_orderdate").cast("date")),
        ).alias("recency_days"),
        F.count("*").cast("int").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    w_r = Window.orderBy(F.desc("recency_days"), F.asc("c_custkey"))
    w_f = Window.orderBy(F.asc("n_orders"), F.asc("c_custkey"))
    w_m = Window.orderBy(F.asc("monetary"), F.asc("c_custkey"))
    return base.select(
        "c_custkey",
        "recency_days",
        "n_orders",
        "monetary",
        F.ntile(5).over(w_r).alias("r_score"),
        F.ntile(5).over(w_f).alias("f_score"),
        F.ntile(5).over(w_m).alias("m_score"),
    )


CUMTOPK_K = 5


@register(
    "cumulative_topk_users",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               SUM(CAST(value AS DECIMAL(18,4))) AS v
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.day, u.user_id
        FROM (SELECT DISTINCT day FROM daily) d
        CROSS JOIN (SELECT DISTINCT user_id FROM daily) u
    ),
    cum AS (
        SELECT g.day, g.user_id,
               COALESCE(SUM(dl.v) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 0) AS cum_v
        FROM grid g LEFT JOIN daily dl USING (user_id, day)
    )
    SELECT day, user_id,
           CAST(round(CAST(cum_v AS DOUBLE), 4) AS DOUBLE) AS cum_value,
           rk
    FROM (
        SELECT day, user_id, cum_v,
               CAST(row_number() OVER (
                   PARTITION BY day ORDER BY cum_v DESC, user_id
               ) AS INT) AS rk
        FROM cum
    )
    WHERE rk <= {CUMTOPK_K}
    """,
    doc=f"Incremental top-k maintenance (EDBT'20 interactive-session "
    f"family): for every day, the top-{CUMTOPK_K} users by CUMULATIVE "
    "event value so far — the batch materialization of a continuously "
    "maintained leaderboard.",
)
def cumulative_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-prefix top-k (cf. \"Incremental Based Framework for
    Efficient Top-K Similarity Search in Interactive Data Analysis
    Sessions\", EDBT 2020): the answer an interactive session shows
    after each day's data lands.  Cumulative sums stay in the DECIMAL
    domain (associative-exact, engine/partition-order independent).

    Scale shape: the grid is (days x users) — rollup-grain, never event-
    grain — and the two windows are one partitioned sort each.  The
    truly streaming version of this leaderboard is the
    ``streaming_upsert_latest`` + ``streaming_topk_per_window`` pair;
    this batch twin is the oracle-checkable materialization of every
    intermediate state."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("v"))
    days = daily.select("day").distinct()
    users = daily.select("user_id").distinct()
    grid = days.crossJoin(users)
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.join(daily, ["user_id", "day"], "left").select(
        "day",
        "user_id",
        F.coalesce(F.sum("v").over(w_cum), F.lit(0)).alias("cum_v"),
    )
    rk = F.row_number().over(
        Window.partitionBy("day").orderBy(F.desc("cum_v"), F.asc("user_id"))
    )
    return (
        cum.withColumn("rk", rk)
        .filter(F.col("rk") <= CUMTOPK_K)
        .select(
            "day",
            "user_id",
            F.round(F.col("cum_v").cast("double"), 4).alias("cum_value"),
            "rk",
        )
    )


MED_WINDOW = 7  # rolling exact-median span (rows)


@register(
    "window_rolling_median",
    oracle=f"""
    SELECT event_id, user_id, ts, value,
           round(median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {MED_WINDOW - 1} PRECEDING AND CURRENT ROW
           ), 6) AS med{MED_WINDOW}
    FROM events
    """,
    doc=f"Exact rolling median over the last {MED_WINDOW} events per user "
    "(sorted-frame midpoint, interpolating on even counts).",
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust rolling center — the median twin of window_rolling_sum.
    Spark has no exact median window aggregate, so the frame is collected
    (bounded: at most {MED_WINDOW} values), array_sorted, and the
    midpoint read out — interpolating the two middle values on even
    frames, matching DuckDB's median() exactly.

    Scale shape: one shuffle on user_id, per-row state bounded by the
    constant frame width; everything stays in JVM codegen (no Python).
    The ORDER BY carries event_id so sub-second ts ties frame
    deterministically in both engines.
    """
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(MED_WINDOW - 1), 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    # collect_list skips NULL values exactly like DuckDB's median();
    # an all-NULL frame leaves n = 0, where element_at(arr, 0) would
    # throw — the median of no measurements is NULL on both engines
    # (r12 NULL-heavy sweep)
    med = F.when(n == 0, F.lit(None)).when(n % 2 == 1, lo).otherwise(
        (lo + hi) / 2.0
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(med, 6).alias(f"med{MED_WINDOW}"),
    )


@register(
    "session_window_dynamic_gap",
    oracle="""
    WITH g AS (
        SELECT user_id, ts,
               CASE WHEN event_type = 'error' THEN INTERVAL 5 MINUTE
                    ELSE INTERVAL 10 MINUTE END AS gap
        FROM events
    ),
    m AS (
        SELECT user_id, ts,
               MAX(ts + gap) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_end
        FROM g
    ),
    s AS (
        SELECT user_id, ts,
               CASE WHEN prev_end IS NULL OR ts >= prev_end THEN 1 ELSE 0 END
                   AS new_s
        FROM m
    ),
    i AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid
        FROM s
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM i GROUP BY user_id, sid
    """,
    doc="Dynamic-gap session windows: per-event gap expression (5 min "
    "after errors, 10 min otherwise) — sessions merge on overlap of "
    "per-event [ts, ts+gap) intervals.",
)
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window with a GAP EXPRESSION instead of a constant: each
    event extends its session by its own inactivity allowance (errors
    cool off faster here).  This is the engine-native form of
    behavior-dependent sessionization — the alternative is a custom
    state op.  The oracle is the general interval-merge gap-island SQL:
    a new session starts where ts clears the running max of previous
    (ts + gap) ends, which is exactly Spark's merge rule for dynamic
    session windows.

    Scale shape: one user-key shuffle; the engine's session merge is a
    sort-based pass per key — same cost as the fixed-gap variant.
    """
    events = table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "error", F.lit("5 minutes")).otherwise(
        F.lit("10 minutes")
    )
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


# ---------------------------------------------------------------------------
# Longest monotone streak (round 8)


@register(
    "longest_rising_streak",
    defer=2,
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, {sql_dsum('value')} AS rev
        FROM events GROUP BY 1
    ),
    flagged AS (
        SELECT day, rev,
               CASE WHEN rev > lag(rev) OVER (ORDER BY day)
                    THEN 1 ELSE 0 END AS up,
               row_number() OVER (ORDER BY day) AS rn
        FROM daily
    ),
    isl AS (
        -- gaps-and-islands: consecutive up-days share (rn - up_rank)
        SELECT day, rn,
               rn - row_number() OVER (PARTITION BY up ORDER BY rn) AS grp
        FROM flagged WHERE up = 1
    ),
    runs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS run_len,
               MIN(day) AS first_up_day, MAX(day) AS last_day
        FROM isl GROUP BY grp
    )
    SELECT run_len + 1 AS streak_days,
           CAST(first_up_day - INTERVAL 1 DAY AS DATE)::VARCHAR AS start_day,
           CAST(last_day AS VARCHAR) AS end_day
    FROM runs
    ORDER BY run_len DESC, first_up_day
    LIMIT 1
    """,
    doc="Longest run of consecutive days with strictly rising daily "
    "revenue (gaps-and-islands over the day-grain rollup); earliest "
    "streak wins ties.",
)
def longest_rising_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic gaps-and-islands interview question as a production
    monitor: momentum streaks in the day-grain revenue series.  Exact
    arithmetic end-to-end (decimal daily sums, integer ranks, date
    output as strings — DuckDB renders DATE as midnight timestamps in
    pandas, so both engines emit VARCHAR).  One day-grain rollup, two
    window passes over <=366 rows, a bounded aggregation."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("rev")
    )
    wd = Window.orderBy("day")
    flagged = daily.select(
        "day",
        F.when(F.col("rev") > F.lag("rev").over(wd), 1).otherwise(0).alias("up"),
        F.row_number().over(wd).alias("rn"),
    )
    isl = flagged.filter(F.col("up") == 1).select(
        "day",
        "rn",
        (
            F.col("rn")
            - F.row_number().over(Window.partitionBy("up").orderBy("rn"))
        ).alias("grp"),
    )
    runs = isl.groupBy("grp").agg(
        F.count("*").alias("run_len"),
        F.min("day").alias("first_up_day"),
        F.max("day").alias("last_day"),
    )
    return (
        runs.select(
            (F.col("run_len") + 1).alias("streak_days"),
            F.date_sub("first_up_day", 1).cast("string").alias("start_day"),
            F.col("last_day").cast("string").alias("end_day"),
            "run_len",
            "first_up_day",
        )
        .orderBy(F.col("run_len").desc(), "first_up_day")
        .limit(1)
        .drop("run_len", "first_up_day")
    )


# ---------------------------------------------------------------------------
# Time-weighted average (round 8)


@register(
    "time_weighted_avg_user",
    defer=2,
    oracle="""
    WITH pts AS (
        SELECT user_id, ts, CAST(value AS DECIMAL(18,4)) AS v,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                   - epoch_us(ts) AS dt_us
        FROM events
    ),
    agg AS (
        -- CAST ... AS VARCHAR AS DOUBLE, not AS DOUBLE directly: the
        -- value x microsecond products push the scale-4 integer past
        -- 2^53, where duckdb's direct decimal->double (int128 to double,
        -- then x 10^-4) compounds two roundings and lands 1 ulp off
        -- Spark's correctly-rounded BigDecimal cast (r10 skew sweep:
        -- 88.119999 vs 88.12 on a 15-day single-gap user).  The string
        -- round-trip is correctly rounded on both engines.
        SELECT user_id,
               CAST(CAST(SUM(v * dt_us) AS VARCHAR) AS DOUBLE) AS wsum,
               CAST(SUM(dt_us) AS BIGINT) AS span_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM pts WHERE dt_us IS NOT NULL
        GROUP BY 1
    )
    SELECT user_id, n_events + 1 AS n_events, span_us,
           floor(wsum / span_us * 1000000) / 1000000 AS twap
    FROM agg WHERE span_us > 0
    """,
    doc="Time-weighted average value per user (LOCF weighting: each "
    "observation holds until the next event): exact decimal x integer-"
    "microsecond products, one ordered window pass.",
)
def time_weighted_avg_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable-aggregate classic: a plain AVG over irregular events
    overweights bursts; weighting each value by its holding time (last
    observation carried forward) gives the true signal level.  Exactness:
    values quantized to DECIMAL(18,4), durations are integer
    microseconds, so every product and sum is exact — one IEEE division
    at the end, floor-quantized.  One per-user window sort, one keyed
    agg; no joins.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,4)").alias("v"),
        (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    agg = pts.groupBy("user_id").agg(
        F.sum(F.col("v") * F.col("dt_us")).cast("double").alias("wsum"),
        F.sum("dt_us").alias("span_us"),
        F.count("*").alias("n_events"),
    )
    return (
        agg.filter(F.col("span_us") > 0)
        .select(
            "user_id",
            (F.col("n_events") + 1).alias("n_events"),
            "span_us",
            (F.floor(F.col("wsum") / F.col("span_us") * 1000000) / 1000000).alias(
                "twap"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Pareto 80/20 concentration audit (round 8)

PARETO_TARGET_PPM = 800_000  # the "80" in 80/20, in ppm
PARETO_BAND_REV = 100_000  # phase-1 revenue band width for the 2-phase rank


@register(
    "pareto_8020_customers",
    defer=2,
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                   AS rev
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev DESC, o_custkey) AS rn,
               SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(rev) OVER () AS tot,
               COUNT(*) OVER () AS n
        FROM cust
    )
    -- first rank whose cumulative share reaches the target: exact decimal
    -- comparison scaled by 1e6 (no float share computation in the filter)
    SELECT CAST(MIN(rn) AS BIGINT) AS n_top_customers,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(1000000 * MIN(rn) // MAX(n) AS BIGINT)
               AS customer_share_ppm
    FROM ranked
    WHERE 1000000 * cum >= {PARETO_TARGET_PPM} * tot
    """,
    doc="Pareto 80/20 audit: how many top customers (by exact decimal "
    "revenue, rank-tie-broken by key) cover 80% of total revenue; the "
    "threshold compare is integer-scaled decimal, no float.",
)
def pareto_8020_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The concentration question behind every account-tiering decision.
    Exactness: revenue is an exact decimal sum, the 80% threshold test is
    ``1e6 * cum >= 800000 * tot`` in the decimal domain (float shares
    would risk a boundary flip at the crossover rank), and outputs are
    integer counts + an integral ppm.

    Distributed shape (VERDICT r8): ranking by revenue is a global sort —
    naively one unpartitioned window over the customer grain.  Two-phase
    prefix sum instead: customers partition by a coarse revenue band
    (``floor(rev / 100k)``, monotone in the rev-desc sort order, so band
    boundaries respect the global ranking and ties stay intra-band),
    phase 1 ranks and cumsums within each band in parallel, phase 2
    prefix-sums per-band (count, revenue) offsets on the bounded band
    grain (≤ max-customer-revenue / 100k rows) and broadcast-joins them
    back; grand totals come from one scalar aggregate, not a global
    window.  Same pattern as peak_concurrent_sessions' day-grain sweep."""
    orders = table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    banded = cust.withColumn(
        "band", F.floor(F.col("rev") / F.lit(PARETO_BAND_REV)).cast("long")
    )
    wloc = Window.partitionBy("band").orderBy(F.col("rev").desc(), "o_custkey")
    local = banded.select(
        "band",
        "rev",
        F.row_number().over(wloc).alias("lrn"),
        F.sum("rev")
        .over(wloc.rowsBetween(Window.unboundedPreceding, 0))
        .alias("lcum"),
    )
    # per-band offsets: everything in STRICTLY HIGHER bands precedes us
    wband = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        banded.groupBy("band")
        .agg(F.count("*").alias("bn"), F.sum("rev").alias("brev"))
        .select(
            "band",
            F.coalesce(F.sum("bn").over(wband), F.lit(0)).alias("rn_off"),
            F.coalesce(
                F.sum("brev").over(wband), F.lit(0).cast("decimal(38,2)")
            ).alias("cum_off"),
        )
    )
    totals = cust.agg(
        F.count("*").alias("n"), F.sum("rev").cast("decimal(38,2)").alias("tot")
    )
    ranked = (
        local.join(F.broadcast(offsets), "band")
        .crossJoin(F.broadcast(totals))
        .select(
            (F.col("rn_off") + F.col("lrn")).cast("int").alias("rn"),
            (F.col("cum_off") + F.col("lcum")).cast("decimal(38,2)").alias("cum"),
            "tot",
            "n",
        )
    )
    hit = ranked.filter(
        F.lit(1000000) * F.col("cum") >= F.lit(PARETO_TARGET_PPM) * F.col("tot")
    )
    return hit.agg(
        F.min("rn").alias("n_top_customers"),
        F.max("n").alias("n_customers"),
        # BIGINT literal: 1e6 * rank overflows Spark's INT32 literal math
        F.expr("CAST(CAST(1000000 AS BIGINT) * MIN(rn) div MAX(n) AS LONG)").alias(
            "customer_share_ppm"
        ),
    )
