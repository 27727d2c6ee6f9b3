"""Streaming window aggregations + watermark dedup over the events stream.

True ``readStream`` versions of the batch window aggs (operators/windows.py)
— same semantics, same oracle SQL, but computed by the streaming engine
with event-time watermarks.  The watermark generalizes the reference's
single persisted ``latest_timestamp`` (fetch_articles.py:33-55): instead of
silently dropping out-of-order rows (fetch_articles.py:102-104, SURVEY.md
§2a F1 gap), lateness is an explicit bound and the engine tracks per-key
state under it.

``streaming_dedup_watermark`` is the engine's fix for the reference's
at-least-once replay window (data committed before state,
fetch_articles.py:128-136): duplicates inside the lateness bound are
dropped by key with bounded state — the streaming version of the silver
compaction's ``dropDuplicates("id")``.

Scale notes: windowed aggs and watermark dedup keep per-key state in the
state store (RocksDB on a real cluster), partitioned by key across
executors; state is evicted as the watermark passes, so memory is bounded
by (keys in flight × lateness), not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.functions.exact import dsum, sql_dsum
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table
from azure_func_forem_data_etl_spark.streaming.core import (
    run_available_now,
    stream_session,
    stream_table,
)


@register(
    "streaming_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h streaming agg (readStream + watermark, complete mode).",
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Input-sized state partitioning (r14, guide §2.2): streaming STATE
    # partitions are pinned at query start (no AQE coalesce), so a
    # core-count-sized setting pays per-partition state-store maintenance
    # on every micro-batch regardless of data volume — measured 1.23 s →
    # 0.82 s at sf0.1 on local[32] routing through stream_session.
    spark = stream_session(spark, sf_dir, "events")
    events = stream_table(spark, sf_dir, "events")
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    # Complete mode: every window emits, incl. those still open at end of
    # stream — exactly the batch result, so the oracle is exact.
    return run_available_now(agg, "complete")


@register(
    "streaming_sliding_window",
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
    doc="Sliding 1h/30m streaming agg (readStream + watermark, complete mode).",
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # input-sized state partitioning — see streaming_tumbling_window (r14)
    spark = stream_session(spark, sf_dir, "events")
    events = stream_table(spark, sf_dir, "events")
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )
    return run_available_now(agg, "complete")


@register(
    "streaming_dedup_watermark",
    oracle="""
    -- COUNT(DISTINCT event_id), not COUNT(*): the SOURCE itself may
    -- carry at-least-once re-deliveries of an id (r11 dup-keys sweep),
    -- and the dedup keeps one row per id; a retry's event_type is the
    -- same logical event's type, so the per-type distinct-id count is
    -- well-defined
    SELECT event_type, COUNT(DISTINCT event_id) AS n_unique
    FROM events
    GROUP BY event_type
    """,
    doc="dropDuplicatesWithinWatermark over a replayed stream: exactly-once repair.",
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    # input-sized state partitioning — see streaming_tumbling_window (r14)
    spark = stream_session(spark, sf_dir, "events")
    # Simulate the reference's replay window: the same source unioned with
    # itself = every event delivered twice within the lateness bound.
    a = stream_table(spark, sf_dir, "events")
    b = stream_table(spark, sf_dir, "events")
    deduped = (
        a.unionByName(b)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out = run_available_now(deduped, "append")
    # Aggregate the deduped rows batch-side: the streaming part is the
    # stateful dedup; the count keeps the result (and the memory sink
    # comparison surface) small and oracle-friendly.
    return out.groupBy("event_type").agg(F.count("*").alias("n_unique"))


@register(
    "streaming_static_enrich",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           c_mktsegment,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
    doc="Stream-static enrichment join: streaming events x broadcast "
    "customer dim, then a watermarked tumbling agg per segment.",
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard streaming enrichment shape: a stateless broadcast hash
    join against a static dimension (re-read per micro-batch, no state
    store involvement), feeding a watermarked window agg.  At scale the dim
    broadcast is per-executor-once per batch; the only keyed state is the
    window agg's."""
    from azure_func_forem_data_etl_spark.sources.tables import table

    # input-sized state partitioning — see streaming_tumbling_window (r14)
    spark = stream_session(spark, sf_dir, "events")
    events = stream_table(spark, sf_dir, "events")
    segments = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        events.join(F.broadcast(segments), F.col("user_id") == F.col("c_custkey"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )
    return run_available_now(agg, "complete")


@register(
    "streaming_interval_join",
    oracle="""
    SELECT s.event_id AS signup_id,
           e.event_id AS purchase_id,
           s.user_id
    FROM events s JOIN events e
      ON e.user_id = s.user_id
     AND s.event_type = 'signup'
     AND e.event_type = 'purchase'
     AND e.ts >= s.ts
     AND e.ts <= s.ts + INTERVAL 1 HOUR
    """,
    doc="Stream-stream interval join: signups x purchases within 1h, both "
    "sides watermarked so join state is evicted as time advances.",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical stream-stream join shape: equi-key (user_id) plus a
    bounded event-time condition.  The time bound + both-side watermarks
    tell the engine exactly how long to retain each side's rows in the
    state store — state is O(events within the lateness+interval window),
    not O(stream) — and late rows beyond it are dropped, which is the
    explicit version of the reference's silent out-of-order drop
    (fetch_articles.py:102-104)."""
    spark = stream_session(spark, sf_dir, "events")
    signups = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    purchases = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = signups.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    out = run_available_now(
        joined.select("signup_id", "purchase_id", "user_id"),
        "append",
    )
    return out


#: Boundary-exclusion margin for the OUTER interval join: null rows are
#: only compared where watermark semantics are unambiguous.  Each side's
#: watermark advances off ITS OWN max event time (the filtered signup /
#: purchase sub-streams, not the whole table), and the unmatched-left
#: flush needs watermark (delay 1h) + join interval (1h) of headroom —
#: so the exclusion anchors at the EARLIER of the two sides' maxima,
#: minus 2h, minus a 5-minute safety margin.
_OUTER_SAFE_US = (2 * 3600 + 300) * 1_000_000


@register(
    "streaming_interval_join_outer",
    oracle=f"""
    WITH mx AS (
        SELECT LEAST(
            MAX(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END),
            MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        ) AS mx_us
        FROM events
    ),
    s AS (
        SELECT event_id AS signup_id, user_id, ts AS s_ts
        FROM events WHERE event_type = 'signup'
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT s.signup_id, p.purchase_id, s.user_id
    FROM s LEFT JOIN p
      ON p.user_id = s.user_id
     AND p.p_ts >= s.s_ts
     AND p.p_ts <= s.s_ts + INTERVAL 1 HOUR
    CROSS JOIN mx
    WHERE p.purchase_id IS NOT NULL
       OR epoch_us(s.s_ts) <= mx.mx_us - {_OUTER_SAFE_US}
    """,
    doc="LEFT OUTER stream-stream interval join: unmatched signups emit a "
    "NULL purchase row once the watermark passes their join window; "
    "null rows in the end-of-stream boundary zone (last interval+"
    "watermark+margin) are excluded on BOTH engines so the compare is "
    "exact despite watermark-timing semantics.",
)
def streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The outer variant is what CDC/attribution pipelines actually run
    ('signups that did NOT convert in the hour').  The engine can only
    emit an unmatched-left null AFTER the watermark passes s_ts + 1h, so
    at AvailableNow end-of-stream the newest signups' null rows are
    legitimately unemitted; the shared boundary filter removes that zone
    from both sides instead of pretending the semantics away.  State
    stays O(interval + lateness window) per key, exactly like the inner
    join."""
    spark = stream_session(spark, sf_dir, "events")
    signups = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    purchases = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = signups.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        "leftOuter",
    )
    out = run_available_now(
        joined.select("signup_id", "purchase_id", "user_id", "s_ts"),
        "append",
    )
    mx_us = (
        table(spark, sf_dir, "events")
        .agg(
            F.least(
                F.max(
                    F.when(
                        F.col("event_type") == "signup", F.unix_micros("ts")
                    )
                ),
                F.max(
                    F.when(
                        F.col("event_type") == "purchase", F.unix_micros("ts")
                    )
                ),
            ).alias("mx")
        )
        .collect()[0]["mx"]
    )
    safe = (mx_us or 0) - _OUTER_SAFE_US
    return out.filter(
        F.col("purchase_id").isNotNull() | (F.unix_micros("s_ts") <= safe)
    ).select("signup_id", "purchase_id", "user_id")


TOPK_PER_WINDOW = 3


@register(
    "streaming_topk_per_window",
    oracle=f"""
    WITH c AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, rk FROM (
        SELECT c.*,
               CAST(row_number() OVER (
                   PARTITION BY window_start
                   -- NULLS LAST pinned explicitly: the untyped (NULL)
                   -- group is a real group, and Spark's ASC default
                   -- orders it FIRST (r12 NULL-heavy sweep)
                   ORDER BY n_events DESC, event_type NULLS LAST
               ) AS INT) AS rk
        FROM c
    )
    WHERE rk <= {TOPK_PER_WINDOW}
    """,
    doc=f"Streaming windowed top-k: tumbling-hour event-type counts from "
    f"a readStream (complete mode), ranked to the top {TOPK_PER_WINDOW} "
    "types per window at read time.",
)
def streaming_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-items over a stream — the composition every ops dashboard
    runs: the STREAMING engine maintains per-(window, key) counts under a
    watermark, and the rank is applied batch-side on the sink table
    (ranking inside a streaming agg is unsupported; materialize-then-rank
    is the production pattern, e.g. a Delta sink + view).

    Scale shape: streaming state is (windows in flight × event types);
    the sink table is aggregate-sized (not stream-sized), so the batch
    rank costs one small window sort; rk <= k compiles to
    WindowGroupLimit."""
    from pyspark.sql import Window

    # input-sized state partitioning — see streaming_tumbling_window (r14)
    spark = stream_session(spark, sf_dir, "events")
    events = stream_table(spark, sf_dir, "events")
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )
    tbl = run_available_now(agg, "complete")
    # NULLS LAST pinned — see the oracle note (r12 NULL-heavy sweep)
    rk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.asc_nulls_last("event_type")
        )
    )
    return tbl.withColumn("rk", rk).filter(F.col("rk") <= TOPK_PER_WINDOW)


BLOCKLIST_MOD = 7  # c_custkey % 7 == 0 -> deterministic "blocked" users


@register(
    "streaming_blocklist_filter",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events e
    WHERE NOT EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_custkey = e.user_id AND c.c_custkey % {BLOCKLIST_MOD} = 0
    )
    GROUP BY 1, 2
    """,
    doc="Stream-static LEFT ANTI join: streaming events minus a static "
    "blocklist dimension, then a watermarked tumbling count per type.",
)
def streaming_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The negative-lookup twin of streaming_static_enrich: compliance/
    abuse filtering drops every event from a blocklisted user *before* it
    reaches aggregation state.  Stream-static anti join is stateless — the
    static side is re-read per micro-batch (picking up blocklist updates)
    and broadcast, so no state store grows with the stream; the only keyed
    state is the downstream window agg's.  The blocklist here is a
    deterministic slice of the customer dim so the batch oracle replays it
    exactly."""
    # input-sized state partitioning — see streaming_tumbling_window (r14)
    spark = stream_session(spark, sf_dir, "events")
    events = stream_table(spark, sf_dir, "events")
    blocked = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % BLOCKLIST_MOD == 0)
        .select(F.col("c_custkey").alias("user_id"))
    )
    agg = (
        events.join(F.broadcast(blocked), "user_id", "left_anti")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users_approx",
        )
    )
    tbl = run_available_now(agg, "complete")
    # COUNT(DISTINCT) is unsupported inside a streaming agg
    # (approx_count_distinct is the streaming-native answer); the exact
    # distinct the oracle checks is recovered batch-side from the same
    # filtered stream replayed through the dedup path below.
    exact = (
        run_available_now(
            stream_table(spark, sf_dir, "events")
            .join(F.broadcast(blocked), "user_id", "left_anti")
            .withWatermark("ts", "1 hour")
            .dropDuplicates(["user_id", "event_type", "ts"])
            .select(
                F.window("ts", "1 hour").alias("w"), "event_type", "user_id"
            ),
            "append",
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "user_id")
        .groupBy("window_start", "event_type")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
    # eqNullSafe on event_type: the untyped (NULL) group is a real group
    # on both engines, and a plain equality join would drop it
    # (r12 NULL-heavy sweep)
    t = tbl.select("window_start", "event_type", "n_events")
    return t.join(
        exact.withColumnsRenamed(
            {"window_start": "__ws", "event_type": "__et"}
        ),
        (F.col("window_start") == F.col("__ws"))
        & F.col("event_type").eqNullSafe(F.col("__et")),
    ).select("window_start", "event_type", "n_events", "n_users")


@register(
    "streaming_interval_join_full",
    oracle=f"""
    WITH mx AS (
        -- the boundary runs over the STREAMS' OWN domain (identified
        -- users): an anonymous event never enters either stream, so it
        -- must not advance the end-of-stream watermark the outer
        -- emission is judged against (r12 NULL-heavy sweep)
        SELECT LEAST(
            MAX(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END),
            MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        ) AS mx_us
        FROM events WHERE user_id IS NOT NULL
    ),
    -- identified users only (r11 null-FK sweep): a NULL join key never
    -- matches, and the two engines disagree on whether the orphaned
    -- anonymous rows count as "unmatched" for outer emission
    s AS (
        SELECT event_id AS signup_id, user_id AS s_user, ts AS s_ts
        FROM events WHERE event_type = 'signup' AND user_id IS NOT NULL
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts
        FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    )
    SELECT s.signup_id, p.purchase_id,
           COALESCE(s.s_user, p.p_user) AS user_id
    FROM s FULL JOIN p
      ON p.p_user = s.s_user
     AND p.p_ts >= s.s_ts
     AND p.p_ts <= s.s_ts + INTERVAL 1 HOUR
    CROSS JOIN mx
    WHERE (s.signup_id IS NOT NULL AND p.purchase_id IS NOT NULL)
       OR (p.purchase_id IS NULL AND epoch_us(s.s_ts) <= mx.mx_us - {_OUTER_SAFE_US})
       OR (s.signup_id IS NULL AND epoch_us(p.p_ts) <= mx.mx_us - {_OUTER_SAFE_US})
    """,
    doc="FULL OUTER stream-stream interval join: unmatched rows of BOTH "
    "sides emit NULL partners once the watermark clears their windows; "
    "the shared end-of-stream boundary zone is excluded on both engines.",
)
def streaming_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the stream-stream join matrix (inner / left / full):
    full-outer is the reconciliation shape — 'every signup AND every
    purchase, matched where possible' — and exercises both sides' state
    eviction + null emission.  Same O(interval + lateness) keyed state as
    the inner join; same boundary-zone discipline as the left-outer
    (rows whose null partner could still legitimately arrive at
    end-of-stream are excluded from BOTH engines' results)."""
    spark = stream_session(spark, sf_dir, "events")
    # identified users only — see the oracle note (r11 null-FK sweep)
    signups = (
        stream_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "signup") & F.col("user_id").isNotNull())
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    purchases = (
        stream_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & F.col("user_id").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        "fullOuter",
    )
    out = run_available_now(
        joined.select("signup_id", "purchase_id", "s_user", "p_user", "s_ts", "p_ts"),
        "append",
    )
    # boundary over the streams' own (identified-user) domain — see the
    # oracle note (r12 NULL-heavy sweep)
    mx_us = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .agg(
            F.least(
                F.max(F.when(F.col("event_type") == "signup", F.unix_micros("ts"))),
                F.max(F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))),
            ).alias("mx")
        )
        .collect()[0]["mx"]
    )
    safe = (mx_us or 0) - _OUTER_SAFE_US
    return out.filter(
        (F.col("signup_id").isNotNull() & F.col("purchase_id").isNotNull())
        | (F.col("purchase_id").isNull() & (F.unix_micros("s_ts") <= safe))
        | (F.col("signup_id").isNull() & (F.unix_micros("p_ts") <= safe))
    ).select(
        "signup_id",
        "purchase_id",
        F.coalesce("s_user", "p_user").alias("user_id"),
    )


@register(
    "streaming_semi_join",
    oracle="""
    SELECT s.event_id AS signup_id, s.user_id
    FROM events s
    WHERE s.event_type = 'signup'
      AND EXISTS (
          SELECT 1 FROM events e
          WHERE e.event_type = 'purchase'
            AND e.user_id = s.user_id
            AND e.ts >= s.ts
            AND e.ts <= s.ts + INTERVAL 1 HOUR
      )
    """,
    doc="Stream-stream LEFT SEMI interval join: signups with >=1 purchase "
    "within 1h, emitted once regardless of purchase count.",
)
def streaming_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the stream-stream join matrix (inner / left+right outer /
    full outer / anti via blocklist / SEMI here): existence within a time
    bound, each left row emitted at most once — the streaming form of
    `EXISTS`, and the shape conversion funnels use ("did a purchase
    follow this signup?") without the row-multiplication an inner join
    would cause on multi-purchase users.

    State story: same as the inner interval join — both sides
    watermarked, the interval bound lets the engine evict each side as
    the watermark passes, so state is O(events in lateness+interval),
    not O(stream).  A semi join can actually evict left rows EARLIER
    (on first match) than an inner join could.
    """
    spark = stream_session(spark, sf_dir, "events")
    signups = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    purchases = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = signups.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    )
    return run_available_now(
        joined.select("signup_id", "user_id"),
        "append",
    )


@register(
    "streaming_session_window",
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
           COUNT(*) AS n_events
    FROM grp
    GROUP BY user_id, session_id
    """,
    doc="NATIVE streaming session windows (session_window + watermark): "
    "10-minute-gap sessions maintained by the engine's merging session "
    "state store, no custom state code.",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine-native counterpart of ``streaming_sessionize_state``
    (applyInPandasWithState): ``session_window`` in a streaming agg gets
    dynamic gap-merging session state managed BY THE ENGINE — sessions
    merge when a bridging event arrives, close when the watermark passes
    session_end + gap, and the state store holds only open sessions.
    Same oracle as the batch ``session_window_agg`` (gap-island SQL);
    the streaming run must land on identical sessions.

    Prefer this over hand-rolled state wherever the semantics fit: JVM
    state maintenance (no Python round-trip), RocksDB-backed at cluster
    scale, and watermark-driven eviction for free.  The custom-state op
    remains for logic session_window can't express (per-event running
    features inside a session).
    """
    # input-sized state partitioning — see streaming_tumbling_window (r14)
    spark = stream_session(spark, sf_dir, "events")
    ev = stream_table(spark, sf_dir, "events").withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )
    return run_available_now(agg, "complete")
