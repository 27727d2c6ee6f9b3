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

from azure_func_forem_data_etl_spark.plans.registry import REGISTRY, register
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


@register(
    "snapshot_diff_user_state",
    oracle="""
    WITH bounds AS (
        -- integer epoch-micros midpoints: engine-exact, no interval rounding
        SELECT MIN(epoch_us(ts)) + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS t1,
               MIN(epoch_us(ts)) + 3 * (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 4 AS t2
        FROM events
    ),
    old_state AS (
        SELECT user_id, event_type
        FROM events, bounds WHERE epoch_us(ts) <= t1
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) = 1
    ),
    new_state AS (
        SELECT user_id, event_type
        FROM events, bounds WHERE epoch_us(ts) <= t2
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'inserted'
                WHEN n.user_id IS NULL THEN 'deleted'
                ELSE 'updated' END AS change_type,
           o.event_type AS old_state,
           n.event_type AS new_state
    FROM old_state o FULL OUTER JOIN new_state n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       -- IS DISTINCT FROM, not <>: a NULL-typed state transition
       -- (NULL -> x or x -> NULL) is a real update; the three-valued <>
       -- silently dropped it from the changelog, which the apply
       -- roundtrip then could not reconstruct (r12 NULL-heavy sweep)
       OR o.event_type IS DISTINCT FROM n.event_type
    """,
    doc="Snapshot diff (CDC derivation): latest-state-per-user at two "
    "points in time, FULL OUTER joined on the key; emits "
    "inserted/updated/deleted rows only — how a lakehouse derives a "
    "changelog between table versions when the source has none.",
)
def snapshot_diff_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each snapshot is one keyed window pass; the diff is one full-outer
    join on the key with payload comparison as a residual — no shuffle
    beyond the two snapshot builds and the key join.  Snapshot times are
    derived from the data's own ts range (50% / 75% points), so the query
    is deterministic without wall-clock constants (reference parity:
    fetch_articles.py derives its cutoff from persisted state, not now())."""
    events = table(spark, sf_dir, "events").withColumn(
        "__us", F.unix_micros("ts")
    )
    b = events.agg(
        F.min("__us").alias("lo"), F.max("__us").alias("hi")
    ).select(
        # integer div: epoch micros (~1.7e18) exceed double's exact range
        F.expr("lo + (hi - lo) div 2").alias("t1"),
        F.expr("lo + 3 * (hi - lo) div 4").alias("t2"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def state_at(bound_col: str) -> DataFrame:
        return (
            events.crossJoin(F.broadcast(b))
            .filter(F.col("__us") <= F.col(bound_col))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("user_id", "event_type")
        )

    old = state_at("t1").select(
        F.col("user_id").alias("o_uid"), F.col("event_type").alias("old_state")
    )
    new = state_at("t2").select(
        F.col("user_id").alias("n_uid"), F.col("event_type").alias("new_state")
    )
    diff = old.join(new, old["o_uid"] == new["n_uid"], "full_outer")
    # null-safe inequality — see the oracle note (r12 NULL-heavy sweep):
    # NULL -> x and x -> NULL are real updates the changelog must carry
    return diff.filter(
        F.col("o_uid").isNull()
        | F.col("n_uid").isNull()
        | ~F.col("old_state").eqNullSafe(F.col("new_state"))
    ).select(
        F.coalesce("o_uid", "n_uid").alias("user_id"),
        F.when(F.col("o_uid").isNull(), F.lit("inserted"))
        .when(F.col("n_uid").isNull(), F.lit("deleted"))
        .otherwise(F.lit("updated"))
        .alias("change_type"),
        "old_state",
        "new_state",
    )


@register(
    "changelog_apply_roundtrip",
    oracle="""
    WITH bounds AS (
        -- the t2 cut stays on the UNFILTERED stream: snapshot_diff (the
        -- changelog producer) computes its t1/t2 there, and the
        -- roundtrip only holds if both sides cut at the same instant
        SELECT MIN(epoch_us(ts)) + 3 * (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 4 AS t2
        FROM events
    )
    -- identified users only (r11 null-FK sweep): CDC is keyed on
    -- user_id, and a NULL key is un-joinable — the apply side's anti/
    -- upsert joins drop it while a window partition pools it
    SELECT user_id, event_type AS state
    FROM events, bounds WHERE epoch_us(ts) <= t2 AND user_id IS NOT NULL
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
    doc="Changelog APPLY: reconstruct the t2 snapshot by applying the "
    "snapshot_diff changelog (inserted/updated/deleted) to the t1 "
    "snapshot; the oracle computes the t2 snapshot directly — a "
    "round-trip proof that diff and apply are inverse operations.",
)
def changelog_apply_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply semantics (the consumer half of CDC, Delta MERGE's logic):
    deletes drop keys from the base (left-anti join), upserts
    (inserted+updated) overwrite-or-add via union + keep-changelog-wins.
    Both legs are keyed joins on user_id — one exchange each at scale.
    Correctness is self-certifying: the output must hash-match the
    directly-computed t2 snapshot, which is exactly what the oracle does."""
    # identified users only in the SNAPSHOTS (see the oracle note); the
    # t1 cut below still uses the unfiltered stream, like snapshot_diff
    diff = (
        snapshot_diff_user_state(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .localCheckpoint(eager=True)
    )
    events = table(spark, sf_dir, "events").withColumn(
        "__us", F.unix_micros("ts")
    )
    b = events.agg(F.min("__us").alias("lo"), F.max("__us").alias("hi")).select(
        F.expr("lo + (hi - lo) div 2").alias("t1")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    base = (
        events.filter(F.col("user_id").isNotNull())
        .crossJoin(F.broadcast(b))
        .filter(F.col("__us") <= F.col("t1"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", F.col("event_type").alias("state"))
    )
    deletes = diff.filter(F.col("change_type") == "deleted").select("user_id")
    upserts = diff.filter(F.col("change_type") != "deleted").select(
        "user_id", F.col("new_state").alias("state")
    )
    kept = base.join(deletes, "user_id", "left_anti").join(
        upserts.select("user_id"), "user_id", "left_anti"
    )
    return kept.unionByName(upserts)


from azure_func_forem_data_etl_spark.functions.exact import dsum, sql_dsum  # noqa: E402

IVM_ORDER_MOD = 10  # o_orderkey % 10 == 0 -> "delta" (newly arrived) orders
IVM_CUST_MOD = 13   # c_custkey % 13 == 0 -> "delta" customers


@register(
    "incremental_join_view",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price,
           CAST(SUM(CASE WHEN o_orderkey % {IVM_ORDER_MOD} = 0
                          OR c_custkey % {IVM_CUST_MOD} = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_from_delta
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Incremental view maintenance: V(A∪ΔA, B∪ΔB) rebuilt as V_old ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB; oracle is the direct full join.",
)
def incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The delta-join identity every materialized-view maintainer runs:

        (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B ∪ ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB

    Deterministic mod-slices of orders/customer stand in for the arriving
    micro-batches; the query evaluates the four legs separately and unions
    them, and the oracle computes the direct full join — hash equality IS
    the algebra's proof.  The 100 TB point: on a real deployment only the
    three Δ legs run per refresh (ΔA⋈B broadcast when ΔA is batch-sized,
    A⋈ΔB prunes A by ΔB's key set), which is O(|Δ|·fanout) instead of
    O(|A|+|B|) per refresh; the unioned legs below are exactly those jobs.
    Each leg keys its shuffle on the same custkey, so AQE coalesces them
    into one exchange footprint."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    a_new = F.col("o_orderkey") % IVM_ORDER_MOD == 0
    b_new = F.col("c_custkey") % IVM_CUST_MOD == 0
    A, dA = orders.filter(~a_new), orders.filter(a_new)
    B, dB = cust.filter(~b_new), cust.filter(b_new)
    on = F.col("o_custkey") == F.col("c_custkey")
    legs = [
        A.join(B, on).withColumn("from_delta", F.lit(0)),
        dA.join(B, on).withColumn("from_delta", F.lit(1)),
        A.join(dB, on).withColumn("from_delta", F.lit(1)),
        dA.join(dB, on).withColumn("from_delta", F.lit(1)),
    ]
    v = legs[0]
    for leg in legs[1:]:
        v = v.unionAll(leg)
    return v.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
        F.sum("from_delta").cast("long").alias("n_from_delta"),
    )


ASOF_SNAPSHOT_TS = "2024-01-15 00:00:00"


@register(
    "state_asof_snapshot",
    oracle=f"""
    WITH hist AS ({{scd2}})
    SELECT user_id, state, valid_from
    FROM hist
    WHERE valid_from <= TIMESTAMP '{ASOF_SNAPSHOT_TS}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{ASOF_SNAPSHOT_TS}')
    """.format(scd2=REGISTRY["scd2_user_state"].oracle),
    doc=f"Time travel over SCD2 history: each user's state AS OF {ASOF_SNAPSHOT_TS} — the interval containing the snapshot instant.",
)
def state_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The time-travel read SCD2 exists to answer: 'what was every user's
    state at instant T?'  One interval-containment filter over the
    validity table — no event-grain scan at query time, which is the
    entire point of maintaining the collapsed history (at 100 TB the
    history table is changes-sized, orders of magnitude under the event
    log; a lakehouse format answers the same question with VERSION AS OF
    on the snapshot it maintains the same way)."""
    hist = scd2_user_state(spark, sf_dir)
    t = F.lit(ASOF_SNAPSHOT_TS).cast("timestamp")
    return hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("user_id", "state", "valid_from")


@register(
    "changelog_apply_with_deletes",
    oracle="""
    WITH ranked AS (
        SELECT user_id, ts, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    )
    SELECT user_id, ts AS last_ts, round(value, 6) AS last_value
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
    doc="Tombstone-aware changelog apply: latest state per key, keys whose "
    "final operation is a delete marker ('error' here) drop out of the "
    "materialized state.",
)
def changelog_apply_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC with DELETE semantics — the missing third verb beside the
    family's insert/upsert ops: a key's state is its latest change
    UNLESS that latest change is a tombstone, in which case the key is
    absent from the materialized view (Debezium/Kafka-compacted-topic
    semantics; 'error' events stand in for op='d' markers on this
    corpus).

    Scale shape: one user-key window (same single sort-shuffle as
    scd2_user_state — Catalyst shares the partitioning), then a
    row-local verb filter.  Equivalent streaming form: the upsert
    foreachBatch sink with a delete branch.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.round("value", 6).alias("last_value"),
        )
    )
