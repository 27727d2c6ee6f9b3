"""Core relational surface: scans, filters, projections, aggregations,
joins, windows, sort/limit, set ops, scalar functions (SURVEY.md §2b).

Also the reference-parity queries re-expressed relationally:

- ``watermark_incremental``: the flagship incremental-ingest pipeline —
  watermark filter (reference fetch_articles.py:102-104, operator F1),
  timestamp projection (:95-97, P1), running MAX + counts (:107-111,
  A1/A2) — as one declarative DataFrame chain.
- ``malformed_filter``: the malformed-record skip path
  (fetch_articles.py:94-100, F2) as a NULL-routing filter.
- ``dedup_replay``: the at-least-once replay dedup the reference implies
  but never implements (data committed before watermark,
  fetch_articles.py:128-136 — §4.3).

Scale notes (100 TB design point):
- Dimension joins broadcast explicitly (``F.broadcast``) — region/nation/
  customer-sized sides never shuffle the fact table.
- Fact-fact joins rely on sort-merge + AQE skew splitting; no collect().
- Top-k per group uses ``row_number() <= k`` (per-partition heap) rather
  than a global sort.
- All money aggregates go through ``functions.exact`` so results are
  bit-identical across engines and partition orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.functions.exact import (
    DEC,
    SQL_CHARGE,
    SQL_REVENUE,
    charge,
    davg,
    decsum,
    dsum,
    revenue,
    sql_davg,
    sql_decsum,
    sql_dsum,
)
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table

# Watermark constant for the flagship query: mid-range of the events table
# (2024-01-01 .. 2024-01-30). Plays the role of the persisted
# ``latest_timestamp`` state (fetch_articles.py:17,33-55).
WATERMARK = "2024-01-15 00:00:00"


@register(
    "watermark_incremental",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           MAX(ts) AS max_ts,
           {sql_dsum('value')} AS sum_value
    FROM events
    WHERE ts > TIMESTAMP '{WATERMARK}'
    GROUP BY event_type
    """,
    doc="Flagship: watermark filter + per-type counts + running MAX (F1/P1/A1/A2/L2).",
)
def watermark_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.filter(F.col("ts") > F.lit(WATERMARK).cast("timestamp"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.max("ts").alias("max_ts"),
            dsum("value").alias("sum_value"),
        )
    )


@register(
    "malformed_filter",
    oracle=r"""
    SELECT event_type,
           COUNT(*) AS n_valid,
           {davg} AS avg_k
    FROM (
        SELECT event_type,
               -- TRY_CAST, not CAST: DuckDB evaluates the projection before
               -- the WHERE below filters >18-digit runs out, so a plain
               -- CAST still overflows; on surviving rows they are identical
               TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        FROM events
        WHERE regexp_extract(props, '"k": (\d+)', 1) <> ''
          -- int64 guard (r11 adversarial-JSON sweep): a >18-digit run is
          -- malformed by this query's own definition — route it out
          -- instead of overflowing the ANSI cast
          AND length(regexp_extract(props, '"k": (\d+)', 1)) <= 18
    )
    WHERE k > 50
    GROUP BY event_type
    """.replace("{davg}", sql_davg("k")),
    doc="Malformed-record routing (F2): unparseable rows dropped, not fatal.",
)
def malformed_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    k_str = F.regexp_extract("props", r'"k": (\d+)', 1)
    return (
        events.select("event_type", k_str.alias("k_str"))
        # the length bound routes >int64 digit runs out as malformed
        # instead of overflowing the ANSI cast (r11 adversarial sweep)
        .filter((F.col("k_str") != "") & (F.length("k_str") <= 18))
        .select("event_type", F.col("k_str").cast("bigint").alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_valid"), davg("k").alias("avg_k"))
    )


@register(
    "dedup_replay",
    oracle="""
    SELECT event_type, COUNT(*) AS n_unique
    FROM (
        SELECT DISTINCT * FROM (
            SELECT * FROM events
            UNION ALL
            SELECT * FROM events WHERE event_type = 'click'
        )
    )
    GROUP BY event_type
    """,
    doc="At-least-once replay dedup (§4.3): duplicate batch union'd in, exact dedup out.",
)
def dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    replayed = events.unionByName(events.filter(F.col("event_type") == "click"))
    return replayed.distinct().groupBy("event_type").agg(F.count("*").alias("n_unique"))


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_decsum(SQL_REVENUE)} AS sum_disc_price,
           {sql_decsum(SQL_CHARGE)} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: wide hash aggregate with partial map-side combine.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            decsum(revenue()).alias("sum_disc_price"),
            decsum(charge()).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "filter_like_project",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM part
    WHERE p_type LIKE '%a%' AND p_size >= 10
    """,
    doc="Predicate + projection pushed into the parquet scan (PushedFilters).",
)
def filter_like_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.filter(F.col("p_type").like("%a%") & (F.col("p_size") >= 10)).select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )


@register(
    "agg_distinct",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Distinct aggregate (expand + two-phase agg under the hood).",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


@register(
    "cube_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets (status × priority matrix incl. grand totals).",
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_price")
    )


@register(
    "rollup_lineitem",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals.",
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "join_broadcast_dims",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_customers,
           {sql_dsum('c.c_acctbal')} AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="Two-hop dimension join; both dims broadcast — fact side never shuffles for the join.",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("sum_acctbal"))
    )


@register(
    "join_fact_fact",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           {sql_decsum(SQL_REVENUE)} AS revenue
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Fact-fact equi-join (sort-merge at scale, AQE skew-split) + aggregate.",
)
def join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), decsum(revenue()).alias("revenue"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    )
    """,
    doc="Left-semi join (EXISTS): dedup-free existence check, no row multiplication.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select("s_suppkey", "s_name")


@register(
    "join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): snapshot diffing / orphan detection.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "window_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    """,
    doc="Top-k per group via row_number (per-partition heap; avoids global sort).",
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@register(
    "window_lag_delta",
    oracle="""
    SELECT user_id, event_id,
           date_diff('microsecond',
                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS delta_us
    FROM events
    """,
    doc="lag/lead: inter-event gap per user in exact integer microseconds.",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.withColumn("_prev", F.lag("ts").over(w)).select(
        "user_id",
        "event_id",
        F.expr("timestampdiff(MICROSECOND, _prev, ts)").alias("delta_us"),
    )


@register(
    "window_rolling_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
    doc="Rolling frame: per-customer running spend (exact decimal window sum).",
)
def window_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
    )


@register(
    "sort_limit_topn",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    doc="Global top-N (TakeOrderedAndProject — no full sort materialized).",
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(20)
    )


@register(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT (distinct): snapshot diffing between ingests.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)  # EXCEPT (distinct) semantics


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    doc="INTERSECT (distinct): retained customers year-over-year.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.intersect(b)


@register(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           length(p_name) AS name_len,
           substr(p_type, 1, 3) AS type_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS snake_name
    FROM part
    WHERE p_size BETWEEN 5 AND 40
    """,
    doc="Scalar string functions (lower/upper/length/substr/concat/replace).",
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.filter(F.col("p_size").between(5, 40)).select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 3).alias("type_prefix"),
        # concat (not concat_ws): NULL in => NULL out, matching the oracle
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
    )


@register(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS o_year,
           month(o_orderdate) AS o_month,
           day(o_orderdate) AS o_day,
           quarter(o_orderdate) AS o_quarter,
           date_trunc('month', o_orderdate) AS month_start,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-01-01'
    """,
    doc="Scalar date functions (year/month/day/quarter/date_trunc/datediff).",
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")).select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_decsum(SQL_REVENUE)} AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 analog: 3-way join (broadcast dim into fact-fact SMJ), agg, top-10.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    cut = F.lit("1995-03-15").cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cut)
        .join(orders.filter(F.col("o_orderdate") < cut), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(decsum(revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .select("l_orderkey", "revenue", "o_orderdate")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           {sql_decsum(SQL_REVENUE)} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 analog: 6-way snowflake join, dims broadcast, region-pruned revenue.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    # Snowflake arm (region->nation->supplier) broadcasts into the fact
    # chain; the customer-nation equality closes the cycle.
    nr = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    s = supplier.join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
    return (
        lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(decsum(revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT o_orderkey,
           o_custkey,
           {sql_dsum('l_quantity')} AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_custkey
    HAVING {sql_dsum('l_quantity')} > 150
    ORDER BY total_qty DESC, o_orderkey
    """,
    doc="TPC-H Q18 analog: fact-fact join, aggregate with HAVING, ordered output.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)  # HAVING
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 analog: priority counts for orders with a late-shipped line "
    "(correlated EXISTS -> left-semi join with a non-equi residual).",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS with a correlated date predicate.

    Decorrelates to a left-semi hash/sort-merge join on ``orderkey`` with
    the date comparison as a join residual — the semi join keeps exactly one
    probe hit per order, so no row multiplication and no distinct needed.
    """
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(lineitem, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q12_late_shipments",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
    doc="TPC-H Q12 analog: conditional aggregation (CASE inside SUM) over a "
    "fact-fact join with a non-equi residual filter.",
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    WITH m AS (
        SELECT date_trunc('month', l_shipdate) AS ship_month,
               CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_REVENUE}
                             ELSE CAST(0 AS DECIMAL(13,4)) END) AS DOUBLE)
                   AS promo_revenue,
               CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
    )
    SELECT ship_month, promo_revenue, total_revenue,
           ROUND(100.0 * promo_revenue / total_revenue, 6) AS promo_pct
    FROM m
    """,
    doc="TPC-H Q14 analog: promo revenue share per ship month — broadcast "
    "dim join + conditional exact-decimal aggregate.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part is a dimension: broadcast it so the fact side never shuffles.

    Both sums stay in the exact decimal domain (functions/exact.py); the
    ratio is computed once per output row from the two already-deterministic
    doubles, so it is bit-identical across engines too.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    m = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            decsum(
                F.when(F.col("p_type") == "PROMO", revenue()).otherwise(
                    F.lit(0).cast("decimal(13,4)")
                )
            ).alias("promo_revenue"),
            decsum(revenue()).alias("total_revenue"),
        )
    )
    return m.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        F.round(F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6).alias(
            "promo_pct"
        ),
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 analog: returned-item revenue per customer — fact-fact SMJ "
    "with broadcast customer/nation dims, exact-decimal agg, deterministic top-20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returnflag filter is pushed into the lineitem scan; customer and
    nation broadcast; the top-20 compiles to TakeOrderedAndProject (per-
    partition heaps, no global sort materialization).  Ties at the cutoff
    are impossible to mis-order: revenue is exact decimal and the sort key
    includes the unique custkey."""
    lineitem = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(decsum(revenue()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 analog: pure scan-filter-aggregate — every predicate "
    "pushed to the parquet scan, zero shuffle to one output row.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical pushdown benchmark: all four predicates reach
    PushedFilters (min/max row-group skipping at scale), and the agg is a
    single partial+final sum — the whole 100 TB question costs one scan of
    the pruned row groups."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(9,2)")
            * F.col("l_discount").cast("decimal(3,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@register(
    "lateral_top_order_per_customer",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
    """,
    doc="LATERAL correlated subquery (top-1 order per customer): Catalyst "
    "decorrelates to WindowGroupLimit + one equi-join — never per-row re-execution.",
)
def lateral_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A lateral subquery looks like per-customer re-execution; both engines
    rewrite it to the set-based plan (per-key top-1 via window-group-limit
    heaps, then a join).  Registered via SQL — LATERAL has no DataFrame-API
    form, and the SQL route proves the decorrelation path end-to-end."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM __lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM __lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        """
    )


@register(
    "q19_disjunctive_join",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           {sql_decsum(SQL_REVENUE)} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity < 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity < 35)
    """,
    doc="TPC-H Q19 analog: disjunctive (OR-of-ANDs) mixed-table predicate "
    "over a broadcast join — per-table conjuncts still push into each scan.",
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst factors the OR: the union of each branch's single-table
    bounds (brand IN (...), size <= 30, quantity < 35) pushes into the
    scans as residual-safe prefilters, and the exact disjunction evaluates
    post-join — the standard way a 100 TB engine keeps OR predicates from
    disabling pushdown entirely."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") < 20)
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & (F.col("l_quantity") < 35)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(b1 | b2)
        .agg(F.count("*").alias("n_rows"), decsum(revenue()).alias("revenue"))
    )


@register(
    "null_safe_join",
    oracle="""
    WITH e AS (
        SELECT event_id, nullif(event_type, 'click') AS k FROM events
    ),
    d AS (
        SELECT * FROM (VALUES ('signup', 'acquisition'),
                              (NULL, 'engagement')) AS t(k, category)
    )
    SELECT d.category, COUNT(e.event_id) AS n_events
    FROM e JOIN d ON e.k IS NOT DISTINCT FROM d.k
    GROUP BY d.category
    """,
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other instead of silently dropping.",
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain equi-join semantics drop every NULL-keyed row (NULL = NULL is
    unknown); ``<=>`` makes NULL a first-class join key, and Spark still
    plans it as a hash join (NULL hashes to a regular bucket under the
    null-safe comparator) — no fallback to nested loops."""
    e = table(spark, sf_dir, "events").select(
        "event_id", F.nullif(F.col("event_type"), F.lit("click")).alias("k")
    )
    d = spark.createDataFrame(
        [("signup", "acquisition"), (None, "engagement")], "k: string, category: string"
    )
    return (
        e.join(F.broadcast(d), e["k"].eqNullSafe(d["k"]))
        .groupBy("category")
        .agg(F.count("event_id").alias("n_events"))
    )


@register(
    "q21_semi_anti_combo",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = o.o_orderkey
          AND l2.l_quantity > 45
    )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q21-style EXISTS + NOT EXISTS combo: chained left-semi then "
    "left-anti join on the same fact — no row multiplication anywhere.",
)
def q21_semi_anti_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both subqueries decorrelate to existence joins against lineitem:
    semi keeps orders with a late line, anti then removes orders with any
    big-quantity line.  Each pass is one keyed shuffle (or reuses the same
    orderkey partitioning back-to-back); output stays one row per order by
    construction, the property that makes EXISTS cheaper than JOIN+DISTINCT
    at 100 TB."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .join(
            li.filter(F.col("l_quantity") > 45),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# pure-SQL entry path: one ANSI string runs verbatim on Spark AND the oracle

# TPC-H Q7 analog (volume shipping between two nations).  Written once in
# engine-portable SQL: Spark executes it via spark.sql over temp views,
# DuckDB via the driver's pre-registered views — byte-identical text, which
# is the point: the engine's SQL surface is first-class, not a DataFrame
# veneer (SURVEY.md §2b "DataFrame/SQL").
_Q7_SQL = f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_decsum("volume")} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {SQL_REVENUE} AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey
          AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


@register(
    "q7_volume_shipping_sql",
    oracle=_Q7_SQL,
    doc="TPC-H Q7 analog run through spark.sql — the identical SQL string "
    "is the oracle (engine-portable ANSI SQL, decimal-domain money math).",
)
def q7_volume_shipping_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API entry path: register temp views, run the SAME text the
    oracle runs.  Catalyst still plans it like the DataFrame queries —
    broadcast for the two nation dims, SMJ for lineitem-orders — because
    SQL and DataFrame compile to the same logical plan."""
    from azure_func_forem_data_etl_spark.sources.tables import register_temp_views

    register_temp_views(spark, sf_dir)
    return spark.sql(_Q7_SQL)


@register(
    "agg_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (JVM percentile(), no "
    "Python) — the built-in complement to applyinpandas_quantiles.",
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's ``percentile`` is the exact linear-interpolation quantile
    (same definition as DuckDB ``quantile_cont``), computed JVM-side with
    a per-group sort — at 100 TB prefer ``approx_percentile`` (registered
    as agg_approx_percentile) unless exactness is required; this query IS
    the exactness contract for that tradeoff."""
    li = table(spark, sf_dir, "lineitem")
    # One array-percentile aggregate: a single per-group value buffer and
    # sort serves all three cut points (three scalar percentile() calls
    # would each keep their own copy of every group's values — 3x the
    # aggregation-buffer memory for identical output).
    pct = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("ps"), F.count("*").alias("n"))
        .select(
            "l_returnflag",
            F.round(F.element_at("ps", 1), 6).alias("p50"),
            F.round(F.element_at("ps", 2), 6).alias("p90"),
            F.round(F.element_at("ps", 3), 6).alias("p99"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# retention cohorts over the events stream table


@register(
    "retention_cohorts",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(datediff('day', c.cohort_day, a.day) AS INT) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY strftime(c.cohort_day, '%Y-%m-%d'),
             CAST(datediff('day', c.cohort_day, a.day) AS INT)
    """,
    doc="Retention cohorts: users grouped by first-seen day, counted at "
    "each day-offset of later activity (classic product analytics).",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix from raw events: distinct (user, day)
    activity, each user's first day, then user counts per (cohort_day,
    offset).  All-integer/date math — bit-exact across engines.

    Scale shape: the distinct and both aggregations all shuffle on
    user_id (AQE reuses the exchange); the final (cohort_day, offset)
    aggregation has ~days² keys — tiny.  The cohort table is NOT
    broadcast: it is user-count-sized; the join is a co-partitioned SMJ
    on the exchange the distinct already created."""
    events = table(spark, sf_dir, "events")
    activity = events.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohort, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day").cast("int"))
        .groupBy(
            # ISO string, not DATE: engines render bare dates differently
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# funnel conversion over the events stream table


@register(
    "funnel_conversion",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN u ON e.user_id = u.user_id
        WHERE e.event_type = 'click' AND e.ts > u.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT '1_view' AS step, COUNT(t_view) AS n_users FROM u
    UNION ALL
    SELECT '2_click' AS step, COUNT(*) AS n_users FROM c
    UNION ALL
    SELECT '3_purchase' AS step, COUNT(*) AS n_users FROM p
    """,
    doc="Ordered funnel: users with a view, then a click AFTER their "
    "first view, then a purchase after that click (event-order funnel).",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis — each step requires the event to happen
    AFTER the user's qualifying previous step, not merely coexist.

    Scale shape: three aggregations all keyed on user_id, so one
    partitioning serves every stage (AQE reuses the exchange); the step
    counts union three one-row aggregates.  Strictly-ordered semantics
    make it a behavioral query the plain groupBy/pivot family can't
    express."""
    events = table(spark, sf_dir, "events")
    u = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(u, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.count("*").alias("_n"))
    )
    return (
        u.agg(F.count("t_view").alias("n_users")).select(
            F.lit("1_view").alias("step"), "n_users"
        )
        .unionByName(
            c.agg(F.count("*").alias("n_users")).select(
                F.lit("2_click").alias("step"), "n_users"
            )
        )
        .unionByName(
            p.agg(F.count("*").alias("n_users")).select(
                F.lit("3_purchase").alias("step"), "n_users"
            )
        )
    )


# ---------------------------------------------------------------------------
# percent-of-total (ratio-to-report) window


@register(
    "pct_of_total_revenue",
    oracle=f"""
    WITH r AS (
        SELECT n_name AS nation, {sql_decsum(SQL_REVENUE)} AS revenue
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        GROUP BY n_name
    )
    SELECT nation, revenue,
           round(revenue / SUM(revenue) OVER (), 6) AS pct_of_total,
           CAST(rank() OVER (ORDER BY revenue DESC, nation) AS INT) AS rev_rank
    FROM r
    """,
    doc="Ratio-to-report: each nation's revenue share of the global total "
    "(empty-partition window AFTER aggregation) + revenue rank.",
)
def pct_of_total_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The report-window shape: a global (unpartitioned) window — safe
    ONLY because it runs on the post-aggregation relation (one row per
    nation), never on raw rows; the fact table reduces through a keyed
    agg first.  Shares are ratios of decimal-exact doubles; the global
    sum is over ≤ |nations| values in a deterministic single partition."""
    li = table(spark, sf_dir, "lineitem")
    supp_nat = table(spark, sf_dir, "supplier").join(
        F.broadcast(table(spark, sf_dir, "nation").select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    r = (
        li.join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("nation")
        .agg(decsum(revenue()).alias("revenue"))
    )
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.col("revenue").desc(), "nation")
    return r.select(
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias(
            "pct_of_total"
        ),
        F.rank().over(w_rank).cast("int").alias("rev_rank"),
    )


@register(
    "join_full_outer_snapshot",
    oracle="""
    WITH h1 AS (
        SELECT o_custkey, COUNT(*) AS n_h1
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY o_custkey
    ),
    h2 AS (
        SELECT o_custkey, COUNT(*) AS n_h2
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        GROUP BY o_custkey
    )
    SELECT coalesce(h1.o_custkey, h2.o_custkey) AS custkey,
           CAST(coalesce(n_h1, 0) AS BIGINT) AS n_h1,
           CAST(coalesce(n_h2, 0) AS BIGINT) AS n_h2,
           CASE WHEN h1.o_custkey IS NULL THEN 'h2_only'
                WHEN h2.o_custkey IS NULL THEN 'h1_only'
                ELSE 'both' END AS presence
    FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
    """,
    doc="FULL OUTER join of two period snapshots per customer: era diff "
    "with both-sided null handling (the set-op completing the join family).",
)
def join_full_outer_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diffing with a FULL OUTER join — customers active in
    either era, labeled both/h1_only/h2_only.  The inputs are already
    aggregated (one row per custkey per side) before the join, so the
    outer join shuffles |customers| rows, not |orders|; partial
    aggregation collapses the fact table map-side.  Full outer cannot
    broadcast (both sides need null-extension) — SMJ on the agg output is
    the right plan and AQE handles any residual skew."""
    orders = table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    h1 = (
        orders.filter(F.col("o_orderdate") < cut)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_h1"))
    )
    h2 = (
        orders.filter(F.col("o_orderdate") >= cut)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_h2"))
    )
    j = h1.withColumnRenamed("o_custkey", "k1").join(
        h2.withColumnRenamed("o_custkey", "k2"),
        F.col("k1") == F.col("k2"),
        "full_outer",
    )
    return j.select(
        F.coalesce("k1", "k2").alias("custkey"),
        F.coalesce("n_h1", F.lit(0)).cast("long").alias("n_h1"),
        F.coalesce("n_h2", F.lit(0)).cast("long").alias("n_h2"),
        F.when(F.col("k1").isNull(), "h2_only")
        .when(F.col("k2").isNull(), "h1_only")
        .otherwise("both")
        .alias("presence"),
    )


@register(
    "keyset_pagination_orders",
    oracle="""
    WITH ranked AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ),
    cursor_row AS (SELECT o_totalprice AS c_price, o_orderkey AS c_key
                   FROM ranked WHERE rn = 40)
    SELECT r.o_orderkey, r.o_custkey, r.o_totalprice
    FROM ranked r, cursor_row c
    WHERE r.o_totalprice < c.c_price
       OR (r.o_totalprice = c.c_price AND r.o_orderkey > c.c_key)
    ORDER BY r.o_totalprice DESC, r.o_orderkey
    LIMIT 20
    """,
    doc="Keyset pagination: page-after-cursor via the (price, key) "
    "tuple predicate + TopK — the O(page) pattern that replaces "
    "OFFSET's O(offset+page) skip-scan at depth.",
)
def keyset_pagination_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why keyset and not OFFSET at 100 TB: OFFSET n must still produce
    and discard n rows on every page request; the keyset predicate
    pushes the cursor into the scan/sort so each page costs
    O(page size) — and compiles to TakeOrderedAndProject here.  The
    cursor row itself is fetched once (driver-side, bounded at 1 row),
    exactly how a paging API stores the last row of the previous page."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    cursor = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 40)
        .select("o_totalprice", "o_orderkey")
        .collect()
    )
    if not cursor:
        # degenerate contract (r10 sparse random sweep): fewer rows than
        # the cursor depth means there is no page after the cursor — the
        # oracle's empty cursor_row join yields no rows, so does this
        return orders.filter(F.lit(False))
    c_price, c_key = cursor[0]["o_totalprice"], cursor[0]["o_orderkey"]
    return (
        orders.filter(
            (F.col("o_totalprice") < F.lit(c_price))
            | (
                (F.col("o_totalprice") == F.lit(c_price))
                & (F.col("o_orderkey") > F.lit(c_key))
            )
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


BACKLOG_ANCHOR = "2001-09-01"  # just past the generated orderdate range


@register(
    "orders_backlog_aging",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '{BACKLOG_ANCHOR}') // 365 AS INT)
               AS age_years,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_value
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY 1, 2
    """,
    doc="Open-order backlog aging: non-finished orders bucketed by whole "
    "years of age at the anchor date, with counts and value at risk.",
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operations report behind every order pipeline: how old is the
    open backlog and how much value sits in each age band.  Age bucketing
    is integer day arithmetic (no float boundaries).

    Scale shape: status filter reaches the scan; one aggregation on a
    (status x age-years) key of trivial cardinality — map-side combine
    makes the shuffle a few rows per partition."""
    orders = table(spark, sf_dir, "orders")
    age_years = (
        F.datediff(
            F.lit(BACKLOG_ANCHOR).cast("date"),
            F.col("o_orderdate").cast("date"),
        )
        / F.lit(365)
    )
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .groupBy(
            "o_orderstatus",
            F.floor(age_years).cast("int").alias("age_years"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


@register(
    "brand_revenue_pareto",
    oracle=f"""
    WITH rev AS (
        SELECT p.p_brand,
               {{DSUM}} AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    ),
    ranked AS (
        SELECT p_brand, revenue,
               CAST(row_number() OVER (
                   ORDER BY revenue DESC, p_brand) AS INT) AS rk,
               sum(revenue) OVER (
                   ORDER BY revenue DESC, p_brand
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_rev,
               sum(revenue) OVER (
                   ORDER BY revenue DESC, p_brand
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING
               ) AS tot_rev
        FROM rev
    )
    SELECT p_brand, rk,
           round(revenue, 2) AS revenue,
           round(cum_rev / tot_rev, 6) AS cum_share
    FROM ranked
    """.replace("{DSUM}", "CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)"),
    doc="Pareto (80/20) report: brands ranked by revenue with cumulative "
    "share — decimal-domain sums, windows over the brand-grain rollup.",
)
def brand_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The concentration question every category manager asks: how few
    brands carry most of the revenue.  Revenue sums stay in the DECIMAL
    domain (associative-exact); both windows and the global total operate
    on the brand-grain rollup, not the fact table.

    Scale shape: one fact-side aggregation (broadcast part dim), then a
    single-partition window over <=#brands rows — rollup-sized by
    construction."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w_ord = Window.orderBy(F.desc("revenue"), F.asc("p_brand"))
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # total over the SAME ordered frame: both engines then add the same
    # doubles in the same order (an unordered OVER () may not)
    w_all = w_ord.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return rev.select(
        "p_brand",
        F.row_number().over(w_ord).alias("rk"),
        F.round("revenue", 2).alias("revenue"),
        F.round(
            F.sum("revenue").over(w_cum) / F.sum("revenue").over(w_all), 6
        ).alias("cum_share"),
    )


def skyline_sweep(df: DataFrame, *part_cols: str) -> DataFrame:
    """One dominance sweep of the (price min, date max) skyline: keep rows
    whose date exceeds the running max over all strictly-preceding rows in
    (price asc, date desc, key asc) order.  With ``part_cols`` this is the
    sound local-prune phase (dominated-in-partition => dominated-globally);
    without, the exact global pass.  Idempotent on its own output."""
    w = Window.partitionBy(*part_cols) if part_cols else Window.partitionBy()
    w = w.orderBy(
        F.asc("o_totalprice"), F.desc("o_orderdate"), F.asc("o_orderkey")
    ).rowsBetween(Window.unboundedPreceding, -1)
    best_prev = F.max("o_orderdate").over(w)
    return (
        df.withColumn("_bp", best_prev)
        .filter(F.col("_bp").isNull() | (F.col("_bp") < F.col("o_orderdate")))
        .drop("_bp")
    )



@register(
    "skyline_orders_2d",
    oracle="""
    WITH s AS (
        SELECT o_orderkey, o_totalprice, o_orderdate,
               MAX(o_orderdate) OVER (
                   ORDER BY o_totalprice ASC, o_orderdate DESC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS best_prev_date
        FROM orders
    )
    SELECT o_orderkey, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM s
    WHERE best_prev_date IS NULL OR best_prev_date < o_orderdate
    """,
    doc="2-D skyline (Pareto frontier): orders minimizing price while maximizing recency; no other order is both cheaper-or-equal and newer.",
)
def skyline_orders_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-dominance query: keep orders where no other order
    is cheaper-or-equal AND newer (strictly better on one axis).  The 2-D
    sweep: sorted by (price asc, date desc), a point survives iff the
    running max of date over all strictly-preceding rows is below its own
    date — which also dedups exact (price, date) ties to one
    representative.

    Distributed shape (the global sort is the naive cost): phase 1 runs
    the same sweep per year-partition — any point dominated within its
    partition is dominated globally, so pruning is sound — leaving a
    frontier-sized survivor set; phase 2 runs the exact global sweep on
    survivors only.  At 100 TB phase 1 is a keyed window over the fact
    table and phase 2 a single-partition window over ~|frontier| rows."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    local = skyline_sweep(
        orders.withColumn("_yr", F.year("o_orderdate")), "_yr"
    ).drop("_yr")
    return skyline_sweep(local).select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
    )


PVM_YEAR_A, PVM_YEAR_B = 1996, 1997


@register(
    "revenue_bridge_pvm",
    oracle=f"""
    WITH base AS (
        SELECT p_brand,
               EXTRACT(year FROM o_orderdate) AS yr,
               l_quantity,
               CAST(l_extendedprice AS DECIMAL(9,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                   AS rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE EXTRACT(year FROM o_orderdate) IN ({PVM_YEAR_A}, {PVM_YEAR_B})
    ),
    per AS (
        SELECT p_brand,
               CAST(SUM(CASE WHEN yr = {PVM_YEAR_A} THEN l_quantity END)
                    AS DOUBLE) AS qty_a,
               CAST(SUM(CASE WHEN yr = {PVM_YEAR_A} THEN rev END)
                    AS DOUBLE) AS rev_a,
               CAST(SUM(CASE WHEN yr = {PVM_YEAR_B} THEN l_quantity END)
                    AS DOUBLE) AS qty_b,
               CAST(SUM(CASE WHEN yr = {PVM_YEAR_B} THEN rev END)
                    AS DOUBLE) AS rev_b
        FROM base GROUP BY p_brand
    )
    SELECT p_brand, qty_a, rev_a, qty_b, rev_b,
           round(rev_b - rev_a, 4) AS delta_revenue,
           round((qty_b - qty_a) * (rev_a / qty_a), 6) AS volume_effect,
           round(qty_b * (rev_b / qty_b - rev_a / qty_a), 6) AS price_effect
    FROM per
    WHERE qty_a > 0 AND qty_b > 0
    """,
    doc=f"Price-volume revenue bridge per brand between {PVM_YEAR_A} and {PVM_YEAR_B}: delta revenue decomposed into volume and price/mix effects.",
)
def revenue_bridge_pvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The finance-analytics waterfall: why did revenue change?  Per
    brand, volume effect = Δqty x period-A unit price, price/mix effect =
    period-B qty x Δunit-price; the two sum exactly to Δrevenue.  Period
    sums are decimal-domain (exact under any partition order) cast to
    double once; the effect formulas are then identical IEEE expression
    trees on both engines.  One three-way join (part dim broadcast-sized)
    + one brand-keyed agg with conditional sums — both periods in a
    single scan instead of a self-join of per-period aggregates."""
    from azure_func_forem_data_etl_spark.functions.exact import revenue as rev_expr

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = F.year("o_orderdate")
    base = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(yr.isin(PVM_YEAR_A, PVM_YEAR_B))
        .select("p_brand", yr.alias("yr"), "l_quantity", rev_expr().alias("rev"))
    )
    def per_year(col, year):
        return F.sum(F.when(F.col("yr") == year, F.col(col))).cast("double")
    per = base.groupBy("p_brand").agg(
        per_year("l_quantity", PVM_YEAR_A).alias("qty_a"),
        per_year("rev", PVM_YEAR_A).alias("rev_a"),
        per_year("l_quantity", PVM_YEAR_B).alias("qty_b"),
        per_year("rev", PVM_YEAR_B).alias("rev_b"),
    )
    unit_a = F.col("rev_a") / F.col("qty_a")
    unit_b = F.col("rev_b") / F.col("qty_b")
    return per.filter((F.col("qty_a") > 0) & (F.col("qty_b") > 0)).select(
        "p_brand",
        "qty_a",
        "rev_a",
        "qty_b",
        "rev_b",
        F.round(F.col("rev_b") - F.col("rev_a"), 4).alias("delta_revenue"),
        F.round((F.col("qty_b") - F.col("qty_a")) * unit_a, 6).alias("volume_effect"),
        F.round(F.col("qty_b") * (unit_b - unit_a), 6).alias("price_effect"),
    )


@register(
    "pipe_syntax_order_stats",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    doc="SQL pipe syntax (Spark 4 |> operators): the same plan as the equivalent SELECT, authored as a linear dataflow.",
)
def pipe_syntax_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.0 ships SQL pipe syntax (SPARK-49555, the ZetaSQL-style
    ``|>`` chain): each operator consumes the previous result top-down —
    the SQL text now reads in the same order Catalyst builds the logical
    plan, and the DataFrame chain's equivalence becomes literal.  The
    oracle is the classic SELECT; identical results prove the two
    syntaxes hit the same semantics (and the same optimized plan)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("__pipe_orders")
    return spark.sql(
        """
        FROM __pipe_orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                         AS total_price
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, total_price
        """
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) operator (round 8)


@register(
    "skyline_parts_pareto",
    defer=2,
    oracle="""
    WITH g AS (
        SELECT p_retailprice AS price, CAST(MAX(p_size) AS BIGINT) AS gmax
        FROM part GROUP BY 1
    ),
    run AS (
        SELECT price, gmax,
               MAX(gmax) OVER (ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_max
        FROM g
    )
    SELECT p.p_partkey, p.p_retailprice AS price,
           CAST(p.p_size AS BIGINT) AS size
    FROM part p JOIN run r ON r.price = p.p_retailprice
    WHERE (r.prior_max IS NULL OR p.p_size > r.prior_max)
      AND p.p_size >= r.gmax
    """,
    doc="Skyline (Pareto frontier) of parts on (price low, size high): "
    "non-dominated rows via the sorted running-max formulation — "
    "O(n log n), no quadratic dominance join.",
)
def skyline_parts_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skyline operator relational engines keep reinventing (Borzsony
    et al., ICDE 2001): rows no other row beats on EVERY criterion.  The
    naive formulation is a quadratic NOT EXISTS dominance self-join; for
    2 criteria it collapses to one sort — a part is dominated iff a
    strictly cheaper price group reaches its size (running max over the
    price order) or its own price group strictly exceeds it — so the plan
    is two keyed aggregations and one window pass, no BroadcastNestedLoop
    anywhere.  Equal (price, size) duplicates are all non-dominated, the
    standard skyline convention.
    """
    part = table(spark, sf_dir, "part")
    g = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("gmax")
    )
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    run = g.select("price", "gmax", F.max("gmax").over(w).alias("prior_max"))
    return (
        part.join(run, part["p_retailprice"] == run["price"])
        .filter(
            (F.col("prior_max").isNull() | (F.col("p_size") > F.col("prior_max")))
            & (F.col("p_size") >= F.col("gmax"))
        )
        .select(
            "p_partkey",
            F.col("p_retailprice").alias("price"),
            F.col("p_size").cast("long").alias("size"),
        )
    )
