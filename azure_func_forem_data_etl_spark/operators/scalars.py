"""Remaining scalar/relational surface from SURVEY.md §2b: grouping sets,
approximate distinct, array/explode functions, JSON functions, map
functions, union set-op, pivot.

The reference passes its JSON payloads through opaquely (`dict[str, Any]`,
fetch_articles.py:58,79-82); these operators are what a consumer of the
landed lake uses to actually pick the payloads apart — all built-in
Catalyst expressions inside whole-stage codegen, no Python in any hot
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.functions.exact import (
    dround,
    dsum,
    sql_dround,
    sql_dsum,
)
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table


@register(
    "grouping_sets_orders",
    oracle=f"""
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="GROUPING SETS with GROUPING() markers (tag x day style matrices).",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__gs_orders")
    # Grouping sets have no DataFrame-API form; SQL is the idiomatic route
    # and compiles to the same Expand + partial/final agg as cube/rollup.
    return spark.sql(
        f"""
        SELECT o_orderstatus,
               o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_approx_distinct",
    # Promoted rows-only -> oracle in r6 (r5 VERDICT ask #2b) via the
    # invariant-projection technique: the HLL++ binary sketch is engine-
    # specific, but (exact distinct, |approx - exact| <= bound) IS oracle-
    # checkable — DuckDB replays the exact distincts and the relative-error
    # invariant rides along as a checked boolean.  Bound = 3x the requested
    # rsd (0.02) with a small-n absolute floor; observed error across all
    # three fixture SFs is <= 1.8% (max at sf0.1: 14459 exact vs 14213).
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys,
           TRUE AS acd_within_3rsd
    FROM orders GROUP BY o_orderstatus
    """,
    doc="approx_count_distinct (HyperLogLog++): constant-memory distincts "
    "at 100 TB, invariant-checked against the exact distinct count.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At 100 TB only the sketch column survives (the exact countDistinct
    exists here to WITNESS the sketch's error bound per group — drop it
    and the plan is one partial-aggregated scan, no Expand)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
            F.countDistinct("o_custkey").alias("exact_custkeys"),
            F.count("*").alias("n_orders"),
        )
        .select(
            "o_orderstatus",
            "n_orders",
            "exact_custkeys",
            (
                F.abs(F.col("approx") - F.col("exact_custkeys"))
                <= F.greatest(
                    F.lit(3).cast("double"),
                    F.lit(0.06) * F.col("exact_custkeys"),
                )
            ).alias("acd_within_3rsd"),
        )
    )


@register(
    "array_functions_docs",
    oracle="""
    SELECT doc_id,
           len(tokens) AS n_tokens,
           len(list_distinct(tokens)) AS n_distinct,
           CAST(list_contains(tokens, 'spark') AS INT) AS has_spark,
           array_to_string(list_slice(tokens, 1, 3), '-') AS first3,
           tokens[-1] AS last_token
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
    """,
    doc="Array functions: size/distinct/contains/slice/join/element_at.",
)
def array_functions_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    d = docs.withColumn("tokens", F.split("text", " "))
    return d.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct"),
        F.array_contains("tokens", "spark").cast("int").alias("has_spark"),
        F.array_join(F.slice("tokens", 1, 3), "-").alias("first3"),
        F.element_at("tokens", -1).alias("last_token"),
    )


@register(
    "explode_token_counts",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
    doc="explode -> corpus-wide term frequencies, deterministic top-20.",
)
def explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@register(
    "json_functions_props",
    oracle="""
    WITH x AS (
        SELECT event_id,
               TRY_CAST(props AS JSON) AS j,
               json_extract_string(TRY_CAST(props AS JSON), '$.k') AS js
        FROM events
    ), y AS (
        SELECT event_id,
               CASE WHEN regexp_matches(js, '^-?[0-9]{1,18}$')
                    THEN CAST(js AS BIGINT) END AS k,
               -- from_json strictness replay: value must be a JSON NUMBER
               -- (integer-typed) inside int64, and duplicate top-level keys
               -- disqualify the row (Spark's last-duplicate-wins is not
               -- mirrorable, so the contract excludes dup-key payloads)
               CASE WHEN json_type(j) = 'OBJECT'
                     AND len(json_keys(j)) = len(list_distinct(json_keys(j)))
                     AND json_type(j, '$.k') IN ('BIGINT', 'UBIGINT')
                    THEN TRY_CAST(js AS BIGINT) END AS k_struct
        FROM x
    )
    SELECT event_id, k, k_struct, k * 2 AS k_doubled FROM y
    """,
    doc="JSON functions: get_json_object path extract + from_json typed struct.",
)
def json_functions_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total on ARBITRARY payloads (r11 adversarial-JSON sweep): ``k`` is
    the $.k value when it is an optionally-signed <=18-digit integer
    string (engines agree on first-duplicate-wins, quote-unwrapping, and
    NULL-on-invalid for path extraction; they diverge on '3.5' casts —
    DuckDB rounds, Spark NULLs — so the integer gate IS the contract).
    ``k_struct`` is the strict from_json parse, NULL unless the payload is
    a unique-key object whose k is an integer-typed JSON number in int64
    (from_json's last-duplicate-wins cannot be replayed in SQL, so
    duplicate-key rows are contractually NULL on both engines)."""
    events = table(spark, sf_dir, "events")
    k_path = F.get_json_object("props", "$.k")
    k = F.when(k_path.rlike(r"^-?[0-9]{1,18}$"), k_path.cast("bigint"))
    jok = F.json_object_keys("props")
    k_struct = F.when(
        F.size(jok) == F.size(F.array_distinct(jok)),
        F.from_json("props", "k BIGINT")["k"],
    )
    return events.select(
        "event_id",
        k.alias("k"),
        k_struct.alias("k_struct"),
        (k * 2).alias("k_doubled"),
    )


#: str_to_map's domain: a FLAT single-line object of bare-word keys and
#: scalar values free of the structural characters the brace/quote/space
#: strip would corrupt (no commas, colons, braces, quotes, or spaces
#: inside a value).  Shared verbatim by the Spark gate and the DuckDB
#: oracle, so both engines agree row-by-row on which payloads parse.
_FLAT_OBJ_RE = (
    r'^\{"[A-Za-z0-9_]+": "?[^,{}": ]*"?'
    r'(, "[A-Za-z0-9_]+": "?[^,{}": ]*"?)*\}$'
)
_KEY_RE = r'"([A-Za-z0-9_]+)":'


@register(
    "map_functions_props",
    oracle=f"""
    WITH x AS (
        SELECT event_id,
               regexp_matches(props, '{_FLAT_OBJ_RE}')
                 AND len(regexp_extract_all(props, '{_KEY_RE}', 1))
                     = len(list_distinct(regexp_extract_all(props, '{_KEY_RE}', 1)))
                 AS safe,
               regexp_extract(props, '"k": "?(-?[0-9]{{1,18}})"?[,}}]', 1) AS ks,
               len(regexp_extract_all(props, '{_KEY_RE}', 1)) AS nk
        FROM events
    )
    SELECT event_id,
           CASE WHEN safe AND ks <> '' THEN CAST(ks AS BIGINT) END AS k,
           CASE WHEN safe THEN nk END AS n_keys
    FROM x
    """,
    doc="Map functions: str_to_map / element_at / map_keys over the props payload.",
)
def map_functions_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total on ARBITRARY payloads (r11 adversarial-JSON sweep): the
    brace/quote/space strip feeding str_to_map corrupts nested values and
    duplicate keys crash map construction ([DUPLICATED_MAP_KEY]), so the
    map is built only behind a shared-regex gate — flat unique-key object
    of bare-word keys and structural-character-free scalars — that the
    oracle evaluates verbatim.  Outside the gate every derived column is
    NULL on both engines."""
    events = table(spark, sf_dir, "events")
    keys = F.regexp_extract_all("props", F.lit(_KEY_RE), F.lit(1))
    safe = F.col("props").rlike(_FLAT_OBJ_RE) & (
        F.size(keys) == F.size(F.array_distinct(keys))
    )
    m = F.when(
        safe,
        F.str_to_map(
            F.regexp_replace("props", r'[{}" ]', ""), F.lit(","), F.lit(":")
        ),
    )
    kv = F.try_element_at(m, F.lit("k"))
    k = F.when(kv.rlike(r"^-?[0-9]{1,18}$"), kv.cast("bigint"))
    return events.select(
        "event_id",
        k.alias("k"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "union_snapshots",
    oracle="""
    SELECT DISTINCT o_custkey FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        UNION ALL
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    )
    """,
    doc="UNION (distinct) of two snapshot projections — the set-op triple with intersect/except.",
)
def union_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return a.unionByName(b).distinct()


@register(
    "pivot_event_values",
    oracle="SELECT user_id % 10 AS user_bucket, "
    + ", ".join(
        "CAST(SUM(CAST(value AS DECIMAL(18,4)))"
        f" FILTER (WHERE event_type = '{t}') AS DOUBLE) AS {t}"
        for t in ("click", "error", "purchase", "signup", "view")
    )
    + " FROM events GROUP BY 1",
    doc="Pivot (long->wide): per-bucket value totals, one column per event type.",
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    # Explicit value list: no extra distinct-values job, stable columns.
    return (
        events.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(dsum("value"))
    )


@register(
    "scalar_math_functions",
    oracle="""
    SELECT o_orderkey,
           abs(o_totalprice - 100000.0) AS dist,
           CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS price_k_ceil,
           CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_k_floor,
           round(o_totalprice, 1) AS price_r1,
           sqrt(o_totalprice) AS price_sqrt,
           o_orderkey % 7 AS key_mod,
           greatest(o_totalprice, 50000.0) AS floored_at_50k,
           CAST(sign(o_totalprice - 100000.0) AS INT) AS above_100k
    FROM orders
    """,
    doc="Scalar math functions (abs/ceil/floor/round/sqrt/mod/greatest/sign; "
    "all IEEE-exact cross-engine — no libm-dependent pow/exp/trig).",
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist"),
        F.ceil(F.col("o_totalprice") / 1000.0).alias("price_k_ceil"),
        F.floor(F.col("o_totalprice") / 1000.0).alias("price_k_floor"),
        F.round("o_totalprice", 1).alias("price_r1"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("floored_at_50k"),
        F.signum(F.col("o_totalprice") - 100000.0).cast("int").alias("above_100k"),
    )


@register(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT ALL (bag semantics): multiplicity-aware snapshot diff.",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


@register(
    "agg_argmax_countif",
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_custkey, o_orderkey) AS last_custkey,
           arg_min(o_custkey, o_orderkey) AS first_custkey,
           CAST(count_if(o_totalprice > 150000.0) AS BIGINT) AS n_big
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="min_by/max_by (arg-extrema, keyed by the unique orderkey: deterministic) + count_if.",
)
def agg_argmax_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.max_by("o_custkey", "o_orderkey").alias("last_custkey"),
        F.min_by("o_custkey", "o_orderkey").alias("first_custkey"),
        F.count_if(F.col("o_totalprice") > 150000.0).alias("n_big"),
    )


@register(
    "intersect_all_snapshots",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT ALL (bag semantics): multiplicity-aware snapshot overlap.",
)
def intersect_all_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)


_SCALAR_SUBQ_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM {orders}
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        FROM {orders}
    )
"""


@register(
    "scalar_subquery_filter",
    oracle=_SCALAR_SUBQ_SQL.format(orders="orders"),
    doc="Scalar subquery in a predicate (above-average filter; decimal-exact mean).",
)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__sq_orders")
    return spark.sql(_SCALAR_SUBQ_SQL.format(orders="__sq_orders"))


_EXISTS_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM {orders} o
    WHERE EXISTS (
        SELECT 1 FROM {lineitem} l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49
    )
"""


@register(
    "exists_subquery",
    oracle=_EXISTS_SQL.format(orders="orders", lineitem="lineitem"),
    doc="Correlated EXISTS (decorrelates to a left-semi hash join).",
)
def exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("__ex_orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("__ex_lineitem")
    return spark.sql(_EXISTS_SQL.format(orders="__ex_orders", lineitem="__ex_lineitem"))


@register(
    "higher_order_array_functions",
    oracle="""
    SELECT doc_id,
           array_to_string(list_transform(string_split(text, ' '), w -> length(w)) [1:5], ',') AS first5_lens,
           len(list_filter(string_split(text, ' '), w -> length(w) > 4)) AS n_long_words,
           list_reduce(
               list_transform(string_split(text, ' '), w -> length(w)),
               (acc, x) -> acc + x
           ) AS total_chars
    FROM documents
    """,
    doc="Higher-order lambdas: transform (word lengths), filter (long words), aggregate (fold).",
)
def higher_order_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(
            "array_join(slice(transform(split(text, ' '), w -> length(w)), 1, 5), ',')"
        ).alias("first5_lens"),
        F.expr("size(filter(split(text, ' '), w -> length(w) > 4))").alias(
            "n_long_words"
        ),
        F.expr(
            "aggregate(transform(split(text, ' '), w -> length(w)), 0, (acc, x) -> acc + x)"
        ).alias("total_chars"),
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, val
    FROM (
        UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
                 FROM lineitem WHERE l_orderkey % 100 = 0)
        ON l_quantity, l_extendedprice, l_discount
        INTO NAME measure VALUE val
    )
    """,
    doc="Unpivot (wide->long): measure columns melt to (measure, val) rows.",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )


#: percentile_approx accuracy: rank error <= n / PCTL_ACC (Greenwald-Khanna
#: relative error 1/accuracy); the oracle bracket allows 2x that, floor 1.
PCTL_ACC = 10_000

#: Shared integer-exact bracket-rank expressions (Spark SQL and DuckDB both
#: use floor integer division here, so the two engines agree bit-for-bit).
#: k(p) = ceil(p*n) as (p*100*n + 99) DIV 100; margin m = ceil(2n/ACC).
_PCTL_M = f"GREATEST(1, (2 * n + {PCTL_ACC - 1}) DIV {PCTL_ACC})"


def _pctl_rank(pct: int, edge: str) -> str:
    k = f"(({pct} * n + 99) DIV 100)"
    if edge == "lo":
        return f"GREATEST(1, {k} - {_PCTL_M})"
    return f"LEAST(n, {k} + {_PCTL_M})"


@register(
    "agg_approx_percentile",
    # Promoted rows-only -> oracle in r6 (r5 VERDICT ask #2a): the sketch
    # value itself is engine-specific, but percentile_approx guarantees the
    # returned element's RANK is within n/accuracy of ceil(p*n) — so the
    # exact order statistics at ranks ceil(p*n) +- 2n/accuracy bracket it.
    # The projection carries those exact rank-neighbor values (DuckDB
    # replays them with ROW_NUMBER) plus the bracket-containment booleans.
    oracle=f"""
    WITH r AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           MAX(CASE WHEN rn = {_pctl_rank(50, "lo").replace("DIV", "//")} THEN value END) AS p50_lo,
           MAX(CASE WHEN rn = {_pctl_rank(50, "hi").replace("DIV", "//")} THEN value END) AS p50_hi,
           MAX(CASE WHEN rn = {_pctl_rank(95, "lo").replace("DIV", "//")} THEN value END) AS p95_lo,
           MAX(CASE WHEN rn = {_pctl_rank(95, "hi").replace("DIV", "//")} THEN value END) AS p95_hi,
           TRUE AS p50_in_bracket,
           TRUE AS p95_in_bracket
    FROM r GROUP BY event_type
    """,
    doc="percentile_approx (quantile sketch): constant-memory percentiles "
    "at 100 TB, bracket-checked against exact rank-neighbor order statistics.",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-bracket side sorts per group (one window shuffle) — that
    cost is the WITNESS, not the production path: at 100 TB you keep only
    the percentile_approx aggregate (single partial-aggregated pass,
    GK sketch per group, no sort)."""
    from pyspark.sql import Window

    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    r = (
        # value IS NOT NULL up front: percentile_approx ignores nulls, and
        # the two engines disagree on null ORDER (Spark nulls-first,
        # DuckDB nulls-last) — excluding them keeps rank semantics
        # engine-identical if the fixtures ever grow null values.
        events.select("event_type", "value")
        .filter(F.col("value").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
    )
    # One fused agg over the windowed pass: the sketch aggregates ride the
    # same (event_type)-partitioned data the bracket extraction needs, so
    # the plan is scan -> one window shuffle -> one agg (no second scan,
    # no bracket<->sketch join).
    fused = r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        *[
            F.max(
                F.when(F.col("rn") == F.expr(_pctl_rank(p, e)), F.col("value"))
            ).alias(f"p{p}_{e}")
            for p in (50, 95)
            for e in ("lo", "hi")
        ],
        F.percentile_approx("value", 0.5, PCTL_ACC).alias("p50a"),
        F.percentile_approx("value", 0.95, PCTL_ACC).alias("p95a"),
    )
    return fused.select(
        "event_type",
        "n",
        "p50_lo",
        "p50_hi",
        "p95_lo",
        "p95_hi",
        F.col("p50a").between(F.col("p50_lo"), F.col("p50_hi")).alias("p50_in_bracket"),
        F.col("p95a").between(F.col("p95_lo"), F.col("p95_hi")).alias("p95_in_bracket"),
    )


@register(
    "string_agg_priorities",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
               AS priorities_csv
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Ordered string aggregation (listagg/string_agg): sorted distinct CSV "
    "per group via collect_set -> array_sort -> array_join.",
)
def string_agg_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark has no ordered string_agg aggregate; the idiomatic spelling is
    collect_set (partial-aggregated, bounded by distinct-count) + array_sort
    + array_join, which makes the output order explicit rather than
    accidental — the only way a distributed string_agg is deterministic."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), "|"
            ).alias("priorities_csv"),
        )
    )


@register(
    "agg_variance_stddev",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(9,4))) AS DOUBLE) AS sm,
               CAST(SUM(CAST(l_quantity AS DECIMAL(9,4))
                        * CAST(l_quantity AS DECIMAL(9,4))) AS DOUBLE) AS ss
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           ROUND((ss - sm * sm / n) / (n - 1), 6) AS var_qty,
           ROUND(SQRT(ROUND((ss - sm * sm / n) / (n - 1), 6)), 6) AS std_qty
    FROM s
    -- degenerate contract (r11 single-row sweep): sample variance is
    -- undefined for a 1-row group ((n-1) = 0) — drop it on BOTH engines
    WHERE n > 1
    """,
    doc="Sample variance/stddev from exact decimal sum + sum-of-squares "
    "(single pass, order-independent), finished in deterministic doubles.",
)
def agg_variance_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in var_samp/stddev accumulate doubles in partition order, which
    is nondeterministic under parallelism (and engine-specific).  This
    computes the two exact decimal moments in one pass — same shuffle shape
    as any hash agg — then finishes with a fixed double expression tree, so
    the result is bit-identical on any engine at any parallelism."""
    q = F.col("l_quantity").cast("decimal(9,4)")
    s = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(q).cast("double").alias("sm"),
            F.sum(q * q).cast("double").alias("ss"),
        )
    )
    var = (F.col("ss") - F.col("sm") * F.col("sm") / F.col("n")) / (F.col("n") - 1)
    # degenerate contract (see oracle): 1-row groups have no sample variance
    return s.filter(F.col("n") > 1).select(
        "l_returnflag",
        F.round(var, 6).alias("var_qty"),
        F.round(F.sqrt(F.round(var, 6)), 6).alias("std_qty"),
    )


@register(
    "histogram_event_values",
    oracle="""
    WITH b AS (
        SELECT event_type,
               CASE WHEN value <= 0.0 THEN 0
                    WHEN value >= 100.0 THEN 21
                    ELSE CAST(floor(value / 5.0) AS INT) + 1 END AS bucket
        FROM events
    )
    SELECT event_type, bucket, COUNT(*) AS n
    FROM b GROUP BY event_type, bucket
    """,
    doc="Fixed-width histogram (width_bucket semantics: 20 buckets over "
    "[0,100) plus under/overflow) as pure arithmetic, one hash agg.",
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogramming at scale is a two-column group-by: bucket ids from a
    fixed arithmetic expression (kept identical in both engines rather than
    width_bucket(), whose edge rounding is implementation-defined), then one
    partial-aggregated count shuffle of at most #types x #buckets rows."""
    v = F.col("value")
    bucket = (
        F.when(v <= 0.0, 0)
        .when(v >= 100.0, 21)
        .otherwise(F.floor(v / 5.0).cast("int") + 1)
    )
    return (
        table(spark, sf_dir, "events")
        .select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
    )


@register(
    "deterministic_sample",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || ':'
                        || CAST(l_linenumber AS VARCHAR)), 1, 1) IN ('0', '1')
    GROUP BY l_returnflag
    """,
    doc="Deterministic ~12.5% sample (md5-nibble Bernoulli on the row key): "
    "reproducible across engines/reruns, unlike TABLESAMPLE.",
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based sampling for pipeline debugging/holdouts: the predicate is
    a pure row-local expression, so it pushes into the scan stage and costs
    nothing extra at 100 TB — and, unlike rand()/TABLESAMPLE, two engines
    (or two runs) agree on exactly which rows are in the sample."""
    li = table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"), F.lit(":"), F.col("l_linenumber").cast("string")
    )
    return (
        li.filter(F.substring(F.md5(key), 1, 1).isin("0", "1"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
    )


@register(
    "variant_shred_props",
    oracle="""
    WITH p AS (
        SELECT event_type, TRY_CAST(props AS JSON) AS j FROM events
    ), x AS (
        SELECT event_type,
               -- try_parse_json rejects duplicate-key payloads outright;
               -- mirror via the top-level key list (scope: the fixtures
               -- carry no NESTED duplicate keys, which Spark also rejects)
               CASE WHEN json_type(j) = 'OBJECT'
                     AND len(json_keys(j)) = len(list_distinct(json_keys(j)))
                    THEN json_extract_string(j, '$.k') END AS js
        FROM p
    ), y AS (
        SELECT event_type,
               CASE WHEN regexp_matches(js, '^-?[0-9]{1,18}$')
                    THEN CAST(js AS BIGINT) END AS k
        FROM x
    )
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM y
    GROUP BY event_type
    """,
    doc="VARIANT semi-structured path (Spark 4): parse_json once into the "
    "binary variant encoding, variant_get typed extraction, then aggregate.",
)
def variant_shred_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern replacement for schema-on-read string JSON (the
    reference's payloads are exactly this shape — opaque dicts,
    fetch_articles.py:58): VARIANT parses once into a binary encoding that
    downstream typed extractions read without re-parsing, and Parquet
    shredding stores hot paths columnar.  Extraction is codegen'd, so this
    stays a one-scan plan like every other scalar query.

    Total on ARBITRARY payloads (r11 adversarial-JSON sweep): parse is
    ``try_parse_json`` (malformed and duplicate-key docs -> NULL variant,
    where the old FAILFAST ``parse_json`` aborted the job) and ``k``
    counts only when the string view of $.k is an optionally-signed
    <=18-digit integer — the gate under which Spark's lenient
    variant_get long coercion ('012' -> 12) and DuckDB's TRY_CAST agree
    exactly (outside it they diverge: '3.5' rounds vs truncates vs NULLs,
    ' 7'/'+8' coerce on one side only)."""
    e = table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    ks = F.try_variant_get(v, "$.k", "string")
    k = F.when(
        ks.rlike(r"^-?[0-9]{1,18}$"), F.try_variant_get(v, "$.k", "long")
    )
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "conditional_null_functions",
    oracle="""
    SELECT event_id,
           nullif(event_type, 'error') AS non_error_type,
           coalesce(nullif(event_type, 'error'), 'REDACTED') AS type_or_default,
           CASE WHEN value > 50 THEN 'high' WHEN value > 10 THEN 'mid'
                ELSE 'low' END AS band,
           least(CAST(value AS DOUBLE), 25.0) AS capped,
           greatest(CAST(user_id % 7 AS BIGINT), 3) AS floored
    FROM events
    """,
    doc="NULL-handling conditionals (nullif/coalesce/CASE/least/greatest) — "
    "pure codegen row expressions, the quarantine-column toolkit.",
)
def conditional_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expression toolkit the bronze->silver quarantine path is built
    from (route bad values to NULL, default them, band them); all fold into
    one codegen'd projection with zero shuffle."""
    e = table(spark, sf_dir, "events")
    ne = F.nullif(F.col("event_type"), F.lit("error"))
    return e.select(
        "event_id",
        ne.alias("non_error_type"),
        F.coalesce(ne, F.lit("REDACTED")).alias("type_or_default"),
        F.when(F.col("value") > 50, "high")
        .when(F.col("value") > 10, "mid")
        .otherwise("low")
        .alias("band"),
        F.least(F.col("value").cast("double"), F.lit(25.0)).alias("capped"),
        F.greatest((F.col("user_id") % 7).cast("long"), F.lit(3).cast("long")).alias(
            "floored"
        ),
    )


@register(
    "bitwise_functions_events",
    oracle="""
    SELECT event_id,
           xor(event_id, user_id) AS xor_id,
           event_id & 255 AS and_mask,
           event_id | 4096 AS or_flag,
           -- shl4 is a true two's-complement SHIFT (Spark shiftleft
           -- wraps like Java <<), so the replay multiplies the
           -- unsigned-u64 image mod 2^64 and re-signs — a BIGINT
           -- multiply overflows near 2^62 (r11 id-domain sweep)
           CAST(CASE WHEN u_shl4 >= 9223372036854775808 THEN
                     CAST(u_shl4 - 18446744073709551616 AS BIGINT)
                ELSE CAST(u_shl4 AS BIGINT) END AS BIGINT) AS shl4,
           -- arithmetic >> == floor division; computed EXACTLY via the
           -- pmod identity in hugeint (a double floor(x/4) is 256 ulps
           -- wide at 2^62, and hugeint // truncates toward zero)
           CAST((CAST(event_id AS HUGEINT)
                 - (((event_id % 4) + 4) % 4)) // 4 AS BIGINT) AS shr2,
           bit_count(CAST(event_id AS BIGINT)) AS popcount
    FROM (
        SELECT *,
               ((CASE WHEN event_id < 0
                      THEN CAST(event_id AS HUGEINT) + 18446744073709551616
                      ELSE CAST(event_id AS HUGEINT) END) * 16)
               & 18446744073709551615 AS u_shl4
        FROM events
    )
    """,
    doc="Bitwise scalar functions: xor/and/or, shifts (as exact integer "
    "arithmetic twins), popcount — the fingerprint-math primitives.",
)
def bitwise_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bit-math surface SimHash/LSH build on, exposed as scalars.
    Shifts replay in the oracle as unsigned-u64 arithmetic mod 2^64
    (shl: Java/Spark << wraps two's-complement) and the exact pmod
    floor-division identity (shr: arithmetic shift) — bit-for-bit on the
    FULL int64 id domain, negative and near-2^62 included (r11 id-domain
    sweep; the old *16 / floor(/4) twins held only for small
    non-negative ids)."""
    events = table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xor_id"),
        F.col("event_id").bitwiseAND(F.lit(255)).alias("and_mask"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("or_flag"),
        F.shiftleft(F.col("event_id"), 4).cast("long").alias("shl4"),
        F.shiftright(F.col("event_id"), 2).cast("long").alias("shr2"),
        F.bit_count(F.col("event_id").cast("long")).alias("popcount"),
    )


@register(
    "string_pad_functions",
    oracle="""
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
           rpad(p_brand, 12, '.') AS padded_brand,
           reverse(p_type) AS rev_type,
           repeat(left(p_name, 3), 2) AS name3x2,
           translate(p_name, 'aeiou', 'AEIOU') AS shouty_vowels,
           ascii(p_type) AS type_ascii0,
           right(p_name, 4) AS name_tail
    FROM part
    """,
    doc="String shaping scalars: lpad/rpad (fixed-width keys), reverse, "
    "repeat, translate, ascii, left/right slicing.",
)
def string_pad_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width key padding (the classic sort-key trick), character
    translation and slicing — all JVM codegen, map-only."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.rpad("p_brand", 12, ".").alias("padded_brand"),
        F.reverse("p_type").alias("rev_type"),
        F.repeat(F.expr("left(p_name, 3)"), 2).alias("name3x2"),
        F.translate("p_name", "aeiou", "AEIOU").alias("shouty_vowels"),
        F.ascii("p_type").alias("type_ascii0"),
        F.expr("right(p_name, 4)").alias("name_tail"),
    )


@register(
    "agg_correlation",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(9,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sy,
               -- DECIMAL(19,..) operands force DuckDB's int128 multiply path
               -- (two <=18-precision decimals stay int64 and overflow).
               CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                        * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                        * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                        * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS corr_qty_price,
           round((n * sxy - sx * sy) / (n * n - n), 6) AS covar_samp_scaled
    FROM m
    -- degenerate contract (r10 const-values sweep): Pearson r is
    -- undefined for a zero-variance side (incl. n = 1 groups) — dropped
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    doc="Pearson correlation + covariance from exact decimal moments "
    "(one pass, order-independent — built-in corr() is not).",
)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same discipline as agg_variance_stddev: built-in ``corr``/
    ``covar_samp`` accumulate doubles in partition order (nondeterministic
    under parallelism); the five exact decimal moments make the finish a
    fixed double expression tree, bit-identical anywhere."""
    x = F.col("l_quantity").cast("decimal(9,4)")
    y = F.col("l_extendedprice").cast("decimal(12,4)")
    m = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum(x * x).cast("double").alias("sxx"),
            F.sum(y * y).cast("double").alias("syy"),
            F.sum(x * y).cast("double").alias("sxy"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    # degenerate contract (see oracle): zero-variance groups are dropped
    m = m.filter(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
    )
    return m.select(
        "l_returnflag",
        F.round(num / den, 6).alias("corr_qty_price"),
        F.round(num / (F.col("n") * F.col("n") - F.col("n")), 6).alias(
            "covar_samp_scaled"
        ),
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE value > 50) AS BIGINT) AS n_high,
           CAST(COUNT(*) FILTER (WHERE value <= 50) AS BIGINT) AS n_low,
           CAST(coalesce(SUM(CAST(value AS DECIMAL(18,4)))
                             FILTER (WHERE value > 50), 0) AS DOUBLE)
               AS sum_high,
           CAST(COUNT(DISTINCT user_id) FILTER (WHERE value > 50) AS BIGINT)
               AS users_high
    FROM events
    GROUP BY event_type
    """,
    doc="Filtered aggregation (SQL FILTER clause): conditional counts, "
    "sums, and distincts in one grouped pass over the fact table.",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FILTER-clause family expressed Spark-side as count_if /
    conditional-CASE aggregates — one pass, one shuffle, all measures
    partial-aggregated map-side (vs the naive multi-scan + join of one
    sub-aggregate per predicate).  The distinct measure rewrites to an
    expand + two-phase agg by Catalyst; money math in exact decimal."""
    e = table(spark, sf_dir, "events")
    high = F.col("value") > 50
    return e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_total"),
        F.count_if(high).cast("long").alias("n_high"),
        F.count_if(~high).cast("long").alias("n_low"),
        F.coalesce(
            F.sum(F.when(high, F.col("value")).cast("decimal(18,4)")), F.lit(0)
        )
        .cast("double")
        .alias("sum_high"),
        F.count_distinct(F.when(high, F.col("user_id")))
        .cast("long")
        .alias("users_high"),
    )


@register(
    "distinct_users_grouping_sets",
    oracle="""
    SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
           event_type,
           COUNT(DISTINCT user_id) AS distinct_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY GROUPING SETS
        ((strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d')),
         (event_type), ())
    """,
    doc="Multi-dimension DISTINCT in one pass: distinct users per day, "
    "per event_type, and overall via GROUPING SETS — one Expand + one "
    "distinct-aggregate instead of three scans.",
)
def distinct_users_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rollup-dashboard shape: every breakdown a reporting layer
    wants (daily distincts, per-type distincts, grand total) computed
    from ONE scan — Expand replicates each row once per grouping set and
    the distinct agg shuffles once on (set-id, keys, user), vs. three
    separate full scans + shuffles run naively.  At 100 TB the swap to
    approx_count_distinct (agg_approx_distinct) removes even the
    per-set distinct state."""
    table(spark, sf_dir, "events").createOrReplaceTempView("__gs_events")
    return spark.sql(
        """
        SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
               event_type,
               COUNT(DISTINCT user_id) AS distinct_users,
               COUNT(*) AS n_events
        FROM __gs_events
        GROUP BY GROUPING SETS
            ((date_format(date_trunc('day', ts), 'yyyy-MM-dd')),
             (event_type), ())
        """
    )


@register(
    "quality_percentile_normalize",
    oracle="""
    -- scored docs only (r12 NULL-heavy sweep): a NULL score would rank
    -- first on Spark's NULLS FIRST and last on DuckDB's NULLS LAST
    WITH s AS (
        SELECT doc_id, n_chars FROM documents WHERE n_chars IS NOT NULL
    )
    SELECT doc_id, n_chars,
           percent_rank() OVER (ORDER BY n_chars, doc_id) AS pct_rank,
           CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INT) AS decile
    FROM s
    """,
    doc="Score-to-percentile normalization: percent_rank + decile over "
    "(n_chars, doc_id) — how raw quality scores become corpus-relative "
    "thresholds ('drop the bottom 10%') that survive distribution drift.",
)
def quality_percentile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpartitioned ranking window — fine here because the ranked
    relation is one row per doc (already reduced).  At 100 TB the same
    normalization runs on the bucketed histogram instead
    (bucketed_quantile_estimates): percentiles from counters, no global
    sort.  The (score, doc_id) tiebreak makes both engines' ranks
    identical."""
    # scored docs only — see the oracle note (r12 NULL-heavy sweep)
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .filter(F.col("n_chars").isNotNull())
    )
    w = Window.orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id",
        "n_chars",
        F.percent_rank().over(w).alias("pct_rank"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )


@register(
    "winsorized_value_stats",
    oracle=f"""
    WITH cuts AS (
        SELECT event_type,
               percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS p05,
               percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value < c.p05 OR e.value > c.p95 AS INT)) AS BIGINT)
               AS n_clipped,
           CAST(SUM(CAST(GREATEST(LEAST(e.value, c.p95), c.p05)
                         AS DECIMAL(18,4))) AS DOUBLE) AS winsorized_sum
    FROM events e JOIN cuts c ON e.event_type = c.event_type
    GROUP BY e.event_type
    """,
    doc="Winsorized (p05/p95-clipped) per-type value sums — the robust-"
    "statistics pass that keeps a handful of outliers from dominating a "
    "100 TB aggregate; exact percentile cuts, decimal-exact sums.",
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aggs over the same event_type key: the percentile cut is a
    per-group sort (the exact twin of bucketed_quantile_estimates'
    sketch path — at 100 TB the cuts come from the histogram instead),
    then the clip + sum pass re-joins the <=#types cut rows by
    broadcast.  Spark's percentile() is the same linear-interpolation
    definition as DuckDB's percentile_cont, and the clipped sum runs in
    the decimal domain, so the hash compare is exact."""
    events = table(spark, sf_dir, "events")
    cuts = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped = F.greatest(F.least(F.col("value"), F.col("p95")), F.col("p05"))
    out_of_range = (
        (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))
    ).cast("int")
    return (
        events.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(out_of_range).cast("long").alias("n_clipped"),
            F.sum(clipped.cast("decimal(18,4)")).cast("double").alias(
                "winsorized_sum"
            ),
        )
    )


@register(
    "regression_value_trend",
    oracle=f"""
    WITH m AS (
        -- exact OLS moments: x = epoch MICROS (exact integers), y = the
        -- scale-4 decimal value; every sum is exact decimal, then
        -- STRING round-trips to correctly-rounded doubles (see
        -- exact.sql_dsum).  The closed forms below are the identical
        -- IEEE expression tree the Spark side evaluates, so the outputs
        -- are bit-equal at ANY magnitude — the r11 magnitude sweep
        -- showed engine regr_* accumulation-order noise exceeding the
        -- absolute 4dp rounding step on 1e10-scale intercepts.
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(epoch_us(ts)) AS STRING) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(epoch_us(ts) AS DECIMAL(38,0))
                             * epoch_us(ts)) AS STRING) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS STRING)
                    AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))
                             * CAST(value AS DECIMAL(18,4))) AS STRING)
                    AS DOUBLE) AS syy,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))
                             * epoch_us(ts)) AS STRING) AS DOUBLE) AS sxy
        FROM events
        GROUP BY event_type
    ),
    d AS (
        SELECT event_type, n, sx, sy,
               n * sxy - sx * sy AS num,
               n * sxx - sx * sx AS den,
               n * syy - sy * sy AS deny
        FROM m
    )
    SELECT event_type, n,
           {sql_dround("CASE WHEN den > 0 THEN (num / den) * 3600000000.0 END", 6)}
               AS slope_per_hour,
           {sql_dround("CASE WHEN den > 0 THEN sy / n - (num / den) * (sx / n) END", 4)}
               AS intercept,
           {sql_dround("CASE WHEN den > 0 AND deny > 0 THEN (num * num) / (den * deny) END", 6)}
               AS r2
    FROM d
    """,
    doc="Per-type OLS trend of value over time (slope per hour, "
    "intercept, r2) from exact decimal moments (x = epoch micros, "
    "y = scale-4 value) — deterministic closed forms, not engine "
    "regr_* (whose accumulation order diverges at large magnitudes).",
)
def regression_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS via the decomposable-moments formulation — one
    partial-aggregated shuffle computes (n, Σx, Σx², Σy, Σy², Σxy) per
    group, which is exactly why it scales: no per-group sort, no second
    pass.  Unlike engine ``regr_*`` (double accumulators whose partial-
    aggregation order is nondeterministic), the moments here are EXACT:
    x is integer epoch micros, y the scale-4 decimal value, sums run in
    the decimal domain and convert once — the closed forms are then the
    same deterministic doubles on any engine and partition order.
    Degenerate contract: zero x-variance (one event, or all at one
    micro) leaves slope/intercept undefined (NULL), zero y-variance
    leaves r2 NULL — mirrored by the oracle CASE guards."""
    events = table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    m = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        # decimal-domain sum: epoch-micro sums pass the int64 range at
        # ~5k rows per group (duckdb auto-promotes BIGINT sums to
        # hugeint; Spark's long sum would overflow under ANSI)
        F.sum(us.cast("decimal(38,0)")).cast("string").cast("double").alias("sx"),
        F.sum(us.cast("decimal(38,0)") * us).cast("string").cast("double").alias("sxx"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("string").cast("double").alias("sy"),
        F.sum(F.col("value").cast("decimal(38,4)") * F.col("value").cast("decimal(18,4)"))
        .cast("string").cast("double").alias("syy"),
        F.sum(F.col("value").cast("decimal(38,4)") * us)
        .cast("string").cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope_us = num / den
    return m.select(
        "event_type",
        "n",
        dround(
            F.when(den > 0, slope_us * F.lit(3600000000.0)), 6
        ).alias("slope_per_hour"),
        dround(
            F.when(den > 0, F.col("sy") / F.col("n") - slope_us * (F.col("sx") / F.col("n"))),
            4,
        ).alias("intercept"),
        dround(
            F.when((den > 0) & (deny > 0), (num * num) / (den * deny)), 6
        ).alias("r2"),
    )


@register(
    "nested_basket_stats",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS basket_revenue,
           round(CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE),
                 9) AS top_item_share
    FROM lineitem GROUP BY l_orderkey
    """,
    doc="Nested-type processing: lineitems collected to array<struct> per "
    "order, then reduced with higher-order lambdas (aggregate/transform) "
    "back to flat basket stats — the oracle computes the same scalars "
    "relationally, proving the nested path's arithmetic.",
)
def nested_basket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why go through the nested representation at all: real silver
    tables often STORE baskets nested (one row per order, items as
    array<struct>) to avoid join fan-out at read time; this query proves
    the engine computes over that layout with JVM lambda expressions —
    collect once, then ``aggregate``/``transform`` fold the array with
    no explode and no second shuffle.  Decimal-domain folds keep the
    sums bit-identical with the relational oracle."""
    li = table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_extendedprice").cast("decimal(18,4)").alias("price")
            )
        ).alias("items")
    )
    zero = F.lit(0).cast("decimal(28,4)")
    revenue = F.aggregate(
        "items",
        zero,
        # decimal + widens the scale-carrying type; re-cast keeps the
        # accumulator fixed at (28,4) as the lambda contract requires
        lambda acc, it: (acc + it["price"]).cast("decimal(28,4)"),
    )
    max_price = F.array_max(F.transform("items", lambda it: it["price"]))
    return nested.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        revenue.cast("double").alias("basket_revenue"),
        F.round(
            max_price.cast("double") / revenue.cast("double"), 9
        ).alias("top_item_share"),
    )


@register(
    "scalar_try_functions",
    oracle="""
    SELECT event_id,
           CASE WHEN CAST(value AS DOUBLE) - floor(value) = 0.0
                THEN NULL ELSE NULL END AS div_by_zero,
           try_cast(event_type AS INTEGER) AS bad_int_cast,
           try_cast(props AS DOUBLE) AS bad_double_cast,
           round(value / 4.0, 6) AS quarter_value
    FROM events
    """,
    doc="Error-tolerant try_* expression family: try_divide by zero, "
    "try_cast of non-numeric strings — NULL instead of job-killing "
    "exceptions under ANSI mode.",
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Under ANSI SQL mode (Spark 4's default) a single malformed value
    kills the whole job — the expression-level analogue of the
    reference's malformed-record problem.  The ``try_*`` family is the
    engine's row-local quarantine: divide-by-zero and bad casts yield
    NULL and the job survives, letting the quarantine-column pattern
    (sources/bronze.py) decide what to do with the NULLs downstream.

    Oracle note: DuckDB's division never raises, so the div-by-zero twin
    is literal NULL on both sides (value-value == 0 always here), and
    the try_casts mirror directly (event_type strings and JSON props are
    never parseable numbers — NULL on both engines).

    Scale: pure map, codegen, zero shuffles.
    """
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), F.col("value") - F.col("value")).alias(
            "div_by_zero"
        ),
        # try_cast mirrors the oracle's try_cast exactly; try_to_number with
        # a '999' format would diverge on numeric strings over 3 digits
        # (ADVICE r3) — event_type never is one today, but exact-twin > luck.
        F.expr("try_cast(event_type AS INT)").alias("bad_int_cast"),
        F.expr("try_cast(props AS DOUBLE)").alias("bad_double_cast"),
        F.round(F.try_divide(F.col("value"), F.lit(4.0)), 6).alias("quarter_value"),
    )


@register(
    "weighted_median_price",
    oracle="""
    WITH j AS (
        SELECT p.p_brand AS brand, l.l_extendedprice AS price,
               CAST(l.l_quantity AS BIGINT) AS w
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    c AS (
        SELECT brand, price, w,
               SUM(w) OVER (PARTITION BY brand ORDER BY price, w
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(w) OVER (PARTITION BY brand) AS tot,
               CAST(COUNT(*) OVER (PARTITION BY brand) AS BIGINT) AS n_rows
        FROM j
    )
    SELECT brand, CAST(MAX(n_rows) AS BIGINT) AS n_rows,
           CAST(MAX(tot) AS BIGINT) AS total_weight,
           MIN(price) AS w_median_price
    FROM c
    WHERE 2 * cum >= tot
    GROUP BY brand
    """,
    doc="Quantity-weighted median extended price per part brand (lower "
    "weighted median: first price whose cumulative weight reaches half).",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentile — the aggregate percentile_approx cannot weight
    and exact percentiles ignore quantity: the representative price where
    half the UNITS (not half the line items) sell at or below.  The
    selection rule (first price with 2*cum >= total) is integer
    arithmetic over integral quantities, so the answer is an actual data
    value picked exactly — no interpolation, no float accumulation.

    Scale shape: one broadcast-dim join (part), one per-brand
    sort window (keyed shuffle), then a per-brand min over the
    threshold-crossing rows.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    w_cum = (
        Window.partitionBy("brand")
        .orderBy("price", "w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("brand")
    c = j.select(
        "brand",
        "price",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_all).alias("tot"),
        F.count("*").over(w_all).alias("n_rows"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("brand")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max("tot").alias("total_weight"),
            F.min("price").alias("w_median_price"),
        )
    )


@register(
    "collation_group_lcase",
    defer=True,
    oracle="""
    SELECT lower(p_type) AS type_lcase,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_case_variants,
           CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents
    FROM part
    GROUP BY 1
    """,
    doc="Case-insensitive grouping via the UTF8_LCASE collation (Spark 4 "
    "collation engine) — grouping key semantics, not a lower() rewrite; "
    "the oracle lower()s explicitly.",
)
def collation_group_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's collation engine moves case/accent-insensitivity into the
    TYPE SYSTEM: a ``COLLATE UTF8_LCASE`` string compares, groups, and
    joins case-insensitively with collation-aware hash/sort operators —
    no lower() rewrites sprayed through the query (and unlike lower(),
    collations also get locale/accent variants).  The aggregation output
    is rendered through lower() only so both engines print one canonical
    key; the GROUPING itself runs on the collated type.  One scan, one
    bounded agg.
    """
    p = table(spark, sf_dir, "part")
    collated = p.select(
        F.expr("p_type COLLATE UTF8_LCASE").alias("type_ci"),
        "p_type",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )
    return collated.groupBy("type_ci").agg(
        F.count("*").alias("n_parts"),
        F.countDistinct("p_type").alias("n_case_variants"),
        F.sum("cents").alias("sum_price_cents"),
    ).select(
        F.lower(F.col("type_ci")).alias("type_lcase"),
        "n_parts",
        "n_case_variants",
        "sum_price_cents",
    )
