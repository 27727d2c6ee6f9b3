"""Column profiling — the data-quality pass every ingest runs before
trusting a new drop: per-column null counts, exact distincts, and
min/max, computed in ONE scan of the table.

The single-scan shape is the point at 100 TB: all per-column aggregates
ride one aggregation (Spark's multi-distinct plans one Expand + shuffle),
then a map-side ``stack`` unpivots the 1-row result into (column, stats)
rows.  The 100 TB variant swaps ``count(distinct)`` for
``approx_count_distinct`` (HLL partials, no Expand) — same query shape,
documented trade; exact distincts here keep the DuckDB oracle bit-exact.

Values are rendered to strings per type (doubles via DECIMAL(18,2), dates
via ISO format) so the profile has one uniform schema regardless of the
table profiled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.functions.exact import dsum
from azure_func_forem_data_etl_spark.operators.similarity import bounded_components
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table

#: (column, kind) — kinds pick the string rendering for min/max.
_PROFILE_COLS = [
    ("l_orderkey", "int"),
    ("l_quantity", "double"),
    ("l_discount", "double"),
    ("l_returnflag", "string"),
    ("l_shipdate", "date"),
    ("l_linestatus", "string"),
]


def _render(col: Column, kind: str) -> Column:
    """Type-aware string rendering, applied AFTER the min/max aggregate —
    rendering first would make min/max lexicographic ('10.00' < '9.00')."""
    if kind == "double":
        return col.cast("decimal(18,2)").cast("string")
    if kind == "date":
        return F.date_format(col, "yyyy-MM-dd")
    return col.cast("string")


def _sql_render(expr: str, kind: str) -> str:
    if kind == "double":
        return f"CAST(CAST({expr} AS DECIMAL(18,2)) AS VARCHAR)"
    if kind == "date":
        return f"strftime({expr}, '%Y-%m-%d')"
    return f"CAST({expr} AS VARCHAR)"


def profile_columns(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """One-scan profile -> (column, n_nulls, n_distinct, min_repr, max_repr)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c, _ in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(c).alias(f"__mn_{c}"),
            F.max(c).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                    F.col(f"__nd_{c}").alias("n_distinct"),
                    _render(F.col(f"__mn_{c}"), kind).alias("min_repr"),
                    _render(F.col(f"__mx_{c}"), kind).alias("max_repr"),
                )
                for c, kind in cols
            ]
        )
    ).alias("p")
    return one.select(stacked).select("p.*")


@register(
    "profile_lineitem_columns",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS "column",
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               {_sql_render(f"MIN({c})", kind)} AS min_repr,
               {_sql_render(f"MAX({c})", kind)} AS max_repr
        FROM lineitem
        """
        for c, kind in _PROFILE_COLS
    ),
    doc="Single-scan column profile of lineitem: null count, exact "
    "distinct count, min/max per column, unpivoted to one row per column.",
)
def profile_lineitem_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_columns(table(spark, sf_dir, "lineitem"), _PROFILE_COLS)


# ---------------------------------------------------------------------------
# Z-order layout: space-filling-curve clustering stats

Z_BITS = 10  # low bits interleaved per dimension -> 20-bit z-space
Z_BUCKETS_SHIFT = 15  # 2^20 z-space / 2^15 = 32 layout buckets

#: Bit-interleave of (l_partkey, l_suppkey) low bits — partkey on even,
#: suppkey on odd positions.  The SAME expression string runs in Spark
#: (via F.expr) and DuckDB: identical integer ops, engine-exact.
_Z_EXPR = " + ".join(
    [f"(((l_partkey >> {i}) & 1) << {2 * i})" for i in range(Z_BITS)]
    + [f"(((l_suppkey >> {i}) & 1) << {2 * i + 1})" for i in range(Z_BITS)]
)


@register(
    "zorder_cluster_stats",
    oracle=f"""
    WITH z AS (
        SELECT l_partkey, l_suppkey,
               ({_Z_EXPR}) >> {Z_BUCKETS_SHIFT} AS zbucket
        FROM lineitem
    )
    SELECT zbucket,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS part_lo, MAX(l_partkey) AS part_hi,
           MIN(l_suppkey) AS supp_lo, MAX(l_suppkey) AS supp_hi
    FROM z GROUP BY zbucket
    """,
    doc="Z-order layout stats: rows bucketed by the interleaved-bit "
    "(partkey, suppkey) space-filling curve; per-bucket min/max of BOTH "
    "dimensions shows the two-column locality a Z-ORDER table rewrite "
    "buys (file skipping on either predicate).",
)
def zorder_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why this is an engine feature: data-skipping indexes (Delta/
    Iceberg file stats) prune on per-file min/max, which only helps if
    the layout clusters BOTH join/filter dims at once — exactly what the
    z-curve provides (cf. Delta Lake OPTIMIZE ZORDER BY).  The stats
    query is the before/after evidence a layout job would emit: one
    map-side bucket id (pure bit ops, shared verbatim with the oracle)
    + one keyed agg."""
    li = table(spark, sf_dir, "lineitem")
    z = li.select(
        "l_partkey",
        "l_suppkey",
        F.expr(f"({_Z_EXPR}) >> {Z_BUCKETS_SHIFT}").alias("zbucket"),
    )
    return z.groupBy("zbucket").agg(
        F.count("*").alias("n_rows"),
        F.min("l_partkey").alias("part_lo"),
        F.max("l_partkey").alias("part_hi"),
        F.min("l_suppkey").alias("supp_lo"),
        F.max("l_suppkey").alias("supp_hi"),
    )


@register(
    "benford_digit_profile",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS digit
        FROM events WHERE value >= 0.01
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT c.digit, c.n,
           CAST(c.n AS DOUBLE) / t.total AS observed_freq,
           log10(1.0 + 1.0 / c.digit) AS benford_freq
    FROM c, t
    """,
    doc="Benford first-digit profile of event values vs the log10(1+1/d) "
    "expectation — the forensic data-quality screen for fabricated or "
    "truncated numeric columns.",
)
def benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit extraction runs on integer cents (floor(value·100) -> first
    character of the decimal rendering): pure integer/string ops that
    both engines evaluate identically — no float-format dependence.
    One map + one 9-row agg; the expected-frequency column is
    log10(1 + 1/d), same libm call on both engines' doubles."""
    events = table(spark, sf_dir, "events").filter(F.col("value") >= 0.01)
    digit = F.substring(
        F.floor(F.col("value") * 100).cast("long").cast("string"), 1, 1
    ).cast("int")
    c = events.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").alias("n")
    )
    t = c.agg(F.sum("n").cast("long").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("observed_freq"),
        F.log10(1.0 + 1.0 / F.col("digit")).alias("benford_freq"),
    )


@register(
    "referential_integrity_check",
    oracle="""
    SELECT 'lineitem->orders' AS relationship,
           (SELECT COUNT(*) FROM lineitem) AS n_child,
           (SELECT COUNT(*) FROM lineitem l ANTI JOIN orders o
             ON l.l_orderkey = o.o_orderkey) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o ANTI JOIN customer c
             ON o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l ANTI JOIN part p
             ON l.l_partkey = p.p_partkey)
    """,
    doc="Referential-integrity audit: orphan counts per FK relationship "
    "via left-anti joins — the constraint check a lakehouse runs because "
    "parquet enforces nothing.",
)
def referential_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each relationship is one anti join on its key: the parent side
    reduces to distinct keys first (broadcast when small), so the check
    costs one pass per child table however wide the rows are.  Spark has
    no declarative FOREIGN KEY — this query IS the enforcement point a
    silver layer schedules after every load."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    part = table(spark, sf_dir, "part")

    rows = []
    for rel, child, key_c, parent, key_p in (
        ("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
        ("orders->customer", orders, "o_custkey", cust, "c_custkey"),
        ("lineitem->part", li, "l_partkey", part, "p_partkey"),
    ):
        pk = parent.select(F.col(key_p).alias(key_c)).distinct()
        n_child = child.count()
        n_orph = child.join(F.broadcast(pk), key_c, "left_anti").count()
        rows.append((rel, n_child, n_orph))
    return spark.createDataFrame(
        rows, "relationship string, n_child long, n_orphans long"
    )


MAD_K = 3 * 1.4826  # 3 sigma-equivalents; 1.4826 makes MAD consistent with σ


@register(
    "event_anomaly_mad",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
    ),
    med AS (
        SELECT event_type, median(v) AS med FROM ev GROUP BY event_type
    ),
    stats AS (
        SELECT e.event_type,
               min(m.med) AS med,
               median(abs(e.v - m.med)) AS mad,
               count(*) AS n_events
        FROM ev e JOIN med m USING (event_type)
        GROUP BY e.event_type
    ),
    an AS (
        SELECT e.event_type, count(*) AS n_anomalies
        FROM ev e JOIN stats s USING (event_type)
        WHERE round(abs(e.v - s.med), 6) > round({MAD_K} * s.mad, 6)
        GROUP BY e.event_type
    )
    SELECT s.event_type,
           CAST(s.n_events AS BIGINT) AS n_events,
           round(s.med, 6) AS med,
           round(s.mad, 6) AS mad,
           CAST(COALESCE(an.n_anomalies, 0) AS BIGINT) AS n_anomalies
    FROM stats s LEFT JOIN an USING (event_type)
    """,
    doc="Robust anomaly detection: per event type, median + MAD of the "
    "value column and the count of |v - med| > 3σ-equivalent outliers.",
)
def event_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier flagging — the robust twin of z-score anomaly
    detection (median and MAD are insensitive to the very outliers being
    hunted, unlike mean/stddev).  Standard data-quality pass over metric
    streams.

    Scale shape: three aggregations keyed on event_type with the tiny
    per-type stats BROADCAST back against the fact table — events never
    shuffles.  Exact ``percentile`` does a full sort per group (the
    oracle-exact tier); the 100 TB variant swaps in
    ``approx_percentile`` (GK sketch, mergeable partials) with identical
    plan shape.  Threshold comparisons are rounded to 6 dp on both
    engines so boundary rows can't flip on float noise."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    med = ev.groupBy("event_type").agg(F.percentile("v", 0.5).alias("med"))
    stats = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med"),
            F.percentile(F.abs(F.col("v") - F.col("med")), 0.5).alias("mad"),
            F.count("*").alias("n_events"),
        )
    )
    anomalies = (
        ev.join(F.broadcast(stats), "event_type")
        .filter(
            F.round(F.abs(F.col("v") - F.col("med")), 6)
            > F.round(F.lit(MAD_K) * F.col("mad"), 6)
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n_anomalies"))
    )
    return (
        stats.join(anomalies, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            F.coalesce("n_anomalies", F.lit(0).cast("long")).alias(
                "n_anomalies"
            ),
        )
    )


HIST_LO = 900.0
HIST_HI = 105000.0
HIST_BINS = 20
_HIST_W = (HIST_HI - HIST_LO) / HIST_BINS


@register(
    "histogram_extendedprice",
    oracle=f"""
    SELECT bin_id,
           round({HIST_LO} + bin_id * {_HIST_W}, 2) AS lo_edge,
           round({HIST_LO} + (bin_id + 1) * {_HIST_W}, 2) AS hi_edge,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM (
        SELECT CAST(least(greatest(
                   floor((l_extendedprice - {HIST_LO}) / {_HIST_W}),
                   0), {HIST_BINS - 1}) AS INT) AS bin_id
        FROM lineitem
    )
    GROUP BY bin_id
    """,
    doc=f"Fixed-bin histogram of l_extendedprice ({HIST_BINS} bins, "
    "clamped edges): the single-scan distribution profile.",
)
def histogram_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram as pure integer-bucket arithmetic (identical
    floor/clamp semantics in both engines — no width_bucket dialect
    drift).  One scan, one aggregation on a ≤ HIST_BINS-cardinality key:
    partial counts combine map-side, so the shuffle is bins × partitions
    rows regardless of table size — the same profile runs unchanged on
    100 TB."""
    li = table(spark, sf_dir, "lineitem")
    bin_id = (
        F.least(
            F.greatest(
                F.floor((F.col("l_extendedprice") - HIST_LO) / _HIST_W),
                F.lit(0),
            ),
            F.lit(HIST_BINS - 1),
        )
        .cast("int")
        .alias("bin_id")
    )
    return (
        li.select(bin_id)
        .groupBy("bin_id")
        .agg(F.count("*").alias("n_rows"))
        .select(
            "bin_id",
            F.round(F.lit(HIST_LO) + F.col("bin_id") * _HIST_W, 2).alias("lo_edge"),
            F.round(F.lit(HIST_LO) + (F.col("bin_id") + 1) * _HIST_W, 2).alias("hi_edge"),
            "n_rows",
        )
    )


WILSON_Z = 1.959964  # two-sided 95%


@register(
    "returns_rate_wilson_ci",
    oracle=f"""
    WITH base AS (
        SELECT date_trunc('month', l_shipdate) AS ship_month,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returns
        FROM lineitem GROUP BY 1
    )
    SELECT ship_month, n_rows, n_returns,
           round(p, 6) AS p_hat,
           round((p + z2 / (2 * n) - {WILSON_Z} *
                  sqrt(p * (1 - p) / n + z2 / (4 * n * n)))
                 / (1 + z2 / n), 6) AS ci_lo,
           round((p + z2 / (2 * n) + {WILSON_Z} *
                  sqrt(p * (1 - p) / n + z2 / (4 * n * n)))
                 / (1 + z2 / n), 6) AS ci_hi
    FROM (
        SELECT ship_month, n_rows, n_returns,
               n_returns / CAST(n_rows AS DOUBLE) AS p,
               CAST(n_rows AS DOUBLE) AS n,
               {WILSON_Z} * {WILSON_Z} AS z2
        FROM base
    )
    """,
    doc="Monthly return-rate with Wilson 95% confidence intervals — "
    "uncertainty-aware rate reporting from plain portable arithmetic.",
)
def returns_rate_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-with-uncertainty reporting (Wilson score interval — the
    interval that behaves at small n and extreme p, unlike the normal
    approximation).  All arithmetic is portable +-*/sqrt, so the oracle
    is bit-comparable after 6dp rounding.

    Scale shape: one aggregation on a month key (map-side combine), then
    scalar math on the month-grain rollup — constant-size everything
    after the single scan."""
    li = table(spark, sf_dir, "lineitem")
    base = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("ship_month")
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_returns"
        ),
    )
    n = F.col("n_rows").cast("double")
    p = F.col("n_returns") / n
    z = WILSON_Z
    z2 = z * z
    denom = 1 + z2 / n
    center = p + z2 / (2 * n)
    margin = z * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    return base.select(
        "ship_month",
        "n_rows",
        "n_returns",
        F.round(p, 6).alias("p_hat"),
        F.round((center - margin) / denom, 6).alias("ci_lo"),
        F.round((center + margin) / denom, 6).alias("ci_hi"),
    )


EQUIDEPTH_BUCKETS = 8


@register(
    "equidepth_histogram_price",
    oracle=f"""
    WITH t AS (
        SELECT l_extendedprice AS v,
               ntile({EQUIDEPTH_BUCKETS}) OVER (
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ) AS bucket
        FROM lineitem
    )
    SELECT bucket, COUNT(*) AS n_rows, MIN(v) AS lo, MAX(v) AS hi
    FROM t GROUP BY bucket
    """,
    doc=f"Equi-depth histogram over l_extendedprice ({EQUIDEPTH_BUCKETS} buckets): the optimizer-statistics twin of the fixed-bin histogram.",
)
def equidepth_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histograms are what engine optimizers
    actually store — bucket *boundaries* adapt to the data so selectivity
    estimates stay accurate under skew, unlike fixed-width bins.  ntile
    over a unique total order (value, orderkey, linenumber) is
    deterministic cross-engine.  The global sort is the cost; at 100 TB
    the production variant is approx_percentile boundaries (one pass, no
    sort) — this exact query is the oracle-checkable ground truth tier,
    same exact/approx pairing as the percentile twins."""
    li = table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_extendedprice").alias("v"),
        F.ntile(EQUIDEPTH_BUCKETS)
        .over(
            Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        )
        .alias("bucket"),
    )
    return t.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )


#: Candidate functional dependencies to audit: determinant -> dependent.
_FD_CANDIDATES = [
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("supplier", "s_nationkey", "s_acctbal"),
]


@register(
    "functional_dependency_audit",
    oracle="""
    WITH """ + ",\n    ".join(
        f"""fd{i} AS (
        SELECT '{t}.{det}->{dep}' AS candidate,
               COUNT(*) AS n_determinants,
               CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violating,
               round(1.0 - SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END)
                     / COUNT(*), 6) AS fd_strength
        FROM (
            SELECT {det}, COUNT(DISTINCT {dep}) AS n_dep
            FROM {t} GROUP BY {det}
        )
    )"""
        for i, (t, det, dep) in enumerate(_FD_CANDIDATES)
    ) + """
    SELECT * FROM fd0 UNION ALL SELECT * FROM fd1
    UNION ALL SELECT * FROM fd2 UNION ALL SELECT * FROM fd3
    """,
    doc="Approximate functional-dependency audit: for each candidate det->dep, how many determinant values map to >1 dependent value.",
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FD discovery is the schema-inference pass of data profiling: a
    strength of 1.0 means det uniquely determines dep (a normalization /
    key candidate), lower values quantify how dirty the dependency is.
    Each candidate costs one (det, dep) distinct agg + one det agg — both
    map-combine, keyed on the determinant; candidates are independent
    scans unioned, so Spark runs them as parallel stages.  100 TB: swap
    count_distinct for approx_count_distinct > 1 per group, same shape."""
    parts = []
    for t, det, dep in _FD_CANDIDATES:
        per_det = (
            table(spark, sf_dir, t)
            .groupBy(det)
            .agg(F.count_distinct(dep).alias("n_dep"))
        )
        viol = F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0))
        parts.append(
            per_det.agg(
                F.lit(f"{t}.{det}->{dep}").alias("candidate"),
                F.count("*").alias("n_determinants"),
                viol.alias("n_violating"),
                F.round(1.0 - viol / F.count("*"), 6).alias("fd_strength"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@register(
    "chisq_independence_cells",
    oracle="""
    WITH j AS (
        SELECT event_type, c_mktsegment
        FROM events JOIN customer ON user_id = c_custkey
    ),
    cell AS (
        SELECT event_type, c_mktsegment, COUNT(*) AS obs
        FROM j GROUP BY event_type, c_mktsegment
    ),
    r AS (SELECT event_type, COUNT(*) AS row_tot FROM j GROUP BY event_type),
    c AS (SELECT c_mktsegment, COUNT(*) AS col_tot FROM j GROUP BY c_mktsegment),
    n AS (SELECT COUNT(*) AS n_tot FROM j)
    SELECT cell.event_type, cell.c_mktsegment, obs,
           round(CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                 / CAST(n_tot AS DOUBLE), 6) AS expected,
           round(
               ((CAST(obs AS DOUBLE) * CAST(n_tot AS DOUBLE)
                 - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE))
                * (CAST(obs AS DOUBLE) * CAST(n_tot AS DOUBLE)
                   - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)))
               / (CAST(n_tot AS DOUBLE) * CAST(row_tot AS DOUBLE)
                  * CAST(col_tot AS DOUBLE)), 6) AS chi2_cell
    FROM cell
    JOIN r ON r.event_type = cell.event_type
    JOIN c ON c.c_mktsegment = cell.c_mktsegment
    CROSS JOIN n
    """,
    doc="Chi-square independence cells for event_type x mktsegment: observed, expected, per-cell chi2 contribution (deterministic double arithmetic on exact counts).",
)
def chisq_independence_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency-table independence test, per-cell: chi2_cell =
    (obs*N - row*col)^2 / (N*row*col).  Every operand is an exact integer
    count cast to double BEFORE arithmetic, and the expression tree is
    written identically on both engines — each multiply/divide is then the
    same IEEE operation on the same operands, so the rounded result is
    bit-exact (a global chi2 SUM would not be: summation order differs
    across partitions; the caller sums our 6dp cells, which IS
    deterministic).  Scale: one broadcast dim join + three keyed
    map-combine aggs; marginals are |types| and |segments| rows ->
    broadcast back onto cells."""
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = ev.join(
        F.broadcast(cust), F.col("user_id") == F.col("c_custkey")
    ).select("event_type", "c_mktsegment")
    cell = j.groupBy("event_type", "c_mktsegment").agg(F.count("*").alias("obs"))
    r = j.groupBy("event_type").agg(F.count("*").alias("row_tot"))
    c = j.groupBy("c_mktsegment").agg(F.count("*").alias("col_tot"))
    n = j.agg(F.count("*").alias("n_tot"))
    obs_d = F.col("obs").cast("double")
    row_d = F.col("row_tot").cast("double")
    col_d = F.col("col_tot").cast("double")
    n_d = F.col("n_tot").cast("double")
    d = obs_d * n_d - row_d * col_d
    return (
        cell.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "c_mktsegment")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "c_mktsegment",
            "obs",
            F.round(row_d * col_d / n_d, 6).alias("expected"),
            F.round((d * d) / (n_d * row_d * col_d), 6).alias("chi2_cell"),
        )
    )


@register(
    "dq_expectations_report",
    oracle="""
    WITH base AS (
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS null_qty,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS range_qty,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                             THEN 1 ELSE 0 END) AS BIGINT) AS range_disc,
               COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
                   AS dup_pk
        FROM lineitem
    ),
    fk AS (
        SELECT COUNT(*) AS orphan_fk
        FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
        )
    )
    SELECT 'quantity_not_null' AS rule, n_rows, null_qty AS violations,
           CAST(null_qty = 0 AS INT) AS passed FROM base
    UNION ALL
    SELECT 'quantity_in_1_50', n_rows, range_qty,
           CAST(range_qty = 0 AS INT) FROM base
    UNION ALL
    SELECT 'discount_in_0_01', n_rows, range_disc,
           CAST(range_disc = 0 AS INT) FROM base
    UNION ALL
    SELECT 'pk_unique', n_rows, dup_pk, CAST(dup_pk = 0 AS INT) FROM base
    UNION ALL
    SELECT 'orderkey_fk_exists', (SELECT n_rows FROM base), orphan_fk,
           CAST(orphan_fk = 0 AS INT) FROM fk
    UNION ALL
    SELECT 'value_finite', n_rows, nonfinite,
           CAST(nonfinite = 0 AS INT)
    FROM (
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN isnan(value) OR isinf(value)
                             THEN 1 ELSE 0 END) AS BIGINT) AS nonfinite
        FROM events
    )
    UNION ALL
    SELECT 'embedding_finite', n_rows, nonfinite,
           CAST(nonfinite = 0 AS INT)
    FROM (
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN len(list_filter(
                          CAST(embedding AS DOUBLE[]),
                          x -> isnan(x) OR isinf(x))) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS nonfinite
        FROM embeddings
    )
    UNION ALL
    -- identified-traffic domain (r11 null-FK sweep): user-keyed
    -- analytics (assignment hashing, per-user state, CDC, as-of
    -- attribution) exclude anonymous events; this rule makes the
    -- excluded mass observable at the gate
    SELECT 'user_id_present', n_rows, anon,
           CAST(anon = 0 AS INT)
    FROM (
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS anon
        FROM events
    )
    UNION ALL
    -- quantized-moment analytics domain (similarity.EMB_COMPONENT_BOUND,
    -- r11 embedding-magnitude sweep): vectors carrying any
    -- |component| >= 1e4 are excluded from dim-stats / centroid / PCA;
    -- this rule makes that exclusion observable at the gate
    SELECT 'embedding_component_range', n_rows, oob,
           CAST(oob = 0 AS INT)
    FROM (
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN COALESCE(list_max(list_transform(
                          CAST(embedding AS DOUBLE[]),
                          x -> abs(x))), 0.0) >= 1e4
                        THEN 1 ELSE 0 END) AS BIGINT) AS oob
        FROM embeddings
    )
    """,
    doc="Deequ-style declarative DQ expectations in one scan (+1 anti join): null/range/PK-uniqueness/FK/finiteness rules -> (rule, violations, passed) rows.",
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-quality gate pattern (Deequ/dbt-test shape): a declarative
    rule list compiled into ONE pass over the fact table — every
    null/range/uniqueness rule is a conditional aggregate riding the same
    scan, so adding a rule costs zero extra I/O; only the FK rule needs a
    second relation (broadcast-keyed LEFT ANTI count).  Emitting
    (rule, violations, passed) rows lets a pipeline fail-or-quarantine on
    `WHERE passed = 0` without recomputing anything.

    The ``value_finite`` rule (r11 NaN/Inf probe) is the gate for the
    engine's whole money-measure surface: the exact-decimal arithmetic
    backbone (functions/exact.py) that makes the oracles bit-exact cannot
    represent NaN/±Inf by construction — on EITHER engine — so non-finite
    measures are a data-quality violation to quarantine at ingest, not a
    value any downstream aggregate is defined over (COVERAGE.md
    §Finite-domain contract).  NaN also silently evades plain range rules
    (NaN < lo and NaN > hi are both false), which is why finiteness needs
    its own rule."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey")
    cnt = F.count("*")
    base = li.agg(
        cnt.alias("n_rows"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_qty"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
        )
        .cast("long")
        .alias("range_qty"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1).otherwise(0)
        )
        .cast("long")
        .alias("range_disc"),
        (cnt - F.count_distinct(F.struct("l_orderkey", "l_linenumber"))).alias("dup_pk"),
    ).first()
    orphans = (
        li.select("l_orderkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .count()
    )
    v = F.col("value")
    ev = (
        table(spark, sf_dir, "events")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.when(F.isnan(v) | (F.abs(v) == F.lit(float("inf"))), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("nonfinite"),
            # identified-traffic rule (r11 null-FK sweep): same scan
            F.sum(F.col("user_id").isNull().cast("int"))
            .cast("long")
            .alias("anon"),
        )
        .first()
    )

    def _nonfinite(x):
        return F.isnan(x) | (F.abs(x) == F.lit(float("inf")))

    emb = (
        table(spark, sf_dir, "embeddings")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.exists(
                    F.col("embedding").cast("array<double>"), _nonfinite
                ).cast("int")
            )
            .cast("long")
            .alias("nonfinite"),
            # quantized-moment domain rule (similarity.EMB_COMPONENT_BOUND):
            # same scan, zero extra I/O
            F.sum(
                (~bounded_components("embedding")).cast("int")
            )
            .cast("long")
            .alias("oob"),
        )
        .first()
    )
    rules = [
        ("quantity_not_null", base["n_rows"], base["null_qty"]),
        ("quantity_in_1_50", base["n_rows"], base["range_qty"]),
        ("discount_in_0_01", base["n_rows"], base["range_disc"]),
        ("pk_unique", base["n_rows"], base["dup_pk"]),
        ("orderkey_fk_exists", base["n_rows"], orphans),
        ("value_finite", ev["n_rows"], ev["nonfinite"]),
        ("user_id_present", ev["n_rows"], ev["anon"]),
        ("embedding_finite", emb["n_rows"], emb["nonfinite"]),
        ("embedding_component_range", emb["n_rows"], emb["oob"]),
    ]
    return spark.createDataFrame(
        [(r, n, int(v), int(v == 0)) for r, n, v in rules],
        "rule string, n_rows bigint, violations bigint, passed int",
    )


#: PSI comparison split: the first half of the event month is the
#: baseline distribution, the second half is the "current" one.
PSI_SPLIT_DATE = "2024-01-16"

#: Fixed value-bucket edges (log-ish spacing over the generator's value
#: range).  Fixed — not quantile — so both engines and both periods
#: bucket identically, and the bucketing is a map-side expression.
PSI_EDGES = (5.0, 10.0, 20.0, 50.0, 100.0, 200.0)

_PSI_BUCKET_SQL = (
    "CASE WHEN value < 5.0 THEN 0 WHEN value < 10.0 THEN 1 "
    "WHEN value < 20.0 THEN 2 WHEN value < 50.0 THEN 3 "
    "WHEN value < 100.0 THEN 4 WHEN value < 200.0 THEN 5 ELSE 6 END"
)

#: Classical PSI epsilon: a one-sided bucket's missing share floors here
#: instead of dropping the cell.  Both engines parse the literal to the
#: same nearest double, so the smoothed arithmetic is identical.
PSI_EPS = 1e-6


@register(
    "psi_value_drift",
    oracle=f"""
    WITH b AS (
        SELECT {_PSI_BUCKET_SQL} AS bucket,
               CAST(ts < TIMESTAMP '{PSI_SPLIT_DATE}' AS INT) AS is_base
        FROM events
    ),
    cells AS (
        SELECT bucket,
               CAST(SUM(is_base) AS BIGINT) AS n_base,
               CAST(SUM(1 - is_base) AS BIGINT) AS n_cur
        FROM b GROUP BY bucket
    ),
    tot AS (
        SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM cells
    )
    SELECT bucket, n_base, n_cur,
           round(n_base / CAST(tb AS DOUBLE), 6) AS p_base,
           round(n_cur / CAST(tc AS DOUBLE), 6) AS p_cur,
           -- classical epsilon smoothing (r10 ADVICE): a bucket with mass
           -- in only ONE period is the sharpest drift signal; its share
           -- floors at {PSI_EPS} instead of dropping the cell, so the
           -- cell sum IS the conventional full PSI.  greatest() is a
           -- no-op for any observed share down to 1/1e6, so two-sided
           -- cells are bit-identical to the unsmoothed form
           round((greatest(n_cur / CAST(tc AS DOUBLE), {PSI_EPS})
                  - greatest(n_base / CAST(tb AS DOUBLE), {PSI_EPS}))
                 * ln(greatest(n_cur / CAST(tc AS DOUBLE), {PSI_EPS})
                      / greatest(n_base / CAST(tb AS DOUBLE), {PSI_EPS})),
                 6) AS psi_term
    FROM cells, tot
    -- degenerate contract: only a period with ZERO total drops rows
    -- (no baseline/current population at all => PSI undefined)
    WHERE tb > 0 AND tc > 0
    """,
    doc="Population Stability Index cells: fixed value buckets, first- vs "
    "second-half-of-month shares, per-bucket PSI contribution.",
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor in the form model-risk teams publish:
    PSI = Σ (p_cur - p_base) · ln(p_cur / p_base) over fixed buckets
    (>0.25 conventionally flags a shifted population).  Emitting the
    per-bucket terms (not just the scalar) shows WHERE the mass moved.

    Scale shape: single scan, map-side bucket+period tagging, one
    7-cell aggregation; the totals join back as a 1-row broadcast.
    Fixed bucket edges keep the bucketing deterministic across engines
    and avoid the quantile shuffle entirely.
    """
    ev = table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < PSI_EDGES[0], 0)
        .when(F.col("value") < PSI_EDGES[1], 1)
        .when(F.col("value") < PSI_EDGES[2], 2)
        .when(F.col("value") < PSI_EDGES[3], 3)
        .when(F.col("value") < PSI_EDGES[4], 4)
        .when(F.col("value") < PSI_EDGES[5], 5)
        .otherwise(6)
    )
    cells = (
        ev.select(
            bucket.alias("bucket"),
            (F.col("ts") < F.lit(PSI_SPLIT_DATE).cast("timestamp"))
            .cast("int")
            .alias("is_base"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_base").alias("n_base"),
            F.sum(1 - F.col("is_base")).alias("n_cur"),
        )
    )
    tot = cells.agg(F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc"))
    p_base = F.col("n_base") / F.col("tb").cast("double")
    p_cur = F.col("n_cur") / F.col("tc").cast("double")
    # epsilon-smoothed shares for the PSI term (see oracle note): one-
    # sided buckets keep a finite, large term instead of being dropped
    ps_base = F.greatest(p_base, F.lit(PSI_EPS))
    ps_cur = F.greatest(p_cur, F.lit(PSI_EPS))
    # degenerate contract (see oracle): drop only empty-period inputs
    return cells.crossJoin(F.broadcast(tot)).filter(
        (F.col("tb") > 0) & (F.col("tc") > 0)
    ).select(
        "bucket",
        "n_base",
        "n_cur",
        F.round(p_base, 6).alias("p_base"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round((ps_cur - ps_base) * F.log(ps_cur / ps_base), 6).alias("psi_term"),
    )


@register(
    "pipeline_observe_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE props IS NULL) AS BIGINT) AS n_null_props,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           MAX(value) AS max_value
    FROM events
    """,
    doc="Zero-extra-pass pipeline metrics via df.observe(): row count, "
    "null-rate, decimal-exact value sum, and type cardinality captured "
    "during a single noop-sink write.",
)
def pipeline_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production way to get pipeline-health metrics WITHOUT a second
    scan: ``df.observe`` attaches named aggregates to the plan and the
    engine accumulates them during the one action the job already runs
    (here: the noop-sink write standing in for the silver write).  The
    reference's row-count progress logging (fetch_articles.py counters)
    costs an extra count() per batch; observe() costs nothing extra.

    The observed metrics come back as a 1-row relation so the driver can
    hash-compare them against the oracle like any other query.  The sum
    runs in the decimal domain (observe evaluates engine-side, so the
    same order-independence discipline applies as everywhere else).

    Observed metrics must be DISTINCT-free (engine rule: they accumulate
    as mergeable partials), so cardinality tracking belongs to the HLL
    sketch ops, not here.

    Scale shape: strictly one corpus pass; the observation is a
    CollectMetrics node folded into the write job — zero shuffles beyond
    what the sink needs (none for noop).
    """
    from pyspark.sql import Observation

    ev = table(spark, sf_dir, "events")
    obs = Observation("pipeline_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("props").isNull(), 1)).alias("n_null_props"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        F.max("value").alias("max_value"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    # SUM/MAX over an all-NULL value column observe as None — keep the
    # NULL instead of float()-crashing (r12 NULL-heavy sweep); the
    # oracle's SUM/MAX return the same NULL
    as_double = lambda v: None if v is None else float(v)  # noqa: E731
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_null_props"],
                as_double(m["sum_value"]),
                as_double(m["max_value"]),
            )
        ],
        "n_rows long, n_null_props long, sum_value double, max_value double",
    )


@register(
    "ks_two_sample_drift",
    oracle=f"""
    WITH b AS (
        -- measured values only (r12 NULL-heavy sweep): a NULL value has
        -- no bin, and the NULL bin cumulates first on Spark's NULLS
        -- FIRST vs last on DuckDB's NULLS LAST
        SELECT CAST(floor(value) AS BIGINT) AS bin,
               CAST(ts < TIMESTAMP '{PSI_SPLIT_DATE}' AS INT) AS is_base
        FROM events WHERE value IS NOT NULL
    ),
    cells AS (
        SELECT bin,
               CAST(SUM(is_base) AS BIGINT) AS n_base,
               CAST(SUM(1 - is_base) AS BIGINT) AS n_cur
        FROM b GROUP BY bin
    ),
    cum AS (
        SELECT bin,
               SUM(n_base) OVER (ORDER BY bin) AS cb,
               SUM(n_cur) OVER (ORDER BY bin) AS cc,
               (SELECT SUM(n_base) FROM cells) AS tb,
               (SELECT SUM(n_cur) FROM cells) AS tc
        FROM cells
    )
    SELECT bin AS at_bin,
           round(abs(cb / CAST(tb AS DOUBLE) - cc / CAST(tc AS DOUBLE)), 6)
               AS ks_stat,
           CAST(tb AS BIGINT) AS n_base, CAST(tc AS BIGINT) AS n_cur
    FROM cum
    -- degenerate contract (r10 random sweep): KS needs BOTH samples
    -- non-empty; with either period empty both engines return no rows
    WHERE tb > 0 AND tc > 0
    ORDER BY abs(cb / CAST(tb AS DOUBLE) - cc / CAST(tc AS DOUBLE)) DESC, bin
    LIMIT 1
    """,
    doc="Binned two-sample Kolmogorov-Smirnov statistic between the two "
    "half-month value distributions: max |ECDF difference| over unit "
    "value bins, with the bin where it is attained.",
)
def ks_two_sample_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KS companion to ``psi_value_drift``: PSI weighs aggregate mass
    shift, KS finds the single worst distributional gap — together the
    standard drift pair on a monitoring dashboard.  Exact KS needs a
    global sort of all values; binning to the unit grid bounds the ECDF
    table at the value range (~500 rows) with error <= bin width's mass,
    the same range-not-rows trade the binned AUC makes.

    Scale shape: one scan -> per-(bin, period) counts -> cumulative
    window over the bin-bounded table -> TakeOrdered(1).
    """
    # measured values only — see the oracle note (r12 NULL-heavy sweep)
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cells = (
        ev.select(
            F.floor("value").cast("long").alias("bin"),
            (F.col("ts") < F.lit(PSI_SPLIT_DATE).cast("timestamp"))
            .cast("int")
            .alias("is_base"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_base").alias("n_base"),
            F.sum(1 - F.col("is_base")).alias("n_cur"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    tot = cells.agg(
        F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc")
    )
    cum = (
        cells.withColumn("cb", F.sum("n_base").over(w))
        .withColumn("cc", F.sum("n_cur").over(w))
        .crossJoin(F.broadcast(tot))
        # degenerate contract (see oracle): KS undefined with an empty side
        .filter((F.col("tb") > 0) & (F.col("tc") > 0))
    )
    diff = F.abs(
        F.col("cb") / F.col("tb").cast("double")
        - F.col("cc") / F.col("tc").cast("double")
    )
    return (
        cum.select(
            F.col("bin").alias("at_bin"),
            F.round(diff, 6).alias("ks_stat"),
            F.col("tb").alias("n_base"),
            F.col("tc").alias("n_cur"),
            diff.alias("__d"),
        )
        .orderBy(F.col("__d").desc(), "at_bin")
        .limit(1)
        .drop("__d")
    )


HILL_TOP_K = 200  # order statistics used by the Hill estimator


@register(
    "tail_index_hill",
    oracle=f"""
    WITH topk AS (
        SELECT value FROM events WHERE value > 0
        ORDER BY value DESC, event_id LIMIT {HILL_TOP_K}
    ),
    xk AS (SELECT MIN(value) AS x_k FROM topk)
    SELECT round(1.0 / (SUM(ln(value / x_k)) / (COUNT(*) - 1)), 6)
               AS hill_alpha,
           CAST(COUNT(*) AS BIGINT) AS k_used,
           CAST(MAX(x_k) AS DOUBLE) AS x_k
    FROM topk, xk
    -- degenerate contract (r10 const-values sweep): an all-equal top-k
    -- zeroes the log-sum and the estimator is undefined — no rows
    HAVING COUNT(*) >= 2 AND SUM(ln(value / x_k)) > 0
    """,
    doc=f"Hill tail-index estimator over the top-{HILL_TOP_K} event values: "
    "alpha-hat = ((1/(k-1)) * sum ln(x_i / x_k))^-1 — heavy-tail "
    "diagnostic.",
)
def tail_index_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How heavy is the value distribution's tail?  The Hill estimator
    (Hill 1975) fits a Pareto exponent to the top-k order statistics —
    alpha < 2 means infinite variance (skew-join salting territory),
    and it's the quantitative companion to the Zipf word-rank fit
    (zipf_exponent_fit): one for numeric tails, one for rank-frequency.

    Determinism note: the log-sum runs over exactly k=200 driver-
    bounded values after a TakeOrdered — the only float summation is
    over a fixed tiny set, and ties at the k-th value are cut by
    event_id so both engines pick the same set.

    Scale shape: TakeOrderedAndProject (per-partition heaps, k rows to
    the driver side of the exchange — no global sort), then a 200-row
    aggregate.
    """
    ev = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    topk = (
        ev.select("value", "event_id")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(HILL_TOP_K)
    )
    xk = topk.agg(F.min("value").alias("x_k"))
    j = topk.crossJoin(F.broadcast(xk))
    s = j.agg(
        F.sum(F.log(F.col("value") / F.col("x_k"))).alias("sum_logs"),
        F.count("*").alias("k_used"),
        F.max("x_k").cast("double").alias("x_k"),
    )
    # degenerate contract (see oracle): k >= 2 and a positive log-sum —
    # a single value (ADVICE r3) or an all-equal top-k (r10 const-values
    # sweep, ANSI DIVIDE_BY_ZERO) leaves the estimator undefined
    return (
        s.filter((F.col("k_used") >= 2) & (F.col("sum_logs") > 0))
        .select(
            F.round(
                1.0 / (F.col("sum_logs") / (F.col("k_used") - 1)), 6
            ).alias("hill_alpha"),
            "k_used",
            "x_k",
        )
    )


# --- resampling / hypothesis-test statistics (round 7) ---------------------
# The reference has no statistics layer at all (its 306 lines fetch and
# store); these belong to the SURVEY §2b profiling surface: a 100 TB
# pipeline needs uncertainty estimates (jackknife), mean-shift tests
# (ANOVA, Mann-Whitney) and association strength (Cramér's V) before it
# trusts a source mix change.  Every query reduces the corpus to a
# bounded group-level table in ONE scan, then finishes with closed-form
# scalar math — the same shape as returns_rate_wilson_ci above.

#: decimal type for exact money sums (o_totalprice < 10^7, scale 2).
_MONEY_DEC = "decimal(18,2)"


@register(
    "jackknife_revenue_ci",
    oracle="""
    WITH g AS (
        SELECT n.n_name AS grp,
               CAST(COUNT(*) AS BIGINT) AS n_i,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS s_i
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n_i) AS BIGINT) AS n, SUM(s_i) AS s,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g
    ),
    loo AS (
        -- delete-one-group estimates, 6dp-quantized so the later sums
        -- are exact decimal additions in both engines.  t.n > g.n_i
        -- guards the k=1 degenerate (one group owning every row) where
        -- the leave-one-out denominator is 0 (r11 single-row sweep)
        SELECT CAST(round(CAST(t.s - g.s_i AS DOUBLE) / (t.n - g.n_i), 6)
                    AS DECIMAL(18,6)) AS theta_i
        FROM g, tot t
        WHERE t.n > g.n_i
    ),
    jb AS (SELECT CAST(SUM(theta_i) AS DOUBLE) / COUNT(*) AS theta_bar FROM loo)
    SELECT t.k AS n_groups,
           round(CAST(t.s AS DOUBLE) / t.n, 6) AS theta_hat,
           round(sqrt((t.k - 1.0) / t.k *
                 CAST((SELECT SUM(CAST(round((theta_i - jb.theta_bar)
                                             * (theta_i - jb.theta_bar), 8)
                                       AS DECIMAL(28,8)))
                       FROM loo) AS DOUBLE)), 6) AS jack_se
    FROM tot t, jb
    -- degenerate contract: a delete-one jackknife needs >= 2 groups
    WHERE t.k > 1
    """,
    doc="Delete-one-nation jackknife standard error of the mean order "
    "value: group-level leave-one-out estimates from one aggregation.",
)
def jackknife_revenue_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resampling-based uncertainty without resampling the data: the
    delete-one-GROUP jackknife needs only per-group (count, sum) — one
    scan, one tiny group table — then every leave-one-out estimate is
    closed-form ((S - s_i) / (N - n_i)).  At 100 TB the group rollup is
    the only distributed work; the jackknife itself runs over k=25 rows.

    Determinism: sums are exact decimal; each per-group double (the LOO
    estimate, then its squared deviation) is quantized before the next
    decimal sum, so no order-dependent float addition anywhere.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    g = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("grp"))
        .agg(
            F.count("*").alias("n_i"),
            F.sum(F.col("o_totalprice").cast(_MONEY_DEC)).alias("s_i"),
        )
        # materialize-once: tot/loo/jb all re-reference this 25-row table,
        # and Spark does NOT reuse the aggregation subplan (only broadcast
        # exchanges) — without this the corpus is scanned once per
        # reference (8x observed in the jackknife plan)
        .localCheckpoint(eager=True)
    )
    tot = g.agg(
        F.sum("n_i").alias("n"), F.sum("s_i").alias("s"), F.count("*").alias("k")
    )
    # the filter precedes the LOO projection: at k=1 the only group owns
    # every row and the (n - n_i) denominator is 0 (r11 sweep); with it,
    # loo/jb go empty and the query emits 0 rows, matching the oracle's
    # k > 1 contract
    loo = g.crossJoin(F.broadcast(tot)).filter(
        F.col("n") > F.col("n_i")
    ).select(
        F.round(
            (F.col("s") - F.col("s_i")).cast("double") / (F.col("n") - F.col("n_i")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("theta_i"),
        "n",
        "s",
        "k",
    )
    jb = loo.groupBy("n", "s", "k").agg(
        (F.sum("theta_i").cast("double") / F.count("*")).alias("theta_bar")
    )
    dev2 = F.round(
        (F.col("theta_i") - F.col("theta_bar")) * (F.col("theta_i") - F.col("theta_bar")),
        8,
    ).cast("decimal(28,8)")
    return (
        loo.join(F.broadcast(jb), ["n", "s", "k"])
        .groupBy("n", "s", "k")
        .agg(F.sum(dev2).alias("ss"))
        .select(
            F.col("k").alias("n_groups"),
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias("theta_hat"),
            F.round(
                F.sqrt(
                    (F.col("k") - F.lit(1.0)) / F.col("k") * F.col("ss").cast("double")
                ),
                6,
            ).alias("jack_se"),
        )
    )


@register(
    "anova_f_groups",
    oracle="""
    WITH g AS (
        -- DECIMAL(18,2) factors (not 12,2 — totalprice reaches 1e11+ on
        -- the magnitude-spread sweep); every decimal->double cast below
        -- round-trips through VARCHAR because the scale-2/4 integer forms
        -- sit far past 2^53, where duckdb's direct cast is 1 ulp off
        -- Spark's correctly-rounded BigDecimal cast (see exact.sql_dsum)
        SELECT o_orderpriority AS grp,
               CAST(COUNT(*) AS BIGINT) AS n_i,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s_i,
               -- one factor at 38,2: duckdb evaluates DECIMAL(18)*
               -- DECIMAL(18) in the narrow int64 width and overflows on
               -- 1e11-scale totalprices; 38,2 forces the hugeint path
               SUM(CAST(o_totalprice AS DECIMAL(38,2))
                   * CAST(o_totalprice AS DECIMAL(18,2))) AS q_i
        FROM orders
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n_i) AS BIGINT) AS n,
               CAST(CAST(SUM(s_i) AS STRING) AS DOUBLE)
                   / CAST(SUM(n_i) AS BIGINT) AS m,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g
    ),
    part AS (
        -- per-group double contributions, rounded to WHOLE units (at
        -- 1e11-1e14 magnitudes any sub-unit round scale would put
        -- round() past 2^53 where engine round() diverges).  They stay
        -- DOUBLES: the old DECIMAL(32,0) quantization hit the
        -- double->decimal conversion gap at 1e22 (Spark converts via
        -- the shortest decimal repr, DuckDB scales in the float domain
        -- — 1 unit apart in the 17th digit; r12 combined-extremes
        -- sweep), so the cross-group sum is an explicit grp-ordered
        -- sequential fold instead — bit-identical on both engines at
        -- any magnitude
        SELECT g.grp,
               round(g.n_i * (CAST(CAST(g.s_i AS STRING) AS DOUBLE) / g.n_i - t.m)
                     * (CAST(CAST(g.s_i AS STRING) AS DOUBLE) / g.n_i - t.m), 0)
                   AS ssb_i,
               round(CAST(CAST(g.q_i AS STRING) AS DOUBLE)
                     - CAST(CAST(g.s_i AS STRING) AS DOUBLE)
                       * CAST(CAST(g.s_i AS STRING) AS DOUBLE) / g.n_i, 0)
                   AS ssw_i,
               t.n, t.k
        FROM g, tot t
    ),
    s AS (
        SELECT k, n,
               list_reduce(list(ssb_i ORDER BY grp), (a, b) -> a + b) AS ssb_d,
               list_reduce(list(ssw_i ORDER BY grp), (a, b) -> a + b) AS ssw_d
        FROM part GROUP BY k, n
    )
    SELECT k AS k_groups, n AS n_total,
           ssb_d AS ssb,
           ssw_d AS ssw,
           round((ssb_d / (k - 1)) / (ssw_d / (n - k)), 6) AS f_stat,
           round(ssb_d / (ssb_d + ssw_d), 6) AS eta_sq
    FROM s
    -- degenerate contract (r10 const-values sweep): zero within-group
    -- variance leaves F undefined — no rows, both engines
    WHERE ssw_d > 0
    """,
    doc="One-way ANOVA F (and eta-squared effect size) across order "
    "priorities from per-group (n, sum, sum-of-squares) partials.",
)
def anova_f_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift test across k groups in ONE scan: ANOVA needs only the
    per-group sufficient statistics (n, Sx, Sx2), so the 100 TB cost is a
    single map-side-combined aggregation on a 5-value key; SSB/SSW/F are
    closed-form over the k-row rollup.

    Determinism: Sx and Sx2 run in the exact decimal domain (x is a
    2-decimal money value, so x2 at scale 4 is exact; 18,2 factor width
    per the magnitude-spread domain); each group's two
    double contributions are quantized to WHOLE units (decimal(32,0))
    before the cross-group decimal sum — at their 1e11-1e14 magnitudes a
    finer scale would put round() past 2^53 where Spark (BigDecimal) and
    DuckDB (float multiply) disagree, the failure seen on this query's
    first draft.
    """
    o = table(spark, sf_dir, "orders")
    x2 = F.col("o_totalprice").cast("decimal(18,2)") * F.col("o_totalprice").cast(
        "decimal(18,2)"
    )
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count("*").alias("n_i"),
        F.sum(F.col("o_totalprice").cast(_MONEY_DEC)).alias("s_i"),
        F.sum(x2).alias("q_i"),
    ).localCheckpoint(eager=True)  # 5-row rollup shared by tot and part
    tot = g.agg(
        F.sum("n_i").alias("n"),
        (F.sum("s_i").cast("double") / F.sum("n_i")).alias("m"),
        F.count("*").alias("k"),
    )
    m_i = F.col("s_i").cast("double") / F.col("n_i")
    # contributions stay DOUBLES and cross-group summation is an
    # explicit grp-ordered sequential fold — the old DECIMAL(32,0)
    # quantization hit the engines' double->decimal conversion gap at
    # 1e22 magnitudes (see the oracle note; r12 combined-extremes sweep)
    part = g.crossJoin(F.broadcast(tot)).select(
        "grp",
        F.round(F.col("n_i") * (m_i - F.col("m")) * (m_i - F.col("m")), 0)
        .alias("ssb_i"),
        F.round(
            F.col("q_i").cast("double")
            - F.col("s_i").cast("double") * F.col("s_i").cast("double") / F.col("n_i"),
            0,
        )
        .alias("ssw_i"),
        "n",
        "k",
    )

    def _ordered_fold(col: str):
        arr = F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("grp"), F.col(col)))),
            lambda s: s[col],
        )
        return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)

    agg = part.groupBy("k", "n").agg(
        _ordered_fold("ssb_i").alias("ssb_d"),
        _ordered_fold("ssw_i").alias("ssw_d"),
    # degenerate contract (see oracle): SSW = 0 leaves F undefined
    ).filter(F.col("ssw_d") > 0)
    return agg.select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_total"),
        F.col("ssb_d").alias("ssb"),
        F.col("ssw_d").alias("ssw"),
        F.round(
            (F.col("ssb_d") / (F.col("k") - 1)) / (F.col("ssw_d") / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
        F.round(F.col("ssb_d") / (F.col("ssb_d") + F.col("ssw_d")), 6).alias("eta_sq"),
    )


#: Mann-Whitney sample pair: compare event values between two types.
_MW_GROUP_A = "click"
_MW_GROUP_B = "error"


@register(
    "mann_whitney_value_shift",
    oracle=f"""
    WITH vg AS (
        SELECT value AS v,
               CAST(SUM(CASE WHEN event_type = '{_MW_GROUP_A}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_a,
               CAST(COUNT(*) AS BIGINT) AS t_v
        FROM events
        -- measured values only (r12 NULL-heavy sweep): the NULL value
        -- group ranks first/last engine-opposite in the below window
        WHERE event_type IN ('{_MW_GROUP_A}', '{_MW_GROUP_B}')
          AND value IS NOT NULL
        GROUP BY 1
    ),
    ranked AS (
        SELECT c_a, t_v,
               COALESCE(SUM(t_v) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        FROM vg
    ),
    s AS (
        SELECT CAST(SUM(c_a) AS BIGINT) AS n1,
               CAST(SUM(t_v - c_a) AS BIGINT) AS n2,
               CAST(SUM(t_v) AS BIGINT) AS n,
               -- R1 = sum of average ranks of group A; average rank is a
               -- half-integer, kept exact as (2*below + t_v + 1) halves
               CAST(SUM(c_a * (2 * below + t_v + 1)) AS BIGINT) AS r1_twice,
               CAST(SUM(t_v * t_v * t_v - t_v) AS BIGINT) AS tie_term
        FROM ranked
    )
    SELECT n1, n2,
           r1_twice / 2.0 - n1 * (n1 + 1) / 2.0 AS u1,
           round((r1_twice / 2.0 - n1 * (n1 + 1) / 2.0 - n1 * (n2 / 2.0))
                 / sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)
                        * ((n + 1) - tie_term / (CAST(n AS DOUBLE) * (n - 1)))),
                 6) AS z_stat,
           round((r1_twice / 2.0 - n1 * (n1 + 1) / 2.0)
                 / (CAST(n1 AS DOUBLE) * n2), 6) AS cl_effect
    FROM s
    -- degenerate contract (r10 const-values sweep): both samples
    -- non-empty, n > 1, and at least two distinct values (a single tied
    -- value makes tie_term = n^3 - n and zeroes the variance) — no rows.
    -- The bound runs in DOUBLE (r10 ADVICE): n^3 overflows BIGINT past
    -- n ~ 2.1M rows and ANSI Spark would throw; in double the not-all-
    -- tied gap is >= ~3n^2, astronomically above ulp(n^3), so the strict
    -- < decides identically on both engines at any feasible n
    WHERE n1 > 0 AND n2 > 0 AND n > 1
      AND CAST(tie_term AS DOUBLE) < CAST(n AS DOUBLE) * n * n - n
    """,
    doc=f"Mann-Whitney U rank test ('{_MW_GROUP_A}' vs '{_MW_GROUP_B}' event "
    "values) with tie-corrected normal z and common-language effect size.",
)
def mann_whitney_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free two-sample shift test.  The rank sums come from
    the DISTINCT-VALUE table, not a per-row rank window: per value keep
    (count_in_A, total_count), cumulative-sum the totals once, and every
    row's average rank is the closed form below + (t+1)/2 — so the only
    window runs over |distinct values| rows and the corpus itself is
    touched by exactly one aggregation.  All rank arithmetic is integer
    (average ranks held as twice-rank), so U is exact and only the final
    z/effect-size expressions are floating point.
    """
    # measured values only — see the oracle note (r12 NULL-heavy sweep)
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_MW_GROUP_A, _MW_GROUP_B)
        & F.col("value").isNotNull()
    )
    vg = ev.groupBy(F.col("value").alias("v")).agg(
        F.sum((F.col("event_type") == _MW_GROUP_A).cast("int")).alias("c_a"),
        F.count("*").alias("t_v"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vg.select(
        "c_a", "t_v", F.coalesce(F.sum("t_v").over(w), F.lit(0)).alias("below")
    )
    s = ranked.agg(
        F.sum("c_a").alias("n1"),
        F.sum(F.col("t_v") - F.col("c_a")).alias("n2"),
        F.sum("t_v").alias("n"),
        F.sum(F.col("c_a") * (2 * F.col("below") + F.col("t_v") + 1)).alias("r1_twice"),
        F.sum(F.col("t_v") * F.col("t_v") * F.col("t_v") - F.col("t_v")).alias(
            "tie_term"
        ),
    )
    n1, n2, n = F.col("n1"), F.col("n2"), F.col("n")
    u1 = F.col("r1_twice") / 2.0 - n1 * (n1 + 1) / 2.0
    sigma = F.sqrt(
        (n1.cast("double") * n2 / 12.0)
        * ((n + 1) - F.col("tie_term") / (n.cast("double") * (n - 1)))
    )
    # degenerate contract (see oracle): both samples present, n > 1, and
    # at least two distinct values — else the variance is zero, no rows.
    # The all-tied bound runs in double, mirroring the oracle: n^3
    # overflows int64 past ~2.1M rows (ANSI ARITHMETIC_OVERFLOW), and the
    # double compare still separates tied from not-tied exactly
    s = s.filter(
        (n1 > 0) & (n2 > 0) & (n > 1)
        & (F.col("tie_term").cast("double") < n.cast("double") * n * n - n)
    )
    return s.select(
        "n1",
        "n2",
        u1.alias("u1"),
        F.round((u1 - n1 * (n2 / 2.0)) / sigma, 6).alias("z_stat"),
        F.round(u1 / (n1.cast("double") * n2), 6).alias("cl_effect"),
    )


@register(
    "cramers_v_nation_priority",
    oracle="""
    WITH cells AS (
        SELECT n.n_name AS x, o.o_orderpriority AS y,
               CAST(COUNT(*) AS BIGINT) AS n_xy
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT x, y, n_xy,
               SUM(n_xy) OVER (PARTITION BY x) AS n_x,
               SUM(n_xy) OVER (PARTITION BY y) AS n_y,
               SUM(n_xy) OVER () AS n
        FROM cells
    ),
    contrib AS (
        SELECT n, n_xy,
               COUNT(DISTINCT x) OVER () AS r_levels,
               COUNT(DISTINCT y) OVER () AS c_levels,
               -- (o-e)^2/e per cell, 8dp-quantized before the exact sum
               CAST(round((n_xy - n_x * CAST(n_y AS DOUBLE) / n)
                          * (n_xy - n_x * CAST(n_y AS DOUBLE) / n)
                          / (n_x * CAST(n_y AS DOUBLE) / n), 8)
                    AS DECIMAL(18,8)) AS chi_i
        FROM m
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(MAX(r_levels) AS BIGINT) AS r_levels,
           CAST(MAX(c_levels) AS BIGINT) AS c_levels,
           round(CAST(SUM(chi_i) AS DOUBLE), 6) AS chi2,
           -- CASE-guarded: min(r,c)=1 zeroes the V denominator
           CASE WHEN LEAST(MAX(r_levels), MAX(c_levels)) > 1 THEN
               round(sqrt(CAST(SUM(chi_i) AS DOUBLE)
                          / (MAX(n) * (LEAST(MAX(r_levels), MAX(c_levels)) - 1))),
                     6) END AS cramers_v
    FROM contrib
    -- degenerate contract (r11 single-row sweep): V needs >= 2 levels on
    -- both axes — a 1xC or Rx1 table has no association to measure
    HAVING LEAST(MAX(r_levels), MAX(c_levels)) > 1
    """,
    doc="Cramer's V association strength between customer nation and "
    "order priority (bias-uncorrected, chi-square based).",
)
def cramers_v_nation_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level categorical association in one number — the go/no-go
    companion to the per-cell chi-square audit (chisq_independence_cells):
    V = sqrt(chi2 / (n * (min(r,c) - 1))) in [0, 1].

    Scale shape: one aggregation to the r x c cell table (bounded:
    25 x 5), then windows/scalar math over those cells only.  Per-cell
    chi-square contributions are 8dp-quantized and summed as exact
    decimal, so the cross-cell total is order-independent.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("x"), F.col("o_orderpriority").alias("y"))
        .agg(F.count("*").alias("n_xy"))
    )
    m = cells.select(
        "x",
        "y",
        "n_xy",
        F.sum("n_xy").over(Window.partitionBy("x")).alias("n_x"),
        F.sum("n_xy").over(Window.partitionBy("y")).alias("n_y"),
        F.sum("n_xy").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("n_x") * F.col("n_y").cast("double") / F.col("n")
    contrib = m.select(
        "n",
        F.size(F.collect_set("x").over(Window.partitionBy())).alias("r_levels"),
        F.size(F.collect_set("y").over(Window.partitionBy())).alias("c_levels"),
        F.round((F.col("n_xy") - e) * (F.col("n_xy") - e) / e, 8)
        .cast("decimal(18,8)")
        .alias("chi_i"),
    )
    chi2 = F.sum("chi_i").cast("double")
    min_levels = F.least(F.max("r_levels"), F.max("c_levels"))
    # degenerate contract (see oracle): a 1xC / Rx1 table has no V; the
    # division is CASE-guarded because ANSI evaluates the agg projection
    # before a post-agg filter could drop the row
    return contrib.agg(
        F.max("n").alias("n_rows"),
        F.max("r_levels").cast("long").alias("r_levels"),
        F.max("c_levels").cast("long").alias("c_levels"),
        F.round(chi2, 6).alias("chi2"),
        F.when(
            min_levels > 1,
            F.round(F.sqrt(chi2 / (F.max("n") * (min_levels - 1))), 6),
        ).alias("cramers_v"),
    ).filter(F.least(F.col("r_levels"), F.col("c_levels")) > 1)


#: Monetary-unit sampling: targeted picks per ship-month partition.
MUS_PICKS_PER_MONTH = 50


@register(
    "monetary_unit_sample",
    oracle=f"""
    WITH cents AS (
        SELECT date_trunc('month', l_shipdate) AS m,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    cum AS (
        SELECT m, c,
               -- (l_orderkey, l_linenumber) is NOT unique in the synthetic
               -- fixture; c as tie-break makes the order total up to
               -- identical rows, which are interchangeable for aggregates
               SUM(c) OVER (PARTITION BY m ORDER BY l_orderkey, l_linenumber, c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
               SUM(c) OVER (PARTITION BY m) AS tot
        FROM cents
    ),
    sel AS (
        SELECT m, c, tot,
               GREATEST(tot // {MUS_PICKS_PER_MONTH}, 1) AS step,
               cw // GREATEST(tot // {MUS_PICKS_PER_MONTH}, 1)
                 - (cw - c) // GREATEST(tot // {MUS_PICKS_PER_MONTH}, 1) AS hits
        FROM cum
    )
    SELECT CAST(CAST(m AS DATE) AS VARCHAR) AS ship_month,
           CAST(COUNT(*) FILTER (WHERE hits > 0) AS BIGINT) AS n_selected,
           CAST(SUM(c) FILTER (WHERE hits > 0) AS BIGINT) AS selected_cents,
           CAST(MAX(tot) AS BIGINT) AS total_cents,
           round(CAST(SUM(c) FILTER (WHERE hits > 0) AS BIGINT)
                 / CAST(MAX(tot) AS DOUBLE), 6) AS coverage
    FROM sel GROUP BY m
    """,
    doc=f"Monetary-unit (PPS) systematic audit sample, ~{MUS_PICKS_PER_MONTH} "
    "picks per ship month: rows whose cumulative cents cross a sampling-"
    "interval multiple.",
)
def monetary_unit_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit sampling proportional to monetary value (every dollar equally
    likely, so big-ticket rows are near-certain picks) — the standard
    substantive-testing sample auditors draw.  Selection is pure integer
    arithmetic on EXACT CENTS (a row is picked iff its cent-interval
    spans a multiple of the per-month step), so both engines pick the
    identical rows; no randomness, rerun-reproducible.

    Scale shape: the running cent total is windowed PER SHIP-MONTH
    (bounded partitions, keyed shuffle — never a global sort); output is
    one audit row per month.
    """
    li = table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.date_trunc("month", "l_shipdate").alias("m"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        "l_orderkey",
        "l_linenumber",
    )
    w_cum = (
        Window.partitionBy("m")
        .orderBy("l_orderkey", "l_linenumber", "c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cents.select(
        "m",
        "c",
        F.sum("c").over(w_cum).alias("cw"),
        F.sum("c").over(Window.partitionBy("m")).alias("tot"),
    )
    # Integer `div` throughout: F.floor(a / b) routes through a DOUBLE
    # quotient, which disagrees with exact integer division exactly when
    # the cumulative total sits near a step multiple — the selection
    # boundary itself (seen as a handful of flipped picks at sf>=0.01).
    sel = cum.withColumn(
        "step",
        F.greatest(F.expr(f"tot div {MUS_PICKS_PER_MONTH}"), F.lit(1)),
    ).selectExpr(
        "m", "c", "tot", "(cw div step) - ((cw - c) div step) AS hits"
    )
    hit = F.col("hits") > 0
    return sel.groupBy("m").agg(
        F.count(F.when(hit, 1)).alias("n_selected"),
        F.sum(F.when(hit, F.col("c"))).alias("selected_cents"),
        F.max("tot").alias("total_cents"),
        F.round(
            F.sum(F.when(hit, F.col("c"))) / F.max("tot").cast("double"), 6
        ).alias("coverage"),
    ).select(
        F.col("m").cast("date").cast("string").alias("ship_month"),
        "n_selected",
        "selected_cents",
        "total_cents",
        "coverage",
    )


@register(
    "poisson_rate_weekend_test",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day,
               CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS is_we,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN is_we = 1 THEN k ELSE 0 END) AS BIGINT) AS k1,
               CAST(SUM(CASE WHEN is_we = 0 THEN k ELSE 0 END) AS BIGINT) AS k2,
               CAST(COUNT(*) FILTER (WHERE is_we = 1) AS BIGINT) AS d1,
               CAST(COUNT(*) FILTER (WHERE is_we = 0) AS BIGINT) AS d2
        FROM d
    )
    SELECT k1, k2, d1, d2,
           round(k1 / CAST(d1 AS DOUBLE), 6) AS rate_weekend,
           round(k2 / CAST(d2 AS DOUBLE), 6) AS rate_weekday,
           round((k1 / CAST(d1 AS DOUBLE) - k2 / CAST(d2 AS DOUBLE))
                 / sqrt(k1 / (CAST(d1 AS DOUBLE) * d1)
                        + k2 / (CAST(d2 AS DOUBLE) * d2)), 6) AS z_stat
    FROM s
    -- degenerate contract (r10 random sweep): the test needs exposure in
    -- BOTH arms (a weekend-less span has d1 = 0) and at least one event
    -- (k1 = k2 = 0 makes the variance 0); otherwise no rows, both engines
    WHERE d1 > 0 AND d2 > 0 AND k1 + k2 > 0
    """,
    doc="Two-sample Poisson rate test: weekend vs weekday daily event "
    "rates with a normal-approximation z.",
)
def poisson_rate_weekend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-process companion to ab_test_proportions (which tests
    per-user proportions): are events ARRIVING faster on weekends?
    Exposure is the number of distinct calendar days per arm, counts are
    exact integers from one aggregation, and the variance-stabilized z
    is closed-form.  ISO weekday (Mon=1..Sun=7) on both engines:
    Spark's weekday() is Mon=0, so +1 aligns it with DuckDB's isodow().
    """
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        (F.weekday("ts") + 1 >= 6).cast("int").alias("is_we"),
    ).agg(F.count("*").alias("k"))
    s = d.agg(
        F.sum(F.when(F.col("is_we") == 1, F.col("k")).otherwise(0)).alias("k1"),
        F.sum(F.when(F.col("is_we") == 0, F.col("k")).otherwise(0)).alias("k2"),
        F.count(F.when(F.col("is_we") == 1, 1)).alias("d1"),
        F.count(F.when(F.col("is_we") == 0, 1)).alias("d2"),
    )
    r1 = F.col("k1") / F.col("d1").cast("double")
    r2 = F.col("k2") / F.col("d2").cast("double")
    z = (r1 - r2) / F.sqrt(
        F.col("k1") / (F.col("d1").cast("double") * F.col("d1"))
        + F.col("k2") / (F.col("d2").cast("double") * F.col("d2"))
    )
    # degenerate contract (see oracle): both arms exposed, >= 1 event
    s = s.filter(
        (F.col("d1") > 0) & (F.col("d2") > 0) & (F.col("k1") + F.col("k2") > 0)
    )
    return s.select(
        "k1",
        "k2",
        "d1",
        "d2",
        F.round(r1, 6).alias("rate_weekend"),
        F.round(r2, 6).alias("rate_weekday"),
        F.round(z, 6).alias("z_stat"),
    )


# --- round-8 batch (defer=True: drains behind the r7 window) ---------------


@register(
    "levene_brown_forsythe",
    defer=True,
    oracle="""
    WITH x AS (
        SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders
    ),
    med AS (
        -- LOWER median: an exact data value, no interpolation ambiguity
        SELECT grp, v AS m FROM (
            SELECT grp, v,
                   row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
                   COUNT(*) OVER (PARTITION BY grp) AS n
            FROM x
        ) WHERE rn = (n + 1) // 2
    ),
    z AS (
        SELECT x.grp, CAST(round(abs(x.v - med.m), 4) AS DECIMAL(18,4)) AS z
        FROM x JOIN med ON med.grp = x.grp
    ),
    g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_i, SUM(z) AS s_i,
               SUM(CAST(z AS DECIMAL(19,4)) * CAST(z AS DECIMAL(19,4))) AS q_i
        FROM z GROUP BY grp
    ),
    tot AS (
        SELECT CAST(SUM(n_i) AS BIGINT) AS n,
               CAST(SUM(s_i) AS DOUBLE) / CAST(SUM(n_i) AS BIGINT) AS m,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g
    ),
    part AS (
        SELECT CAST(round(g.n_i * (CAST(g.s_i AS DOUBLE) / g.n_i - t.m)
                          * (CAST(g.s_i AS DOUBLE) / g.n_i - t.m), 2)
                    AS DECIMAL(28,2)) AS ssb_i,
               CAST(round(CAST(g.q_i AS DOUBLE)
                          - CAST(g.s_i AS DOUBLE) * CAST(g.s_i AS DOUBLE)
                            / g.n_i, 2) AS DECIMAL(28,2)) AS ssw_i,
               t.n, t.k
        FROM g, tot t
    )
    SELECT k AS k_groups, n AS n_total,
           round((CAST(SUM(ssb_i) AS DOUBLE) / (k - 1))
                 / (CAST(SUM(ssw_i) AS DOUBLE) / (n - k)), 6) AS bf_stat
    FROM part GROUP BY k, n
    -- degenerate contract (r10 const-values sweep): all-equal deviations
    -- zero the within-group SS — no rows, both engines
    HAVING SUM(ssw_i) > 0
    """,
    doc="Brown-Forsythe robust variance-equality test across order "
    "priorities: ANOVA F on |x - group lower-median| deviations.",
)
def levene_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-shift companion to anova_f_groups (which tests MEANS and
    silently assumes equal variances): the Brown-Forsythe statistic runs
    the same F machinery on absolute deviations from the group MEDIAN,
    robust to heavy tails where classic Levene (mean-based) is not.

    The group median is the LOWER median — an exact data value selected
    by row_number, so both engines transform identically; deviations are
    4dp-quantized into the decimal domain before any sum.  Scale shape:
    one per-group sort window for the median, one grouped aggregation,
    closed-form F over the k-row rollup.
    """
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), F.col("o_totalprice").alias("v")
    )
    w = Window.partitionBy("grp").orderBy("v")
    med = (
        o.select(
            "grp",
            "v",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(Window.partitionBy("grp")).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("grp", F.col("v").alias("m"))
    )
    z = o.join(med, "grp").select(
        "grp", F.round(F.abs(F.col("v") - F.col("m")), 4).cast("decimal(18,4)").alias("z")
    )
    g = z.groupBy("grp").agg(
        F.count("*").alias("n_i"),
        F.sum("z").alias("s_i"),
        F.sum(
            F.col("z").cast("decimal(19,4)") * F.col("z").cast("decimal(19,4)")
        ).alias("q_i"),
    ).localCheckpoint(eager=True)
    tot = g.agg(
        F.sum("n_i").alias("n"),
        (F.sum("s_i").cast("double") / F.sum("n_i")).alias("m"),
        F.count("*").alias("k"),
    )
    m_i = F.col("s_i").cast("double") / F.col("n_i")
    part = g.crossJoin(F.broadcast(tot)).select(
        F.round(F.col("n_i") * (m_i - F.col("m")) * (m_i - F.col("m")), 2)
        .cast("decimal(28,2)")
        .alias("ssb_i"),
        F.round(
            F.col("q_i").cast("double")
            - F.col("s_i").cast("double") * F.col("s_i").cast("double") / F.col("n_i"),
            2,
        )
        .cast("decimal(28,2)")
        .alias("ssw_i"),
        "n",
        "k",
    )
    agg = part.groupBy("k", "n").agg(
        F.sum("ssb_i").cast("double").alias("ssb_d"),
        F.sum("ssw_i").cast("double").alias("ssw_d"),
    # degenerate contract (see oracle): SSW = 0 leaves the F undefined
    ).filter(F.col("ssw_d") > 0)
    return agg.select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_total"),
        F.round(
            (F.col("ssb_d") / (F.col("k") - 1))
            / (F.col("ssw_d") / (F.col("n") - F.col("k"))),
            6,
        ).alias("bf_stat"),
    )


@register(
    "mcnemar_purchase_shift",
    defer=True,
    oracle="""
    WITH bounds AS (
        SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
    ),
    u AS (
        -- "positive" = purchases over-represented vs the 1-in-5 base rate
        -- within the half (an any-purchase flag saturates to 1 for every
        -- user once they have dozens of events per half)
        SELECT e.user_id,
               CAST(SUM(CASE WHEN e.event_type = 'purchase'
                             AND epoch_us(e.ts) < (b.lo + b.hi) // 2
                             THEN 1 ELSE 0 END) * 5
                    > SUM(CASE WHEN epoch_us(e.ts) < (b.lo + b.hi) // 2
                               THEN 1 ELSE 0 END) AS INT) AS before_p,
               CAST(SUM(CASE WHEN e.event_type = 'purchase'
                             AND epoch_us(e.ts) >= (b.lo + b.hi) // 2
                             THEN 1 ELSE 0 END) * 5
                    > SUM(CASE WHEN epoch_us(e.ts) >= (b.lo + b.hi) // 2
                               THEN 1 ELSE 0 END) AS INT) AS after_p
        FROM events e, bounds b
        GROUP BY e.user_id
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN before_p = 1 AND after_p = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN before_p = 0 AND after_p = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN before_p = 1 AND after_p = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS both_p,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM u
    )
    SELECT n_users, both_p, b AS only_before, c AS only_after,
           CASE WHEN b + c > 0 THEN
               round((b - c) * (b - c) / CAST(b + c AS DOUBLE), 6)
           END AS mcnemar_chi2
    FROM s
    -- degenerate contract (r11 single-row sweep): zero discordant pairs
    -- leave the test undefined — no rows on BOTH engines
    WHERE b + c > 0
    """,
    doc="McNemar paired test: did users' purchase OVER-REPRESENTATION "
    "(above the 1-in-5 base rate) flip between the first and second half "
    "of the window (discordant-pair chi-square, no continuity "
    "correction)?",
)
def mcnemar_purchase_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired before/after test — the right tool when the SAME users are
    observed in both periods (a two-proportion z on overlapping user
    sets overstates significance).  The period split is the exact
    integer midpoint of the observed epoch-microsecond range, so both
    engines cut identically; everything else is integer counting and a
    closed-form discordant-pair chi-square.  One corpus aggregation.
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    )
    mid = F.floor((F.col("lo") + F.col("hi")) / 2)
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.unix_micros("ts") < mid),
                        1,
                    ).otherwise(0)
                )
                * 5
                > F.sum(F.when(F.unix_micros("ts") < mid, 1).otherwise(0))
            )
            .cast("int")
            .alias("before_p"),
            (
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.unix_micros("ts") >= mid),
                        1,
                    ).otherwise(0)
                )
                * 5
                > F.sum(F.when(F.unix_micros("ts") >= mid, 1).otherwise(0))
            )
            .cast("int")
            .alias("after_p"),
        )
    )
    b = F.sum(F.when((F.col("before_p") == 1) & (F.col("after_p") == 0), 1).otherwise(0))
    c = F.sum(F.when((F.col("before_p") == 0) & (F.col("after_p") == 1), 1).otherwise(0))
    # degenerate contract (see oracle): zero discordant pairs => test
    # undefined; the chi2 division is CASE-guarded because ANSI evaluates
    # the agg projection before any post-agg filter
    return u.agg(
        F.count("*").alias("n_users"),
        F.sum(
            F.when((F.col("before_p") == 1) & (F.col("after_p") == 1), 1).otherwise(0)
        ).alias("both_p"),
        b.alias("only_before"),
        c.alias("only_after"),
        F.when(
            (b + c) > 0,
            F.round((b - c) * (b - c) / (b + c).cast("double"), 6),
        ).alias("mcnemar_chi2"),
    ).filter(F.col("only_before") + F.col("only_after") > 0)


@register(
    "runs_test_daily_revenue",
    defer=True,
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, {{dsum}} AS rev
        FROM events GROUP BY 1
    ),
    med AS (
        SELECT rev AS m FROM (
            SELECT rev, row_number() OVER (ORDER BY rev) AS rn,
                   COUNT(*) OVER () AS n
            FROM daily
        ) WHERE rn = (n + 1) // 2
    ),
    signs AS (
        SELECT day, CASE WHEN rev > m THEN 1 ELSE 0 END AS above
        FROM daily, med WHERE rev <> m
    ),
    runs AS (
        SELECT above,
               CASE WHEN lag(above) OVER (ORDER BY day) IS DISTINCT FROM above
                    THEN 1 ELSE 0 END AS new_run
        FROM signs
    ),
    s AS (
        SELECT CAST(SUM(new_run) AS BIGINT) AS r,
               CAST(SUM(above) AS BIGINT) AS n1,
               CAST(COUNT(*) - SUM(above) AS BIGINT) AS n2,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM runs
    )
    SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
           round((r - (2.0 * n1 * n2 / n + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
                        / (CAST(n AS DOUBLE) * n * (n - 1))), 6) AS z_stat
    FROM s
    -- degenerate contract (r10 random sweep): the run-count variance is
    -- positive only with both signs present, n > 1, and 2*n1*n2 > n
    -- (n1 = n2 = 1 zeroes it); otherwise no rows, both engines
    WHERE n1 > 0 AND n2 > 0 AND n > 1 AND 2 * n1 * n2 > n
    """.format(dsum="CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)"),
    doc="Wald-Wolfowitz runs test on daily revenue vs its lower median: "
    "too few runs = trending/sticky, too many = oscillating.",
)
def runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomness screen for a time series that makes NO distributional
    assumption: count maximal runs of above/below-median days and compare
    to the exact run-count moments.  Days equal to the (lower) median are
    dropped, the standard convention.  Integer counting end-to-end; one
    corpus aggregation, then day-grain windows.
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("rev")
    ).localCheckpoint(eager=True)  # median + signs both re-reference it
    med = (
        daily.select(
            "rev",
            F.row_number().over(Window.orderBy("rev")).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("n"),
        )
        .filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("rev").alias("m"))
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("rev") != F.col("m"))
        .select("day", (F.col("rev") > F.col("m")).cast("int").alias("above"))
    )
    runs = signs.select(
        "above",
        F.when(
            ~F.lag("above").over(Window.orderBy("day")).eqNullSafe(F.col("above")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    s = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum("above").alias("n1"),
        (F.count("*") - F.sum("above")).alias("n2"),
        F.count("*").alias("n"),
    )
    r, n1, n2, n = (F.col(c) for c in ("r", "n1", "n2", "n"))
    mu = 2.0 * n1 * n2 / n + 1
    sigma = F.sqrt(
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n.cast("double") * n * (n - 1))
    )
    # degenerate contract (see oracle): variance > 0 or no rows
    s = s.filter((n1 > 0) & (n2 > 0) & (n > 1) & (2 * n1 * n2 > n))
    return s.select(
        r.alias("n_runs"),
        n1.alias("n_above"),
        n2.alias("n_below"),
        F.round((r - mu) / sigma, 6).alias("z_stat"),
    )


#: Entropy histogram bucket width (bits).
ENTROPY_BUCKET_BITS = 0.25


@register(
    "user_event_entropy",
    defer=True,
    oracle=f"""
    WITH c AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS k
        FROM events GROUP BY 1, 2
    ),
    u AS (
        SELECT user_id,
               CAST(SUM(k) AS BIGINT) AS n,
               -- H = log2(n) - (1/n) * sum k*log2(k): one log per term,
               -- 10dp-quantized so the per-user sum is exact
               CAST(SUM(CAST(round(k * log2(k), 10) AS DECIMAL(28,10)))
                    AS DOUBLE) AS sk
        FROM c GROUP BY 1
    ),
    h AS (
        -- + 0.0: a single-type user's H is a ~1e-11 residual that
        -- rounds to -0.0 here and +0.0 on the Spark side (r11
        -- combined-extremes probe)
        SELECT user_id, round(log2(n) - sk / n, 6) + 0.0 AS entropy FROM u
    )
    SELECT CAST(floor(entropy / {ENTROPY_BUCKET_BITS}) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           round(MIN(entropy), 6) AS min_entropy,
           round(MAX(entropy), 6) AS max_entropy
    FROM h GROUP BY 1
    """,
    doc="Histogram of per-user event-type Shannon entropy (bits, "
    f"{ENTROPY_BUCKET_BITS}-bit buckets): bots cluster at 0, organic "
    "users near log2(5).",
)
def user_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity screen: a user who only ever fires one event
    type (entropy 0) is a bot/integration signature; organic users sit
    near the corpus maximum.  H = log2(n) - (1/n)*SUM(k*log2(k)) needs
    one aggregation to (user, type) grain and one to user grain — the
    k*log2(k) terms are 10dp-quantized so the per-user reduction is
    order-free, and the output is a bounded entropy histogram.
    """
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("k"))
    u = c.groupBy("user_id").agg(
        F.sum("k").alias("n"),
        F.sum(
            F.round(F.col("k") * F.log2("k"), 10).cast("decimal(28,10)")
        ).cast("double").alias("sk"),
    )
    h = u.select(
        # + 0.0 mirrors the oracle's -0.0 normalization (see note)
        (F.round(F.log2("n") - F.col("sk") / F.col("n"), 6) + F.lit(0.0))
        .alias("entropy")
    )
    return h.groupBy(
        F.floor(F.col("entropy") / ENTROPY_BUCKET_BITS).cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n_users"),
        F.round(F.min("entropy"), 6).alias("min_entropy"),
        F.round(F.max("entropy"), 6).alias("max_entropy"),
    )


@register(
    "brand_price_qty_regression",
    defer=True,
    oracle="""
    WITH x AS (
        SELECT p.p_brand AS brand,
               CAST(l.l_extendedprice AS DECIMAL(12,2)) AS price,
               CAST(l.l_quantity AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    g AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(price) AS DOUBLE) AS sx,
               CAST(SUM(qty) AS BIGINT) AS sy,
               CAST(SUM(price * qty) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(price AS DECIMAL(19,2))
                        * CAST(price AS DECIMAL(19,2))) AS DOUBLE) AS sxx
        FROM x GROUP BY brand
    )
    SELECT brand, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000, 6)
               AS slope_per_million,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
               AS intercept_qty
    FROM g
    -- degenerate contract (r10 const-values sweep): a brand with zero
    -- price variance (incl. n = 1) has no regression line — dropped
    WHERE n * sxx - sx * sx > 0
    """,
    doc="Per-brand OLS of quantity on extended price (slope scaled per "
    "million currency units) — groupwise regression from exact decimal "
    "moments.",
)
def brand_price_qty_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPWISE regression — one model per brand in a single pass, the
    shape regression_value_trend (one global series) doesn't cover: all
    five OLS moments are per-group sufficient statistics computed in the
    exact decimal domain (price is a 2-decimal value; its square at
    scale 4 is exact; int128-width casts keep DuckDB off its overflowing
    int64 fast path), so the per-brand slope/intercept are closed-form
    deterministic doubles.  One broadcast dim join + one grouped
    aggregation, regardless of fact size.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    x = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    g = x.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("price").cast("double").alias("sx"),
        F.sum("qty").alias("sy"),
        F.sum(F.col("price") * F.col("qty")).cast("double").alias("sxy"),
        F.sum(
            F.col("price").cast("decimal(19,2)") * F.col("price").cast("decimal(19,2)")
        )
        .cast("double")
        .alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    # degenerate contract (see oracle): zero price variance = no line
    g = g.filter(n * sxx - sx * sx > 0)
    return g.select(
        "brand",
        "n",
        F.round(slope * 1000000, 6).alias("slope_per_million"),
        F.round((sy - slope * sx) / n, 6).alias("intercept_qty"),
    )


@register(
    "simpson_slope_reversals",
    defer=True,
    oracle="""
    WITH x AS (
        SELECT p.p_brand AS brand,
               CAST(l.l_extendedprice AS DECIMAL(12,2)) AS price,
               CAST(l.l_quantity AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    g AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(price) AS DOUBLE) AS sx,
               CAST(SUM(qty) AS BIGINT) AS sy,
               CAST(SUM(price * qty) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(price AS DECIMAL(19,2))
                        * CAST(price AS DECIMAL(19,2))) AS DOUBLE) AS sxx
        FROM x GROUP BY brand
    ),
    pooled AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n, SUM(sx) AS sx,
               CAST(SUM(sy) AS BIGINT) AS sy, SUM(sxy) AS sxy,
               SUM(sxx) AS sxx
        FROM g
    ),
    cls AS (
        SELECT g.brand,
               CASE WHEN g.n * g.sxy - g.sx * g.sy > 0 THEN 1
                    WHEN g.n * g.sxy - g.sx * g.sy < 0 THEN -1
                    ELSE 0 END AS brand_sign,
               CASE WHEN p.n * p.sxy - p.sx * p.sy > 0 THEN 1
                    WHEN p.n * p.sxy - p.sx * p.sy < 0 THEN -1
                    ELSE 0 END AS pooled_sign
        FROM g, pooled p
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
           CAST(MAX(pooled_sign) AS BIGINT) AS pooled_sign,
           CAST(SUM(CASE WHEN brand_sign * pooled_sign < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reversed,
           CAST(MIN(CASE WHEN brand_sign * pooled_sign < 0 THEN brand END)
                AS VARCHAR) AS first_reversed_brand
    FROM cls
    """,
    doc="Simpson's-paradox screen: brands whose price-quantity slope SIGN "
    "opposes the pooled regression's sign (exact sign comparison on the "
    "covariance numerators).",
)
def simpson_slope_reversals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aggregation trap detector: a pooled trend whose sign flips
    inside groups means any corpus-level conclusion is confounded by
    group composition.  Slope SIGN needs only the covariance numerator
    n*Sxy - Sx*Sy — exact decimal arithmetic, so the comparison is
    integer-robust with no division anywhere.  Reuses the one-pass
    groupwise moments of brand_price_qty_regression; pooled moments are
    the column sums of the group table.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    x = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    g = x.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("price").cast("double").alias("sx"),
        F.sum("qty").alias("sy"),
        F.sum(F.col("price") * F.col("qty")).cast("double").alias("sxy"),
        F.sum(
            F.col("price").cast("decimal(19,2)") * F.col("price").cast("decimal(19,2)")
        )
        .cast("double")
        .alias("sxx"),
    ).localCheckpoint(eager=True)  # shared by pooled + cls
    pooled = g.agg(
        F.sum("n").alias("pn"),
        F.sum("sx").alias("psx"),
        F.sum("sy").alias("psy"),
        F.sum("sxy").alias("psxy"),
    )
    bnum = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    pnum = F.col("pn") * F.col("psxy") - F.col("psx") * F.col("psy")
    cls = g.crossJoin(F.broadcast(pooled)).select(
        "brand",
        F.when(bnum > 0, 1).when(bnum < 0, -1).otherwise(0).alias("brand_sign"),
        F.when(pnum > 0, 1).when(pnum < 0, -1).otherwise(0).alias("pooled_sign"),
    )
    rev = F.col("brand_sign") * F.col("pooled_sign") < 0
    return cls.agg(
        F.count("*").alias("n_brands"),
        F.max("pooled_sign").cast("long").alias("pooled_sign"),
        F.sum(rev.cast("int")).alias("n_reversed"),
        F.min(F.when(rev, F.col("brand"))).cast("string").alias(
            "first_reversed_brand"
        ),
    )


@register(
    "user_overdispersion_index",
    defer=True,
    oracle="""
    WITH dc AS (
        SELECT user_id, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS k
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
        FROM events
    ),
    u AS (
        -- per-user daily-count moments over ALL observed days (days with
        -- zero events contribute zero to both sums)
        SELECT d.user_id, s.n_days,
               CAST(SUM(d.k) AS BIGINT) AS sk,
               CAST(SUM(d.k * d.k) AS BIGINT) AS sk2
        FROM dc d, span s
        GROUP BY d.user_id, s.n_days
    ),
    idx AS (
        SELECT CAST(round((CAST(sk2 AS DOUBLE) / n_days
                           - (CAST(sk AS DOUBLE) / n_days)
                             * (CAST(sk AS DOUBLE) / n_days))
                          / (CAST(sk AS DOUBLE) / n_days), 6)
                    AS DECIMAL(18,6)) AS d_i
        FROM u
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(SUM(d_i) AS DOUBLE) / COUNT(*), 6) AS avg_dispersion,
           round(MAX(CAST(d_i AS DOUBLE)), 6) AS max_dispersion,
           CAST(SUM(CASE WHEN d_i > 1.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_overdispersed
    FROM idx
    """,
    doc="Per-user daily-event-count dispersion index (variance/mean over "
    "all observed days): Poisson ~1, bursty users >> 1; corpus summary "
    "with an over-1.5 count.",
)
def user_overdispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral burstiness at the USER level (term_burstiness_vmr is
    the same statistic over words x docs): a user whose daily counts are
    Poisson-like has index ~1; schedulers and batch scripts spike far
    above.  Zero-days cost nothing — the variance/mean come from the
    integer (Σk, Σk²) of active days plus the global day span.  Two
    aggregations; per-user indices 6dp-quantized before the corpus mean.
    """
    ev = table(spark, sf_dir, "events")
    dc = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("k")
    )
    span = ev.agg(F.countDistinct(F.col("ts").cast("date")).alias("n_days"))
    u = (
        dc.crossJoin(F.broadcast(span))
        .groupBy("user_id", "n_days")
        .agg(
            F.sum("k").alias("sk"),
            F.sum(F.col("k") * F.col("k")).alias("sk2"),
        )
    )
    mean = F.col("sk").cast("double") / F.col("n_days")
    var = F.col("sk2").cast("double") / F.col("n_days") - mean * mean
    idx = u.select(F.round(var / mean, 6).cast("decimal(18,6)").alias("d_i"))
    return idx.agg(
        F.count("*").alias("n_users"),
        F.round(F.sum("d_i").cast("double") / F.count("*"), 6).alias(
            "avg_dispersion"
        ),
        F.round(F.max(F.col("d_i").cast("double")), 6).alias("max_dispersion"),
        F.sum(F.when(F.col("d_i") > 1.5, 1).otherwise(0)).alias("n_overdispersed"),
    )


@register(
    "basket_size_geometric_fit",
    defer=True,
    oracle="""
    WITH b AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS sz
        FROM lineitem GROUP BY 1
    ),
    hist AS (SELECT sz, CAST(COUNT(*) AS BIGINT) AS obs FROM b GROUP BY 1),
    s AS (
        SELECT CAST(SUM(obs) AS BIGINT) AS n_orders,
               CAST(SUM(sz * obs) AS BIGINT) AS n_items
        FROM hist
    ),
    fit AS (
        -- geometric on {1,2,...}: MLE p = 1/mean = n_orders/n_items;
        -- expected count for size k is n*p*(1-p)^(k-1)
        SELECT h.sz, h.obs, s.n_orders, s.n_items,
               s.n_orders * (s.n_orders / CAST(s.n_items AS DOUBLE))
                 * power(1.0 - s.n_orders / CAST(s.n_items AS DOUBLE),
                         h.sz - 1) AS expected
        FROM hist h, s
    )
    SELECT sz AS basket_size, obs AS n_orders_observed,
           round(expected, 4) AS n_orders_expected,
           round((obs - expected) * (obs - expected) / expected, 6)
               AS chi2_term
    FROM fit
    """,
    doc="Geometric-distribution fit of order basket sizes: observed vs "
    "MLE-expected counts per size with per-size chi-square terms.",
)
def basket_size_geometric_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does basket size follow the memoryless add-one-more-item model?
    The geometric MLE needs only (orders, items) — two integers — and
    the per-size expected counts are closed-form; big chi-square terms
    localize WHERE the model breaks (bulk orders, minimums).  power()
    with an integer exponent is repeated IEEE multiplication in both
    engines; expected/chi2 round at 4/6dp over the bounded size
    histogram.  Two integer aggregations total.
    """
    li = table(spark, sf_dir, "lineitem")
    b = li.groupBy("l_orderkey").agg(F.count("*").alias("sz"))
    hist = b.groupBy("sz").agg(F.count("*").alias("obs")).localCheckpoint(
        eager=True
    )  # shared by totals + fit
    s = hist.agg(
        F.sum("obs").alias("n_orders"),
        F.sum(F.col("sz") * F.col("obs")).alias("n_items"),
    )
    p = F.col("n_orders") / F.col("n_items").cast("double")
    expected = F.col("n_orders") * p * F.pow(1.0 - p, F.col("sz") - 1)
    fit = hist.crossJoin(F.broadcast(s)).select(
        F.col("sz").alias("basket_size"),
        F.col("obs").alias("n_orders_observed"),
        F.round(expected, 4).alias("n_orders_expected"),
        F.round(
            (F.col("obs") - expected) * (F.col("obs") - expected) / expected, 6
        ).alias("chi2_term"),
    )
    return fit


# ---------------------------------------------------------------------------
# Wilson-interval supplier ranking (round 8)

ONTIME_Z = 1.96           # 95% two-sided (distinct from the module-level WILSON_Z above!)
ONTIME_DAYS = 30          # shipped within this many days of the order date


@register(
    "wilson_ontime_ranking",
    defer=2,
    oracle=f"""
    WITH s AS (
        SELECT l.l_suppkey AS supp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                                            CAST(l.l_shipdate AS DATE))
                                  <= {ONTIME_DAYS}
                             THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1
    ),
    wil AS (
        SELECT supp, n, k,
               ((k / CAST(n AS DOUBLE)) + {ONTIME_Z} * {ONTIME_Z} / (2.0 * n)
                - {ONTIME_Z} * sqrt((k / CAST(n AS DOUBLE))
                                    * (1.0 - k / CAST(n AS DOUBLE)) / n
                                    + {ONTIME_Z} * {ONTIME_Z}
                                      / (4.0 * n * CAST(n AS DOUBLE))))
               / (1.0 + {ONTIME_Z} * {ONTIME_Z} / n) AS lb
        FROM s
    )
    SELECT supp AS supp_key, n AS n_shipments, k AS n_ontime,
           floor(lb * 1000000) / 1000000 AS wilson_lower
    FROM wil
    ORDER BY lb DESC, supp LIMIT 25
    """,
    doc=f"Top-25 suppliers by the Wilson 95% lower bound of their "
    f"{ONTIME_DAYS}-day on-time ship rate — the small-sample-honest "
    "ranking (a 2/2 supplier must not outrank a 95/100 one).",
)
def wilson_ontime_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking by raw success rate rewards tiny denominators; the Wilson
    score interval's lower bound is the standard correction (how Reddit
    sorts comments).  Pure closed-form per supplier — integer (n, k)
    aggregation, then one arithmetic expression whose every operation
    (divide, sqrt) is IEEE-correctly-rounded and written in the same
    order on both engines; floor-quantized output.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    z = ONTIME_Z
    s = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("l_suppkey").alias("supp_key"))
        .agg(
            F.count("*").alias("n_shipments"),
            F.sum(
                F.when(
                    F.datediff(
                        F.col("l_shipdate").cast("date"),
                        F.col("o_orderdate").cast("date"),
                    )
                    <= ONTIME_DAYS,
                    1,
                ).otherwise(0)
            ).alias("n_ontime"),
        )
    )
    ph = F.col("n_ontime") / F.col("n_shipments").cast("double")
    n = F.col("n_shipments")
    lb = (
        ph
        + z * z / (2.0 * n)
        - z
        * F.sqrt(ph * (1.0 - ph) / n + z * z / (4.0 * n * n.cast("double")))
    ) / (1.0 + z * z / n)
    return (
        s.select(
            "supp_key",
            "n_shipments",
            "n_ontime",
            (F.floor(lb * 1000000) / 1000000).alias("wilson_lower"),
            lb.alias("__lb"),
        )
        .orderBy(F.col("__lb").desc(), "supp_key")
        .limit(25)
        .drop("__lb")
    )


# ---------------------------------------------------------------------------
# Event-type lift matrix (round 8)


@register(
    "event_type_lift_matrix",
    defer=2,
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        FROM events
    ),
    n AS (SELECT CAST(COUNT(DISTINCT (user_id, day)) AS BIGINT) AS tot FROM ud),
    m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM ud GROUP BY 1),
    co AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM ud a JOIN ud b
          ON a.user_id = b.user_id AND a.day = b.day
         AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT co.type_a, co.type_b, co.c_ab,
           -- lift = P(ab)/(P(a)P(b)) = tot*c_ab/(c_a*c_b): integral ppm,
           -- no float or log anywhere
           CAST(1000000 * n.tot * co.c_ab // (ma.c * mb.c) AS BIGINT)
               AS lift_ppm
    FROM co
        JOIN m ma ON ma.event_type = co.type_a
        JOIN m mb ON mb.event_type = co.type_b
        CROSS JOIN n
    """,
    doc="Event-type lift matrix over (user, day) baskets: observed "
    "co-occurrence vs independence, as integral ppm — the PMI matrix "
    "without the cross-engine log.",
)
def event_type_lift_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which behaviors travel together within a user-day: lift > 1e6 ppm
    means the pair co-occurs beyond chance (the association signal PMI
    log-transforms, kept here as an exact integer ratio so no libm enters
    the path).  Baskets = distinct (user, day); the pair join runs on the
    <=5-type per-basket sets, so fanout is bounded by type-count squared
    per basket, never corpus-quadratic."""
    ev = table(spark, sf_dir, "events")
    # consumed by the basket count, the margins, and both pair-join
    # sides — pin the basket grain once (no corpus re-distinct per ref)
    ud = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"), "event_type")
        .distinct()
        .localCheckpoint(eager=True)
    )
    tot = ud.select("user_id", "day").distinct().count()
    m = ud.groupBy("event_type").agg(F.count("*").alias("c"))
    a, b = ud.alias("a"), ud.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("c_ab"))
    )
    ma = m.select(F.col("event_type").alias("type_a"), F.col("c").alias("c_a"))
    mb = m.select(F.col("event_type").alias("type_b"), F.col("c").alias("c_b"))
    return (
        co.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .select(
            "type_a",
            "type_b",
            "c_ab",
            # pre-multiplied in Python: 1000000 * tot overflows an INT
            # literal in Spark's ANSI parser
            F.expr(f"CAST({1000000 * tot} * c_ab div (c_a * c_b) AS LONG)").alias(
                "lift_ppm"
            ),
        )
    )
