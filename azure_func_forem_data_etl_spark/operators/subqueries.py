"""Correlated-subquery query family: the remaining TPC-H analogs (Q2, Q8,
Q9, Q11, Q13, Q15, Q16, Q17, Q20, Q22) adapted to the testdata star schema
(no partsupp table; trimmed columns — thresholds replace ps_availqty and
``c_nationkey % 5`` plays the phone-prefix country code).

This family exists to cover *subquery decorrelation* — the one relational
surface the earlier TPC-H analogs didn't exercise:

- correlated scalar aggregates (Q2 min-per-part, Q17 avg-per-part),
- global scalar thresholds (Q11, Q15, Q22),
- nested IN / NOT IN / NOT EXISTS (Q16, Q20, Q22),
- outer-join aggregation then re-aggregation (Q13).

Two implementation styles on purpose:

- **DataFrame, decorrelated by hand** (Q2/Q8/Q9/Q11/Q13/Q15/Q16/Q22): the
  correlated subquery becomes an aggregate + equi-join (what Catalyst's
  ``RewriteCorrelatedScalarSubquery`` does internally), with the scalar
  side explicitly ``F.broadcast`` so a 100 TB fact table never shuffles
  against a one-row threshold.
- **spark.sql with the oracle's own text** (Q17/Q20): the *correlated*
  SQL runs verbatim on both engines, exercising Catalyst's own
  decorrelation (``DecorrelateInnerQuery``) rather than ours.

All money math stays in the decimal domain (functions/exact.py) so sums
are bit-identical across engines and partition orders.

Scale notes (100 TB design point): every scalar subquery is a one-row
broadcast (no shuffle); Q2/Q17's per-part aggregates shuffle 8-byte keys
+ one value, then equi-join back on l_partkey — the same partitioning the
fact join needs, so AQE reuses the exchange; Q13's left join shuffles on
custkey and feeds the second aggregation map-side (c_count has ~30
distinct values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.functions.exact import (
    SQL_REVENUE,
    decsum,
    revenue,
)
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import (
    register_temp_views,
    table,
)

# ---------------------------------------------------------------------------
# Q2 analog: min-cost supplier per part (correlated MIN, decorrelated)

_Q2_SQL = """
    SELECT DISTINCT p.p_partkey, p.p_brand, s.s_name,
           l.l_extendedprice AS min_price
    FROM part p, lineitem l, supplier s
    WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
      AND p.p_size BETWEEN 10 AND 15 AND p.p_type = 'STANDARD'
      AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
                               FROM lineitem l2
                               WHERE l2.l_partkey = p.p_partkey)
"""


@register(
    "q2_min_cost_supplier",
    oracle=_Q2_SQL,
    doc="TPC-H Q2 analog: suppliers offering each part at its global "
    "minimum price (correlated MIN subquery, decorrelated to agg+join).",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated by hand: the per-part MIN becomes a groupBy aggregate
    joined back on l_partkey — exactly Catalyst's rewrite of the
    correlated form.  The min is over ALL lineitems of the part (the
    correlation is on the part row, not the filtered slice), so the
    aggregate runs before the size/type filter; the equality compares
    stored doubles (no arithmetic), so it is engine-exact."""
    part = table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 15) & (F.col("p_type") == "STANDARD")
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    min_price = li.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            min_price.withColumnRenamed("l_partkey", "mp_partkey"),
            (F.col("p_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "p_brand", "s_name", "min_price")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Q8 analog: national market share

@register(
    "q8_market_share",
    oracle=f"""
    WITH base AS (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {SQL_REVENUE} AS volume,
               n2.n_name AS supp_nation
        FROM part, lineitem, orders, customer, supplier, nation n1,
             nation n2, region
        WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
          AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
          AND s_suppkey = l_suppkey AND s_nationkey = n2.n_nationkey
          AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                              AND TIMESTAMP '1996-12-31'
    )
    SELECT o_year,
           round(CAST(SUM(CASE WHEN supp_nation = 'NATION_2'
                               THEN volume END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
    doc="TPC-H Q8 analog: NATION_2's share of ECONOMY-part volume sold to "
    "ASIA customers per year (conditional aggregate ratio).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sums come out of ONE aggregation pass (conditional sum), so
    the ratio needs no self-join; the five dimension tables broadcast.
    The division runs on two exact decimal-derived doubles — IEEE
    division of identical operands is identical everywhere."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nat = cust.join(
        F.broadcast(
            nation.join(
                F.broadcast(region),
                nation["n_regionkey"] == region["r_regionkey"],
            ).select("n_nationkey")
        ),
        cust["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nat = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    vol = F.when(F.col("supp_nation") == "NATION_2", revenue())
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_nat), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            F.round(
                decsum(vol) / decsum(revenue()),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 analog: product-type profit by nation and year

# No partsupp.ps_supplycost: cost is modeled as half the part list price,
# kept fully in the decimal domain so the profit sum is engine-exact.
_SQL_COST = (
    "CAST(p_retailprice AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(4,1))"
    " * CAST(0.5 AS DECIMAL(2,1))"
)


def _cost() -> F.Column:
    return (
        F.col("p_retailprice").cast("decimal(9,2)")
        * F.col("l_quantity").cast("decimal(4,1)")
        * F.lit(0.5).cast("decimal(2,1)")
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM({SQL_REVENUE} - {_SQL_COST}) AS DOUBLE) AS sum_profit
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%widget%'
    GROUP BY n_name, CAST(year(o_orderdate) AS INT)
    """,
    doc="TPC-H Q9 analog: per-nation, per-year profit on widget parts "
    "(revenue minus modeled supply cost, exact decimal domain).",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    supp_nat = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supp["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("nation", "o_year")
        .agg(decsum(revenue() - _cost()).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 analog: important part volume (global scalar threshold)

Q11_FRACTION = 0.0006


@register(
    "q11_important_volume",
    oracle=f"""
    WITH pv AS (
        SELECT l_partkey, CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS part_value
        FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_value FROM pv
    WHERE part_value > (SELECT CAST(SUM({SQL_REVENUE}) AS DOUBLE)
                               * {Q11_FRACTION}
                        FROM lineitem)
    """,
    doc="TPC-H Q11 analog: parts whose revenue exceeds a fixed fraction "
    "of total revenue (global scalar subquery threshold).",
)
def q11_important_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global total is a one-row aggregate broadcast against the
    per-part aggregate — the scalar subquery costs one extra pass over
    lineitem and zero extra shuffles of the grouped side.  Both sums are
    decimal-exact, so the ``>`` threshold compare is engine-stable."""
    li = table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(decsum(revenue()).alias("part_value"))
    total = li.agg(
        (decsum(revenue()) * F.lit(Q11_FRACTION)).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


# ---------------------------------------------------------------------------
# Q13 analog: customer order-count distribution

@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) t GROUP BY c_count
    """,
    doc="TPC-H Q13 analog: distribution of per-customer order counts, "
    "zero-order customers included (outer join + double aggregation).",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(o_orderkey) over a left join counts 0 for unmatched
    customers (COUNT skips the NULL the outer join manufactures) — the
    classic way to keep empty groups.  The second groupBy has ~30
    distinct keys, so it is all map-side partials."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q15 analog: top supplier by quarterly revenue

@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({SQL_REVENUE}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue FROM supplier, rev
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15 analog: supplier(s) with the maximum Q1-1996 revenue "
    "(aggregate reused as both join input and scalar MAX).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarterly aggregate is computed once and reused for both the
    scalar MAX and the equality filter (vs the view the original defines
    twice).  Equality compares two decimal-exact doubles.  The MAX side
    is a one-row broadcast."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        decsum(revenue()).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 analog: supplier counts by part attributes (NOT IN)

@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part, lineitem
    WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 analog: distinct suppliers per part attribute combo, "
    "excluding negative-balance suppliers (NOT IN as anti join).",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-nullable key is exactly a left-anti join (the
    null-aware complication never triggers); the excluded-supplier list
    broadcasts.  COUNT(DISTINCT) runs as Spark's two-phase expand
    aggregate — no driver collect."""
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    li = table(spark, sf_dir, "lineitem")
    bad_supp = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 + Q20: Catalyst-decorrelated (spark.sql runs the oracle's own text)

_Q17_SQL = """
    SELECT CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem l1, part p
    WHERE p.p_partkey = l1.l_partkey AND p.p_brand = 'Brand#3'
      AND l1.l_quantity <
          (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4)))
                              AS DOUBLE) / COUNT(l2.l_quantity))
           FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""


@register(
    "q17_small_quantity_revenue",
    oracle=_Q17_SQL,
    doc="TPC-H Q17 analog via spark.sql: revenue of below-average-quantity "
    "orders, correlated AVG subquery decorrelated by Catalyst itself.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated SQL text runs verbatim on both engines; Catalyst's
    DecorrelateInnerQuery turns the per-part AVG into the same aggregate
    + join the hand-decorrelated queries build.  The average uses the
    decimal-sum/count formula so the 0.2x threshold is engine-exact."""
    register_temp_views(spark, sf_dir)
    return spark.sql(_Q17_SQL)


_Q20_SQL = """
    SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > CAST(60 AS DECIMAL(18,4))
    )
"""


@register(
    "q20_substantial_suppliers",
    oracle=_Q20_SQL,
    doc="TPC-H Q20 analog via spark.sql: suppliers who shipped >60 units "
    "of any red part in 1996 (nested IN subqueries + HAVING).",
)
def q20_substantial_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN subqueries become semi joins under Catalyst: part-name
    filter semi-joins lineitem (broadcast), the grouped HAVING result
    semi-joins supplier.  The quantity sum is decimal-exact so the >60
    cut is engine-stable."""
    register_temp_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)


# ---------------------------------------------------------------------------
# Q22 analog: dormant high-balance customers

@register(
    "q22_dormant_customers",
    oracle="""
    SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4)))
                                   AS DOUBLE) / COUNT(c2.c_acctbal)
                       FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY CAST(c_nationkey % 5 AS INT)
    """,
    doc="TPC-H Q22 analog: above-average-balance customers with no recent "
    "orders, by country code (scalar AVG + NOT EXISTS anti join).",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS is a left-anti join against recent orders; the global
    average balance is a one-row broadcast.  ``c_nationkey % 5`` stands
    in for the original's phone-prefix country code (the schema has no
    phone column)."""
    cust = table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    recent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
