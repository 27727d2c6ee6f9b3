"""Count-Min sketch over the token stream — the fixed-memory frequency
sketch for heavy-hitter queries at 100 TB (cf. Cormode & Muthukrishnan;
Spark also ships a binary ``count_min_sketch`` aggregate, but building the
counter matrix relationally keeps it queryable, mergeable by plain SUM,
and engine-deterministic).

Sketch = DEPTH x WIDTH counters: row d hashes each token with
``xxhash64(token, d)`` into one of WIDTH buckets; estimate(token) =
min over rows of its bucket counts.  Overestimates only (collisions add),
error <= N * e / WIDTH with prob 1 - e^-DEPTH — both bounds unit-tested.

Scale shape: building is one groupBy over (depth x bucket) keys — at most
DEPTH*WIDTH rows out regardless of corpus size; merging two sketches is
SUM by (depth, bucket); estimating k tokens joins a k*DEPTH probe table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(token_col, depth: int):
    return F.pmod(F.xxhash64(token_col, F.lit(depth)), F.lit(CMS_WIDTH))


def cms_build(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """(depth, bucket, cnt) counter matrix from a token stream."""
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                _bucket(F.col(token_col), d).alias("bucket"),
            )
            for d in range(CMS_DEPTH)
        ]
    )
    return (
        tokens.select(F.explode(rows).alias("r"))
        .select("r.depth", "r.bucket")
        .groupBy("depth", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(cms: DataFrame, probe_tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """(token, est): min over depths of the token's bucket counts."""
    probes = probe_tokens.select(
        token_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _bucket(F.col(token_col), d).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("r"),
    ).select(token_col, "r.depth", "r.bucket")
    # Broadcast the CMS, not the probes: the LEFT side of a left-outer
    # join is not hash-buildable, so a hint there is silently ignored
    # (r3 sim log's HintErrorLogger warning).  The counter matrix is
    # bounded at DEPTH*WIDTH rows — the textbook broadcast side — and the
    # probe side streams, which also holds when callers probe many tokens.
    return (
        probes.join(F.broadcast(cms), ["depth", "bucket"], "left")
        .na.fill({"cnt": 0})
        .groupBy(token_col)
        .agg(F.min("cnt").alias("est"))
    )


#: Euler's e — the constant in the classic CMS error bound
#: est <= true + e*N/WIDTH (holds with prob 1 - e^-DEPTH per query;
#: observed margin on the fixtures is 0 at every SF — the top-10 heavy
#: tokens hit a collision-free depth).
CMS_E = 2.718281828459045


@register(
    "cms_heavy_hitters",
    # Promoted rows-only -> oracle in r6 (r5 VERDICT ask #2c): the counter
    # values are xxhash64-family-specific, but the projection that matters
    # is invariant-checkable — exact top-10 counts (plain GROUP BY in
    # DuckDB) plus the two CMS guarantees as booleans: overestimate-only
    # (deterministic: collisions only ADD counts) and the e*N/WIDTH bound.
    oracle="""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    top AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS true_cnt
        FROM tok GROUP BY token
        ORDER BY true_cnt DESC, token LIMIT 10
    )
    SELECT token, true_cnt,
           TRUE AS est_ge_true, TRUE AS est_within_bound
    FROM top
    """,
    doc="Count-Min sketch: 4x1024 counter matrix; top-10 exact heavy "
    "hitters with the sketch's one-sided-error and e*N/WIDTH bound "
    "invariants checked in-plan.",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N (total token count) is a driver-side scalar — one tiny agg job,
    same BNLJ-free pattern as association_rules_parts — so the bound
    column folds to a literal comparison in the final projection."""
    docs = table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    n_total = tokens.count()
    bound = CMS_E * n_total / CMS_WIDTH
    cms = cms_build(tokens)
    top = (
        tokens.groupBy("token")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "token")
        .limit(10)
    )
    return (
        cms_estimate(cms, top.select("token"))
        .join(top, "token")
        .select(
            "token",
            "true_cnt",
            (F.col("est") >= F.col("true_cnt")).alias("est_ge_true"),
            (
                (F.col("est") - F.col("true_cnt")).cast("double") <= F.lit(bound)
            ).alias("est_within_bound"),
        )
        .orderBy(F.col("true_cnt").desc(), "token")
    )


@register(
    "hll_sketch_union",
    # Promoted rows-only -> oracle in r6 (r5 VERDICT ask #2): the binary
    # datasketches-HLL state is engine-specific AND (unlike theta below)
    # its estimates leave exact mode within fixture range (sf0.1 per-day
    # error up to 0.69%), so the honest oracle is the invariant
    # projection: exact distincts (DuckDB GROUP BY) + the estimate-error
    # bound as a checked boolean (3% relative, absolute floor 3 — ~2x the
    # lgConfigK=12 rsd of 1.6%).
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users_exact,
           TRUE AS hll_within_bound
    FROM events GROUP BY 1
    UNION ALL
    SELECT CAST(NULL AS TIMESTAMP),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           TRUE
    FROM events
    """,
    doc="HyperLogLog sketch build + union (hll_sketch_agg / hll_union_agg): "
    "per-day user sketches merged to rolling distincts — the mergeable-"
    "aggregate pattern pre-aggregation needs at 100 TB — with each "
    "estimate bound-checked against the exact distinct count.",
)
def hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why sketches and not approx_count_distinct: the sketch is a VALUE —
    persist per-day sketches (a few KB each) and answer any later
    cross-day distinct question by unioning them, without rescanning the
    raw 100 TB.  Build is one partial-aggregated shuffle; union reduces
    #days rows.  The final row carries the all-days estimate next to the
    per-day ones via a second, tiny union agg.  The exact countDistinct
    columns exist to witness the sketch error in-plan (the 100 TB
    production variant drops them and keeps only the sketches)."""
    events = table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact"),
    )

    def _ok(est, exact):
        return F.coalesce(
            F.abs(est - exact.cast("double"))
            <= F.greatest(F.lit(3.0), F.lit(0.03) * exact.cast("double")),
            exact == F.lit(0),  # empty input: null estimate, 0 exact
        )

    per_day = daily.select(
        "day",
        F.col("exact").cast("long").alias("distinct_users_exact"),
        _ok(F.hll_sketch_estimate("sk"), F.col("exact")).alias("hll_within_bound"),
    )
    overall_exact = events.agg(
        F.countDistinct("user_id").alias("exact")
    )
    overall = (
        daily.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        )
        .crossJoin(F.broadcast(overall_exact))
        .select(
            F.lit(None).cast("timestamp").alias("day"),
            F.col("exact").cast("long").alias("distinct_users_exact"),
            _ok(F.col("est"), F.col("exact")).alias("hll_within_bound"),
        )
    )
    return per_day.unionByName(overall)


@register(
    "theta_sketch_setops",
    # Promoted rows-only -> oracle in r6 (r5 VERDICT ask #2, same
    # below-capacity argument as approx_topk_event_types): a theta sketch
    # stays in EXACT mode until it retains more than its nominal 4096
    # entries, and every fixture SF tops out at 1500 distinct users — so
    # estimate(), union, intersection and difference all return the exact
    # set cardinalities (verified bit-exact at sf0.001/0.01/0.1) and the
    # oracle is plain COUNT DISTINCT set algebra.  At 100 TB the same
    # query degrades gracefully to ~1.6% estimates past capacity — which
    # is exactly the regime documented in the docstring.
    oracle="""
    -- type selection runs on the SAME identified-user universe the
    -- sketches aggregate (r12 ADVICE): a lexicographically-early type
    -- occurring only on anonymous (NULL user_id) traffic must not be
    -- chosen here and then aggregate to an empty sketch on the Spark
    -- side.  NULL event_type is excluded symmetrically (a NULL type is
    -- not a type; Spark orders NULLS FIRST, DuckDB NULLS LAST).
    WITH t2 AS (
        SELECT event_type FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        GROUP BY event_type
        ORDER BY event_type LIMIT 2
    ),
    ab AS (SELECT MIN(event_type) AS ta, MAX(event_type) AS tb FROM t2),
    -- identified users only (r11 null-FK sweep): sketch updates SKIP a
    -- NULL key while DISTINCT keeps it and NOT IN goes three-valued
    ua AS (SELECT DISTINCT e.user_id FROM events e, ab
           WHERE e.event_type = ab.ta AND e.user_id IS NOT NULL),
    ub AS (SELECT DISTINCT e.user_id FROM events e, ab
           WHERE e.event_type = ab.tb AND e.user_id IS NOT NULL)
    SELECT ab.ta AS type_a, ab.tb AS type_b,
           -- no qualifying types (e.g. 100% anonymous traffic): there is
           -- no sketch, so every estimate is NULL — matching Spark's
           -- theta_sketch_estimate(NULL) (r12 NULL-heavy sweep)
           CASE WHEN ab.ta IS NULL THEN NULL ELSE
               CAST((SELECT COUNT(*) FROM ua) AS BIGINT) END AS distinct_a,
           CASE WHEN ab.ta IS NULL THEN NULL ELSE
               CAST((SELECT COUNT(*) FROM ub) AS BIGINT) END AS distinct_b,
           CASE WHEN ab.ta IS NULL THEN NULL ELSE
               CAST((SELECT COUNT(*) FROM (SELECT user_id FROM ua
                                           UNION SELECT user_id FROM ub))
                    AS BIGINT) END AS union_est,
           CASE WHEN ab.ta IS NULL THEN NULL ELSE
               CAST((SELECT COUNT(*) FROM ua
                     WHERE user_id IN (SELECT user_id FROM ub))
                    AS BIGINT) END AS inter_est,
           CASE WHEN ab.ta IS NULL THEN NULL ELSE
               CAST((SELECT COUNT(*) FROM ua
                     WHERE user_id NOT IN (SELECT user_id FROM ub))
                    AS BIGINT) END AS a_minus_b_est
    FROM ab
    """,
    doc="Theta sketch set algebra (theta_sketch_agg / union / intersection / "
    "difference): distinct-user estimates for two event types plus their "
    "union, overlap, and A-minus-B — the sketch family that answers "
    "audience-overlap questions at 100 TB without a distinct-join.",
)
def theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why theta over HLL here: HLL only unions; theta sketches support
    intersection and difference, so 'users who did A and B' never needs
    the raw data again.  Build is one partial-aggregated groupBy (a few
    KB per sketch); every set operation is driver-cheap scalar algebra
    on two binary values.  The two event types are the lexicographic
    first two — deterministic without data-dependent constants."""
    # identified users only — see the oracle note (r11 null-FK sweep);
    # the TYPE pick also runs on this filtered universe so both engines
    # choose from the same set (r12 ADVICE), and NULL types are excluded
    # symmetrically (Spark sorts NULLS FIRST, DuckDB NULLS LAST)
    events = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    types = (
        events.filter(F.col("event_type").isNotNull())
        .select("event_type")
        .distinct()
        .orderBy("event_type")
        .limit(2)
    )
    sks = (
        events.join(F.broadcast(types), "event_type", "left_semi")
        .groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
    )
    two = sks.agg(
        F.min_by("event_type", "event_type").alias("type_a"),
        F.max_by("event_type", "event_type").alias("type_b"),
        F.min_by("sk", "event_type").alias("sk_a"),
        F.max_by("sk", "event_type").alias("sk_b"),
    )
    est = F.theta_sketch_estimate
    return two.select(
        "type_a",
        "type_b",
        F.round(est("sk_a"), 1).alias("distinct_a"),
        F.round(est("sk_b"), 1).alias("distinct_b"),
        F.round(est(F.theta_union("sk_a", "sk_b")), 1).alias("union_est"),
        F.round(est(F.theta_intersection("sk_a", "sk_b")), 1).alias("inter_est"),
        F.round(est(F.theta_difference("sk_a", "sk_b")), 1).alias("a_minus_b_est"),
    )


QSK_BUCKETS = 64


@register(
    "bucketed_quantile_estimates",
    oracle=f"""
    WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
    cnts AS (
        -- hi = lo guard (r10 const-values sweep): a single-valued
        -- distribution has zero bucket width; everything lands in bucket
        -- 1 and every quantile reads back lo (est = lo + 0 * width)
        SELECT event_type,
               CASE WHEN hi = lo THEN 1
                    ELSE LEAST({QSK_BUCKETS}, CAST(floor((value - lo)
                         / ((hi - lo) / {QSK_BUCKETS})) AS BIGINT) + 1)
               END AS bucket,
               COUNT(*) AS cnt
        FROM events, b GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, bucket,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM cnts
    ),
    qs AS (SELECT * FROM (VALUES (50), (90), (99)) t(pct)),
    hit AS (
        SELECT event_type, pct, CAST(MIN(bucket) AS BIGINT) AS bucket
        FROM cum, qs WHERE 100 * cum >= pct * n
        GROUP BY 1, 2
    )
    SELECT event_type, pct,
           lo + (bucket - 1) * ((hi - lo) / {QSK_BUCKETS}) AS est
    FROM hit, b
    """,
    doc="Mergeable bucketed-quantile sketch: 64 equi-width counters per "
    "event_type; p50/p90/p99 read off the cumulative histogram — the "
    "fixed-memory quantile state that merges by plain SUM.",
)
def bucketed_quantile_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why relational buckets and not percentile_approx: the counter rows
    ARE the sketch — persist per-partition/day histograms (64 rows each),
    merge any subset later by SUM, and read any quantile without
    rescanning raw data (same mergeable-value argument as
    hll_sketch_union; approx_percentile's binary state is not SQL-
    mergeable).  Build is one keyed agg; quantile extraction is a window
    cumsum over <=64 rows per group.  Integer crossing test (100*cum >=
    pct*n) and a mirrored float edge expression keep both engines
    bit-identical."""
    events = table(spark, sf_dir, "events")
    b = events.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    cnts = (
        events.crossJoin(F.broadcast(b))
        .select(
            "event_type",
            # hi = lo guard (see oracle): constant distribution -> bucket 1
            F.when(F.col("hi") == F.col("lo"), F.lit(1).cast("long"))
            .otherwise(
                F.least(
                    F.lit(QSK_BUCKETS).cast("long"),
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / F.lit(QSK_BUCKETS))
                    )
                    + 1,
                )
            ).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    wo = Window.partitionBy("event_type").orderBy("bucket")
    wall = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = cnts.select(
        "event_type",
        "bucket",
        F.sum("cnt").over(wo).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    qs = F.explode(F.array(*[F.lit(p) for p in (50, 90, 99)])).alias("pct")
    hit = (
        cum.select("event_type", "bucket", "cum", "n", qs)
        .filter(F.lit(100) * F.col("cum") >= F.col("pct") * F.col("n"))
        .groupBy("event_type", "pct")
        .agg(F.min("bucket").cast("long").alias("bucket"))
    )
    return hit.crossJoin(F.broadcast(b)).select(
        "event_type",
        "pct",
        (
            F.col("lo")
            + (F.col("bucket") - 1)
            * ((F.col("hi") - F.col("lo")) / F.lit(QSK_BUCKETS))
        ).alias("est"),
    )


@register(
    "cms_join_cardinality",
    # Promoted rows-only -> oracle in r6 (r5 VERDICT ask #2c): the dot-
    # product estimate is xxhash64-family-specific, but its two guarantees
    # are invariant-checkable — overestimate-only (deterministic: bucket
    # collisions only add cross terms) and the expectation bound
    # est <= exact + e*N_o*N_l/WIDTH (observed margin ~2.7x under the
    # bound at every fixture SF).  DuckDB replays the exact join size and
    # both input counts; the booleans ride along.
    oracle="""
    SELECT CAST((SELECT COUNT(*) FROM orders o
                 JOIN lineitem l ON l.l_orderkey = o.o_orderkey) AS BIGINT)
               AS exact_join_size,
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_orders,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_lineitem,
           TRUE AS est_ge_exact, TRUE AS est_within_bound
    """,
    doc="Join-size estimation from Count-Min sketches: |orders JOIN "
    "lineitem| estimated as min over depths of the bucket-count dot "
    "product — the optimizer-style cardinality estimate computed from "
    "two constant-size sketches, invariant-checked against the exact "
    "count.",
)
def cms_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why it matters at 100 TB: join reordering / broadcast decisions
    need |A ⋈ B| BEFORE running the join; two CMS sketches (DEPTH×WIDTH
    counters each, built in one pass per table) give an overestimate-only
    bound via Σ_b cms_A[d,b]·cms_B[d,b], minimized over depths — no
    shuffle of the join keys at all.  The exact count (one real join)
    rides along as ground truth; the error-bound unit test asserts
    estimate >= exact and estimate <= exact + e·N_A·N_B/WIDTH."""
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("token")
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("token")
    )
    cms_o = cms_build(orders).withColumnRenamed("cnt", "cnt_o")
    cms_l = cms_build(li).withColumnRenamed("cnt", "cnt_l")
    est = (
        cms_o.join(cms_l, ["depth", "bucket"])
        .groupBy("depth")
        .agg(F.sum(F.col("cnt_o") * F.col("cnt_l")).alias("dot"))
        .agg(F.min("dot").alias("est_join_size"))
    )
    n_o = table(spark, sf_dir, "orders").count()
    n_l = table(spark, sf_dir, "lineitem").count()
    exact = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .join(
            table(spark, sf_dir, "lineitem").select(
                F.col("l_orderkey").alias("o_orderkey")
            ),
            "o_orderkey",
        )
        .count()
    )
    bound = CMS_E * n_o * n_l / CMS_WIDTH
    return est.select(
        F.lit(exact).cast("long").alias("exact_join_size"),
        F.lit(n_o).cast("long").alias("n_orders"),
        F.lit(n_l).cast("long").alias("n_lineitem"),
        (F.col("est_join_size") >= F.lit(exact)).alias("est_ge_exact"),
        (
            (F.col("est_join_size") - F.lit(exact)).cast("double") <= F.lit(bound)
        ).alias("est_within_bound"),
    )


APPROX_TOPK_K = 5


@register(
    "approx_topk_event_types",
    oracle=f"""
    WITH c AS (
        SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type
    ),
    r AS (
        SELECT item, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, item) AS rnk
        FROM c
    )
    SELECT rnk, item, cnt FROM r WHERE rnk <= {APPROX_TOPK_K}
    """,
    doc=f"approx_top_k sketch aggregate: top-{APPROX_TOPK_K} event types "
    "exploded to rows and deterministically re-ranked; exact (and "
    "oracle-checkable) at this key cardinality.",
)
def approx_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine-native heavy-hitters aggregate (approx_top_k) beside the
    hand-built CMS (``cms_heavy_hitters``): one JVM sketch per partition
    merged at the driver side of the agg, constant memory, one pass.
    Below the sketch's internal capacity the counts are exact, so on a
    bounded-cardinality key it is hash-checkable against the exact
    GROUP BY — which is precisely the regime where you'd trust it at
    100 TB (hot-key monitoring over a few thousand types).  The exploded
    rows are re-ranked by (count DESC, item) so tie order never depends
    on sketch internals.
    """
    ev = table(spark, sf_dir, "events")
    sk = ev.agg(
        F.expr(f"approx_top_k(event_type, {APPROX_TOPK_K})").alias("tk")
    ).select(F.explode("tk").alias("e"))
    flat = sk.select(
        F.col("e.item").alias("item"), F.col("e.count").cast("long").alias("cnt")
    )
    w = Window.orderBy(F.col("cnt").desc(), "item")
    return flat.withColumn("rnk", F.row_number().over(w)).select("rnk", "item", "cnt")
