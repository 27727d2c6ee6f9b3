"""Model / data-quality evaluation metrics over the labeled embeddings and
events tables — the measurement layer every curation loop needs before it
trusts a classifier gate or a retrieval index: ROC-AUC for binary quality
classifiers, NDCG@k for retrieval, calibration (reliability bins) for
score-threshold picking, and mutual information for feature screening.

Scale shapes: every metric here reduces to (1) a bounded-cardinality
aggregation (score bins, label cells) followed by a window/agg over that
tiny table, or (2) a reuse of the already-bounded k-NN top-k. Nothing
shuffles the corpus more than once, and no unpartitioned window ever sees
more than a few thousand rows (bin-bounded by construction).

Reference parity: the reference pipeline (fetch_articles.py) has no eval
layer; these belong to the SURVEY §2b "engine capability" surface a
100 TB training-data pipeline needs (classifier-gate audits a la
fasttext-quality filters, retrieval eval for dedup/decontamination
indexes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.operators.similarity import (
    KNN_K,
    KNN_QUERY_MOD,
    knn_bruteforce_topk,
    sql_cosine_domain,
)
from azure_func_forem_data_etl_spark.sources.tables import (
    SQL_EMB_CANON,
    entity_table,
    entity_table_pinned,
    table,
)

#: Positive class for the binary metrics: label == 0 ("keep" class).
POS_LABEL = 0

#: AUC score-binning width exponent: scores round to 4dp before ranking.
#: This bounds the distinct-score table at (range / 1e-4) rows regardless
#: of corpus size — the standard sketched-AUC trade (mllib's
#: BinaryClassificationMetrics bins the same way); with ~20k bins the
#: binned AUC differs from exact by < 1e-4 absolute.
AUC_BIN_DECIMALS = 4

#: Calibration: logistic link steepness mapping the raw score to (0, 1).
CAL_STEEPNESS = 4.0

#: Fixed value-bucket edges for the events MI cells (quartile-ish at the
#: generator's distribution, but FIXED so both engines bucket identically
#: — NTILE would tie-break nondeterministically across engines).
MI_EDGES = (15.0, 35.0, 70.0)


@register(
    "eval_roc_auc",
    oracle=f"""
    WITH scored AS (
        SELECT round(embedding[1], {AUC_BIN_DECIMALS}) + 0.0 AS score_b,
               CAST(label = {POS_LABEL} AS INT) AS is_pos
        FROM embeddings
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    ),
    bins AS (
        SELECT score_b,
               COUNT(*) AS n,
               SUM(is_pos) AS n_pos,
               COUNT(*) - SUM(is_pos) AS n_neg
        FROM scored GROUP BY score_b
    ),
    cum AS (
        SELECT n_pos, n_neg,
               COALESCE(SUM(n_neg) OVER (
                   ORDER BY score_b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS neg_below
        FROM bins
    )
    SELECT round(SUM(n_pos * (neg_below + n_neg / 2.0))
                 / (SUM(n_pos) * SUM(n_neg)), 6) AS auc,
           CAST(SUM(n_pos) AS BIGINT) AS n_pos,
           CAST(SUM(n_neg) AS BIGINT) AS n_neg
    FROM cum
    -- degenerate contract (r10 single-class sweep): AUC needs BOTH
    -- classes present — no rows otherwise, both engines
    HAVING SUM(n_pos) > 0 AND SUM(n_neg) > 0
    """,
    doc="Binned ROC-AUC (pairwise win-rate form) for the label-0-vs-rest "
    "classifier score, tie-aware (ties count 1/2).",
)
def eval_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC via the pairwise formulation: AUC = P(score_pos > score_neg)
    + 0.5 * P(tie), computed from score-binned counts.

    Scale shape: one corpus scan aggregates into <= ~20k score bins
    (4dp rounding bounds the bin count by the score range, not the row
    count); the cumulative window then runs on that tiny table, so the
    plan is scan -> partial agg -> 20k-row window -> 1-row agg. The
    classic "sort all N scores" AUC shuffle never happens — this is how
    AUC stays a single cheap pass at 100 TB.
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    scored = emb.select(
        F.element_at("embedding", 1).cast("double").alias("score"),
        (F.col("label") == POS_LABEL).cast("int").alias("is_pos"),
    )
    return binned_auc(scored)


def binned_auc(scored: DataFrame, decimals: int = AUC_BIN_DECIMALS) -> DataFrame:
    """Tie-aware binned ROC-AUC over a (score double, is_pos int) relation;
    see ``eval_roc_auc`` for the scale rationale."""
    bins = (
        scored.select(
            # + 0.0: a tiny-negative score rounds to -0.0 here and +0.0
            # on the oracle's path (r11 combined-extremes probe)
            (F.round(F.col("score"), decimals) + F.lit(0.0)).alias("score_b"),
            "is_pos",
        )
        .groupBy("score_b")
        .agg(
            F.count("*").alias("n"),
            F.sum("is_pos").alias("n_pos"),
            (F.count("*") - F.sum("is_pos")).alias("n_neg"),
        )
    )
    # ~20k rows max: the unpartitioned window is bin-bounded, not corpus-bounded.
    w = Window.orderBy("score_b").rowsBetween(Window.unboundedPreceding, -1)
    cum = bins.withColumn("neg_below", F.coalesce(F.sum("n_neg").over(w), F.lit(0)))
    agg = cum.agg(
        F.sum(
            F.col("n_pos") * (F.col("neg_below") + F.col("n_neg") / F.lit(2.0))
        ).alias("u"),
        F.sum("n_pos").alias("n_pos"),
        F.sum("n_neg").alias("n_neg"),
    )
    # degenerate contract (see oracle): AUC needs both classes present
    agg = agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    return agg.select(
        F.round(F.col("u") / (F.col("n_pos") * F.col("n_neg")), 6).alias("auc"),
        "n_pos",
        "n_neg",
    )


@register(
    "eval_ndcg_at_k",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe, label AS qlabel
        -- canonical vector-store grain (r13 dup-entity leg)
        FROM {SQL_EMB_CANON} embeddings WHERE vec_id % {KNN_QUERY_MOD} = 0
          -- zero vectors excluded: cosine undefined (r10 sweep contract)
          AND {sql_cosine_domain("embedding::DOUBLE[]")}
    ),
    s AS (
        SELECT q.query_id, q.qlabel, c.vec_id AS neighbor_id, c.label AS nlabel,
               round(list_cosine_similarity(qe, c.embedding::DOUBLE[]), 6) AS cos_sim
        FROM q, {SQL_EMB_CANON} c
        WHERE c.vec_id <> q.query_id
          AND {sql_cosine_domain("c.embedding::DOUBLE[]")}
    ),
    r AS (
        SELECT query_id, neighbor_id, cos_sim,
               CAST(qlabel = nlabel AS INT) AS rel,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
               ) AS rnk
        FROM s
    ),
    topk AS (SELECT * FROM r WHERE rnk <= {KNN_K}),
    ideal AS (
        SELECT query_id, rel, rnk,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY rel DESC, rnk
               ) AS ideal_rnk
        FROM topk
    )
    SELECT query_id,
           CAST(SUM(rel) AS BIGINT) AS n_rel,
           round(SUM(rel / log2(rnk + 1.0)), 6) AS dcg,
           round(SUM(rel / log2(ideal_rnk + 1.0)), 6) AS idcg,
           CASE WHEN SUM(rel) = 0 THEN 0.0
                ELSE round(SUM(rel / log2(rnk + 1.0))
                           / SUM(rel / log2(ideal_rnk + 1.0)), 6)
           END AS ndcg
    FROM ideal
    GROUP BY query_id
    """,
    doc=f"NDCG@{KNN_K} of exact-kNN retrieval against label agreement as "
    "graded relevance, IDCG over the retrieved set.",
)
def eval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval: run the bounded exact k-NN (same query
    sample and top-k as ``knn_bruteforce``), grade each retrieved
    neighbor by label agreement with its query, and score per-query
    NDCG@k (IDCG normalizes over the retrieved set's relevance
    multiset — the usual "ideal reordering" convention).

    Scale shape: everything after the k-NN reuse is windows/aggs over
    queries x k rows (bounded by the kNN query cap), i.e. free. The only
    heavy stage is the k-NN itself, which is the already-audited
    broadcast-query scan.
    """
    # canonical vector-store grain (r13 dup-entity leg; oracle mirrors)
    emb = entity_table_pinned(spark, sf_dir, "embeddings")
    topk = knn_bruteforce_topk(emb)
    labels = emb.select("vec_id", "label")
    g = (
        topk.join(
            labels.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
                "label", "qlabel"
            ),
            "query_id",
        )
        .join(
            labels.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed(
                "label", "nlabel"
            ),
            "neighbor_id",
        )
        .withColumn("rel", (F.col("qlabel") == F.col("nlabel")).cast("int"))
    )
    w_ideal = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col("rnk"))
    g = g.withColumn("ideal_rnk", F.row_number().over(w_ideal))
    dcg = F.sum(F.col("rel") / F.log2(F.col("rnk") + F.lit(1.0)))
    idcg = F.sum(F.col("rel") / F.log2(F.col("ideal_rnk") + F.lit(1.0)))
    return g.groupBy("query_id").agg(
        F.sum("rel").alias("n_rel"),
        F.round(dcg, 6).alias("dcg"),
        F.round(idcg, 6).alias("idcg"),
        F.when(F.sum("rel") == 0, F.lit(0.0))
        .otherwise(F.round(dcg / idcg, 6))
        .alias("ndcg"),
    )


@register(
    "eval_calibration_bins",
    oracle=f"""
    WITH scored AS (
        SELECT 1.0 / (1.0 + exp(-{CAL_STEEPNESS} * embedding[1])) AS p,
               CAST(label = {POS_LABEL} AS INT) AS is_pos
        FROM embeddings
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    )
    SELECT LEAST(CAST(floor(p * 10) AS INT), 9) AS bin,
           COUNT(*) AS n_rows,
           round(CAST(SUM(CAST(round(p, 6) AS DECIMAL(18, 6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_p,
           round(SUM(is_pos) / CAST(COUNT(*) AS DOUBLE), 6) AS frac_pos
    FROM scored
    GROUP BY 1
    """,
    doc="Reliability diagram: decile bins of the logistic-linked score vs "
    "observed positive rate (per-bin ECE inputs).",
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit for a quality-classifier gate: map the raw score
    through a logistic link, bucket predictions into 10 fixed probability
    bins, and compare mean predicted probability to the observed positive
    rate per bin — the reliability-diagram table (and the per-bin inputs
    to ECE).

    Determinism note: mean-of-doubles is order-dependent in IEEE float,
    so the predicted probabilities are rounded to 6dp and summed as
    DECIMAL(18,6) (exact, associative) before dividing — both engines
    then agree bit-for-bit.

    Scale shape: map-only scoring + a 10-cell hash aggregation; one scan,
    one tiny shuffle.
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    p = 1.0 / (1.0 + F.exp(-CAL_STEEPNESS * F.element_at("embedding", 1).cast("double")))
    scored = emb.select(
        p.alias("p"), (F.col("label") == POS_LABEL).cast("int").alias("is_pos")
    )
    return (
        scored.groupBy(
            F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.round(
                F.sum(F.round(F.col("p"), 6).cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_p"),
            F.round(F.sum("is_pos") / F.count("*").cast("double"), 6).alias("frac_pos"),
        )
    )


@register(
    "eval_mutual_information",
    oracle=f"""
    WITH cells AS (
        SELECT event_type,
               CASE WHEN value < {MI_EDGES[0]} THEN 0
                    WHEN value < {MI_EDGES[1]} THEN 1
                    WHEN value < {MI_EDGES[2]} THEN 2
                    ELSE 3 END AS value_bucket,
               COUNT(*) AS n_xy
        FROM events
        GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n_xy) AS n FROM cells),
    marg AS (
        SELECT c.event_type, c.value_bucket, c.n_xy,
               SUM(c.n_xy) OVER (PARTITION BY c.event_type) AS n_x,
               SUM(c.n_xy) OVER (PARTITION BY c.value_bucket) AS n_y,
               t.n
        FROM cells c, tot t
    )
    SELECT event_type, value_bucket, n_xy,
           round(ln((n_xy * CAST(n AS DOUBLE)) / (n_x * CAST(n_y AS DOUBLE))), 6)
               AS pmi,
           round((n_xy / CAST(n AS DOUBLE))
                 * ln((n_xy * CAST(n AS DOUBLE)) / (n_x * CAST(n_y AS DOUBLE))), 6)
               AS mi_contrib
    FROM marg
    """,
    doc="Mutual-information cells between event_type and fixed value "
    "buckets: per-cell PMI and MI contribution (feature screening).",
)
def eval_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-screening MI: how much does knowing the event type tell you
    about the value bucket? Emits the full PMI cell table (the MI scalar
    is the sum of ``mi_contrib``) so dependent cells are inspectable.

    Buckets use FIXED edges, not NTILE: quantile bucketing tie-breaks
    nondeterministically across engines and reshuffles the corpus; fixed
    edges are a map-side expression.

    Scale shape: one scan into a (types x 4)-cell aggregate; windows for
    the marginals run over that tiny cell table. The 1-row total joins
    back by broadcast (cross join of a 1-row side stays a broadcast
    nested loop of constant size).
    """
    ev = table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < MI_EDGES[0], 0)
        .when(F.col("value") < MI_EDGES[1], 1)
        .when(F.col("value") < MI_EDGES[2], 2)
        .otherwise(3)
    )
    cells = (
        ev.select("event_type", bucket.alias("value_bucket"))
        .groupBy("event_type", "value_bucket")
        .agg(F.count("*").alias("n_xy"))
    )
    marg = cells.withColumn(
        "n_x", F.sum("n_xy").over(Window.partitionBy("event_type"))
    ).withColumn("n_y", F.sum("n_xy").over(Window.partitionBy("value_bucket")))
    tot = cells.agg(F.sum("n_xy").alias("n"))
    m = marg.crossJoin(F.broadcast(tot))
    ratio = (F.col("n_xy") * F.col("n").cast("double")) / (
        F.col("n_x") * F.col("n_y").cast("double")
    )
    return m.select(
        "event_type",
        "value_bucket",
        "n_xy",
        F.round(F.log(ratio), 6).alias("pmi"),
        F.round((F.col("n_xy") / F.col("n").cast("double")) * F.log(ratio), 6).alias(
            "mi_contrib"
        ),
    )


#: Decision thresholds swept for the PR table (probability grid).
PR_THRESHOLDS = tuple(round(0.1 * i, 1) for i in range(2, 9))  # 0.2 .. 0.8


@register(
    "eval_pr_threshold_sweep",
    oracle=f"""
    WITH scored AS (
        SELECT 1.0 / (1.0 + exp(-{CAL_STEEPNESS} * embedding[1])) AS p,
               CAST(label = {POS_LABEL} AS INT) AS is_pos
        FROM embeddings
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    ),
    t AS (
        SELECT unnest(ARRAY[{", ".join(str(t) for t in PR_THRESHOLDS)}]) AS thr
    )
    SELECT thr,
           CAST(COUNT(*) FILTER (WHERE p >= thr AND is_pos = 1) AS BIGINT) AS tp,
           CAST(COUNT(*) FILTER (WHERE p >= thr AND is_pos = 0) AS BIGINT) AS fp,
           CAST(COUNT(*) FILTER (WHERE p < thr AND is_pos = 1) AS BIGINT) AS fn,
           round(COUNT(*) FILTER (WHERE p >= thr AND is_pos = 1)
                 / CAST(GREATEST(COUNT(*) FILTER (WHERE p >= thr), 1) AS DOUBLE),
                 6) AS precision_,
           round(COUNT(*) FILTER (WHERE p >= thr AND is_pos = 1)
                 / CAST(GREATEST(COUNT(*) FILTER (WHERE is_pos = 1), 1) AS DOUBLE),
                 6) AS recall_
    FROM scored CROSS JOIN t
    GROUP BY thr
    """,
    doc="Precision/recall sweep over 7 decision thresholds of the "
    "logistic-linked score — the operating-point table behind choosing "
    "a classifier gate cut-off.",
)
def eval_pr_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which gate threshold to ship?  One corpus scan fans each row out
    to the |thresholds| cells it contributes to (explode of a constant
    array — map-side, bounded fanout), then a 7-row aggregate computes
    confusion counts and precision/recall per operating point.  The
    integer-ratio divisions keep both engines bit-identical.

    Scale shape: fanout x7 happens before the partial aggregation, so
    shuffle volume is |thresholds| x partitions tiny partials — the
    sweep costs one pass no matter how many thresholds.
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    p = 1.0 / (1.0 + F.exp(-CAL_STEEPNESS * F.element_at("embedding", 1).cast("double")))
    scored = emb.select(
        p.alias("p"), (F.col("label") == POS_LABEL).cast("int").alias("is_pos")
    )
    thr = F.explode(F.array(*[F.lit(t) for t in PR_THRESHOLDS])).alias("thr")
    fan = scored.select("p", "is_pos", thr)
    pred_pos = F.col("p") >= F.col("thr")
    tp = F.sum(F.when(pred_pos & (F.col("is_pos") == 1), 1).otherwise(0))
    fp = F.sum(F.when(pred_pos & (F.col("is_pos") == 0), 1).otherwise(0))
    fn = F.sum(F.when(~pred_pos & (F.col("is_pos") == 1), 1).otherwise(0))
    return fan.groupBy("thr").agg(
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        F.round(tp / F.greatest(tp + fp, F.lit(1)).cast("double"), 6).alias(
            "precision_"
        ),
        F.round(tp / F.greatest(tp + fn, F.lit(1)).cast("double"), 6).alias("recall_"),
    )


# --- round 7: Brier decomposition, MAP@k, two-proportion A/B z-test --------


@register(
    "eval_brier_decomposition",
    oracle=f"""
    WITH scored AS (
        SELECT CAST(round(1.0 / (1.0 + exp(-{CAL_STEEPNESS} * embedding[1])), 6)
                    AS DECIMAL(8,6)) AS p6,
               CAST(label = {POS_LABEL} AS INT) AS y
        FROM embeddings
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    ),
    bins AS (
        SELECT LEAST(CAST(floor(CAST(p6 AS DOUBLE) * 10) AS INT), 9) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_b,
               SUM(p6) AS sp_b,
               CAST(SUM(y) AS BIGINT) AS ny_b,
               SUM((p6 - y) * (p6 - y)) AS sq_b
        FROM scored GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n_b) AS BIGINT) AS n,
               CAST(SUM(ny_b) AS BIGINT) AS ny,
               CAST(SUM(sq_b) AS DOUBLE) AS sq
        FROM bins
    ),
    parts AS (
        SELECT t.n, t.ny, t.sq,
               CAST(round(b.n_b * (CAST(b.sp_b AS DOUBLE) / b.n_b
                                   - CAST(b.ny_b AS DOUBLE) / b.n_b)
                               * (CAST(b.sp_b AS DOUBLE) / b.n_b
                                   - CAST(b.ny_b AS DOUBLE) / b.n_b), 8)
                    AS DECIMAL(18,8)) AS rel_i,
               CAST(round(b.n_b * (CAST(b.ny_b AS DOUBLE) / b.n_b
                                   - CAST(t.ny AS DOUBLE) / t.n)
                               * (CAST(b.ny_b AS DOUBLE) / b.n_b
                                   - CAST(t.ny AS DOUBLE) / t.n), 8)
                    AS DECIMAL(18,8)) AS res_i
        FROM bins b, tot t
    )
    SELECT MAX(n) AS n_rows,
           round(sq / MAX(n), 6) AS brier,
           round(CAST(SUM(rel_i) AS DOUBLE) / MAX(n), 6) AS reliability,
           round(CAST(SUM(res_i) AS DOUBLE) / MAX(n), 6) AS resolution,
           round((CAST(MAX(ny) AS DOUBLE) / MAX(n))
                 * (1 - CAST(MAX(ny) AS DOUBLE) / MAX(n)), 6) AS uncertainty
    FROM parts
    GROUP BY sq
    """,
    doc="Brier score with Murphy decomposition (reliability - resolution "
    "+ uncertainty) over the 10 calibration bins.",
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar companion to eval_calibration_bins: the Brier score says how
    good the probabilities are; Murphy's decomposition says WHY (badly
    calibrated vs simply unresolving).  Probabilities are 6dp-quantized
    at the source, so the per-row squared-error sum is an exact decimal
    aggregation; the bin-level reliability/resolution terms are
    8dp-quantized before their 10-row sum.  One scan, 10-cell rollup.
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    p = 1.0 / (1.0 + F.exp(-CAL_STEEPNESS * F.element_at("embedding", 1).cast("double")))
    scored = emb.select(
        F.round(p, 6).cast("decimal(8,6)").alias("p6"),
        (F.col("label") == POS_LABEL).cast("int").alias("y"),
    )
    bins = scored.groupBy(
        F.least(F.floor(F.col("p6").cast("double") * 10).cast("int"), F.lit(9)).alias(
            "bin"
        )
    ).agg(
        F.count("*").alias("n_b"),
        F.sum("p6").alias("sp_b"),
        F.sum("y").alias("ny_b"),
        F.sum((F.col("p6") - F.col("y")) * (F.col("p6") - F.col("y"))).alias("sq_b"),
    ).localCheckpoint(eager=True)  # 10-row rollup shared by tot and parts
    tot = bins.agg(
        F.sum("n_b").alias("n"),
        F.sum("ny_b").alias("ny"),
        F.sum("sq_b").cast("double").alias("sq"),
    )
    pb = F.col("sp_b").cast("double") / F.col("n_b")
    yb = F.col("ny_b").cast("double") / F.col("n_b")
    ybar = F.col("ny").cast("double") / F.col("n")
    parts = bins.crossJoin(F.broadcast(tot)).select(
        "n",
        "ny",
        "sq",
        F.round(F.col("n_b") * (pb - yb) * (pb - yb), 8)
        .cast("decimal(18,8)")
        .alias("rel_i"),
        F.round(F.col("n_b") * (yb - ybar) * (yb - ybar), 8)
        .cast("decimal(18,8)")
        .alias("res_i"),
    )
    return parts.groupBy("sq").agg(
        F.max("n").alias("n_rows"),
        F.round(F.col("sq") / F.max("n"), 6).alias("brier"),
        F.round(F.sum("rel_i").cast("double") / F.max("n"), 6).alias("reliability"),
        F.round(F.sum("res_i").cast("double") / F.max("n"), 6).alias("resolution"),
        F.round(
            (F.max("ny").cast("double") / F.max("n"))
            * (1 - F.max("ny").cast("double") / F.max("n")),
            6,
        ).alias("uncertainty"),
    ).drop("sq")


@register(
    "eval_map_at_k",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe, label AS qlabel
        -- canonical vector-store grain (r13 dup-entity leg)
        FROM {SQL_EMB_CANON} embeddings WHERE vec_id % {KNN_QUERY_MOD} = 0
          -- zero vectors excluded: cosine undefined (r10 sweep contract)
          AND {sql_cosine_domain("embedding::DOUBLE[]")}
    ),
    s AS (
        SELECT q.query_id, q.qlabel, c.vec_id AS neighbor_id, c.label AS nlabel,
               round(list_cosine_similarity(qe, c.embedding::DOUBLE[]), 6) AS cos_sim
        FROM q, {SQL_EMB_CANON} c
        WHERE c.vec_id <> q.query_id
          AND {sql_cosine_domain("c.embedding::DOUBLE[]")}
    ),
    r AS (
        SELECT query_id, CAST(qlabel = nlabel AS INT) AS rel,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
               ) AS rnk
        FROM s
    ),
    topk AS (
        SELECT query_id, rel, rnk,
               SUM(rel) OVER (PARTITION BY query_id ORDER BY rnk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rel
        FROM r WHERE rnk <= {KNN_K}
    )
    SELECT query_id,
           CAST(SUM(rel) AS BIGINT) AS n_rel,
           CASE WHEN SUM(rel) = 0 THEN 0.0
                ELSE round(CAST(SUM(CAST(round(rel * (cum_rel
                                / CAST(rnk AS DOUBLE)), 10) AS DECIMAL(18,10)))
                           AS DOUBLE) / SUM(rel), 6)
           END AS ap
    FROM topk
    GROUP BY query_id
    """,
    doc=f"Mean-average-precision@{KNN_K} inputs: per-query AP of exact-kNN "
    "retrieval with label agreement as relevance (normalized by retrieved "
    "relevant count).",
)
def eval_map_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive retrieval eval alongside eval_ndcg_at_k: AP rewards
    putting the relevant neighbors FIRST (precision-at-each-hit), where
    NDCG's log discount is gentler.  Reuses the bounded exact-kNN top-k;
    everything after is windows over queries x k rows.  Per-hit
    precision terms are 10dp-quantized before the per-query decimal sum,
    so the AP is order-independent.
    """
    # canonical vector-store grain (r13 dup-entity leg; oracle mirrors)
    emb = entity_table_pinned(spark, sf_dir, "embeddings")
    topk = knn_bruteforce_topk(emb)
    labels = emb.select("vec_id", "label")
    g = (
        topk.join(
            labels.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
                "label", "qlabel"
            ),
            "query_id",
        )
        .join(
            labels.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed(
                "label", "nlabel"
            ),
            "neighbor_id",
        )
        .withColumn("rel", (F.col("qlabel") == F.col("nlabel")).cast("int"))
    )
    w_cum = (
        Window.partitionBy("query_id")
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = g.withColumn("cum_rel", F.sum("rel").over(w_cum))
    term = F.round(
        F.col("rel") * (F.col("cum_rel") / F.col("rnk").cast("double")), 10
    ).cast("decimal(18,10)")
    return g.groupBy("query_id").agg(
        F.sum("rel").alias("n_rel"),
        F.when(F.sum("rel") == 0, F.lit(0.0))
        .otherwise(F.round(F.sum(term).cast("double") / F.sum("rel"), 6))
        .alias("ap"),
    )


#: A/B split: first md5 nibble of the user id, 8/16 per arm; conversion
#: is "purchases over-represented in the user's events" (> the 1-in-5
#: base rate) — a per-user rate comparison stays non-degenerate at every
#: SF, where "any purchase at all" saturates to 100% once users have
#: dozens of events.
AB_CONV_EVENT = "purchase"
AB_Z_CRIT = 1.96


@register(
    "ab_test_proportions",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 'A' ELSE 'B' END AS variant,
               CAST(SUM(CASE WHEN event_type = '{AB_CONV_EVENT}' THEN 1
                         ELSE 0 END) * 5 > COUNT(*) AS INT) AS converted
        FROM events GROUP BY 1
    ),
    arms AS (
        SELECT CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
               CAST(SUM(CASE WHEN variant = 'A' THEN converted ELSE 0 END)
                    AS BIGINT) AS conv_a,
               CAST(SUM(CASE WHEN variant = 'B' THEN converted ELSE 0 END)
                    AS BIGINT) AS conv_b
        FROM u
    )
    SELECT n_a, n_b, conv_a, conv_b,
           round(conv_a / CAST(n_a AS DOUBLE), 6) AS p_a,
           round(conv_b / CAST(n_b AS DOUBLE), 6) AS p_b,
           round((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
                 / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                        * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat,
           CAST(abs((conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
                 / sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                        * (1 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE))
                        * (1.0 / n_a + 1.0 / n_b))) > {AB_Z_CRIT} AS INT)
               AS significant
    FROM arms
    -- degenerate contract (r11 single-row sweep): the pooled z needs
    -- BOTH arms populated and a pooled rate strictly inside (0, 1) —
    -- otherwise the variance is 0 and the stat is undefined (no rows)
    WHERE n_a > 0 AND n_b > 0
      AND conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b
    """,
    doc="Two-proportion z-test on an md5-nibble user split (pooled "
    "variance); conversion = any purchase event.",
)
def ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-analysis primitive: a reproducible hash-based user split
    (the same md5-nibble Bernoulli as deterministic_sample — any engine
    assigns identical variants) and the pooled two-proportion z.  The
    corpus collapses to per-user rows in one agg, then to a single
    4-integer row; the z and significance flag are closed-form.
    """
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == AB_CONV_EVENT, 1).otherwise(0)) * 5
            > F.count("*")
        )
        .cast("int")
        .alias("converted")
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
        )
        .otherwise("B")
        .alias("variant"),
        "converted",
    )
    arms = u.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("converted")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("variant") == "B", F.col("converted")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    p_a = F.col("conv_a") / F.col("n_a").cast("double")
    p_b = F.col("conv_b") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b")).cast(
        "double"
    )
    z = (p_a - p_b) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    # degenerate contract (see oracle): both arms present, pooled rate
    # strictly in (0, 1) — else zero variance, no rows
    arms = arms.filter(
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b"))
    )
    return arms.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > AB_Z_CRIT).cast("int").alias("significant"),
    )


@register(
    "eval_auprc",
    defer=True,
    oracle=f"""
    WITH scored AS (
        SELECT round(embedding[1], {AUC_BIN_DECIMALS}) + 0.0 AS score_b,
               CAST(label = {POS_LABEL} AS INT) AS is_pos
        FROM embeddings
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    ),
    bins AS (
        SELECT score_b, CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(is_pos) AS BIGINT) AS p_b
        FROM scored GROUP BY 1
    ),
    cum AS (
        SELECT p_b,
               SUM(n_b) OVER (ORDER BY score_b DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
               SUM(p_b) OVER (ORDER BY score_b DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
               SUM(p_b) OVER () AS tp
        FROM bins
    )
    SELECT CAST(MAX(tp) AS BIGINT) AS n_pos,
           -- CASE-guarded: the division must not evaluate at tp = 0 even
           -- though HAVING drops the group (symmetric with the Spark
           -- side, where ANSI would throw before a post-agg filter)
           CASE WHEN MAX(tp) > 0 THEN
               round(CAST(SUM(CAST(round(p_b * (cp / CAST(cn AS DOUBLE)), 10)
                                    AS DECIMAL(18,10))) AS DOUBLE)
                     / MAX(tp), 6) END AS auprc
    FROM cum
    -- degenerate contract (r11 single-row sweep): average precision is
    -- undefined with zero positives — no rows on BOTH engines
    HAVING MAX(tp) > 0
    """,
    doc="Binned average precision (AUPRC): per score bin, positives times "
    "precision-at-bin-end, normalized by total positives — same 4dp "
    "binning as eval_roc_auc.",
)
def eval_auprc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PR-curve summary scalar that eval_pr_threshold_sweep (a 9-point
    sweep) cannot give: average precision over ALL thresholds.  Scores
    bin at 4dp exactly like the AUC, ties resolved at bin granularity
    (each bin's positives credited with precision at the bin's END —
    the pessimistic tie convention, documented).  Per-bin contributions
    are 10dp-quantized before the exact decimal sum.  One scan, then
    windows over the bounded bin table.
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    scored = emb.select(
        (F.round(F.element_at("embedding", 1).cast("double"), AUC_BIN_DECIMALS) + F.lit(0.0)).alias(
            "score_b"
        ),
        (F.col("label") == POS_LABEL).cast("int").alias("is_pos"),
    )
    bins = scored.groupBy("score_b").agg(
        F.count("*").alias("n_b"), F.sum("is_pos").alias("p_b")
    )
    w_cum = Window.orderBy(F.desc("score_b")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = bins.select(
        "p_b",
        F.sum("n_b").over(w_cum).alias("cn"),
        F.sum("p_b").over(w_cum).alias("cp"),
        F.sum("p_b").over(Window.partitionBy()).alias("tp"),
    )
    term = F.round(
        F.col("p_b") * (F.col("cp") / F.col("cn").cast("double")), 10
    ).cast("decimal(18,10)")
    # degenerate contract (see oracle): zero positives => AP undefined.
    # The division is CASE-guarded — ANSI evaluates the agg projection
    # before any post-agg filter could drop the row.
    return cum.agg(
        F.max("tp").alias("n_pos"),
        F.when(
            F.max("tp") > 0,
            F.round(F.sum(term).cast("double") / F.max("tp"), 6),
        ).alias("auprc"),
    ).filter(F.col("n_pos") > 0)


LIFT_N_BUCKETS = 10


@register(
    "eval_lift_table",
    defer=True,
    oracle=f"""
    WITH scored AS (
        SELECT vec_id, round(embedding[1], {AUC_BIN_DECIMALS}) + 0.0 AS score_b,
               CAST(label = {POS_LABEL} AS INT) AS is_pos
        FROM embeddings
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    ),
    ranked AS (
        -- deterministic decile assignment: NTILE over a TOTAL order
        -- (score desc, vec_id) — engine tie-breaking never differs
        SELECT is_pos,
               NTILE({LIFT_N_BUCKETS}) OVER (ORDER BY score_b DESC, vec_id)
                   AS bucket
        FROM scored
    ),
    b AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(is_pos) AS BIGINT) AS pos
        FROM ranked GROUP BY bucket
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS pt
          FROM b)
    SELECT b.bucket, b.n AS n_rows, b.pos AS n_pos,
           round(b.pos / CAST(b.n AS DOUBLE), 6) AS response_rate,
           round((b.pos / CAST(b.n AS DOUBLE))
                 / (t.pt / CAST(t.nt AS DOUBLE)), 6) AS lift,
           round(SUM(b.pos) OVER (ORDER BY b.bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / CAST(t.pt AS DOUBLE), 6) AS cum_gain
    FROM b, t
    -- degenerate contract (r11 single-row sweep): zero positives make
    -- lift and gains undefined — no rows on BOTH engines
    WHERE t.pt > 0
    """,
    doc=f"Decile lift/gains table over the score ranking ({LIFT_N_BUCKETS} "
    "NTILE buckets on a total order): response rate, lift vs base, "
    "cumulative gains.",
)
def eval_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The campaign-targeting view of classifier quality: if we act on the
    top decile, what hit rate and what share of all positives do we
    capture?  NTILE runs over a TOTAL order (score, then vec_id), so
    both engines assign identical buckets — the tie hazard that makes
    naive NTILE-by-score non-reproducible.  One scan, then arithmetic on
    the 10-row bucket table.
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    scored = emb.select(
        "vec_id",
        (F.round(F.element_at("embedding", 1).cast("double"), AUC_BIN_DECIMALS) + F.lit(0.0)).alias(
            "score_b"
        ),
        (F.col("label") == POS_LABEL).cast("int").alias("is_pos"),
    )
    ranked = scored.select(
        "is_pos",
        F.ntile(LIFT_N_BUCKETS)
        .over(Window.orderBy(F.desc("score_b"), "vec_id"))
        .alias("bucket"),
    )
    b = ranked.groupBy("bucket").agg(
        F.count("*").alias("n"), F.sum("is_pos").alias("pos")
    ).localCheckpoint(eager=True)  # 10 rows; shared by t + final projection
    t = b.agg(F.sum("n").alias("nt"), F.sum("pos").alias("pt"))
    rr = F.col("pos") / F.col("n").cast("double")
    base = F.col("pt") / F.col("nt").cast("double")
    w_gain = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    # degenerate contract (see oracle): zero positives => no rows; the
    # filter precedes the projection so the divisions never evaluate
    return b.crossJoin(F.broadcast(t)).filter(F.col("pt") > 0).select(
        "bucket",
        F.col("n").alias("n_rows"),
        F.col("pos").alias("n_pos"),
        F.round(rr, 6).alias("response_rate"),
        F.round(rr / base, 6).alias("lift"),
        F.round(F.sum("pos").over(w_gain) / F.col("pt").cast("double"), 6).alias(
            "cum_gain"
        ),
    )


@register(
    "eval_ks_separation",
    defer=True,
    oracle=f"""
    WITH scored AS (
        -- CAST to DOUBLE before rounding: round(FLOAT) stays FLOAT in
        -- DuckDB and score_b is an OUTPUT column here, unlike the AUC
        SELECT round(CAST(embedding[1] AS DOUBLE), {AUC_BIN_DECIMALS})
                   + 0.0 AS score_b,
               CAST(label = {POS_LABEL} AS INT) AS is_pos
        FROM embeddings
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    ),
    bins AS (
        SELECT score_b, CAST(SUM(is_pos) AS BIGINT) AS p_b,
               CAST(COUNT(*) - SUM(is_pos) AS BIGINT) AS q_b
        FROM scored GROUP BY 1
    ),
    cum AS (
        SELECT SUM(p_b) OVER (ORDER BY score_b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
               SUM(q_b) OVER (ORDER BY score_b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cq,
               SUM(p_b) OVER () AS tp, SUM(q_b) OVER () AS tq,
               score_b
        FROM bins
    ),
    d AS (
        SELECT score_b, tp, tq,
               abs(cp * tq - cq * tp) AS num, tp * tq AS den
        FROM cum
    )
    SELECT CAST(MAX(tp) AS BIGINT) AS n_pos, CAST(MAX(tq) AS BIGINT) AS n_neg,
           round(CAST(MAX(num) AS DOUBLE) / MAX(den), 6) AS ks_stat,
           -- lowest threshold among the max-gap bins: num is an integer
           -- that can tie across bins, and a bare MIN_BY is unspecified
           -- under ties (same explicit tie-break as decision_stump_split)
           (SELECT MIN(score_b) FROM d
            WHERE num = (SELECT MAX(num) FROM d)) AS ks_threshold
    FROM d
    -- degenerate contract (r10 single-class sweep): KS needs both
    -- classes (den = tp*tq = 0 otherwise) — no rows, both engines
    HAVING MAX(den) > 0
    """,
    doc="Kolmogorov-Smirnov separation between positive and negative "
    "score distributions (max ECDF gap as an exact integer ratio) and "
    "the threshold achieving it.",
)
def eval_ks_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The credit-scoring companion to AUC: the KS statistic is the
    single-threshold separability (max |ECDF_pos - ECDF_neg|) and its
    argmax is the natural cutoff.  The ECDF gap is kept as the INTEGER
    cross product |cp*tq - cq*tp| over den = tp*tq, so the max and its
    threshold are exact; only the reported ratio divides.  Same 4dp
    binning as the AUC; windows run over the bounded bin table.
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    scored = emb.select(
        (F.round(F.element_at("embedding", 1).cast("double"), AUC_BIN_DECIMALS) + F.lit(0.0)).alias(
            "score_b"
        ),
        (F.col("label") == POS_LABEL).cast("int").alias("is_pos"),
    )
    bins = scored.groupBy("score_b").agg(
        F.sum("is_pos").alias("p_b"),
        (F.count("*") - F.sum("is_pos")).alias("q_b"),
    )
    w_cum = Window.orderBy("score_b").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = bins.select(
        "score_b",
        F.sum("p_b").over(w_cum).alias("cp"),
        F.sum("q_b").over(w_cum).alias("cq"),
        F.sum("p_b").over(w_all).alias("tp"),
        F.sum("q_b").over(w_all).alias("tq"),
    )
    d = cum.select(
        "score_b",
        F.abs(F.col("cp") * F.col("tq") - F.col("cq") * F.col("tp")).alias("num"),
        (F.col("tp") * F.col("tq")).alias("den"),
        "tp",
        "tq",
    )
    agg = d.agg(
        F.max("tp").alias("n_pos"),
        F.max("tq").alias("n_neg"),
        F.max("num").alias("num_max"),
        F.max("den").alias("den_max"),
        # num can tie across bins; break ties on the LOWER threshold so the
        # argmax is deterministic and engine-independent (struct ordering:
        # maximal gap first, then minimal score_b)
        F.min_by("score_b", F.struct(-F.col("num"), F.col("score_b"))).alias(
            "ks_threshold"
        ),
    )
    # degenerate contract (see oracle): both classes present or no rows
    agg = agg.filter(F.col("den_max") > 0)
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(F.col("num_max").cast("double") / F.col("den_max"), 6).alias(
            "ks_stat"
        ),
        "ks_threshold",
    )


@register(
    "decision_stump_split",
    defer=True,
    oracle=f"""
    WITH scored AS (
        SELECT round(CAST(embedding[1] AS DOUBLE), {AUC_BIN_DECIMALS})
                   + 0.0 AS score_b,
               CAST(label = {POS_LABEL} AS INT) AS is_pos
        FROM embeddings
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    ),
    bins AS (
        SELECT score_b, CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(is_pos) AS BIGINT) AS p_b
        FROM scored GROUP BY 1
    ),
    cum AS (
        SELECT score_b,
               SUM(n_b) OVER (ORDER BY score_b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
               SUM(p_b) OVER (ORDER BY score_b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl,
               SUM(n_b) OVER () AS n, SUM(p_b) OVER () AS p
        FROM bins
    ),
    splits AS (
        -- weighted Gini after splitting at (score <= score_b): computed
        -- from integer counts; candidates exclude the last bin (empty
        -- right side)
        SELECT score_b, nl, pl, n, p,
               round(
                 (2.0 * pl * (nl - pl) / nl
                  + 2.0 * (p - pl) * ((n - nl) - (p - pl)) / (n - nl)) / n,
                 10) AS gini_w
        FROM cum WHERE nl < n
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
           round(2.0 * MAX(p) * (MAX(n) - MAX(p))
                 / (CAST(MAX(n) AS DOUBLE) * MAX(n)), 6) AS gini_root,
           round(MIN(gini_w), 6) AS gini_split,
           -- lowest threshold among the minimal-gini candidates (DuckDB's
           -- MIN_BY takes no composite key)
           (SELECT MIN(score_b) FROM splits
            WHERE gini_w = (SELECT MIN(gini_w) FROM splits))
               AS split_threshold
    FROM splits
    """,
    doc="Best decision stump on the first embedding dimension: the split "
    "threshold minimizing weighted Gini impurity (4dp candidate grid, "
    "integer class counts).",
)
def decision_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first node every tree learner grows — and a one-number answer
    to "is this feature worth anything": root Gini vs best-split
    weighted Gini.  Candidate thresholds are the 4dp score bins;
    left/right class counts come from ONE cumulative window over the
    bin table, so evaluating all candidates is O(bins), not O(bins x
    rows).  The argmin tie-breaks on the lower threshold in both
    engines.
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    scored = emb.select(
        (F.round(F.element_at("embedding", 1).cast("double"), AUC_BIN_DECIMALS) + F.lit(0.0)).alias(
            "score_b"
        ),
        (F.col("label") == POS_LABEL).cast("int").alias("is_pos"),
    )
    bins = scored.groupBy("score_b").agg(
        F.count("*").alias("n_b"), F.sum("is_pos").alias("p_b")
    )
    w_cum = Window.orderBy("score_b").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = bins.select(
        "score_b",
        F.sum("n_b").over(w_cum).alias("nl"),
        F.sum("p_b").over(w_cum).alias("pl"),
        F.sum("n_b").over(w_all).alias("n"),
        F.sum("p_b").over(w_all).alias("p"),
    )
    nl, pl, n, p = (F.col(c) for c in ("nl", "pl", "n", "p"))
    nr, pr = n - nl, p - pl
    gini_w = F.round(
        (2.0 * pl * (nl - pl) / nl + 2.0 * pr * (nr - pr) / nr) / n, 10
    )
    splits = cum.filter(nl < n).select(
        "score_b", "n", "p", gini_w.alias("gini_w")
    )
    return splits.agg(
        F.max("n").alias("n_rows"),
        F.round(
            2.0 * F.max("p") * (F.max("n") - F.max("p"))
            / (F.max("n").cast("double") * F.max("n")),
            6,
        ).alias("gini_root"),
        F.round(F.min("gini_w"), 6).alias("gini_split"),
        F.min_by("score_b", F.struct(F.col("gini_w"), F.col("score_b"))).alias(
            "split_threshold"
        ),
    )


#: MI feature ranking: per-dimension value quartile edges are FIXED (the
#: generator's embeddings are ~N(0,1) per dim) so both engines bucket
#: identically — the same fixed-edge trade as MI_EDGES above.
FEATURE_MI_EDGES = (-0.5, 0.0, 0.5)
FEATURE_MI_TOP_K = 10


@register(
    "feature_mi_ranking",
    defer=True,
    oracle=f"""
    WITH pos AS (
        SELECT i, CASE WHEN CAST(embedding[i] AS DOUBLE) < {FEATURE_MI_EDGES[0]} THEN 0
                       WHEN CAST(embedding[i] AS DOUBLE) < {FEATURE_MI_EDGES[1]} THEN 1
                       WHEN CAST(embedding[i] AS DOUBLE) < {FEATURE_MI_EDGES[2]} THEN 2
                       ELSE 3 END AS vb,
               CAST(label = {POS_LABEL} AS INT) AS y
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    ),
    cells AS (
        SELECT i, vb, y, CAST(COUNT(*) AS BIGINT) AS n_xy FROM pos
        GROUP BY 1, 2, 3
    ),
    marg AS (
        SELECT i, vb, y, n_xy,
               SUM(n_xy) OVER (PARTITION BY i, vb) AS n_x,
               SUM(n_xy) OVER (PARTITION BY i, y) AS n_y,
               SUM(n_xy) OVER (PARTITION BY i) AS n
        FROM cells
    ),
    mi AS (
        SELECT i AS dim,
               CAST(SUM(CAST(round((n_xy / CAST(n AS DOUBLE))
                     * ln((n_xy * CAST(n AS DOUBLE))
                          / (n_x * CAST(n_y AS DOUBLE))), 10)
                   AS DECIMAL(18,10))) AS DOUBLE) AS mi_nats
        FROM marg GROUP BY i
    )
    SELECT dim, round(mi_nats, 6) AS mi_nats
    FROM mi ORDER BY mi_nats DESC, dim LIMIT {FEATURE_MI_TOP_K}
    """,
    doc=f"Top-{FEATURE_MI_TOP_K} embedding dimensions by mutual "
    "information with the label (fixed 4-bucket value bins, "
    "10dp-quantized cell terms).",
)
def feature_mi_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature screening across ALL dimensions at once — which embedding
    coordinates actually carry label signal (the multivariate extension
    of eval_mutual_information's single 2-way table).  One posexplode to
    (dim, bucket, label) grain, bounded at dims x 4 x labels cells;
    per-cell MI terms are 10dp-quantized before the per-dim sum, and the
    top-k is a TakeOrdered with a dim tie-break.
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    v = F.col("x").cast("double")
    pos = emb.select(
        (F.col("label") == POS_LABEL).cast("int").alias("y"),
        F.posexplode("embedding").alias("i0", "x"),
    ).select(
        (F.col("i0") + 1).alias("i"),
        "y",
        F.when(v < FEATURE_MI_EDGES[0], 0)
        .when(v < FEATURE_MI_EDGES[1], 1)
        .when(v < FEATURE_MI_EDGES[2], 2)
        .otherwise(3)
        .alias("vb"),
    )
    cells = pos.groupBy("i", "vb", "y").agg(F.count("*").alias("n_xy"))
    marg = cells.select(
        "i",
        "n_xy",
        F.sum("n_xy").over(Window.partitionBy("i", "vb")).alias("n_x"),
        F.sum("n_xy").over(Window.partitionBy("i", "y")).alias("n_y"),
        F.sum("n_xy").over(Window.partitionBy("i")).alias("n"),
    )
    term = F.round(
        (F.col("n_xy") / F.col("n").cast("double"))
        * F.log(
            (F.col("n_xy") * F.col("n").cast("double"))
            / (F.col("n_x") * F.col("n_y").cast("double"))
        ),
        10,
    ).cast("decimal(18,10)")
    mi = marg.groupBy(F.col("i").alias("dim")).agg(
        F.sum(term).cast("double").alias("mi_raw")
    )
    return (
        mi.select("dim", F.round("mi_raw", 6).alias("mi_nats"))
        .orderBy(F.desc("mi_nats"), "dim")
        .limit(FEATURE_MI_TOP_K)
    )


#: Asymmetric misclassification costs for the cost-curve threshold pick.
COST_FP = 1.0
COST_FN = 5.0


@register(
    "eval_cost_curve_threshold",
    defer=True,
    oracle=f"""
    WITH scored AS (
        SELECT round(CAST(embedding[1] AS DOUBLE), {AUC_BIN_DECIMALS})
                   + 0.0 AS score_b,
               CAST(label = {POS_LABEL} AS INT) AS is_pos
        FROM embeddings
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    ),
    bins AS (
        SELECT score_b, CAST(COUNT(*) AS BIGINT) AS n_b,
               CAST(SUM(is_pos) AS BIGINT) AS p_b
        FROM scored GROUP BY 1
    ),
    cum AS (
        -- predict positive when score > t: below-threshold positives are
        -- the FNs, above-threshold negatives the FPs
        SELECT score_b,
               SUM(p_b) OVER (ORDER BY score_b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fn,
               SUM(n_b - p_b) OVER (ORDER BY score_b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tn,
               SUM(p_b) OVER () AS tp_all, SUM(n_b - p_b) OVER () AS neg_all
        FROM bins
    ),
    cost AS (
        -- costs are exact integer-weighted counts ({COST_FP}, {COST_FN}
        -- have exact double products with integers at these scales)
        SELECT score_b,
               {COST_FN} * fn + {COST_FP} * (neg_all - tn) AS c,
               tp_all, neg_all
        FROM cum
    )
    SELECT CAST(MAX(tp_all) AS BIGINT) AS n_pos,
           CAST(MAX(neg_all) AS BIGINT) AS n_neg,
           round({COST_FP} * MAX(neg_all), 4) AS cost_predict_all_pos,
           round({COST_FN} * MAX(tp_all), 4) AS cost_predict_all_neg,
           round(MIN(c), 4) AS min_cost,
           (SELECT MIN(score_b) FROM cost
            WHERE c = (SELECT MIN(c) FROM cost)) AS best_threshold
    FROM cost
    """,
    doc=f"Cost-curve threshold pick under asymmetric costs (FP={COST_FP}, "
    f"FN={COST_FN}): expected-cost minimum over the 4dp threshold grid "
    "vs the two degenerate policies.",
)
def eval_cost_curve_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC says how good the ranking is; deployment needs a THRESHOLD, and
    when errors cost differently the right one is far from 0.5.  The
    expected cost at every candidate threshold is an integer-weighted
    pair of cumulative counts from ONE window pass over the bin table,
    and the argmin tie-breaks on the lower threshold.  Degenerate
    all-positive/all-negative policy costs bracket the result.
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    scored = emb.select(
        (F.round(F.element_at("embedding", 1).cast("double"), AUC_BIN_DECIMALS) + F.lit(0.0)).alias(
            "score_b"
        ),
        (F.col("label") == POS_LABEL).cast("int").alias("is_pos"),
    )
    bins = scored.groupBy("score_b").agg(
        F.count("*").alias("n_b"), F.sum("is_pos").alias("p_b")
    )
    w_cum = Window.orderBy("score_b").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = bins.select(
        "score_b",
        F.sum("p_b").over(w_cum).alias("fn"),
        F.sum(F.col("n_b") - F.col("p_b")).over(w_cum).alias("tn"),
        F.sum("p_b").over(w_all).alias("tp_all"),
        F.sum(F.col("n_b") - F.col("p_b")).over(w_all).alias("neg_all"),
    )
    cost = cum.select(
        "score_b",
        (COST_FN * F.col("fn") + COST_FP * (F.col("neg_all") - F.col("tn"))).alias(
            "c"
        ),
        "tp_all",
        "neg_all",
    ).localCheckpoint(eager=True)  # aggregated twice (min + argmin)
    min_c = cost.agg(F.min("c").alias("mc"))
    return (
        cost.crossJoin(F.broadcast(min_c))
        .agg(
            F.max("tp_all").alias("n_pos"),
            F.max("neg_all").alias("n_neg"),
            F.round(COST_FP * F.max("neg_all"), 4).alias("cost_predict_all_pos"),
            F.round(COST_FN * F.max("tp_all"), 4).alias("cost_predict_all_neg"),
            F.round(F.min("c"), 4).alias("min_cost"),
            F.min(F.when(F.col("c") == F.col("mc"), F.col("score_b"))).alias(
                "best_threshold"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Isotonic calibration via pool-adjacent-violators (round 8)

ISO_BIN_DECIMALS = 2


@register(
    "isotonic_calibration_pav",
    defer=2,
    # Oracle uses the minimax characterization of the isotonic fit:
    #   fit_i = max_{k<=i} min_{j>=i} avg(p[k..j]) / avg-weight(n[k..j])
    # which equals the PAV block rate at bin i (standard theorem), so the
    # Spark side's integer stack fold and this O(bins^3)-join SQL compute
    # the SAME rational — and equal rationals divide to identical doubles.
    # Fraction ordering by double value is exact here: distinct rates
    # p/n with n <= 1e6 differ by >= 1e-12, far above double ulp.
    oracle=f"""
    WITH scored AS (
        SELECT round(CAST(embedding[1] AS DOUBLE), {ISO_BIN_DECIMALS})
                   AS score_b,
               CAST(label = {POS_LABEL} AS INT) AS is_pos
        FROM embeddings
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    ),
    bins AS (
        SELECT score_b, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(is_pos) AS BIGINT) AS p,
               row_number() OVER (ORDER BY score_b) AS rn
        FROM scored GROUP BY 1
    ),
    pre AS (
        SELECT rn,
               SUM(p) OVER (ORDER BY rn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
               SUM(n) OVER (ORDER BY rn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        FROM bins
    ),
    fr AS (
        SELECT lo.rn AS k, hi.rn AS j,
               (hi.cp - COALESCE(lk.cp, 0))
                   / CAST(hi.cn - COALESCE(lk.cn, 0) AS DOUBLE) AS v
        FROM pre hi
            JOIN pre lo ON lo.rn <= hi.rn
            LEFT JOIN pre lk ON lk.rn = lo.rn - 1
    ),
    lower_env AS (
        SELECT b.rn AS i, f.k, MIN(f.v) AS mn
        FROM bins b JOIN fr f ON f.k <= b.rn AND f.j >= b.rn
        GROUP BY 1, 2
    ),
    fit AS (SELECT i, MAX(mn) AS iso FROM lower_env GROUP BY i)
    -- score_b + 0.0: the zero bin groups -0.0 and 0.0 together and the
    -- surviving sign is engine-arbitrary; +0.0 canonicalizes (-0.0 + 0.0
    -- IS +0.0 in IEEE)
    SELECT b.score_b + 0.0 AS score_b, b.n AS n_rows, b.p AS n_pos,
           f.iso AS isotonic_rate
    FROM bins b JOIN fit f ON f.i = b.rn
    """,
    doc=f"Isotonic calibration of the first embedding dimension vs label: "
    f"pool-adjacent-violators over {10**ISO_BIN_DECIMALS}-grain score "
    "bins; per-bin monotone calibrated rate.",
)
def isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard nonparametric calibrator (Zadrozny & Elkan 2002):
    fit the best MONOTONE probability curve to score bins — what Platt
    scaling can't do when the miscalibration isn't sigmoid-shaped.  The
    corpus reduces to <=~70 (score, n, p) bins; PAV then runs
    DRIVER-SIDE as the classic stack fold with EXACT integer merge
    comparisons (cross-multiplication, no floats until the final p/n
    divide).  The oracle recomputes the identical fit via the minimax
    formula, which is pure SQL over prefix sums.
    """
    from pyspark.sql import types as T

    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    bins = sorted(
        (r["score_b"], r["n"], r["p"])
        for r in emb.select(
            F.round(F.element_at("embedding", 1).cast("double"), ISO_BIN_DECIMALS)
            .alias("score_b"),
            (F.col("label") == POS_LABEL).cast("int").alias("is_pos"),
        )
        .groupBy("score_b")
        .agg(F.count("*").alias("n"), F.sum("is_pos").alias("p"))
        .collect()
    )
    # PAV stack: blocks of (p, n, n_bins); merge while the previous
    # block's rate >= the new block's (integer cross-multiplication)
    stack: list[list[int]] = []
    for _, n, p in bins:
        stack.append([p, n, 1])
        while len(stack) >= 2 and stack[-2][0] * stack[-1][1] >= stack[-1][0] * stack[-2][1]:
            p2, n2, c2 = stack.pop()
            stack[-1][0] += p2
            stack[-1][1] += n2
            stack[-1][2] += c2
    rows = []
    i = 0
    for p_blk, n_blk, c_blk in stack:
        for _ in range(c_blk):
            s, n, p = bins[i]
            rows.append((s + 0.0, n, p, p_blk / n_blk))  # -0.0 -> +0.0
            i += 1
    schema = T.StructType(
        [
            T.StructField("score_b", T.DoubleType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("n_pos", T.LongType()),
            T.StructField("isotonic_rate", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# Hanley-McNeil AUC confidence interval (round 8)


@register(
    "auc_confidence_hanley",
    defer=2,
    # Every float op below is written in the identical order on both
    # engines (single correctly-rounded ops on identical operands), with
    # the U statistic kept as the exact INTEGER 2U until the one division
    # that produces A; outputs floor-quantized.
    oracle=f"""
    WITH scored AS (
        SELECT round(embedding[1], {AUC_BIN_DECIMALS}) + 0.0 AS score_b,
               CAST(label = {POS_LABEL} AS INT) AS is_pos
        FROM embeddings
        -- labeled rows only (r12 NULL-heavy sweep): an unlabeled
        -- example is neither positive nor negative
        WHERE label IS NOT NULL
    ),
    bins AS (
        SELECT score_b, COUNT(*) AS n, SUM(is_pos) AS n_pos,
               COUNT(*) - SUM(is_pos) AS n_neg
        FROM scored GROUP BY score_b
    ),
    cum AS (
        SELECT n_pos, n_neg,
               COALESCE(SUM(n_neg) OVER (ORDER BY score_b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS neg_below
        FROM bins
    ),
    agg AS (
        SELECT CAST(SUM(n_pos * (2 * neg_below + n_neg)) AS BIGINT) AS u2,
               CAST(SUM(n_pos) AS BIGINT) AS np,
               CAST(SUM(n_neg) AS BIGINT) AS nn
        FROM cum
    ),
    -- degenerate contract (r10 single-class sweep): the CI needs both
    -- classes present — no rows otherwise, both engines
    s1 AS (SELECT u2, np, nn, u2 / (2.0 * np * nn) AS a FROM agg
           WHERE np > 0 AND nn > 0),
    s2 AS (
        SELECT np, nn, a, a / (2.0 - a) AS q1, 2.0 * a * a / (1.0 + a) AS q2
        FROM s1
    ),
    s3 AS (
        SELECT np, nn, a,
               sqrt((a * (1.0 - a) + (np - 1.0) * (q1 - a * a)
                     + (nn - 1.0) * (q2 - a * a))
                    / CAST(np * nn AS DOUBLE)) AS se
        FROM s2
    )
    SELECT np AS n_pos, nn AS n_neg,
           floor(a * 1000000) / 1000000 AS auc,
           floor((a - 1.96 * se) * 1000000) / 1000000 AS ci_lower,
           floor((a + 1.96 * se) * 1000000) / 1000000 AS ci_upper
    FROM s3
    """,
    doc="ROC-AUC with the Hanley-McNeil (1982) closed-form 95% confidence "
    "interval — the standard error every AUC readout should ship with; "
    "exact-integer U statistic, one-pass bin table.",
)
def auc_confidence_hanley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An AUC without an interval invites overreading a 0.003 'gain'.
    Hanley-McNeil gives the classic closed-form SE from A, n_pos, n_neg
    alone (Q1 = A/(2-A), Q2 = 2A^2/(1+A)) — no bootstrap, one extra
    expression on the same one-pass binned-U aggregation as
    eval_roc_auc.  The 2U numerator stays an exact integer; each float
    op is written in the identical order on both engines.
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()  # labeled rows only (r12 NULL-heavy sweep)
    )
    scored = emb.select(
        (F.round(F.element_at("embedding", 1).cast("double"), AUC_BIN_DECIMALS)
         + F.lit(0.0))
        .alias("score_b"),
        (F.col("label") == POS_LABEL).cast("int").alias("is_pos"),
    )
    bins = scored.groupBy("score_b").agg(
        F.count("*").alias("n"),
        F.sum("is_pos").alias("n_pos"),
        (F.count("*") - F.sum("is_pos")).alias("n_neg"),
    )
    w = Window.orderBy("score_b").rowsBetween(Window.unboundedPreceding, -1)
    cum = bins.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w), F.lit(0)).alias("neg_below"),
    )
    agg = cum.agg(
        F.sum(F.col("n_pos") * (2 * F.col("neg_below") + F.col("n_neg"))).alias("u2"),
        F.sum("n_pos").alias("np"),
        F.sum("n_neg").alias("nn"),
    # degenerate contract (see oracle): both classes present or no rows
    ).filter((F.col("np") > 0) & (F.col("nn") > 0))
    s1 = agg.withColumn("a", F.col("u2") / (2.0 * F.col("np") * F.col("nn")))
    s2 = s1.withColumn("q1", F.col("a") / (2.0 - F.col("a"))).withColumn(
        "q2", 2.0 * F.col("a") * F.col("a") / (1.0 + F.col("a"))
    )
    a, q1, q2 = F.col("a"), F.col("q1"), F.col("q2")
    np_, nn_ = F.col("np"), F.col("nn")
    s3 = s2.withColumn(
        "se",
        F.sqrt(
            (
                a * (1.0 - a)
                + (np_ - 1.0) * (q1 - a * a)
                + (nn_ - 1.0) * (q2 - a * a)
            )
            / (np_ * nn_).cast("double")
        ),
    )
    se = F.col("se")
    return s3.select(
        np_.alias("n_pos"),
        nn_.alias("n_neg"),
        (F.floor(a * 1000000) / 1000000).alias("auc"),
        (F.floor((a - 1.96 * se) * 1000000) / 1000000).alias("ci_lower"),
        (F.floor((a + 1.96 * se) * 1000000) / 1000000).alias("ci_upper"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap (round 9): deterministic resampling via xxhash64

#: Bootstrap replicates.  Poisson(1) weights make each replicate a single
#: independent map-side draw per row — the only bootstrap that works when
#: the corpus doesn't fit anywhere (Chamandy et al. 2012, "Estimating
#: uncertainty for massive data streams"; n is unknown per partition, and
#: sampling WITH replacement would need global indexing).
BOOT_B = 16

#: floor(CDF_Poisson(1)(k) * 2^64) for k = 0..8, computed to 60 decimal
#: digits: the replicate weight is the count of thresholds <= the row's
#: u64 hash, i.e. the inverse-CDF transform done entirely in integers.
#: P(w > 8) ~ 1.1e-6 — the cap is shared by both engines, so exactness
#: is unaffected.
_POIS1_CDF_U64 = (
    6786177901268885274,
    13572355802537770549,
    16965444753172213186,
    18096474403383694065,
    18379231815936564285,
    18435783298447138329,
    18445208545532234003,
    18446555009401533385,
    18446723317385195808,
)

#: Same thresholds shifted to Spark's signed-int64 order: u64 order is
#: preserved under u -> u - 2^63, which on the Spark side is one
#: ``hash ^ LONG_MIN`` bit flip.
_POIS1_CDF_S64 = tuple(t - (1 << 63) for t in _POIS1_CDF_U64)

_LONG_MIN = -(1 << 63)


def _poisson_bootstrap_oracle() -> str:
    from azure_func_forem_data_etl_spark.functions import xxh64_sql as X
    from azure_func_forem_data_etl_spark.functions.exact import sql_dsum

    hash_ctes = X.xxh64_longs_expr_ctes(
        "pb",
        "reps",
        ["o_totalprice", "b"],
        ["o_orderkey", "b"],
        X.SPARK_HASH_SEED,
    )
    w = " + ".join(
        f"(CASE WHEN h >= {X._c(t)} THEN 1 ELSE 0 END)" for t in _POIS1_CDF_U64
    )
    return f"""
    WITH reps AS (
        SELECT o_orderkey, o_totalprice, b
        FROM orders, (SELECT UNNEST(generate_series(1, {BOOT_B})) AS b)
    ),
    {hash_ctes},
    weighted AS (SELECT b, o_totalprice, {w} AS w FROM pb_hash)
    SELECT CAST(b AS INT) AS replicate,
           CAST(SUM(w) AS BIGINT) AS n_eff,
           -- STRING round-trip: the weighted scale-4 sum passes 2^53 on
           -- the magnitude-spread domain (see exact.sql_dsum)
           CAST(CAST(SUM(w * CAST(o_totalprice AS DECIMAL(18,4))) AS STRING)
                AS DOUBLE) AS boot_total
    FROM weighted GROUP BY 1
    UNION ALL
    SELECT 0, CAST(COUNT(*) AS BIGINT), {sql_dsum('o_totalprice')}
    FROM orders
    """


@register(
    "poisson_bootstrap_totals",
    defer=3,
    oracle=_poisson_bootstrap_oracle(),
    doc=f"Deterministic Poisson bootstrap of total order revenue: "
    f"{BOOT_B} replicates, weight = inverse-CDF(Poisson(1)) of "
    "xxhash64(o_orderkey, b) done in pure integer threshold compares; "
    "replicate 0 is the observed statistic.  Exact decimal sums.",
)
def poisson_bootstrap_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resampling-based uncertainty without RNG state: row r's weight in
    replicate b is Pois(1) via the inverse CDF applied to
    ``xxhash64(o_orderkey, b)`` — reproducible across runs, engines, and
    partitionings, which is what makes it oracle-checkable here and
    restart-safe at 100 TB (a bootstrap keyed on partition-local RNG is
    neither).  The whole thing is one generated column + one keyed agg:
    explode B replicate ids per row map-side, compare the hash against 9
    integer thresholds (u64 order == signed order after one ^LONG_MIN bit
    flip), and partial-aggregate (replicate, w*value) — shuffle rows =
    B x partitions, not B x corpus.  Spread of the replicate totals
    estimates the SE of the total; replicate 0 carries the observed
    statistic so the output is self-contained.
    """
    from azure_func_forem_data_etl_spark.functions.exact import dsum

    orders = table(spark, sf_dir, "orders")
    w_expr = " + ".join(
        f"(CASE WHEN hx >= {t}L THEN 1 ELSE 0 END)" for t in _POIS1_CDF_S64
    )
    reps = (
        orders.select(
            "o_orderkey",
            "o_totalprice",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.lit(BOOT_B).cast("long"))
            ).alias("b"),
        )
        .withColumn(
            "hx",
            F.xxhash64("o_orderkey", "b").bitwiseXOR(F.lit(_LONG_MIN)),
        )
        .withColumn("w", F.expr(w_expr))
    )
    boot = reps.groupBy(F.col("b").cast("int").alias("replicate")).agg(
        F.sum("w").alias("n_eff"),
        F.sum(
            F.col("w") * F.col("o_totalprice").cast("decimal(18,4)")
        ).cast("double").alias("boot_total"),
    )
    observed = orders.agg(
        F.lit(0).alias("replicate"),
        F.count("*").alias("n_eff"),
        dsum("o_totalprice").alias("boot_total"),
    )
    return boot.unionByName(observed)


# ---------------------------------------------------------------------------
# Split conformal prediction (round 9)

#: Conformal miscoverage target: 1 - alpha = 90% nominal coverage.
CONF_ALPHA_NUM, CONF_ALPHA_DEN = 9, 10  # ceil(0.9 * (n+1))-th residual


def _conformal_oracle() -> str:
    from azure_func_forem_data_etl_spark.functions import xxh64_sql as X

    hash_ctes = X.xxh64_longs_expr_ctes(
        "cf", "orders", ["o_orderpriority", "o_totalprice"], ["o_orderkey"],
        X.SPARK_HASH_SEED,
    )
    signed = X.signed64("h")
    return f"""
    WITH {hash_ctes},
    split AS MATERIALIZED (
        SELECT o_orderpriority AS pri,
               CAST(o_totalprice AS DECIMAL(18,4)) AS y,
               ((({signed}) % 10) + 10) % 10 AS s
        FROM cf_hash
    ),
    tr AS MATERIALIZED (
        SELECT pri, y,
               ROW_NUMBER() OVER (PARTITION BY pri ORDER BY y) AS rn,
               COUNT(*) OVER (PARTITION BY pri) AS n
        FROM split WHERE s <= 6
    ),
    model AS MATERIALIZED (
        SELECT pri, CAST(MAX(n) AS BIGINT) AS n_train,
               MIN(CASE WHEN rn = (n + 1) // 2 THEN y END) AS med
        FROM tr GROUP BY pri
    ),
    cal AS (
        SELECT c.pri, ABS(c.y - m.med) AS r
        FROM split c JOIN model m ON m.pri = c.pri
        WHERE c.s IN (7, 8)
    ),
    cal_rn AS MATERIALIZED (
        SELECT pri, r,
               ROW_NUMBER() OVER (PARTITION BY pri ORDER BY r) AS rn,
               COUNT(*) OVER (PARTITION BY pri) AS n
        FROM cal
    ),
    q AS MATERIALIZED (
        SELECT pri, CAST(MAX(n) AS BIGINT) AS n_cal,
               MIN(CASE WHEN rn = ({CONF_ALPHA_NUM} * (n + 1) + {CONF_ALPHA_DEN - 1}) // {CONF_ALPHA_DEN}
                        THEN r END) AS q_hat
        FROM cal_rn GROUP BY pri
    ),
    tst AS (
        SELECT t.pri,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(COUNT(*) FILTER (
                   WHERE q.q_hat IS NULL OR ABS(t.y - m.med) <= q.q_hat
               ) AS BIGINT) AS n_covered
        FROM split t
            JOIN model m ON m.pri = t.pri
            JOIN q ON q.pri = t.pri
        WHERE t.s = 9
        GROUP BY t.pri
    )
    SELECT m.pri AS o_orderpriority, m.n_train, q.n_cal,
           COALESCE(t.n_test, 0) AS n_test,
           COALESCE(t.n_covered, 0) AS n_covered,
           CAST(m.med AS DOUBLE) AS pred_median,
           CAST(q.q_hat AS DOUBLE) AS q_hat,
           CASE WHEN t.n_test > 0
                THEN 1000000 * t.n_covered // t.n_test END AS coverage_ppm
    FROM model m
        JOIN q ON q.pri = m.pri
        LEFT JOIN tst t ON t.pri = m.pri
    """


@register(
    "conformal_interval_coverage",
    defer=3,
    oracle=_conformal_oracle(),
    doc="Mondrian split-conformal intervals on order totals: deterministic "
    "hash split (train 70 / cal 20 / test 10 via pmod(xxhash64(key),10)), "
    "per-priority median predictor, q_hat = ceil(0.9(n+1))-th smallest "
    "calibration residual, exact integer/decimal coverage audit on test.",
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free prediction intervals with finite-sample coverage
    (Vovk's split conformal, the Mondrian per-group variant): the entire
    method is order statistics, which is why it survives a bit-exact
    cross-engine oracle where any regression-based interval would not.
    The hash split makes train/cal/test membership a pure function of the
    row key — reproducible across engines and restarts, no sampling state.
    Scale shape: two keyed window passes (train median, calibration
    quantile) and one keyed agg, all partitioned by the 5-value priority
    key; the model and q_hat frames are group-grain (5 rows) and
    broadcast back onto the test scan.  q_hat is NULL (cover-everything)
    when ceil(0.9(n_cal+1)) > n_cal — the small-group finite-sample rule,
    exercised by the planted test."""
    orders = table(spark, sf_dir, "orders")
    split = orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").cast("decimal(18,4)").alias("y"),
        F.pmod(F.xxhash64("o_orderkey"), F.lit(10)).alias("s"),
    )
    wp_y = Window.partitionBy("pri").orderBy("y")
    wp = Window.partitionBy("pri")
    model = (
        split.filter(F.col("s") <= 6)
        .withColumn("rn", F.row_number().over(wp_y))
        .withColumn("n", F.count("*").over(wp))
        .groupBy("pri")
        .agg(
            F.max("n").alias("n_train"),
            F.min(
                F.when(F.expr("rn = (n + 1) div 2"), F.col("y"))
            ).alias("med"),
        )
        # group-grain (5 rows) but referenced by cal, tst AND the final
        # select — Spark re-runs unshared aggregation subplans, so pin it.
        .localCheckpoint(eager=True)
    )
    cal = (
        split.filter(F.col("s").isin(7, 8))
        .join(F.broadcast(model), "pri")
        .withColumn("r", F.abs(F.col("y") - F.col("med")))
    )
    wp_r = Window.partitionBy("pri").orderBy("r")
    k = (
        f"rn = ({CONF_ALPHA_NUM} * (n + 1) + {CONF_ALPHA_DEN - 1}) "
        f"div {CONF_ALPHA_DEN}"
    )
    q = (
        cal.withColumn("rn", F.row_number().over(wp_r))
        .withColumn("n", F.count("*").over(wp))
        .groupBy("pri")
        .agg(
            F.max("n").alias("n_cal"),
            F.min(F.when(F.expr(k), F.col("r"))).alias("q_hat"),
        )
        .localCheckpoint(eager=True)  # same: shared by tst + final select
    )
    tst = (
        split.filter(F.col("s") == 9)
        .join(F.broadcast(model), "pri")
        .join(F.broadcast(q), "pri")
        .groupBy("pri")
        .agg(
            F.count("*").alias("n_test"),
            F.count_if(
                F.col("q_hat").isNull()
                | (F.abs(F.col("y") - F.col("med")) <= F.col("q_hat"))
            ).alias("n_covered"),
        )
    )
    return (
        model.join(q, "pri")
        .join(tst, "pri", "left")
        .select(
            F.col("pri").alias("o_orderpriority"),
            "n_train",
            "n_cal",
            F.coalesce("n_test", F.lit(0)).alias("n_test"),
            F.coalesce("n_covered", F.lit(0)).alias("n_covered"),
            F.col("med").cast("double").alias("pred_median"),
            F.col("q_hat").cast("double").alias("q_hat"),
            F.expr(
                "CASE WHEN n_test > 0 THEN 1000000 * n_covered div n_test END"
            ).alias("coverage_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction (round 9)


def _cuped_oracle() -> str:
    from azure_func_forem_data_etl_spark.functions import xxh64_sql as X

    hash_ctes = X.xxh64_longs_expr_ctes(
        "cu", "peruser", ["user_id", "x", "y"], ["user_id"], X.SPARK_HASH_SEED
    )
    signed = X.signed64("h")
    return f"""
    WITH bounds AS (
        -- midpoint over the EXPERIMENT POPULATION's events (identified
        -- users), matching the Spark side's post-filter bounds: with
        -- anonymous traffic at the corpus time extremes the all-events
        -- midpoint shifts every user's pre/post split (r13 combo leg —
        -- the same filtered-domain rule as the stream-join boundaries)
        SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid
        FROM events WHERE user_id IS NOT NULL
    ),
    peruser AS MATERIALIZED (
        -- identified users only (r11 null-FK sweep): an anonymous
        -- event has no assignment unit (Spark xxhash64 SKIPS null
        -- inputs, pooling all anonymous traffic into one pseudo-user)
        SELECT user_id,
               CAST(SUM(CASE WHEN epoch_us(ts) <= b.mid
                             THEN CAST(value AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END)
                    AS DECIMAL(19,4)) AS x,
               CAST(SUM(CASE WHEN epoch_us(ts) > b.mid
                             THEN CAST(value AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END)
                    AS DECIMAL(19,4)) AS y
        FROM events, bounds b
        WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    {hash_ctes},
    armed AS MATERIALIZED (
        SELECT user_id, x, y, ((({signed}) % 2) + 2) % 2 AS arm FROM cu_hash
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy
        FROM armed
    ),
    th AS (
        SELECT n, sx, sy,
               CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                    ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS theta,
               CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL
                    ELSE (n * sxy - sx * sy) * (n * sxy - sx * sy)
                         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END
                   AS rho_sq
        FROM m
    )
    SELECT a.arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(SUM(a.x) AS DOUBLE) / COUNT(*), 6) AS mean_pre,
           round(CAST(SUM(a.y) AS DOUBLE) / COUNT(*), 6) AS mean_post,
           round(t.theta, 6) AS theta,
           round(t.rho_sq, 6) AS rho_sq,
           round(CAST(SUM(a.y) AS DOUBLE) / COUNT(*)
                 - t.theta * (CAST(SUM(a.x) AS DOUBLE) / COUNT(*)
                              - t.sx / t.n), 6) AS adj_mean_post
    FROM armed a, th t
    GROUP BY a.arm, t.theta, t.rho_sq, t.sx, t.n
    """


@register(
    "cuped_adjusted_lift",
    defer=3,
    oracle=_cuped_oracle(),
    doc="CUPED variance-reduced A/B readout: per-user pre/post value "
    "sums split at the corpus time midpoint, arms via pmod(xxhash64("
    "user_id), 2), theta = cov(x,y)/var(x) from exact decimal moments; "
    "per-arm adjusted post-period means + the rho-squared variance-"
    "reduction factor.",
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The variance-reduction step every mature experimentation stack
    runs before the t-test (Deng, Xu, Kohavi, Walker WSDM'13): regress
    the post-period metric on its pre-period covariate and compare
    arm means of the residualized metric — same estimate, ~rho-squared
    less variance.  Everything reduces to user-grain sufficient
    statistics: one corpus pass to (user, pre-sum, post-sum), a map-side
    hash for the arm, then exact decimal moments; theta and the
    adjusted means are closed-form doubles from those moments, so the
    whole readout is one keyed agg + two 1-row broadcasts regardless of
    corpus size.  The time midpoint comes from a scalar (min, max)
    aggregate cross-joined back — no driver round-trip, no config.
    """
    # identified users only — see the oracle note (r11 null-FK sweep)
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.col("value").cast("decimal(18,4)").alias("v"),
        )
    )
    bounds = ev.agg(
        F.expr("(min(us) + max(us)) div 2").alias("mid")
    )
    z = F.lit(0).cast("decimal(18,4)")
    peruser = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("us") <= F.col("mid"), F.col("v")).otherwise(z))
            .cast("decimal(19,4)")
            .alias("x"),
            F.sum(F.when(F.col("us") > F.col("mid"), F.col("v")).otherwise(z))
            .cast("decimal(19,4)")
            .alias("y"),
        )
        .withColumn("arm", F.pmod(F.xxhash64("user_id"), F.lit(2)))
        # consumed by the moments agg AND the per-arm readout — pin the
        # user grain once (no corpus rescan per branch)
        .localCheckpoint(eager=True)
    )
    m = peruser.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    dvx, dvy, cv = n * sxx - sx * sx, n * syy - sy * sy, n * sxy - sx * sy
    th = m.select(
        n.alias("n"),
        sx.alias("gsx"),
        F.when(dvx == 0, F.lit(None)).otherwise(cv / dvx).alias("theta"),
        F.when(dvx * dvy == 0, F.lit(None))
        .otherwise(cv * cv / (dvx * dvy))
        .alias("rho_sq"),
    )
    arm_mean_pre = F.sum("x").cast("double") / F.count("*")
    arm_mean_post = F.sum("y").cast("double") / F.count("*")
    return (
        peruser.crossJoin(F.broadcast(th))
        .groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.round(arm_mean_pre, 6).alias("mean_pre"),
            F.round(arm_mean_post, 6).alias("mean_post"),
            F.round(F.first("theta"), 6).alias("theta"),
            F.round(F.first("rho_sq"), 6).alias("rho_sq"),
            F.round(
                arm_mean_post
                - F.first("theta")
                * (arm_mean_pre - F.first("gsx") / F.first("n")),
                6,
            ).alias("adj_mean_post"),
        )
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes beta-binomial shrinkage (round 9)

EB_RATE_EVENT = "purchase"  # the "success" event whose per-user rate shrinks


def _eb_oracle() -> str:
    mf = "(CAST(s1 AS DOUBLE) / k) / 1000000.0"
    vf = (
        "(CAST(s2 AS DOUBLE) / k"
        " - (CAST(s1 AS DOUBLE) / k) * (CAST(s1 AS DOUBLE) / k))"
        " / 1000000000000.0"
    )
    return f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = '{EB_RATE_EVENT}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY user_id
    ),
    r AS (SELECT user_id, n, x, 1000000 * x // n AS rate_ppm FROM pu),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(rate_ppm) AS BIGINT) AS s1,
               CAST(SUM(rate_ppm * rate_ppm) AS BIGINT) AS s2
        FROM r
    ),
    pri AS (
        SELECT k, {mf} AS m_f,
               CASE WHEN {vf} > 0
                    THEN {mf} * (1.0 - {mf}) / ({vf}) - 1.0
                    ELSE NULL END AS c
        FROM mom
    )
    SELECT r.user_id, r.n AS n_events, r.x AS n_successes, r.rate_ppm,
           CAST(floor(p.m_f * p.c * 1000000.0) AS BIGINT) AS alpha_x1e6,
           CAST(floor((1.0 - p.m_f) * p.c * 1000000.0) AS BIGINT)
               AS beta_x1e6,
           CAST(floor((CAST(r.x AS DOUBLE) + p.m_f * p.c)
                      / (CAST(r.n AS DOUBLE) + p.c) * 1000000.0) AS BIGINT)
               AS shrunk_ppm
    FROM r, pri p
    """


@register(
    "eb_beta_binomial_shrinkage",
    defer=3,
    oracle=_eb_oracle(),
    doc=f"Empirical-Bayes shrinkage of per-user '{EB_RATE_EVENT}' rates: "
    "beta-binomial prior by method of moments over ppm-quantized rates "
    "(exact integer moments), posterior mean (x + alpha) / (n + alpha + "
    "beta) per user — small-sample users pull toward the corpus prior.",
)
def eb_beta_binomial_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leaderboard de-noiser (Robbins 1956; the baseball-batting
    canon): a user with 1 purchase in 2 events is not a 50%-converter,
    and ranking raw rates rewards tiny denominators.  Fit Beta(alpha,
    beta) across users by method of moments and report each user's
    posterior mean.  Exactness protocol: per-user rates are quantized to
    integral ppm FIRST (stated contract), so the cross-user moments are
    exact BIGINT sums; alpha/beta and the posterior are then identical
    closed-form double expressions in both engines (the CUPED recipe,
    evaluation.py:1836) and outputs floor-quantize — no float aggregate
    ever crosses engines.  Degenerate guard: zero cross-user variance
    leaves the prior undefined (c = NULL -> NULL shrunk columns) rather
    than dividing by zero.  100 TB shape: one user-keyed count agg, one
    1-row moments broadcast back onto the user grain — nothing above
    user grain shuffles, no sort, no driver round-trip.
    """
    ev = table(spark, sf_dir, "events")
    pu = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("event_type") == EB_RATE_EVENT, 1).otherwise(0)
        ).alias("x"),
    )
    # consumed by the moments agg AND the output projection — pin the
    # user grain once or the events scan + agg run per reference
    r = pu.withColumn("rate_ppm", F.expr("1000000 * x div n")).localCheckpoint(
        eager=True
    )
    mom = r.agg(
        F.count("*").alias("k"),
        F.sum("rate_ppm").alias("s1"),
        F.sum(F.col("rate_ppm") * F.col("rate_ppm")).alias("s2"),
    )
    m_f = (F.col("s1").cast("double") / F.col("k")) / F.lit(1_000_000.0)
    v_f = (
        F.col("s2").cast("double") / F.col("k")
        - (F.col("s1").cast("double") / F.col("k"))
        * (F.col("s1").cast("double") / F.col("k"))
    ) / F.lit(1_000_000_000_000.0)
    pri = mom.select(
        m_f.alias("m_f"),
        F.when(v_f > 0, m_f * (F.lit(1.0) - m_f) / v_f - F.lit(1.0))
        .otherwise(F.lit(None))
        .alias("c"),
    )
    return r.crossJoin(F.broadcast(pri)).select(
        "user_id",
        F.col("n").alias("n_events"),
        F.col("x").alias("n_successes"),
        "rate_ppm",
        F.floor(F.col("m_f") * F.col("c") * 1_000_000.0).alias("alpha_x1e6"),
        F.floor((F.lit(1.0) - F.col("m_f")) * F.col("c") * 1_000_000.0).alias(
            "beta_x1e6"
        ),
        F.floor(
            (F.col("x").cast("double") + F.col("m_f") * F.col("c"))
            / (F.col("n").cast("double") + F.col("c"))
            * 1_000_000.0
        ).alias("shrunk_ppm"),
    )


# ---------------------------------------------------------------------------
# Quantile treatment effects (round 9)

QTE_QUANTILES_PPM = (250_000, 500_000, 750_000, 900_000)
QTE_BAND_TOTAL = 1_000  # phase-1 rank band width over per-user totals


def _qte_oracle() -> str:
    from azure_func_forem_data_etl_spark.functions import xxh64_sql as X

    hash_ctes = X.xxh64_longs_expr_ctes(
        "qt", "qpu", ["user_id", "total"], ["user_id"], X.SPARK_HASH_SEED
    )
    signed = X.signed64("h")
    qvals = ", ".join(f"({p})" for p in QTE_QUANTILES_PPM)
    return f"""
    WITH qpu AS MATERIALIZED (
        -- identified users only (r11 null-FK sweep): an anonymous
        -- event has no assignment unit (Spark xxhash64 SKIPS null
        -- inputs, pooling all anonymous traffic into one pseudo-user).
        -- measured events only (r12 NULL-heavy sweep): a user whose
        -- events all carry NULL value has a NULL total, which Spark
        -- ranks NULLS FIRST and DuckDB NULLS LAST — no measurement,
        -- no rank
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(19,4))
                   AS total
        FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY user_id
    ),
    {hash_ctes},
    armed AS MATERIALIZED (
        SELECT user_id, total, ((({signed}) % 2) + 2) % 2 AS arm
        FROM qt_hash
    ),
    ranked AS (
        SELECT arm, total,
               row_number() OVER (PARTITION BY arm ORDER BY total, user_id)
                   AS rn
        FROM armed
    ),
    counts AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n FROM armed GROUP BY arm),
    targets AS (
        SELECT c.arm, c.n, q.q_ppm,
               (q.q_ppm * c.n + 999999) // 1000000 AS trn
        FROM counts c, (VALUES {qvals}) q(q_ppm)
    )
    SELECT CAST(t.q_ppm AS BIGINT) AS q_ppm,
           MAX(CASE WHEN t.arm = 1 THEN t.n END) AS n_treat,
           MAX(CASE WHEN t.arm = 0 THEN t.n END) AS n_ctrl,
           CAST(MAX(CASE WHEN t.arm = 1 THEN r.total END) AS DOUBLE)
               AS q_treat,
           CAST(MAX(CASE WHEN t.arm = 0 THEN r.total END) AS DOUBLE)
               AS q_ctrl,
           CAST(MAX(CASE WHEN t.arm = 1 THEN r.total END) AS DOUBLE)
               - CAST(MAX(CASE WHEN t.arm = 0 THEN r.total END) AS DOUBLE)
               AS qte
    FROM targets t JOIN ranked r ON r.arm = t.arm AND r.rn = t.trn
    GROUP BY t.q_ppm
    """


@register(
    "quantile_treatment_effect",
    defer=3,
    oracle=_qte_oracle(),
    doc="Quantile treatment effects: per hash arm (pmod(xxhash64(user), "
    "2)), exact type-1 order-statistic quantiles of per-user total value "
    "at p25/p50/p75/p90 via two-phase banded ranking, and the per-"
    "quantile treatment-minus-control difference.",
)
def quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where CUPED reads the MEAN, QTE reads the distribution: a
    treatment that moves the p90 while leaving the median alone is
    invisible to the t-test and obvious here (Koenker's quantile lens on
    the two-sample readout).  Quantiles are exact type-1 order
    statistics — value at rank ceil(q*n) under the total (total,
    user_id) order — because sketch quantiles can't feed a defensible
    launch decision when arms differ by less than the sketch error.
    Ranking is the pareto two-phase pattern (windows.py:756), keyed by
    (arm, value band): phase 1 ranks inside each band in parallel,
    phase 2 prefix-sums per-(arm, band) counts on the bounded band grain
    and broadcast-joins the offsets back — no unpartitioned window over
    the user grain.  The ceil is integer ((q_ppm*n + 999999) div 1e6),
    the metric an exact decimal, so both engines select the identical
    row; outputs cast to double (scale-4 decimals are double-exact).
    """
    # identified users with measured events only — see the oracle notes
    # (r11 null-FK sweep; r12 NULL-heavy sweep)
    ev = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    peruser = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("decimal(19,4)")
            .alias("total")
        )
        .withColumn("arm", F.pmod(F.xxhash64("user_id"), F.lit(2)))
        # consumed by the band ranks, the band offsets, and the arm
        # counts — pin the user grain once (no corpus rescan per branch)
        .localCheckpoint(eager=True)
    )
    banded = peruser.withColumn(
        "band", F.floor(F.col("total") / F.lit(QTE_BAND_TOTAL)).cast("long")
    )
    wloc = Window.partitionBy("arm", "band").orderBy("total", "user_id")
    local = banded.select(
        "arm", "band", "total", F.row_number().over(wloc).alias("lrn")
    )
    wband = Window.partitionBy("arm").orderBy("band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        banded.groupBy("arm", "band")
        .agg(F.count("*").alias("bn"))
        .select(
            "arm",
            "band",
            F.coalesce(F.sum("bn").over(wband), F.lit(0)).alias("off"),
        )
    )
    ranked = local.join(F.broadcast(offsets), ["arm", "band"]).select(
        "arm", "total", (F.col("off") + F.col("lrn")).alias("rn")
    )
    counts = peruser.groupBy("arm").agg(F.count("*").alias("n"))
    targets = counts.select(
        "arm",
        "n",
        F.explode(
            F.array(*[F.lit(p) for p in QTE_QUANTILES_PPM])
        ).alias("q_ppm"),
    ).withColumn("trn", F.expr("(q_ppm * n + 999999) div 1000000"))
    # keyed equi-join on (arm, rank): each arm contributes exactly
    # len(QTE_QUANTILES_PPM) rows
    hit = ranked.join(
        F.broadcast(targets.withColumnRenamed("arm", "t_arm")),
        (F.col("arm") == F.col("t_arm")) & (F.col("rn") == F.col("trn")),
    )
    t1 = F.when(F.col("arm") == 1, F.col("total").cast("double"))
    t0 = F.when(F.col("arm") == 0, F.col("total").cast("double"))
    return (
        hit.groupBy(F.col("q_ppm").cast("long").alias("q_ppm"))
        .agg(
            F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_treat"),
            F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_ctrl"),
            F.max(t1).alias("q_treat"),
            F.max(t0).alias("q_ctrl"),
            (F.max(t1) - F.max(t0)).alias("qte"),
        )
    )


# ---------------------------------------------------------------------------
# Group-sequential A/B monitor (round 9)

GSD_WEEK_US = 7 * 86400 * 1_000_000  # absolute epoch week (no corpus anchor)
#: Approximate O'Brien-Fleming shape constant: the boundary at look k of K
#: is C * sqrt(K / k) — very conservative early, ~C at the final look.
#: (Exact OBF constants need the multivariate normal integral; the SHAPE
#: is the operational content and is what the monitor replays exactly.)
GSD_OBF_C = 2.24


def _gsd_oracle() -> str:
    from azure_func_forem_data_etl_spark.functions import xxh64_sql as X

    hash_ctes = X.xxh64_longs_expr_ctes(
        "gs", "gu", ["user_id", "w_seen", "w_conv", "w_last"], ["user_id"],
        X.SPARK_HASH_SEED,
    )
    signed = X.signed64("h")
    z = (
        "(CAST(cx1 AS DOUBLE) / cn1 - CAST(cx0 AS DOUBLE) / cn0)"
        " / sqrt((CAST(cx0 + cx1 AS DOUBLE) / (cn0 + cn1))"
        " * (1.0 - CAST(cx0 + cx1 AS DOUBLE) / (cn0 + cn1))"
        " * (1.0 / cn0 + 1.0 / cn1))"
    )
    guard = (
        "cn0 > 0 AND cn1 > 0 AND cx0 + cx1 > 0 AND cx0 + cx1 < cn0 + cn1"
    )
    bound = f"{GSD_OBF_C} * sqrt(CAST(kk AS DOUBLE) / week_k)"
    return f"""
    WITH gu AS MATERIALIZED (
        -- identified users only (r11 null-FK sweep): an anonymous
        -- event has no assignment unit (Spark xxhash64 SKIPS null
        -- inputs, pooling all anonymous traffic into one pseudo-user)
        SELECT user_id,
               MIN(epoch_us(ts) // {GSD_WEEK_US}) AS w_seen,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) // {GSD_WEEK_US} END) AS w_conv,
               MAX(epoch_us(ts) // {GSD_WEEK_US}) AS w_last
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    {hash_ctes},
    armed AS MATERIALIZED (
        SELECT user_id, w_seen, w_conv, w_last,
               ((({signed}) % 2) + 2) % 2 AS arm
        FROM gs_hash
    ),
    b AS (SELECT MIN(w_seen) AS w0, MAX(w_last) AS w1 FROM armed),
    spine AS (
        SELECT b.w0, b.w1, w.week
        FROM b, UNNEST(generate_series(b.w0, b.w1)) AS w(week)
    ),
    grid AS (
        SELECT CAST(s.week - s.w0 + 1 AS BIGINT) AS week_k,
               CAST(s.w1 - s.w0 + 1 AS BIGINT) AS kk,
               CAST(COUNT(*) FILTER (a.arm = 0 AND a.w_seen <= s.week)
                    AS BIGINT) AS cn0,
               CAST(COUNT(*) FILTER (a.arm = 0 AND a.w_conv <= s.week)
                    AS BIGINT) AS cx0,
               CAST(COUNT(*) FILTER (a.arm = 1 AND a.w_seen <= s.week)
                    AS BIGINT) AS cn1,
               CAST(COUNT(*) FILTER (a.arm = 1 AND a.w_conv <= s.week)
                    AS BIGINT) AS cx1
        FROM spine s CROSS JOIN armed a
        GROUP BY 1, 2
    )
    SELECT week_k, cn0 AS n_ctrl, cx0 AS x_ctrl, cn1 AS n_treat,
           cx1 AS x_treat,
           CASE WHEN {guard}
                THEN CAST(floor(({z}) * 1000000.0) AS BIGINT) END AS z_x1e6,
           CAST(floor(({bound}) * 1000000.0) AS BIGINT) AS bound_x1e6,
           CASE WHEN {guard} AND abs({z}) >= {bound}
                THEN 1 ELSE 0 END AS crossed
    FROM grid
    """


@register(
    "group_sequential_ab_monitor",
    defer=3,
    oracle=_gsd_oracle(),
    doc="Group-sequential A/B monitor: weekly cumulative per-arm user and "
    "converter counts (arms via pmod(xxhash64(user_id), 2)), two-"
    "proportion z per look, O'Brien-Fleming-shaped stopping boundary "
    "C*sqrt(K/k); flags boundary crossings — the peeking-safe readout.",
)
def group_sequential_ab_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fix for the oldest A/B sin — peeking at the p-value every week
    inflates false positives several-fold; group-sequential designs
    (Pocock 1977, O'Brien-Fleming 1979) spend alpha across scheduled
    looks instead.  Each week is a look: cumulative users and converters
    per hash arm, two-proportion z, and an OBF-shaped boundary
    C*sqrt(K/k) that is nearly uncrossable early and ~C at the last
    look.  Exactness: counts reduce to first-seen / first-conversion
    WEEKS per user (one corpus pass, pinned), cumulated on the bounded
    week grain; z and the boundary are identical closed-form doubles in
    both engines (division and sqrt are IEEE-exact), floor-quantized.
    The oracle computes the same looks from a deliberately different
    shape (user x week cross join + conditional counts) so the week-
    grain cumsum logic is independently checked.  100 TB shape: one
    user-keyed agg, then everything lives on the (arm, week) grain
    (two bounded windows + one bounded pivot) — no corpus rescan, no
    unpartitioned window over user rows.
    """
    # identified users only — see the oracle note (r11 null-FK sweep)
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.expr(f"unix_micros(ts) div {GSD_WEEK_US}").alias("week"),
            (F.col("event_type") == "purchase").alias("is_conv"),
        )
    )
    u = (
        ev.groupBy("user_id")
        .agg(
            F.min("week").alias("w_seen"),
            F.min(F.when(F.col("is_conv"), F.col("week"))).alias("w_conv"),
            F.max("week").alias("w_last"),
        )
        .withColumn("arm", F.pmod(F.xxhash64("user_id"), F.lit(2)))
        # consumed by the bounds agg and both histograms — pin once
        .localCheckpoint(eager=True)
    )
    bounds = u.agg(F.min("w_seen").alias("w0"), F.max("w_last").alias("w1"))
    spine = bounds.select(
        "w0",
        "w1",
        F.explode(F.sequence(F.col("w0"), F.col("w1"))).alias("week"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("arm"),
    )
    seen_h = u.groupBy("arm", F.col("w_seen").alias("week")).agg(
        F.count("*").alias("ns")
    )
    conv_h = (
        u.filter(F.col("w_conv").isNotNull())
        .groupBy("arm", F.col("w_conv").alias("week"))
        .agg(F.count("*").alias("nx"))
    )
    wcum = (
        Window.partitionBy("arm")
        .orderBy("week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grid = (
        spine.join(seen_h, ["arm", "week"], "left")
        .join(conv_h, ["arm", "week"], "left")
        .select(
            "arm",
            "week",
            "w0",
            "w1",
            F.sum(F.coalesce("ns", F.lit(0))).over(wcum).alias("cn"),
            F.sum(F.coalesce("nx", F.lit(0))).over(wcum).alias("cx"),
        )
    )
    looks = grid.groupBy(
        (F.col("week") - F.col("w0") + 1).alias("week_k"),
        (F.col("w1") - F.col("w0") + 1).alias("kk"),
    ).agg(
        F.max(F.when(F.col("arm") == 0, F.col("cn"))).alias("cn0"),
        F.max(F.when(F.col("arm") == 0, F.col("cx"))).alias("cx0"),
        F.max(F.when(F.col("arm") == 1, F.col("cn"))).alias("cn1"),
        F.max(F.when(F.col("arm") == 1, F.col("cx"))).alias("cx1"),
    )
    cn0, cx0 = F.col("cn0"), F.col("cx0")
    cn1, cx1 = F.col("cn1"), F.col("cx1")
    pooled = (cx0 + cx1).cast("double") / (cn0 + cn1)
    z = (cx1.cast("double") / cn1 - cx0.cast("double") / cn0) / F.sqrt(
        pooled * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / cn0 + F.lit(1.0) / cn1)
    )
    guard = (
        (cn0 > 0) & (cn1 > 0) & (cx0 + cx1 > 0) & (cx0 + cx1 < cn0 + cn1)
    )
    bound = F.lit(GSD_OBF_C) * F.sqrt(
        F.col("kk").cast("double") / F.col("week_k")
    )
    return looks.select(
        "week_k",
        cn0.alias("n_ctrl"),
        cx0.alias("x_ctrl"),
        cn1.alias("n_treat"),
        cx1.alias("x_treat"),
        F.when(guard, F.floor(z * 1_000_000.0)).alias("z_x1e6"),
        F.floor(bound * 1_000_000.0).alias("bound_x1e6"),
        F.when(guard & (F.abs(z) >= bound), 1).otherwise(0).alias("crossed"),
    )


# ---------------------------------------------------------------------------
# Qini uplift curve (round 9)

QINI_DECILES = 10


def _qini_oracle() -> str:
    from azure_func_forem_data_etl_spark.functions import xxh64_sql as X

    hash_ctes = X.xxh64_longs_expr_ctes(
        "qn", "qu", ["user_id", "score", "conv"], ["user_id"], X.SPARK_HASH_SEED
    )
    signed = X.signed64("h")
    return f"""
    WITH qu AS MATERIALIZED (
        -- identified users only (r11 null-FK sweep): an anonymous
        -- event has no assignment unit (Spark xxhash64 SKIPS null
        -- inputs, pooling all anonymous traffic into one pseudo-user)
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS score,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS conv
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    {hash_ctes},
    armed AS MATERIALIZED (
        SELECT user_id, score, conv, ((({signed}) % 2) + 2) % 2 AS arm
        FROM qn_hash
    ),
    ranked AS (
        SELECT arm, conv,
               ((row_number() OVER (ORDER BY score DESC, user_id) - 1)
                * {QINI_DECILES}) // (SELECT COUNT(*) FROM armed) + 1
                   AS decile
        FROM armed
    ),
    per AS (
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(COUNT(*) FILTER (arm = 1) AS BIGINT) AS dn_t,
               CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
                   AS dx_t,
               CAST(COUNT(*) FILTER (arm = 0) AS BIGINT) AS dn_c,
               CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
                   AS dx_c
        FROM ranked GROUP BY 1
    ),
    cum AS (
        SELECT decile,
               SUM(dn_t) OVER w AS cn_t, SUM(dx_t) OVER w AS cx_t,
               SUM(dn_c) OVER w AS cn_c, SUM(dx_c) OVER w AS cx_c
        FROM per
        WINDOW w AS (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT decile,
           CAST(cn_t AS BIGINT) AS cn_t, CAST(cx_t AS BIGINT) AS cx_t,
           CAST(cn_c AS BIGINT) AS cn_c, CAST(cx_c AS BIGINT) AS cx_c,
           CASE WHEN cn_c > 0 THEN
               CAST(floor((CAST(cx_t AS DOUBLE)
                    - CAST(cx_c AS DOUBLE) * cn_t / cn_c) * 1000000.0)
                    AS BIGINT) END AS qini_x1e6
    FROM cum
    """


@register(
    "uplift_qini_deciles",
    defer=3,
    oracle=_qini_oracle(),
    doc="Qini uplift curve (Radcliffe 2007): users ranked by a "
    "deterministic engagement score into deciles, cumulative treated/"
    "control converter counts per decile (arms via pmod(xxhash64(user), "
    "2)), qini = cx_t - cx_c * cn_t/cn_c — the uplift-targeting gains "
    "curve.",
)
def uplift_qini_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The evaluation curve for 'who should we target': rank users by a
    score, then ask how many INCREMENTAL conversions the top deciles
    contain — treated converters minus the control converters scaled to
    the treated population (Radcliffe's Qini).  A useless score gives a
    straight line to the overall uplift; a good one bows above it.
    Score here is the deterministic engagement proxy (click count), so
    both engines rank identically ((score desc, user_id) total order);
    integer counts cumulate on the bounded decile grain, and the only
    float step is the final scaled difference — identical IEEE doubles,
    floor-quantized.  Decile assignment is exact integer arithmetic
    ((rank-1)*10 div n + 1), ranked with the banded two-phase pattern
    (band = the small-int score itself) — no unpartitioned window over
    the user grain.  100 TB shape: one user-keyed agg, score-band keyed
    ranking, decile-grain everything after.
    """
    # identified users only — see the oracle note (r11 null-FK sweep)
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    u = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("score"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
        .withColumn("arm", F.pmod(F.xxhash64("user_id"), F.lit(2)))
        # consumed by the count agg, the band ranks, and the band offsets
        .localCheckpoint(eager=True)
    )
    n_tot = u.agg(F.count("*").alias("n"))
    # two-phase global rank over (score desc, user_id): band = score
    wloc = Window.partitionBy("score").orderBy("user_id")
    local = u.select(
        "score", "arm", "conv", F.row_number().over(wloc).alias("lrn")
    )
    wband = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        u.groupBy("score")
        .agg(F.count("*").alias("bn"))
        .select(
            "score",
            F.coalesce(F.sum("bn").over(wband), F.lit(0)).alias("off"),
        )
    )
    ranked = (
        local.join(F.broadcast(offsets), "score")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "arm",
            "conv",
            (
                (F.col("off") + F.col("lrn") - 1) * QINI_DECILES
            ).cast("long").alias("rx"),
            "n",
        )
        .select("arm", "conv", F.expr("rx div n + 1").alias("decile"))
    )
    per = ranked.groupBy("decile").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("dn_t"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("dx_t"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("dn_c"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("dx_c"),
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        F.sum("dn_t").over(wcum).alias("cn_t"),
        F.sum("dx_t").over(wcum).alias("cx_t"),
        F.sum("dn_c").over(wcum).alias("cn_c"),
        F.sum("dx_c").over(wcum).alias("cx_c"),
    )
    qini = (
        F.col("cx_t").cast("double")
        - F.col("cx_c").cast("double") * F.col("cn_t") / F.col("cn_c")
    ) * F.lit(1_000_000.0)
    return cum.select(
        "decile",
        "cn_t",
        "cx_t",
        "cn_c",
        "cx_c",
        F.when(F.col("cn_c") > 0, F.floor(qini)).alias("qini_x1e6"),
    )
