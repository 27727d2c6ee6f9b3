"""Similarity search over the embeddings table (north-star LLM pipeline).

Three tiers, by scale:

- ``embedding_cosine_pairs``: JVM-side zip_with/aggregate cosine on a
  bounded sample — pure built-in expressions, oracle-checkable.
- ``knn_bruteforce``: the exact top-k baseline.  Corpus partitions stream
  through ``mapInPandas`` (Arrow batches), cosine against a broadcast
  query matrix via BLAS matmul, per-batch partial top-k, exact global
  top-k merge with a window.  This is the shape that survives 100 TB:
  work is proportional to corpus size, partial top-k caps shuffle output
  at (queries × k) per partition, and the Python boundary is vectorized.
- ``ann_lsh_topk``: the approximate scale path — random-hyperplane LSH
  signatures bucket the corpus; only same-bucket candidates get exact
  scoring.  Recall vs the brute-force oracle is unit-tested.

Cross-engine determinism: cosines are rounded to 6 decimals and ranked by
(rounded cos DESC, neighbor_id) — reorder-of-summation noise (~1e-15)
cannot flip a 1e-6-grid comparison except on measure-zero boundaries.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from azure_func_forem_data_etl_spark.functions.exact import dround, sql_dround
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import (
    SQL_EMB_CANON,
    entity_table,
    entity_table_pinned,
    scale_out,
    table,
)

KNN_K = 5
KNN_QUERY_MOD = 100  # vec_id % 100 == 0 -> 1% of vectors are queries
# Hard bounds on the driver-side query set: a fraction of the corpus is NOT
# a bound at 100 TB.  Total cap fails loudly; per-pass cap sizes each
# broadcast (4096 x 1024-dim f64 = 32 MB worst case).
KNN_MAX_QUERIES_TOTAL = 65_536
KNN_MAX_QUERIES_PER_PASS = 4_096
PAIRS_SAMPLE_MOD = 5
PAIRS_THRESHOLD = 0.3

_KNN_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ]
)


def _np_matrix(pdf_embedding: pd.Series) -> np.ndarray:
    return np.array([np.asarray(e, dtype=np.float64) for e in pdf_embedding])


# Immutable-source metadata memo: registered queries read fixed parquet
# dirs, so corpus row count / embedding width are cached per source path
# and warm reruns skip the metadata-only Spark jobs — the same role a
# table catalog's statistics play on a real deployment.  Keyed by path,
# never by DataFrame, so ad-hoc (mutable) inputs always recompute.
#
# IMMUTABILITY ASSUMPTION (API boundary): a cache_key is a promise that
# the path's contents never change within the session.  A pipeline that
# REWRITES a table at the same path must call :func:`clear_fit_caches`
# (or pass a fresh cache_key, e.g. path + snapshot version) or stale
# row counts / centroids / codebooks will be silently reused — the same
# contract a table catalog's statistics cache carries (r11 VERDICT ask
# #8; re-fit behavior tested in tests/test_certificates.py).
_SOURCE_META: dict[str, int] = {}
_CENTROID_CACHE: dict[str, pd.DataFrame] = {}

#: Every per-source-path fit/metadata memo in the engine registers here
#: so one hook invalidates them all (clustering's k-means memo joins at
#: its module import).
_FIT_CACHES: list[dict] = [_SOURCE_META, _CENTROID_CACHE]


def register_fit_cache(cache: dict) -> dict:
    """Enroll a per-source-path memo dict in :func:`clear_fit_caches`."""
    _FIT_CACHES.append(cache)
    return cache


def clear_fit_caches() -> None:
    """Invalidate every per-source-path fit/metadata memo (centroid
    samples, PQ codebooks, k-means fits, corpus counts/dims).  Call
    after rewriting a table at a path previously used as a cache_key."""
    for c in _FIT_CACHES:
        c.clear()


def _corpus_dim(emb: DataFrame, cache_key: str | None = None) -> int | None:
    """Embedding width from the data (one-row driver read); None if empty."""
    k = f"dim::{cache_key}"
    if cache_key is not None and k in _SOURCE_META:
        return _SOURCE_META[k]
    row = emb.select(F.size("embedding").alias("d")).head()
    dim = None if row is None else int(row["d"])
    if cache_key is not None and dim is not None:
        _SOURCE_META[k] = dim
    return dim


def _corpus_count(emb: DataFrame, cache_key: str | None = None) -> int:
    """Corpus row count (parquet metadata job), memoized per source path."""
    k = f"n::{cache_key}"
    if cache_key is not None and k in _SOURCE_META:
        return _SOURCE_META[k]
    n = emb.count()
    if cache_key is not None:
        _SOURCE_META[k] = n
    return n


def cosine_expr(a: str, b: str) -> Column:
    """Sequential-fold cosine between two array<double> columns (JVM-side)."""
    dot = F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    na = F.expr(
        f"sqrt(aggregate(zip_with({a}, {a}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    nb = F.expr(
        f"sqrt(aggregate(zip_with({b}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    return dot / (na * nb)


def nonzero_norm(col: str) -> Column:
    """Predicate: the array<double> column has a positive FINITE L2 norm
    — the cosine domain.

    Cosine similarity is UNDEFINED for the zero vector; every
    cosine-based query excludes zero vectors from queries and candidates
    (r10 zero-vector sweep: ANSI raises DIVIDE_BY_ZERO on the Spark side
    while DuckDB's list_cosine_similarity silently returns -1).  It is
    equally undefined for vectors carrying IEEE specials (r13 specials
    sweep): a NaN/±Inf component makes every dot product NaN or ±Inf,
    and the two engines' NaN conventions then disagree lane by lane
    (Spark treats NaN as largest in ALL comparisons; DuckDB only in
    ordering).  Such vectors are a data-quality condition — excluded
    WHOLESALE, same treatment as EMB_COMPONENT_BOUND.

    Cross-engine trick: the finiteness leg is written ``norm2 <
    'Infinity'`` because that comparison is FALSE for NaN under BOTH
    conventions (IEEE: unordered; NaN-largest: NaN > Inf) and FALSE for
    an Inf norm on both — the ``> 0`` leg, where the conventions
    diverge on NaN, is only ever reached by finite values.  The SQL
    twin is :func:`sql_cosine_domain`; keep them in lockstep.

    The squares run in DOUBLE, not the raw float32 (r10 ADVICE): a
    component around 1e-23 squares to 0.0 in float32 while staying > 0
    in double, and the oracles compute the test in double
    (``embedding::DOUBLE[]``) — the two engines must agree on WHICH
    vectors are excluded, not just on the excluded rows' values."""
    d = f"CAST({col} AS ARRAY<DOUBLE>)"
    norm2 = F.expr(
        f"aggregate(zip_with({d}, {d}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (norm2 < F.lit(float("inf"))) & (norm2 > 0)


def sql_cosine_domain(expr: str) -> str:
    """DuckDB twin of :func:`nonzero_norm` — interpolate into oracles
    instead of hand-inlining (anti-drift, same move as
    textfold.SQL_FOLD_TEXT).  ``expr`` must already be a DOUBLE[]
    expression."""
    ip = f"list_inner_product({expr}, {expr})"
    return f"({ip} < 'Infinity'::DOUBLE AND {ip} > 0)"


def finite_components(col: str) -> Column:
    """Predicate: every component of the array<float/double> column is
    finite — the domain of Euclidean analytics (k-means, quantization)
    where zero vectors are fine but one NaN/Inf poisons every mean,
    distance, and scale downstream (r13 specials sweep).  Same
    NaN-convention-proof shape as :func:`nonzero_norm`: the absmax fold
    propagates NaN on both engines and ``absmax < Inf`` rejects it under
    either comparison convention.  SQL twin:
    :func:`sql_finite_components`."""
    d = f"CAST({col} AS ARRAY<DOUBLE>)"
    absmax = F.expr(
        f"aggregate({d}, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"
    )
    return absmax < F.lit(float("inf"))


def sql_finite_components(expr: str) -> str:
    """DuckDB twin of :func:`finite_components`; ``expr`` must be a
    DOUBLE[] expression.  COALESCE: an empty vector folds to 0.0 on the
    Spark side and list_max returns NULL here."""
    return (
        f"COALESCE(list_max(list_transform({expr}, x -> abs(x))), 0.0)"
        " < 'Infinity'::DOUBLE"
    )


# ---------------------------------------------------------------------------
# ANN output certificates (rows-only -> oracle promotion, r11 VERDICT ask #1)
#
# The ANN top-k internals (RNG hyperplanes, float k-means, ADC codebooks)
# are not DuckDB-replayable, but their OUTPUTS satisfy data-level
# invariants any correct implementation must: exactly least(k, corpus-1)
# neighbors per query, emitted similarities equal to an independent exact
# cosine recompute of the emitted (query, neighbor) pairs, ranks dense and
# sorted on the (cos DESC, neighbor_id) total order, no self-matches, no
# duplicate neighbors.  The registered queries project those invariants
# per query (same technique as the r6 sketch-family promotion:
# scalars.agg_approx_distinct) so the driver hash-checks them against a
# DuckDB oracle that derives the query domain and projects the expected
# booleans.  The raw (query_id, neighbor_id, cos_sim, rnk) pair form
# stays available through the underlying functions (lsh_topk, ivf_topk,
# pq_topk, ivfpq_topk), whose recall-vs-exact floors and determinism are
# pytest-asserted (tests/test_ann_recall.py, tests/test_similarity.py).

#: Shared DuckDB twin for every ANN top-k certificate: the query domain
#: (vec_id % KNN_QUERY_MOD — both engines' % keeps the dividend sign) plus
#: the expected-TRUE invariant projections.
ANN_CERT_ORACLE = f"""
    SELECT vec_id AS query_id,
           TRUE AS full_k,
           TRUE AS ranks_complete,
           TRUE AS sims_sorted,
           TRUE AS sims_exact,
           TRUE AS no_self,
           TRUE AS neighbors_distinct
    -- canonical vector-store grain (r13 dup-entity leg): one row per id
    FROM {SQL_EMB_CANON} embeddings
    WHERE vec_id % {KNN_QUERY_MOD} = 0
    """


def ann_topk_certificate(
    emb: DataFrame,
    topk: DataFrame,
    n_corpus: int,
    k: int = KNN_K,
    query_mod: int = KNN_QUERY_MOD,
    exact_full_k: bool = True,
) -> DataFrame:
    """Per-query invariant projection of an ANN top-k result (see the
    section note above).  ``full_k`` is the liveness check — a search
    that silently returns nothing fails it.  Two strengths (r12 ADVICE):

    - ``exact_full_k=True`` (PQ / IVF-PQ): the neighbor count must equal
      least(k, corpus - 1).  STRUCTURAL for those variants — the ADC
      pass scores every corpus vector, so that many candidates always
      exist and a shortfall is a genuine defect.
    - ``exact_full_k=False`` (LSH / IVF / trained-IVF): probing variants
      only score the candidates their buckets/lists surface, so an
      exact-count assertion would mislabel a legitimately sparse
      approximate result (thin bucket on unseen data) as a correctness
      mismatch instead of a recall shortfall.  The certificate keeps
      what IS structural — count <= least(k, corpus-1), and >= 1
      whenever any neighbor is expected (liveness: the query's own
      list/bucket is always probed) — and leaves the exact-k property
      to the empirical recall floors in tests/test_ann_recall.py and
      the fixture-pinned exact-count test in tests/test_certificates.py.

    Scale shape: the emitted pairs frame is queries x k rows, so both
    recompute joins BROADCAST it against the corpus scan, the window
    runs on queries x k rows, and the output is one row per query.
    NaN discipline: a zero-norm query or neighbor yields NaN cosine on
    both the emitted and recomputed side; Spark's NaN semantics
    (NaN = NaN, NaN largest in orderings) keep the invariants stable."""
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("__e"))
    qdom = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id")
    )
    pairs = F.broadcast(topk).join(
        e.withColumnsRenamed({"vec_id": "query_id", "__e": "__qe"}), "query_id"
    )
    pairs = F.broadcast(pairs).join(
        e.withColumnsRenamed({"vec_id": "neighbor_id", "__e": "__ne"}),
        "neighbor_id",
    )
    pairs = pairs.withColumn("__resim", F.round(cosine_expr("__qe", "__ne"), 6))
    # ONE aggregation (collect the rnk-sorted per-query list), then every
    # invariant evaluates as a JVM array lambda — no rank window, no
    # multi-countDistinct Expand: the lag-window formulation cost ~1 s of
    # extra exchange/stage overhead per bench run (r12 matched-canary
    # A/B), pure scheduling latency on a queries x k frame.
    per = pairs.groupBy("query_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("rnk").alias("r"),
                    F.col("cos_sim").alias("s"),
                    F.col("neighbor_id").alias("n"),
                    F.col("__resim").alias("e"),
                )
            )
        ).alias("__a")
    )
    n = F.size("__a")
    # NB: sequence(1, 0) counts DOWN in Spark, so the consecutive-pair
    # folds only evaluate under the n >= 2 guard
    ranks_dense = F.expr(
        "forall(sequence(1, size(__a) - 1), i -> __a[i].r = __a[i-1].r + 1)"
    )
    sims_sorted = F.expr(
        "forall(sequence(1, size(__a) - 1), i -> "
        "__a[i-1].s > __a[i].s OR "
        "(__a[i-1].s = __a[i].s AND __a[i-1].n < __a[i].n))"
    )
    per = per.select(
        "query_id",
        n.alias("__n"),
        (F.element_at("__a", 1)["r"] == 1).alias("__first_rank_1"),
        F.when(n <= 1, F.lit(True)).otherwise(ranks_dense).alias("__rdense"),
        F.when(n <= 1, F.lit(True)).otherwise(sims_sorted).alias("__ssorted"),
        # NaN = NaN is TRUE under Spark's NaN semantics; the isnan leg
        # keeps the intent explicit
        F.forall(
            "__a",
            lambda x: (x["s"] == x["e"]) | (F.isnan(x["s"]) & F.isnan(x["e"])),
        ).alias("__sims_exact"),
        F.forall("__a", lambda x: x["n"] != F.col("query_id")).alias("__no_self"),
        (
            F.size(F.array_distinct(F.transform("__a", lambda x: x["n"]))) == n
        ).alias("__ndistinct"),
    )
    expected = F.least(F.lit(k), F.lit(max(0, n_corpus - 1)))
    true = F.lit(True)
    n_actual = F.coalesce(F.col("__n"), F.lit(0))
    if exact_full_k:
        full_k = n_actual == expected
    else:
        full_k = (n_actual <= expected) & (n_actual >= F.least(F.lit(1), expected))
    return qdom.join(F.broadcast(per), "query_id", "left").select(
        "query_id",
        full_k.alias("full_k"),
        # first rank 1 + consecutive ranks = dense 1..n (distinct, max=n)
        F.coalesce(
            F.col("__first_rank_1") & F.col("__rdense"), true
        ).alias("ranks_complete"),
        F.coalesce("__ssorted", true).alias("sims_sorted"),
        F.coalesce("__sims_exact", true).alias("sims_exact"),
        F.coalesce("__no_self", true).alias("no_self"),
        F.coalesce("__ndistinct", true).alias("neighbors_distinct"),
    )


#: Component bound for the QUANTIZED-MOMENT embedding analytics
#: (dim stats, label centroids, PCA): their exact-decimal moment
#: accumulators quantize components at fixed scales (13,9 / 18,6), which
#: is only exact for |x| < 1e4.  Real embedding spaces sit at O(1) (unit
#: or near-unit vectors; even raw fp16 activations cap at 65504 — but
#: trained embedding components in practice are O(1..10)); components at
#: 1e25 (r11 embedding-magnitude sweep) are a data-quality condition, not
#: a statistic to absorb.  Vectors carrying any out-of-bound component
#: are excluded WHOLESALE (vector-level, so centroid/cosine semantics
#: stay coherent) and the exclusion is observable via the
#: `embedding_component_range` DQ rule (profile.dq_expectations_report).
EMB_COMPONENT_BOUND = 1e4


def bounded_components(col: str) -> Column:
    """Predicate: every component of the array<float> column is within
    the quantized-moment analytics domain (see EMB_COMPONENT_BOUND);
    evaluated in DOUBLE like nonzero_norm."""
    d = f"CAST({col} AS ARRAY<DOUBLE>)"
    return (
        F.expr(f"aggregate({d}, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))")
        < EMB_COMPONENT_BOUND
    )


def sql_bounded_components(expr: str) -> str:
    """Oracle twin of :func:`bounded_components`."""
    # COALESCE: list_max of an empty list is NULL, while the Spark
    # aggregate fold starts at 0.0 — an empty vector is in-domain
    return (
        f"COALESCE(list_max(list_transform({expr}::DOUBLE[], x -> abs(x))), 0.0)"
        f" < {EMB_COMPONENT_BOUND!r}"
    )


@register(
    "embedding_cosine_pairs",
    oracle=f"""
    WITH s AS (
        SELECT vec_id, embedding::DOUBLE[] AS e, label
        FROM embeddings WHERE vec_id % {PAIRS_SAMPLE_MOD} = 0
          -- zero vectors excluded: cosine undefined (r10 sweep contract)
          AND {sql_cosine_domain("embedding::DOUBLE[]")}
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.e, b.e), 6) AS cos_sim,
           CAST(a.label = b.label AS INT) AS label_match
    FROM s a JOIN s b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.e, b.e), 6) >= {PAIRS_THRESHOLD}
    """,
    doc="Near-dup candidate pairs by embedding cosine on a 20% sample (JVM-side fold).",
)
def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_func_forem_data_etl_spark.operators._guards import assert_bounded_input

    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % PAIRS_SAMPLE_MOD == 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"), "label")
        .filter(nonzero_norm("e"))  # cosine undefined for zero vectors
    )
    # The a.vec_id < b.vec_id theta-join below is a BroadcastNestedLoopJoin —
    # intentional (exact ground truth for the ANN paths) but quadratic, so
    # refuse to build the plan if the sampled input outgrew its bound.
    assert_bounded_input(emb.select("vec_id"), "embedding_cosine_pairs")
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"), F.col("label").alias("la")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"), F.col("label").alias("lb")
    )
    cos = F.round(cosine_expr("ea", "eb"), 6)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= PAIRS_THRESHOLD)
        .select(
            "vec_a",
            "vec_b",
            "cos_sim",
            (F.col("la") == F.col("lb")).cast("int").alias("label_match"),
        )
    )


def _partial_topk_mapper(bq, k: int):
    """Per-Arrow-batch cosine + partial top-k against the query matrix.

    ``bq`` is a ``sparkContext.broadcast`` of ``(qids, Q)`` — one torrent
    transfer per executor instead of a per-task closure copy.  Emits at
    most len(qids) * k rows per batch.

    Tie handling: after ``argpartition`` (value-only), the cut is widened
    to include every candidate tied with the k-th value, so the final
    ``lexsort`` by (cos DESC, neighbor_id) sees the full tie set — the
    partial top-k under that total order then exactly agrees with the
    oracle's deterministic (cos DESC, id) ranking."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, Q = bq.value
        qn = np.linalg.norm(Q, axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _np_matrix(pdf["embedding"])
            ids = pdf["vec_id"].to_numpy()
            cn = np.linalg.norm(C, axis=1)
            S = np.round((C @ Q.T) / np.outer(cn, qn), 6)  # n x m
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(qids):
                col = S[:, j]
                mask = ids != qid
                cids, cvals = ids[mask], col[mask]
                if len(cids) == 0:
                    continue
                kk = min(k, len(cids))
                if len(cids) > kk:
                    part = np.argpartition(-cvals, kk - 1)
                    cut = cvals[part[kk - 1]]
                    rest = part[kk:]
                    keep = np.concatenate([part[:kk], rest[cvals[rest] >= cut]])
                    cids, cvals = cids[keep], cvals[keep]
                order = np.lexsort((cids, -cvals))[:k]
                out_q.extend([qid] * len(order))
                out_n.extend(cids[order])
                out_c.extend(cvals[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_c}
            )

    return mapper


@register(
    "knn_bruteforce",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        -- canonical vector-store grain (r13 dup-entity leg)
        FROM {SQL_EMB_CANON} embeddings WHERE vec_id % {KNN_QUERY_MOD} = 0
          -- zero vectors excluded: cosine undefined (r10 sweep contract)
          AND {sql_cosine_domain("embedding::DOUBLE[]")}
    ),
    s AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(qe, c.embedding::DOUBLE[]), 6) AS cos_sim
        FROM q, {SQL_EMB_CANON} c
        WHERE c.vec_id <> q.query_id
          AND {sql_cosine_domain("c.embedding::DOUBLE[]")}
    ),
    r AS (
        SELECT query_id, neighbor_id, cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
               ) AS rnk
        FROM s
    )
    SELECT query_id, neighbor_id, cos_sim, rnk FROM r WHERE rnk <= {KNN_K}
    """,
    doc="Exact k-NN baseline: broadcast queries, BLAS cosine per Arrow batch, partial+global top-k.",
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # canonical vector-store grain (r13 dup-entity leg; oracle mirrors)
    return knn_bruteforce_topk(entity_table_pinned(spark, sf_dir, "embeddings"))


def knn_bruteforce_topk(
    emb: DataFrame,
    query_mod: int = KNN_QUERY_MOD,
    k: int = KNN_K,
    max_queries: int = KNN_MAX_QUERIES_TOTAL,
    queries_per_pass: int = KNN_MAX_QUERIES_PER_PASS,
) -> DataFrame:
    """Exact k-NN with a *bounded* driver-side query set.

    The query matrix is collected with a hard cap (``LIMIT max_queries+1``
    then fail loudly — never an unbounded fraction of the corpus), shipped
    to executors via ``sparkContext.broadcast`` (one copy per executor,
    not per task closure), and chunked into passes of ``queries_per_pass``
    so each broadcast stays small even at the cap.  Driver memory is
    O(max_queries * dim) by construction, independent of corpus size."""
    spark = emb.sparkSession
    # zero vectors excluded from BOTH queries and candidates: cosine is
    # undefined for them (see nonzero_norm; r10 zero-vector sweep)
    emb = emb.filter(nonzero_norm("embedding"))
    q = emb.filter(F.col("vec_id") % query_mod == 0).select("vec_id", "embedding")
    qpd = q.orderBy("vec_id").limit(max_queries + 1).toPandas()
    if len(qpd) == 0:  # empty corpus/queries: empty result, not a crash
        # Same columns as the populated path (incl. rnk) so downstream
        # consumers (eval_ndcg_at_k) see a stable schema either way.
        return spark.createDataFrame([], _KNN_SCHEMA).withColumn(
            "rnk", F.lit(1)
        ).filter(F.lit(False))
    if len(qpd) > max_queries:
        raise ValueError(
            f"knn_bruteforce query set exceeds the {max_queries}-query bound; "
            "raise the cap explicitly or thin the query sample (query_mod)"
        )
    qids = qpd["vec_id"].to_numpy()
    Q = _np_matrix(qpd["embedding"])
    # One-file corpus scans as one partition; widen so every core runs a
    # BLAS batch (no-op when the scan is already split).
    corpus = scale_out(emb.select("vec_id", "embedding"), "vec_id")
    sc = spark.sparkContext
    partials = []
    for lo in range(0, len(qids), queries_per_pass):
        bq = sc.broadcast((qids[lo : lo + queries_per_pass], Q[lo : lo + queries_per_pass]))
        partials.append(
            corpus.mapInPandas(_partial_topk_mapper(bq, k), schema=_KNN_SCHEMA)
        )
    partial = partials[0]
    for p in partials[1:]:
        partial = partial.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        partial.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


# ---------------------------------------------------------------------------
# Approximate NN: random-hyperplane LSH

# 16 tables x 6 bits: for this corpus's top-5 neighbors (cos ~0.3-0.5,
# theta ~60-70 deg) per-bit collision ~0.6 => per-table ~0.05, across 16
# tables ~0.55 candidate recall.  More tables buys recall linearly in
# cost; fewer bits buys recall at larger candidate sets.
LSH_TABLES = 16
LSH_BITS = 6


def _hyperplanes(dim: int) -> np.ndarray:
    """Deterministic hyperplanes (fixed seed): (tables*bits) x dim."""
    return np.random.RandomState(4242).randn(LSH_TABLES * LSH_BITS, dim)


def _signature_mapper(H: np.ndarray):
    sig_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("table_id", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(LSH_BITS)).astype(np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"])
            bits = (E @ H.T) > 0  # n x (tables*bits)
            rows = {"vec_id": [], "table_id": [], "bucket": []}
            for t in range(LSH_TABLES):
                chunk = bits[:, t * LSH_BITS : (t + 1) * LSH_BITS]
                buckets = chunk @ weights
                rows["vec_id"].extend(pdf["vec_id"].to_numpy())
                rows["table_id"].extend([t] * len(pdf))
                rows["bucket"].extend(buckets)
            yield pd.DataFrame(rows)

    return mapper, sig_schema


def lsh_topk(
    emb: DataFrame,
    query_mod: int = KNN_QUERY_MOD,
    k: int = KNN_K,
    cache_key: str | None = None,
) -> DataFrame:
    """ANN top-k: same-bucket candidates only, exact cosine rescoring."""
    dim = _corpus_dim(emb, cache_key)
    if dim is None:  # empty corpus
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double, rnk int"
        )
    mapper, sig_schema = _signature_mapper(_hyperplanes(dim))
    # The signature table feeds BOTH sides of the bucket join (query probes
    # and corpus postings); materialize it once or the Python signature
    # pass runs twice.  It is 16 short rows per vector — the persisted
    # index table of a real ANN deployment.
    sigs = (
        scale_out(emb.select("vec_id", "embedding"), "vec_id")
        .mapInPandas(mapper, schema=sig_schema)
        .localCheckpoint(eager=True)
    )
    # Multi-probe: each query also probes the LSH_BITS hamming-1 buckets,
    # lifting candidate recall ~3x for a 7x (tiny) lookup cost.
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(LSH_BITS)],
    )
    qsigs = (
        sigs.filter(F.col("vec_id") % query_mod == 0)
        .select(F.col("vec_id").alias("query_id"), "table_id", F.explode(probes).alias("bucket"))
    )
    cands = (
        qsigs.join(sigs, ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    scored = (
        cands.join(e.withColumnsRenamed({"vec_id": "query_id", "e": "qe"}), "query_id")
        .join(e.withColumnsRenamed({"vec_id": "neighbor_id", "e": "ne"}), "neighbor_id")
        .withColumn("cos_sim", F.round(cosine_expr("qe", "ne"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


@register(
    "ann_lsh_topk",
    # Promoted rows-only -> certificate oracle in r12 (r11 VERDICT ask
    # #1): the hyperplane draws stay engine-internal, but the OUTPUT
    # invariants hash-check (see ann_topk_certificate).
    oracle=ANN_CERT_ORACLE,
    doc=f"ANN top-k via random-hyperplane LSH ({LSH_TABLES} tables x {LSH_BITS} bits), exact rescoring of candidates; output projected as a per-query invariant certificate.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # canonical vector-store grain (r13 dup-entity leg; oracle mirrors);
    # "#canon" memo key: raw-grain readers share the same source path
    emb = entity_table_pinned(spark, sf_dir, "embeddings")
    ck = f"{sf_dir}/embeddings#canon"
    # probing variant: bounded-count + liveness full_k (r12 ADVICE #1)
    return ann_topk_certificate(
        emb, lsh_topk(emb, cache_key=ck), _corpus_count(emb, ck),
        exact_full_k=False,
    )


# ---------------------------------------------------------------------------
# Approximate NN: IVF (inverted-file) coarse quantizer

# Centroids are a deterministic corpus sample instead of a k-means fit —
# same inverted-list machinery, no training job; a real deployment swaps
# in trained centroids without touching the dataflow.  The count is sized
# so the expected inverted-list length stays ~constant (cost per probe is
# then O(IVF_TARGET_LIST) at any corpus size) and HARD-clamped at
# IVF_MAX_CENTROIDS so driver memory is O(budget * dim) — never a corpus
# fraction (the round-1 flaw).  Corpora big enough to hit the clamp swap
# in trained centroids and a larger explicit budget.
IVF_MAX_CENTROIDS = 4096
IVF_TARGET_LIST = 48
IVF_NPROBE = 8
IVF_ASSIGN_PROBES = 8  # multi-assignment width for the pair-generation path


def _centroid_budget(
    n_vectors: int, probes: int = 1, target_list: int = IVF_TARGET_LIST
) -> int:
    """#centroids giving expected list length ≈ target_list under
    ``probes``-way assignment, clamped to the hard driver budget."""
    import math

    return max(4, min(IVF_MAX_CENTROIDS, math.ceil(n_vectors * probes / target_list)))

_ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cluster_id", T.LongType()),
    ]
)

#: Assignment rows that carry the vector itself — the classical IVF
#: layout (vectors stored IN the inverted lists): one corpus shuffle by
#: cluster_id replaces a later corpus-wide join back to the embedding
#: table for neighbor rescoring (r11, VERDICT ask #8).
_ASSIGN_EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cluster_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _sample_centroids(
    emb: DataFrame, n: int, cache_key: str | None = None
) -> pd.DataFrame:
    """Deterministic fixed-budget centroid sample: order by a hash of
    vec_id, take n.  ``orderBy + limit`` compiles to TakeOrdered — only n
    rows ever reach the driver, so this is O(n * dim) driver memory at any
    corpus size (the fix for the round-1 fraction-based collect).

    The sample is a pure function of the (immutable) source, so it is
    memoized per path like the other source metadata — ≤ budget×dim
    doubles per key."""
    k = f"centroids::{cache_key}::{n}"
    if cache_key is not None and k in _CENTROID_CACHE:
        return _CENTROID_CACHE[k]
    cpd = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(n)
        .toPandas()
    )
    if cache_key is not None:
        _CENTROID_CACHE[k] = cpd
    return cpd


def _assign_mapper(
    cids: np.ndarray,
    C: np.ndarray,
    n_probes: int = 1,
    carry_embedding: bool = False,
):
    """Nearest-centroid assignment per Arrow batch (cosine; ties -> lowest
    centroid id, deterministic).  ``n_probes > 1`` multi-assigns each
    vector to its n nearest lists — used by the pair-generation path so
    near-dups split across a Voronoi boundary still share a list.
    ``carry_embedding`` emits the vector alongside its assignment
    (schema ``_ASSIGN_EMB_SCHEMA``) so the inverted lists are
    self-contained for rescoring."""
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    order = np.argsort(cids)
    cids_sorted, Cn_sorted = cids[order], Cn[order]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"])
            En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
            sims = En @ Cn_sorted.T
            p = min(n_probes, sims.shape[1])
            # stable sort => ties resolve to the lowest centroid id
            best = np.argsort(-sims, axis=1, kind="stable")[:, :p]
            ids = np.repeat(pdf["vec_id"].to_numpy(), p)
            cols = {"vec_id": ids, "cluster_id": cids_sorted[best].ravel()}
            if carry_embedding:
                cols["embedding"] = np.repeat(pdf["embedding"].to_numpy(), p)
            yield pd.DataFrame(cols)

    return mapper


def ivf_topk(
    emb: DataFrame,
    query_mod: int = KNN_QUERY_MOD,
    k: int = KNN_K,
    nprobe: int | None = None,
    centroids: tuple[np.ndarray, np.ndarray] | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """IVF ANN: assign corpus to inverted lists once; queries probe their
    ``nprobe`` nearest lists; exact cosine rescoring of list members only.

    At 100 TB the assignment is a single corpus pass against broadcast
    centroids, the inverted lists shuffle by cluster_id (bounded skew:
    sampled centroids track data density), and rescoring touches
    ~nprobe/n_centroids of the corpus per query.
    """
    spark = emb.sparkSession
    empty = "query_id long, neighbor_id long, cos_sim double, rnk int"
    n_vectors = _corpus_count(emb, cache_key)
    if n_vectors == 0:  # empty corpus: no centroids -> empty result
        return spark.createDataFrame([], empty)
    if centroids is None:
        cpd = _sample_centroids(emb, _centroid_budget(n_vectors), cache_key)
        cids = cpd["vec_id"].to_numpy()
        C = _np_matrix(cpd["embedding"])
    else:
        # trained centroids (e.g. clustering.kmeans_fit): ids are just
        # list labels — callers pass arange(k)
        cids, C = centroids
    if nprobe is None:
        nprobe = _ivf_nprobe(len(cids))
    corpus = scale_out(emb.select("vec_id", "embedding"), "vec_id")
    # classical IVF layout: the inverted lists carry the vectors, so
    # rescoring never joins back to the corpus (one shuffle, not two)
    assignments = corpus.mapInPandas(
        _assign_mapper(cids, C, carry_embedding=True), schema=_ASSIGN_EMB_SCHEMA
    )
    return _ivf_probe_rescore(
        emb, assignments, cids, C, query_mod, k, nprobe,
        assignments_carry_embedding=True,
    )


def _ivf_probe_rescore(
    emb: DataFrame,
    assignments: DataFrame,
    cids: np.ndarray,
    C: np.ndarray,
    query_mod: int,
    k: int,
    nprobe: int,
    assignments_carry_embedding: bool = False,
) -> DataFrame:
    """Shared IVF query half: probe-list selection (driver, hard-bounded)
    + exact cosine rescoring of probed list members.  Used by both the
    build-and-query path (ivf_topk) and the saved-index path
    (ivf_query_index).

    Query embeddings are already driver-resident (the bounded probe
    collect), so they rejoin as a BROADCAST literal frame rather than a
    corpus-wide shuffle join; the neighbor side joins the corpus only
    when the inverted lists don't carry the vectors themselves
    (``assignments_carry_embedding=False``, the parquet-resident saved
    index whose assignment table stays vec_id->cluster_id)."""
    spark = emb.sparkSession
    empty = "query_id long, neighbor_id long, cos_sim double, rnk int"
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    # Query probe lists, computed driver-side under the same hard bound as
    # knn_bruteforce (a sample *fraction* is not a bound at 100 TB).
    qpd = (
        emb.filter(F.col("vec_id") % query_mod == 0)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(KNN_MAX_QUERIES_TOTAL + 1)
        .toPandas()
    )
    if len(qpd) == 0:
        return spark.createDataFrame([], empty)
    if len(qpd) > KNN_MAX_QUERIES_TOTAL:
        raise ValueError(
            f"ivf_topk query set exceeds the {KNN_MAX_QUERIES_TOTAL}-query bound; "
            "thin the query sample (query_mod) or raise the cap explicitly"
        )
    Q = _np_matrix(qpd["embedding"])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    order = np.argsort(cids)
    sims = Qn @ Cn[order].T
    probes = []
    for qi, qid in enumerate(qpd["vec_id"].to_numpy()):
        top = np.argsort(-sims[qi], kind="stable")[:nprobe]
        probes.extend((int(qid), int(cids[order][t])) for t in top)
    probe_df = spark.createDataFrame(probes, "query_id LONG, cluster_id LONG")

    cands = (
        F.broadcast(probe_df)
        .join(assignments, "cluster_id")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    if assignments_carry_embedding:
        cands = cands.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").cast("array<double>").alias("ne"),
        )
    else:
        e = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").cast("array<double>").alias("ne"),
        )
        cands = cands.select(
            "query_id", F.col("vec_id").alias("neighbor_id")
        ).join(e, "neighbor_id")
    # float32 -> float64 is exact, so the literal qe frame is bit-identical
    # to cast(embedding as array<double>) on the corpus side
    qe_df = spark.createDataFrame(
        [
            (int(i), [float(x) for x in v])
            for i, v in zip(qpd["vec_id"], qpd["embedding"])
        ],
        "query_id LONG, qe ARRAY<DOUBLE>",
    )
    scored = cands.join(F.broadcast(qe_df), "query_id").withColumn(
        "cos_sim", F.round(cosine_expr("qe", "ne"), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


@register(
    "ann_ivf_topk",
    # Promoted rows-only -> certificate oracle in r12 (r11 VERDICT ask
    # #1): centroid sampling/assignment stays engine-internal, but the
    # OUTPUT invariants hash-check (see ann_topk_certificate).
    oracle=ANN_CERT_ORACLE,
    doc="ANN top-k via IVF inverted lists (fixed-budget centroids, sqrt-scaled nprobe), exact rescoring; output projected as a per-query invariant certificate.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # canonical vector-store grain (r13 dup-entity leg; oracle mirrors);
    # "#canon" memo key: raw-grain readers share the same source path
    emb = entity_table_pinned(spark, sf_dir, "embeddings")
    ck = f"{sf_dir}/embeddings#canon"
    # probing variant: bounded-count + liveness full_k (r12 ADVICE #1)
    return ann_topk_certificate(
        emb, ivf_topk(emb, cache_key=ck), _corpus_count(emb, ck),
        exact_full_k=False,
    )


# ---------------------------------------------------------------------------
# IVF index persistence: build once, query many

def ivf_save_index(
    emb: DataFrame, index_dir: str, cache_key: str | None = None
) -> None:
    """Persist an IVF index as two parquet tables: ``centroids`` (id +
    vector, <= 4,096 rows) and ``assignments`` (vec_id -> cluster_id, one
    row per corpus vector).

    This is the index *lifecycle* an embedding lake needs at 100 TB:
    the corpus-pass assignment runs ONCE at build time; every later
    query session loads KB-sized centroids to the driver and prunes the
    parquet-resident inverted lists by cluster_id — no re-assignment,
    no full-corpus scan.  (Embeddings themselves stay in the lake table;
    the index references them by vec_id, like a database secondary
    index.)"""
    spark = emb.sparkSession
    n_vectors = _corpus_count(emb, cache_key)
    if n_vectors == 0:
        # write empty tables so the query path degrades cleanly
        spark.createDataFrame([], "vec_id long, embedding array<float>").write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/centroids")
        spark.createDataFrame([], _ASSIGN_SCHEMA).write.mode("overwrite").parquet(
            f"{index_dir}/assignments"
        )
        return
    cpd = _sample_centroids(emb, _centroid_budget(n_vectors), cache_key)
    cids = cpd["vec_id"].to_numpy()
    C = _np_matrix(cpd["embedding"])
    spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(cids, C)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")
    corpus = scale_out(emb.select("vec_id", "embedding"), "vec_id")
    corpus.mapInPandas(_assign_mapper(cids, C), schema=_ASSIGN_SCHEMA).write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/assignments")


def ivf_query_index(
    emb: DataFrame,
    index_dir: str,
    query_mod: int = KNN_QUERY_MOD,
    k: int = KNN_K,
    nprobe: int | None = None,
) -> DataFrame:
    """ANN query against a saved index (``ivf_save_index``): centroids
    load driver-side (bounded by the build-time budget), inverted lists
    stream from parquet — identical results to the build-and-query path
    because sampling, assignment, and rescoring are all deterministic."""
    spark = emb.sparkSession
    cpd = (
        spark.read.parquet(f"{index_dir}/centroids").orderBy("vec_id").toPandas()
    )
    if len(cpd) == 0:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double, rnk int"
        )
    cids = cpd["vec_id"].to_numpy()
    C = _np_matrix(cpd["embedding"])
    assignments = spark.read.parquet(f"{index_dir}/assignments")
    if nprobe is None:
        nprobe = _ivf_nprobe(len(cids))
    return _ivf_probe_rescore(emb, assignments, cids, C, query_mod, k, nprobe)


@register(
    "embedding_quantize_int8",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        -- quantization domain = finite vectors (r13 specials sweep): a
        -- NaN/Inf component makes the absmax scale non-finite and every
        -- q = round(x/scale) undefined (Spark ANSI raises CAST_OVERFLOW)
        WHERE {sql_finite_components("embedding::DOUBLE[]")}
    ),
    s AS (
        SELECT vec_id, e,
               CASE WHEN list_max(list_transform(e, x -> abs(x))) = 0 THEN 1.0
                    ELSE list_max(list_transform(e, x -> abs(x))) / 127.0 END AS scale
        FROM v
    ),
    q AS (
        -- display-scale rounding via the shortest-repr dround contract:
        -- plain round re-rounds 1e14-magnitude scales on the scaled
        -- path (r11 embedding-magnitude sweep)
        SELECT vec_id, {sql_dround("scale", 9)} AS scale,
               list_transform(e, x -> CAST(round(x / scale) AS INT)) AS qv
        FROM s
    )
    SELECT vec_id, scale,
           qv[1] AS q_first,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           list_min(qv) AS q_min,
           list_max(qv) AS q_max
    FROM q
    """,
    doc="Symmetric int8 embedding quantization (per-vector absmax scale) — "
    "4x storage cut for ANN corpora; JVM-side lambda expressions only.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector absmax int8 quantization, the standard storage/bandwidth
    reduction for billion-vector ANN corpora: q = round(x / scale),
    scale = max|x| / 127.  Entirely built-in array lambdas (transform /
    aggregate) inside whole-stage codegen — a map-only pass at 100 TB, no
    Python, no shuffle.  Reconstruction error |q*scale - x| <= scale/2 is
    unit-tested; the registry output exposes scalar surrogates (first/sum/
    min/max) so the driver canonicalizer sees no array columns.

    Domain: FINITE vectors only (finite_components, r13 specials sweep)
    — one NaN/Inf component poisons the absmax scale and, under ANSI,
    crashes the int cast; at 100 TB a single dirty vector must be
    quarantined by the gate, not kill the job."""
    emb = table(spark, sf_dir, "embeddings").filter(
        finite_components("embedding")
    )
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    mx = F.expr(
        "aggregate(transform(e, x -> abs(x)), CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, x))"
    )
    s = v.withColumn("scale_raw", F.when(mx == 0, F.lit(1.0)).otherwise(mx / F.lit(127.0)))
    q = s.withColumn(
        "qv", F.transform("e", lambda x: F.round(x / F.col("scale_raw")).cast("int"))
    )
    return q.select(
        "vec_id",
        dround(F.col("scale_raw"), 9).alias("scale"),
        F.element_at("qv", 1).alias("q_first"),
        F.expr("aggregate(qv, 0L, (a, x) -> a + x)").alias("q_sum"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
    )


def quantized_vectors(emb: DataFrame) -> DataFrame:
    """(vec_id, scale, qv array<int>) — the full-array variant for
    downstream use (quantized ANN, storage); unit-test surface."""
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    mx = F.expr(
        "aggregate(transform(e, x -> abs(x)), CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, x))"
    )
    s = v.withColumn("scale", F.when(mx == 0, F.lit(1.0)).otherwise(mx / F.lit(127.0)))
    return s.withColumn(
        "qv", F.transform("e", lambda x: F.round(x / F.col("scale")).cast("int"))
    ).select("vec_id", "scale", "qv", "e")


def ivf_candidate_pairs(
    emb: DataFrame,
    threshold: float = PAIRS_THRESHOLD,
    assign_probes: int = IVF_ASSIGN_PROBES,
) -> DataFrame:
    """Scalable cosine candidate pairs: IVF multi-assignment buckets the
    corpus (each vector joins its ``assign_probes`` nearest inverted
    lists), within-list candidates are hot-bucket-bounded (star fallback),
    and only candidates get exact cosine scoring.

    This is the 100 TB edge source for embedding clustering: cost is one
    corpus pass for assignment + a bucketed self-join — never the O(n^2)
    all-pairs shape (``embedding_cosine_pairs`` stays a bounded-sample
    ground-truth op only).  Recall vs the exact pairs is unit-tested."""
    from azure_func_forem_data_etl_spark.operators.dedup import capped_bucket_pairs

    spark = emb.sparkSession
    n_vectors = emb.count()
    if n_vectors == 0:
        return spark.createDataFrame([], "vec_a long, vec_b long, cos_sim double")
    cpd = _sample_centroids(emb, _centroid_budget(n_vectors, probes=assign_probes))
    cids = cpd["vec_id"].to_numpy()
    C = _np_matrix(cpd["embedding"])
    corpus = scale_out(emb.select("vec_id", "embedding"), "vec_id")
    assignments = corpus.mapInPandas(
        _assign_mapper(cids, C, n_probes=assign_probes), schema=_ASSIGN_SCHEMA
    )
    cand = capped_bucket_pairs(assignments, ["cluster_id"], "vec_id")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    scored = (
        cand.select(F.col("vec_id_a").alias("vec_a"), F.col("vec_id_b").alias("vec_b"))
        .join(e.withColumnsRenamed({"vec_id": "vec_a", "e": "ea"}), "vec_a")
        .join(e.withColumnsRenamed({"vec_id": "vec_b", "e": "eb"}), "vec_b")
        .withColumn("cos_sim", F.round(cosine_expr("ea", "eb"), 6))
        .filter(F.col("cos_sim") >= threshold)
    )
    return scored.select("vec_a", "vec_b", "cos_sim")


@register(
    "embedding_neardup_clusters",
    oracle=None,  # composes the iterative component fixpoint; invariants unit-tested
    doc="Embedding-space near-dup clustering: IVF-bucketed cosine candidate "
    "pairs -> connected components -> keep-one-representative groups.",
)
def embedding_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering contract as the text near-dup path
    (``neardup_cluster_components``) but with cosine-similarity edges: the
    component operator is edge-source-agnostic, which is the point — any
    pairwise similarity (MinHash, SimHash, cosine, exact hash) feeds one
    shared keep-one-per-cluster dedup step.

    Edges come from ``ivf_candidate_pairs`` (bucketed, ~linear), NOT the
    all-pairs sampled ``embedding_cosine_pairs`` — at 100 TB the clustering
    path must never inherit an O(n^2) edge source."""
    from azure_func_forem_data_etl_spark.operators.dedup import connected_components

    pairs = ivf_candidate_pairs(table(spark, sf_dir, "embeddings"))
    comp = connected_components(pairs, "vec_a", "vec_b")
    sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "comp").select(
        F.col("id").alias("vec_id"),
        F.col("comp").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("comp")).cast("int").alias("is_representative"),
    )


# ---------------------------------------------------------------------------
# per-dimension corpus statistics (feature scaling / drift monitoring)


@register(
    "embedding_dim_stats",
    oracle=f"""
    WITH x AS (
        SELECT i - 1 AS dim,
               CAST(round(CAST(embedding[i] AS DOUBLE), 9)
                    AS DECIMAL(14,9)) AS q,
               CAST(embedding[i] AS DOUBLE) AS xd
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
        -- quantized-moment domain: vectors with any |component| >= 1e4
        -- are excluded wholesale (see similarity.EMB_COMPONENT_BOUND;
        -- observable via the embedding_component_range DQ rule)
        WHERE {sql_bounded_components('embedding')}
    )
    SELECT CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(q) AS DOUBLE) / COUNT(*), 6) AS mean,
           -- sample variance is undefined for a single vector: NULL (the
           -- row keeps its well-defined n/mean/min/max; r11 sweep)
           CASE WHEN COUNT(*) > 1 THEN
               round((CAST(SUM(q * q) AS DOUBLE)
                      - CAST(SUM(q) AS DOUBLE) * CAST(SUM(q) AS DOUBLE)
                        / COUNT(*))
                     / (COUNT(*) - 1), 6) END AS var,
           min(xd) AS mn,
           max(xd) AS mx
    FROM x
    GROUP BY dim
    """,
    doc="Per-dimension embedding stats (n/mean/var/min/max) via posexplode; "
    "exact decimal moments so results are partition-order-independent.",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-scaling statistics per embedding dimension — the input to
    whitening / standardization and the standard drift monitor for an
    embedding column.

    Shape: posexplode (map-side fanout x dim) -> one hash agg keyed by
    dim.  The shuffle carries only (dim, decimal moment) partials — with
    64 dims and map-side combine the shuffle is O(partitions x dims),
    independent of corpus size.  Double sums are order-dependent, so
    moments accumulate in exact DECIMAL (inputs pre-rounded to 9dp,
    squares exact at (26,18)); min/max of doubles are order-safe as-is.
    Domain: the fixed quantization scales are exact only for
    |component| < 1e4, so out-of-bound vectors are excluded wholesale
    (bounded_components; r11 embedding-magnitude sweep)."""
    emb = table(spark, sf_dir, "embeddings").filter(
        bounded_components("embedding")
    )
    x = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "xd")
    ).select(
        # DECIMAL(14,9), not (13,9): the open |x| < 1e4 domain bound
        # leaves a band [1e4-ulp, 1e4) whose 9dp rounding is exactly
        # 10000.000000000 — one integer digit past a (13,9) quantizer
        # (r12 ADVICE; unreachable for float32 inputs, latent for wider)
        "dim", "xd", F.round("xd", 9).cast("decimal(14,9)").alias("q")
    )
    n = F.count("*")
    s = F.sum("q").cast("double")
    ss = F.sum(F.col("q") * F.col("q")).cast("double")
    return x.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        n.cast("long").alias("n"),
        F.round(s / n, 6).alias("mean"),
        # single-vector corpus: sample variance undefined -> NULL (CASE-
        # guarded so the (n-1) division never evaluates; r11 sweep)
        F.when(n > 1, F.round((ss - s * s / n) / (n - F.lit(1)), 6)).alias(
            "var"
        ),
        F.min("xd").alias("mn"),
        F.max("xd").alias("mx"),
    )


from azure_func_forem_data_etl_spark.plans.registry import REGISTRY as _REG


@register(
    "knn_label_accuracy",
    oracle=f"""
    WITH knn AS ({_REG["knn_bruteforce"].oracle}),
    -- labeled rows only (r12 NULL-heavy sweep): an unlabeled neighbor
    -- casts no vote (and the NULL-label vote group argmax-orders
    -- engine-opposite), and an unlabeled query has no ground truth
    lab AS (SELECT vec_id, CAST(label AS INT) AS label
            FROM {SQL_EMB_CANON} embeddings
            WHERE label IS NOT NULL),
    votes AS (
        SELECT k.query_id, l.label, count(*) AS c
        FROM knn k JOIN lab l ON k.neighbor_id = l.vec_id
        GROUP BY k.query_id, l.label
    ),
    pred AS (
        SELECT query_id, label AS pred_label FROM (
            SELECT query_id, label,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY c DESC, label
                   ) AS rn
            FROM votes
        ) WHERE rn = 1
    )
    SELECT p.query_id,
           ql.label AS true_label,
           p.pred_label,
           CAST(ql.label = p.pred_label AS INT) AS correct
    FROM pred p JOIN lab ql ON p.query_id = ql.vec_id
    """,
    doc="Embedding-quality evaluation: k-NN label classification — "
    "majority vote over the exact top-k neighbors vs the query's own "
    "label, per query (deterministic tie-break).",
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard intrinsic embedding eval (k-NN classification): if
    neighbors share the query's label, the space clusters semantically.
    Composes the exact brute-force top-k with a majority vote
    (count DESC, label ASC tie-break — fully deterministic).

    Scale shape: the vote operates on the (queries x k)-sized neighbor
    list — never the corpus — and label attachment broadcasts that small
    side into the labels join; two tiny aggregations after."""
    emb = entity_table_pinned(spark, sf_dir, "embeddings")
    # labeled rows only — see the oracle note (r12 NULL-heavy sweep)
    lab = emb.select("vec_id", F.col("label").cast("int").alias("label")).filter(
        F.col("label").isNotNull()
    )
    knn = knn_bruteforce_topk(emb)
    votes = (
        F.broadcast(knn.select("query_id", "neighbor_id"))
        .join(lab.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("c"))
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("label"))
    )
    pred = (
        votes.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"))
    )
    return (
        F.broadcast(pred)
        .join(lab.withColumnRenamed("vec_id", "query_id"), "query_id")
        .select(
            "query_id",
            F.col("label").alias("true_label"),
            "pred_label",
            (F.col("label") == F.col("pred_label")).cast("int").alias(
                "correct"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-compression ANN tier
#
# IVF/LSH shrink the *candidate set*; PQ shrinks the *vectors themselves*:
# the embedding space is split into PQ_M subspaces and each subvector is
# replaced by the id of its nearest codeword, so a dim x float32 vector
# becomes PQ_M bytes (dim=64 float -> 256 B -> 8 B, 32x).  At 100 TB that
# is the difference between an index that fits in cluster RAM and one that
# does not.  Scan-time scoring is ADC (asymmetric distance computation):
# each query precomputes a PQ_M x K table of query-subvector . codeword
# dots (K = _pq_codewords, sqrt-of-corpus-scaled, 16..256)
# dots, and every corpus vector's approximate dot is PQ_M table lookups —
# no float vector is ever touched until the exact rescore of the top
# candidates.  Training is driver-side k-means per subspace on a
# hard-bounded sample (same bound discipline as the IVF centroid budget).

PQ_M = 8              # subspaces (codes per vector)
PQ_K_MIN = 16         # codeword floor (4-bit codes at the smallest corpora)
PQ_K_MAX = 256        # codeword cap (8-bit codes — one byte per subspace)
PQ_TRAIN_SAMPLE = 2048  # driver-side training sample (hard bound)
PQ_KMEANS_ITERS = 10
PQ_CAND_FACTOR = 8    # ADC keeps k*factor candidates for exact rescore


def _pq_codewords(n_vectors: int) -> int:
    """Corpus-adaptive codebook size (r10 VERDICT ask #4): codewords per
    subspace grow ~sqrt(corpus), rounded up to a power of two, clamped to
    [PQ_K_MIN, PQ_K_MAX].  Fixed 16-codeword books quantize a growing
    gaussian corpus too coarsely (measured recall@5: 0.33 at 2k vectors);
    sqrt scaling reaches 64 codewords there (0.73 with the factor-8
    shortlist) and saturates at byte codes (256) for any big corpus —
    training stays a bounded driver-side sample either way."""
    k = 1 << max(4, math.ceil(math.log2(max(16.0, math.sqrt(max(1, n_vectors))))))
    return min(PQ_K_MAX, k)


def _ivf_nprobe(n_centroids: int) -> int:
    """Corpus-adaptive probe width: ~2.5*sqrt(n_centroids), floored at the
    historical fixed default.  A FIXED nprobe makes recall decay as the
    list count grows with the corpus (measured: 0.88 at 11 lists, 0.45 at
    42); sqrt scaling keeps the probed FRACTION shrinking (16/42 here,
    160/4096 ≈ 4% at the centroid cap) while recall holds ≥ 0.7."""
    return max(IVF_NPROBE, min(n_centroids, math.ceil(2.5 * math.sqrt(n_centroids))))

_PQ_CODE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ]
)


def _pq_subspaces(dim: int, m: int = PQ_M) -> list[tuple[int, int]]:
    """Split [0, dim) into m contiguous, nearly-equal slices."""
    bounds = [round(i * dim / m) for i in range(m + 1)]
    return [(bounds[i], bounds[i + 1]) for i in range(m) if bounds[i] < bounds[i + 1]]


def _kmeans_1d(X: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means (seeded by evenly-spaced sample
    points, not RNG) for one subspace.  Runs on the driver over the bounded
    training sample only: O(sample * k * subdim)."""
    n = len(X)
    k = min(k, n)
    # deterministic init: evenly spaced rows of the (hash-ordered) sample
    C = X[np.linspace(0, n - 1, k).astype(int)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def pq_train(
    emb: DataFrame, cache_key: str | None = None
) -> list[np.ndarray] | None:
    """Train per-subspace codebooks on a deterministic bounded sample of
    the L2-normalized corpus.  Returns a list of (K x subdim) arrays with
    K = :func:`_pq_codewords` (corpus-adaptive), or None on an empty
    corpus.  Memoized per source path."""
    k = f"pq::{cache_key}"
    if cache_key is not None and k in _CENTROID_CACHE:
        return _CENTROID_CACHE[k]
    spd = _sample_centroids(emb, PQ_TRAIN_SAMPLE, cache_key)
    if len(spd) == 0:
        return None
    n_codewords = _pq_codewords(_corpus_count(emb, cache_key))
    S = _np_matrix(spd["embedding"])
    S = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    books = [
        _kmeans_1d(S[:, lo:hi], n_codewords, PQ_KMEANS_ITERS)
        for lo, hi in _pq_subspaces(S.shape[1])
    ]
    if cache_key is not None:
        _CENTROID_CACHE[k] = books
    return books


def _pq_encode_mapper(books: list[np.ndarray], slices: list[tuple[int, int]]):
    """Per-Arrow-batch PQ encoding: L2-normalize, then nearest codeword per
    subspace (ties -> lowest codeword id via argmin)."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"])
            En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(En), len(slices)), dtype=np.int64)
            for m, (lo, hi) in enumerate(slices):
                sub = En[:, lo:hi]
                B = books[m]
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
                d = (sub**2).sum(1)[:, None] - 2 * sub @ B.T + (B**2).sum(1)[None, :]
                codes[:, m] = d.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes.astype(object))}
            )

    return mapper


def _pq_encode_adc_mapper(bq, k_keep: int):
    """Fused encode + ADC scan per Arrow batch of (vec_id, embedding):
    PQ-encode the batch, then score codes via per-query lookup tables and
    keep a partial top-k_keep.  One Python pass over the corpus instead of
    encode->JVM->ADC (halves the Arrow boundary crossings; on a stored-
    index deployment the encode half is ``_pq_encode_mapper`` at build
    time and this degenerates to the ADC half reading codes).  ``bq``
    broadcasts (qids, LUT, books, slices); LUT is (n_queries x M x K)."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, LUT, books, slices = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"])
            En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(En), len(slices)), dtype=np.int64)
            for m, (lo, hi) in enumerate(slices):
                sub = En[:, lo:hi]
                B = books[m]
                d = (sub**2).sum(1)[:, None] - 2 * sub @ B.T + (B**2).sum(1)[None, :]
                codes[:, m] = d.argmin(axis=1)
            ids = pdf["vec_id"].to_numpy()
            # scores[n, q] = sum_m LUT[q, m, codes[n, m]]
            scores = np.zeros((len(ids), len(qids)))
            for m in range(codes.shape[1]):
                scores += LUT[:, m, codes[:, m]].T
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(qids):
                col = scores[:, j]
                mask = ids != qid
                cids, cvals = ids[mask], col[mask]
                if len(cids) == 0:
                    continue
                kk = min(k_keep, len(cids))
                if len(cids) > kk:
                    part = np.argpartition(-cvals, kk - 1)[:kk]
                    cids, cvals = cids[part], cvals[part]
                order = np.lexsort((cids, -cvals))
                out_q.extend([qid] * len(order))
                out_n.extend(cids[order])
                out_s.extend(cvals[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_score": out_s}
            )

    return mapper


def pq_topk(
    emb: DataFrame,
    query_mod: int = KNN_QUERY_MOD,
    k: int = KNN_K,
    cache_key: str | None = None,
) -> DataFrame:
    """PQ-ADC ANN: encode the corpus to PQ_M-byte codes (one pass), scan
    codes with per-query lookup tables, exact-rescore the top
    k*PQ_CAND_FACTOR candidates.

    100 TB shape: the scan touches only the code table (32x smaller than
    the vectors), the shuffle is capped at queries x k*factor rows, and the
    exact rescore joins back to the float vectors for just those
    candidates.  Composes with IVF routing (probe lists first, ADC within
    lists) without changing either side.
    """
    spark = emb.sparkSession
    empty = "query_id long, neighbor_id long, cos_sim double, rnk int"
    books = pq_train(emb, cache_key)
    if books is None:
        return spark.createDataFrame([], empty)
    dim = books and sum(b.shape[1] for b in books)
    slices = _pq_subspaces(dim)

    qpd = (
        emb.filter(F.col("vec_id") % query_mod == 0)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(KNN_MAX_QUERIES_TOTAL + 1)
        .toPandas()
    )
    if len(qpd) == 0:
        return spark.createDataFrame([], empty)
    if len(qpd) > KNN_MAX_QUERIES_TOTAL:
        raise ValueError(
            f"pq_topk query set exceeds the {KNN_MAX_QUERIES_TOTAL}-query bound; "
            "thin the query sample (query_mod) or raise the cap explicitly"
        )
    Q = _np_matrix(qpd["embedding"])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qids = qpd["vec_id"].to_numpy()
    # LUT[q, m, c] = query-subvector . codeword  (approx dot decomposes as a sum)
    LUT = np.zeros((len(qids), len(slices), max(b.shape[0] for b in books)))
    for m, (lo, hi) in enumerate(slices):
        LUT[:, m, : books[m].shape[0]] = Qn[:, lo:hi] @ books[m].T
    bq = spark.sparkContext.broadcast((qids, LUT, books, slices))

    cands = scale_out(emb.select("vec_id", "embedding"), "vec_id").mapInPandas(
        _pq_encode_adc_mapper(bq, k * PQ_CAND_FACTOR),
        schema="query_id long, neighbor_id long, adc_score double",
    )
    # Global ADC top-(k*factor) per query, then exact cosine rescore.
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    shortlist = (
        cands.withColumn("arn", F.row_number().over(wa))
        .filter(F.col("arn") <= k * PQ_CAND_FACTOR)
        .select("query_id", "neighbor_id")
    )
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    scored = (
        shortlist.join(e.withColumnsRenamed({"vec_id": "query_id", "e": "qe"}), "query_id")
        .join(e.withColumnsRenamed({"vec_id": "neighbor_id", "e": "ne"}), "neighbor_id")
        .withColumn("cos_sim", F.round(cosine_expr("qe", "ne"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


@register(
    "ann_pq_topk",
    # Promoted rows-only -> certificate oracle in r12 (r11 VERDICT ask
    # #1).  For PQ the full_k invariant is STRUCTURAL, not empirical:
    # the ADC pass scores every corpus vector, so least(k, corpus-1)
    # neighbors always exist.
    oracle=ANN_CERT_ORACLE,
    doc=f"ANN top-k via product quantization ({PQ_M} subspaces, sqrt-scaled 16..256-codeword books, ADC scan), exact rescoring of the shortlist; output projected as a per-query invariant certificate.",
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # canonical vector-store grain (r13 dup-entity leg; oracle mirrors);
    # "#canon" memo key: raw-grain readers share the same source path
    emb = entity_table_pinned(spark, sf_dir, "embeddings")
    ck = f"{sf_dir}/embeddings#canon"
    return ann_topk_certificate(
        emb, pq_topk(emb, cache_key=ck), _corpus_count(emb, ck)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse routing x compressed scoring in ONE corpus pass

IVFPQ_NPROBE = 8  # legacy floor; routing now defaults to 1.5x _ivf_nprobe

#: IVF-PQ compounds TWO approximations (routing misses + code
#: quantization), so it rescores a wider shortlist than plain PQ and
#: probes 1.5x wider than plain IVF — both still O(k)/O(sqrt(centroids))
#: per query (r11 recall sweep: 0.59 -> 0.74 at sf0.1, bench-neutral).
IVFPQ_CAND_FACTOR = 12


def _ivfpq_mapper(bq, k_keep: int):
    """Fused assign + route + encode + ADC per Arrow batch: each vector is
    assigned to its nearest centroid, and for every query it is
    ADC-scored ONLY if that centroid is in the query's probe list.  One
    corpus pass does what classic IVF-PQ does in two (assign, then scan);
    per-batch work is O(rows x (centroids + M)) and output is capped at
    queries x k_keep per batch.  ``bq`` broadcasts
    (qids, LUT, books, slices, C_sorted, cids_sorted, probe_sets)."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, LUT, books, slices, Cn, cids, probe_sets = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"])
            En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
            # coarse assignment (ties -> lowest centroid id: stable argsort
            # not needed, argmax on -sims with sorted cids gives lowest id
            # via argmax's first-occurrence rule on ties)
            sims = En @ Cn.T
            assign = cids[np.argmax(sims, axis=1)]
            # PQ encode
            codes = np.empty((len(En), len(slices)), dtype=np.int64)
            for m, (lo, hi) in enumerate(slices):
                sub = En[:, lo:hi]
                B = books[m]
                d = (sub**2).sum(1)[:, None] - 2 * sub @ B.T + (B**2).sum(1)[None, :]
                codes[:, m] = d.argmin(axis=1)
            ids = pdf["vec_id"].to_numpy()
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(qids):
                probed = np.isin(assign, probe_sets[j]) & (ids != qid)
                if not probed.any():
                    continue
                cids_j, codes_j = ids[probed], codes[probed]
                scores = np.zeros(len(cids_j))
                for m in range(codes_j.shape[1]):
                    scores += LUT[j, m, codes_j[:, m]]
                kk = min(k_keep, len(cids_j))
                if len(cids_j) > kk:
                    part = np.argpartition(-scores, kk - 1)[:kk]
                    cids_j, scores = cids_j[part], scores[part]
                order = np.lexsort((cids_j, -scores))
                out_q.extend([qid] * len(order))
                out_n.extend(cids_j[order])
                out_s.extend(scores[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_score": out_s}
            )

    return mapper


def ivfpq_topk(
    emb: DataFrame,
    query_mod: int = KNN_QUERY_MOD,
    k: int = KNN_K,
    nprobe: int | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """IVF-PQ ANN: coarse centroids route each query to ``nprobe``
    inverted lists; within the routed lists vectors are scored from their
    PQ codes (ADC); the shortlist gets one exact cosine rescore.

    The 100 TB composition argument made real: IVF cuts the *fraction of
    the corpus touched* per query (~nprobe/n_centroids), PQ cuts the
    *bytes per touched vector* (M bytes vs dim x 4), and both reductions
    multiply.  Here the assign/route/encode/ADC steps fuse into a single
    corpus pass; a stored-index deployment persists (cluster_id, codes)
    once and scans only the probed partitions."""
    spark = emb.sparkSession
    empty = "query_id long, neighbor_id long, cos_sim double, rnk int"
    n_vectors = _corpus_count(emb, cache_key)
    if n_vectors == 0:
        return spark.createDataFrame([], empty)
    books = pq_train(emb, cache_key)
    if books is None:
        return spark.createDataFrame([], empty)
    dim = sum(b.shape[1] for b in books)
    slices = _pq_subspaces(dim)
    cpd = _sample_centroids(emb, _centroid_budget(n_vectors), cache_key)
    cids = cpd["vec_id"].to_numpy()
    C = _np_matrix(cpd["embedding"])
    order = np.argsort(cids)
    cids_sorted = cids[order]
    Cn_sorted = (C / np.linalg.norm(C, axis=1, keepdims=True))[order]
    if nprobe is None:
        nprobe = math.ceil(1.5 * _ivf_nprobe(len(cids)))

    qpd = (
        emb.filter(F.col("vec_id") % query_mod == 0)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(KNN_MAX_QUERIES_TOTAL + 1)
        .toPandas()
    )
    if len(qpd) == 0:
        return spark.createDataFrame([], empty)
    if len(qpd) > KNN_MAX_QUERIES_TOTAL:
        raise ValueError(
            f"ivfpq_topk query set exceeds the {KNN_MAX_QUERIES_TOTAL}-query "
            "bound; thin the query sample (query_mod) or raise the cap"
        )
    Q = _np_matrix(qpd["embedding"])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qids = qpd["vec_id"].to_numpy()
    LUT = np.zeros((len(qids), len(slices), max(b.shape[0] for b in books)))
    for m, (lo, hi) in enumerate(slices):
        LUT[:, m, : books[m].shape[0]] = Qn[:, lo:hi] @ books[m].T
    qsims = Qn @ Cn_sorted.T
    p = min(nprobe, qsims.shape[1])
    probe_sets = [
        cids_sorted[np.argsort(-qsims[j], kind="stable")[:p]] for j in range(len(qids))
    ]
    bq = spark.sparkContext.broadcast(
        (qids, LUT, books, slices, Cn_sorted, cids_sorted, probe_sets)
    )
    cands = scale_out(emb.select("vec_id", "embedding"), "vec_id").mapInPandas(
        _ivfpq_mapper(bq, k * IVFPQ_CAND_FACTOR),
        schema="query_id long, neighbor_id long, adc_score double",
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    shortlist = (
        cands.withColumn("arn", F.row_number().over(wa))
        .filter(F.col("arn") <= k * IVFPQ_CAND_FACTOR)
        .select("query_id", "neighbor_id")
    )
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    scored = (
        shortlist.join(e.withColumnsRenamed({"vec_id": "query_id", "e": "qe"}), "query_id")
        .join(e.withColumnsRenamed({"vec_id": "neighbor_id", "e": "ne"}), "neighbor_id")
        .withColumn("cos_sim", F.round(cosine_expr("qe", "ne"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


@register(
    "ann_ivfpq_topk",
    # Promoted rows-only -> certificate oracle in r12 (r11 VERDICT ask
    # #1): routing + codebooks stay engine-internal, the OUTPUT
    # invariants hash-check (see ann_topk_certificate).
    oracle=ANN_CERT_ORACLE,
    doc="ANN top-k via IVF-PQ (coarse routing x ADC code scoring fused into one corpus pass, sqrt-scaled nprobe), exact rescoring; output projected as a per-query invariant certificate.",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # canonical vector-store grain (r13 dup-entity leg; oracle mirrors);
    # "#canon" memo key: raw-grain readers share the same source path
    emb = entity_table_pinned(spark, sf_dir, "embeddings")
    ck = f"{sf_dir}/embeddings#canon"
    return ann_topk_certificate(
        emb, ivfpq_topk(emb, cache_key=ck), _corpus_count(emb, ck)
    )


@register(
    "knn_margin_profile",
    defer=True,
    oracle=f"""
    WITH knn AS ({_REG["knn_bruteforce"].oracle}),
    m AS (
        SELECT query_id,
               MAX(CASE WHEN rnk = 1 THEN cos_sim END) AS s1,
               MAX(CASE WHEN rnk = 2 THEN cos_sim END) AS s2,
               MAX(CASE WHEN rnk = {KNN_K} THEN cos_sim END) AS sk
        FROM knn GROUP BY query_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(CAST(SUM(CAST(round(s1 - s2, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_margin_12,
           round(CAST(SUM(CAST(round(s1 - sk, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / COUNT(*), 6) AS avg_margin_1k,
           round(MIN(s1 - s2), 6) AS min_margin_12
    FROM m
    """,
    doc=f"k-NN margin profile: mean/min gap between the 1st and 2nd (and "
    f"1st and {KNN_K}th) neighbor similarities — retrieval-confidence "
    "diagnostic.",
)
def knn_margin_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How decisive are nearest-neighbor matches: a thin 1st-vs-2nd margin
    means labels/dedup decisions ride on noise (and ANN recall targets
    must be higher to preserve them).  Reuses the bounded exact k-NN
    top-k; the rest is a per-query pivot and a quantized-decimal mean
    over the bounded query set.
    """
    emb = entity_table_pinned(spark, sf_dir, "embeddings")
    topk = knn_bruteforce_topk(emb)
    m = topk.groupBy("query_id").agg(
        F.max(F.when(F.col("rnk") == 1, F.col("cos_sim"))).alias("s1"),
        F.max(F.when(F.col("rnk") == 2, F.col("cos_sim"))).alias("s2"),
        F.max(F.when(F.col("rnk") == KNN_K, F.col("cos_sim"))).alias("sk"),
    )
    d12 = F.round(F.col("s1") - F.col("s2"), 6).cast("decimal(18,6)")
    d1k = F.round(F.col("s1") - F.col("sk"), 6).cast("decimal(18,6)")
    return m.agg(
        F.count("*").alias("n_queries"),
        F.round(F.sum(d12).cast("double") / F.count("*"), 6).alias("avg_margin_12"),
        F.round(F.sum(d1k).cast("double") / F.count("*"), 6).alias("avg_margin_1k"),
        F.round(F.min(F.col("s1") - F.col("s2")), 6).alias("min_margin_12"),
    )


@register(
    "knn_hubness_histogram",
    defer=True,
    oracle=f"""
    WITH knn AS ({_REG["knn_bruteforce"].oracle}),
    occ AS (
        SELECT neighbor_id, CAST(COUNT(*) AS BIGINT) AS k_occ
        FROM knn GROUP BY neighbor_id
    )
    SELECT k_occ AS occurrence_count,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(MIN(neighbor_id) AS BIGINT) AS min_vec_id
    FROM occ GROUP BY k_occ
    """,
    doc="Hubness histogram of exact k-NN results: how many vectors appear "
    "in n query neighbor lists — the high-dimensional hub pathology "
    "check.",
)
def knn_hubness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness is the curse-of-dimensionality failure mode where a few
    points become everyone's neighbor, silently skewing kNN labels and
    graph-based dedup.  The histogram of neighbor-occurrence counts is
    the standard screen (a heavy right tail = hubs).  Integer counting
    over the already-bounded k-NN output.
    """
    # canonical vector-store grain (r13 dup-entity leg; the composed
    # knn oracle is canonical)
    emb = entity_table_pinned(spark, sf_dir, "embeddings")
    topk = knn_bruteforce_topk(emb)
    occ = topk.groupBy("neighbor_id").agg(F.count("*").alias("k_occ"))
    return occ.groupBy(F.col("k_occ").alias("occurrence_count")).agg(
        F.count("*").alias("n_vectors"),
        F.min("neighbor_id").alias("min_vec_id"),
    )


# ---------------------------------------------------------------------------
# MMR diversified retrieval (round 9)

MMR_CAND_N = 16          # relevance top-N candidate pool per query
MMR_K = 5                # diversified picks per query
MMR_LAMBDA_U = 700_000   # lambda = 0.7 in micro-units (integer score domain)


def _mmr_greedy(pool_pdf, pairs_pdf):
    """Per-query MMR greedy over the bounded candidate pool — exact
    integer arithmetic: score = lambda_u*rel_u - (1e6-lambda_u)*max_sim_u,
    ties broken by smallest vec_id.  Runs inside a cogrouped
    applyInPandas, so each invocation sees ONE query's 16 candidates and
    their pairwise sims."""
    import pandas as pd

    if len(pool_pdf) == 0:
        return pd.DataFrame(
            columns=["query_id", "pick_rank", "vec_id", "rel_u", "score_u"]
        )
    qid = int(pool_pdf["query_id"].iloc[0])
    rel = dict(zip(pool_pdf["nid"].astype(int), pool_pdf["rel_u"].astype(int)))
    sim = {
        (int(a), int(b)): int(s)
        for a, b, s in zip(pairs_pdf["ca"], pairs_pdf["cb"], pairs_pdf["sim_u"])
    }
    lam, anti = MMR_LAMBDA_U, 1_000_000 - MMR_LAMBDA_U
    chosen, out = [], []
    for k in range(1, min(MMR_K, len(rel)) + 1):
        best = None
        for c, r in rel.items():
            if c in chosen:
                continue
            mx = max((sim[(c, p)] for p in chosen), default=0)
            score = lam * r - anti * mx
            if best is None or (score, -c) > (best[1], -best[0]):
                best = (c, score)
        chosen.append(best[0])
        out.append((qid, k, best[0], rel[best[0]], best[1]))
    return pd.DataFrame(
        out, columns=["query_id", "pick_rank", "vec_id", "rel_u", "score_u"]
    )


@register(
    "mmr_diversified_topk",
    defer=3,
    oracle=f"""
    WITH RECURSIVE
    embeddings_canon AS MATERIALIZED {SQL_EMB_CANON},
    -- ^ canonical vector-store grain (r13 dup-entity leg)
    mq AS MATERIALIZED (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        FROM embeddings_canon WHERE vec_id % {KNN_QUERY_MOD} = 0
          -- zero vectors excluded: cosine undefined (r10 sweep contract)
          AND {sql_cosine_domain("embedding::DOUBLE[]")}
    ),
    ms AS (
        SELECT mq.query_id, c.vec_id AS nid,
               CAST(round(round(list_cosine_similarity(qe,
                    c.embedding::DOUBLE[]), 6) * 1000000) AS BIGINT) AS rel_u
        FROM mq, embeddings_canon c WHERE c.vec_id <> mq.query_id
          AND {sql_cosine_domain("c.embedding::DOUBLE[]")}
    ),
    mpool AS MATERIALIZED (
        SELECT query_id, nid, rel_u,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel_u DESC, nid) AS rnk
        FROM ms QUALIFY rnk <= {MMR_CAND_N}
    ),
    mpe AS MATERIALIZED (
        SELECT p.query_id, p.nid, e.embedding::DOUBLE[] AS pv
        FROM mpool p JOIN embeddings_canon e ON e.vec_id = p.nid
    ),
    mpairs AS MATERIALIZED (
        SELECT a.query_id, a.nid AS ca, b.nid AS cb,
               CAST(round(round(list_cosine_similarity(a.pv, b.pv), 6)
                    * 1000000) AS BIGINT) AS sim_u
        FROM mpe a JOIN mpe b
            ON a.query_id = b.query_id AND a.nid <> b.nid
    ),
    mmr(query_id, pick_rank, picked, vec_id, rel_u, score_u) AS (
        SELECT query_id, 1, [nid], nid, rel_u,
               {MMR_LAMBDA_U} * rel_u
        FROM mpool QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY rel_u DESC, nid) = 1
        UNION ALL
        SELECT m.query_id, m.pick_rank + 1, list_append(m.picked, nxt.nid),
               nxt.nid, nxt.rel_u, nxt.score_u
        FROM mmr m, LATERAL (
            SELECT p.nid, p.rel_u,
                   {MMR_LAMBDA_U} * p.rel_u - {1_000_000 - MMR_LAMBDA_U} * (
                       SELECT MAX(pr.sim_u) FROM mpairs pr
                       WHERE pr.query_id = m.query_id AND pr.ca = p.nid
                         AND list_contains(m.picked, pr.cb)
                   ) AS score_u
            FROM mpool p
            WHERE p.query_id = m.query_id
              AND NOT list_contains(m.picked, p.nid)
            ORDER BY score_u DESC, p.nid
            LIMIT 1
        ) nxt
        WHERE m.pick_rank < {MMR_K}
    )
    SELECT query_id, CAST(pick_rank AS BIGINT) AS pick_rank, vec_id,
           rel_u, score_u
    FROM mmr
    """,
    doc=f"MMR diversified retrieval (Carbonell-Goldstein 1998): top-"
    f"{MMR_CAND_N} relevance pool per query, then {MMR_K} greedy picks "
    "maximizing lambda*relevance - (1-lambda)*max-sim-to-chosen in the "
    "exact integer micro-unit domain; distributed per-query via "
    "cogrouped applyInPandas, replayed step-by-step by a recursive-CTE "
    "oracle.",
)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG re-ranker that fixes top-k's redundancy: pure relevance
    returns five near-copies of the same passage; MMR trades relevance
    against similarity-to-already-chosen (Carbonell & Goldstein 1998).
    Exactness protocol: cosines quantize to integral micro-units at 6dp
    (the knn-proven cross-engine agreement point), after which the
    greedy is pure integer arithmetic — argmax ties cannot flip between
    engines, so a recursive-CTE oracle replays all picks bit-exactly.
    Scale shape: the relevance pool rides the bounded-broadcast kNN
    machinery (knn_bruteforce_topk); pairwise sims join only pool
    members (|pool|^2 per query, constants); the greedy runs PER QUERY
    inside a cogrouped applyInPandas (Arrow, two query-keyed shuffles) —
    no driver fold, no cap beyond kNN's own query bound.
    """
    # canonical vector-store grain (r13 dup-entity leg; oracle mirrors)
    emb = entity_table_pinned(spark, sf_dir, "embeddings")
    pool = (
        knn_bruteforce_topk(emb, k=MMR_CAND_N)
        .select(
            "query_id",
            F.col("neighbor_id").alias("nid"),
            F.round(F.col("cos_sim") * 1_000_000).cast("long").alias("rel_u"),
        )
        # consumed by both pairwise sides and the cogroup — pin once
        .localCheckpoint(eager=True)
    )
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    pe = pool.join(e, pool["nid"] == e["vec_id"]).select(
        "query_id", "nid", F.col("v").alias("pv")
    )
    a, b = pe.alias("a"), pe.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.nid") != F.col("b.nid")),
        )
        .withColumn("cs", F.round(cosine_expr("a.pv", "b.pv"), 6))
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.nid").alias("ca"),
            F.col("b.nid").alias("cb"),
            F.round(F.col("cs") * 1_000_000).cast("long").alias("sim_u"),
        )
    )
    out_schema = (
        "query_id long, pick_rank long, vec_id long, rel_u long, score_u long"
    )
    return (
        pool.groupBy("query_id")
        .cogroup(pairs.groupBy("query_id"))
        .applyInPandas(_mmr_greedy, schema=out_schema)
    )
