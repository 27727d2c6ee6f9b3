"""Distributed Lloyd's k-means over the embeddings table, and the
trained-centroid IVF path built on it.

This is the "swap in trained centroids" upgrade the IVF module documents
(similarity.py): ``kmeans_fit`` produces k centroids with driver memory
O(k · dim) and per-iteration cost of one corpus pass, and
``ann_ivf_trained_topk`` feeds them into the existing inverted-list
machinery unchanged.

Execution shape per iteration (the same one Spark MLlib's KMeans uses —
partial aggregation, then a driver-side reduce of k-bounded partials):

1. broadcast the k×dim centroid matrix into an Arrow-batched
   ``mapInPandas`` pass — each batch emits at most k rows of
   (cluster_id, count, vector_sum) partials, so executor output is
   bounded by k per batch, NOT by corpus size;
2. collect the partials (≤ k · n_batches tiny rows — bounded by cluster
   parallelism, not data volume) and reduce them with numpy on the
   driver in sorted order (deterministic for a fixed partitioning);
3. recompute centroids; empty clusters keep their previous centroid.

Assignment is euclidean argmin with ties resolving to the lowest cluster
id (numpy argmin).  Initialization reuses ``_sample_centroids`` — a
deterministic TakeOrdered-by-hash sample, O(k·dim) on the driver.
"""

from __future__ import annotations

import logging
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.operators.similarity import (
    ANN_CERT_ORACLE,
    _corpus_count,
    _np_matrix,
    _sample_centroids,
    ann_topk_certificate,
    bounded_components,
    finite_components,
    ivf_topk,
    register_fit_cache,
    sql_finite_components,
    sql_bounded_components,
)
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import (
    entity_table,
    entity_table_pinned,
    scale_out,
    table,
)

_LOG = logging.getLogger(__name__)

KMEANS_K = 32
KMEANS_ITERS = 5

_PARTIAL_SCHEMA = "cluster_id long, cnt long, vsum array<double>"


def _dist2(E: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Squared euclidean distance matrix, |E| x k."""
    return (
        (E**2).sum(axis=1, keepdims=True) - 2.0 * (E @ C.T) + (C**2).sum(axis=1)
    )


def _partial_mapper(C: np.ndarray):
    """Per-batch assignment + partial (count, vector-sum) per centroid.

    Emits ≤ k rows per Arrow batch regardless of batch size — the
    map-side combine that makes the shuffle-free collect safe."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"]).astype(np.float64)
            assign = np.argmin(_dist2(E, C), axis=1)
            out_cid, out_cnt, out_sum = [], [], []
            for cid in np.unique(assign):
                mask = assign == cid
                out_cid.append(int(cid))
                out_cnt.append(int(mask.sum()))
                out_sum.append(E[mask].sum(axis=0))
            yield pd.DataFrame(
                {"cluster_id": out_cid, "cnt": out_cnt, "vsum": out_sum}
            )

    return mapper


def _inertia(corpus: DataFrame, C: np.ndarray) -> float:
    """True k-means objective: one corpus pass, one partial row per batch."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"]).astype(np.float64)
            d2 = np.maximum(_dist2(E, C).min(axis=1), 0.0)
            yield pd.DataFrame({"s": [float(d2.sum())]})

    parts = corpus.mapInPandas(mapper, schema="s double").toPandas()
    return float(parts["s"].sum())


#: Fitted-centroid memo, keyed (cache_key, k, iters): the fit is a pure
#: function of the (immutable) source table, and FOUR registry queries
#: fit the same embeddings corpus at the default (k, iters) — one fit
#: per session instead of one per query (same per-path discipline as
#: similarity._CENTROID_CACHE; ≤ k·dim doubles per key).
_KMEANS_CACHE: dict[tuple[str, int, int], np.ndarray] = register_fit_cache({})


def kmeans_fit(
    emb: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    trace_inertia: bool = False,
    cache_key: str | None = None,
) -> tuple[np.ndarray, list[float]]:
    """Lloyd's iterations; returns (k×dim centroid matrix, inertia trace).

    The trace (one extra corpus pass per iteration) is opt-in for tests;
    production fits skip it, costing exactly one pass per iteration.
    Driver memory is O(k·dim + k·n_batches) — bounded by cluster
    parallelism, never by corpus size.  ``cache_key`` memoizes the
    fitted centroids per source path (traced fits are never cached)."""
    ck = (cache_key, k, iters)
    if cache_key is not None and not trace_inertia and ck in _KMEANS_CACHE:
        return _KMEANS_CACHE[ck], []
    # Euclidean domain = finite vectors (r13 specials sweep): one NaN
    # component would poison every mean it touches; ±Inf every distance
    emb = emb.filter(finite_components("embedding"))
    corpus = scale_out(emb.select("vec_id", "embedding"), "vec_id")
    init = _sample_centroids(emb, k)
    if len(init) == 0:  # empty corpus: no centroids, no iterations
        return np.zeros((0, 0)), []
    C = _np_matrix(init["embedding"]).astype(np.float64)
    k = C.shape[0]  # corpus may be smaller than requested k
    trace: list[float] = []
    for _ in range(iters):
        partials = corpus.mapInPandas(
            _partial_mapper(C), schema=_PARTIAL_SCHEMA
        ).toPandas()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(C)
        for cid, grp in partials.groupby("cluster_id", sort=True):
            counts[int(cid)] = grp["cnt"].sum()
            sums[int(cid)] = np.vstack(grp["vsum"].to_numpy()).sum(axis=0)
        nonempty = counts > 0
        C_new = C.copy()  # empty clusters keep their previous centroid
        C_new[nonempty] = sums[nonempty] / counts[nonempty, None]
        C = C_new
        if trace_inertia:
            trace.append(_inertia(corpus, C))
    if cache_key is not None and not trace_inertia:
        _KMEANS_CACHE[ck] = C
    return C, trace


def kmeans_assignments(emb: DataFrame, C: np.ndarray) -> DataFrame:
    """(vec_id, cluster_id): one final broadcast-assignment pass."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"]).astype(np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster_id": np.argmin(_dist2(E, C), axis=1),
                }
            )

    corpus = scale_out(
        emb.filter(finite_components("embedding")).select("vec_id", "embedding"),
        "vec_id",
    )
    return corpus.mapInPandas(mapper, schema="vec_id long, cluster_id long")


def kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster float profile (cluster_id, n_vectors, centroid_norm) —
    the full API, unit-tested via the convergence suite.  Engine-specific
    float trajectories keep the raw floats out of the oracle registry;
    the registered ``kmeans_cluster_profile`` exposes this profile's
    invariant projection instead (r4 VERDICT ask #4)."""
    emb = table(spark, sf_dir, "embeddings")
    C, _ = kmeans_fit(emb, cache_key=f"{sf_dir}/embeddings")
    if C.size == 0:
        return spark.createDataFrame(
            [], "cluster_id long, n_vectors long, centroid_norm double"
        )
    spark_norms = spark.createDataFrame(
        [
            (int(i), round(float(np.linalg.norm(C[i])), 6))
            for i in range(C.shape[0])
        ],
        "cluster_id long, centroid_norm double",
    )
    return (
        kmeans_assignments(emb, C)
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_vectors"))
        .join(F.broadcast(spark_norms), "cluster_id")
        .select("cluster_id", "n_vectors", "centroid_norm")
    )


_KMEANS_PROFILE_INV_SCHEMA = (
    "n_points long, centroids_in_hull int, weighted_ss_bounded int"
)


@register(
    "kmeans_cluster_profile",
    # Promoted rows-only -> oracle in r5 (r4 VERDICT ask #4) via the
    # invariant-projection trick.  SOUNDNESS (round-5 review): the bounds
    # are stated on (count, mean) pairs produced by ONE assignment pass
    # under the final centroids — the Lloyd half-step means — NOT by
    # mixing the fit's prior-iteration centroids with a fresh
    # re-assignment's counts (that mix is not mathematically bounded: a
    # point that migrates between iterations can push Σ n_i·|c_i|² past
    # the corpus energy).  For a self-consistent (n_i, m_i): per-cluster
    # Jensen gives Σ n_i·|m_i|² <= Σ|x|², and every m_i lies in the convex
    # hull so max|m_i| <= max|x|.  Equality only at singleton/identical
    # clusters, so a 1e-9 relative tolerance absorbs summation-order float
    # noise without ever masking a real violation.
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           1 AS centroids_in_hull,
           1 AS weighted_ss_bounded
    FROM embeddings
    -- Euclidean domain: finite vectors only (r13 specials sweep)
    WHERE {sql_finite_components("embedding::DOUBLE[]")}
    """,
    doc=f"Distributed Lloyd k-means (k={KMEANS_K}, {KMEANS_ITERS} iters): "
    "hash-checkable invariants of the trained clustering's half-step "
    "means (exact partition count, centroid-in-hull, Jensen energy "
    "bound); the raw float profile stays available via kmeans_profile().",
)
def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One extra partials pass (<= k rows per Arrow batch) yields the
    mutually-consistent per-cluster counts and UNROUNDED means the bounds
    need; the data-side energy bounds come from one JVM aggregate.  The
    invariant math runs on bounded driver scalars (same documented
    pattern as the 1-row cursors at relational.py)."""
    emb = table(spark, sf_dir, "embeddings").filter(
        finite_components("embedding")
    )
    C, _ = kmeans_fit(emb, cache_key=f"{sf_dir}/embeddings")
    if C.size == 0:
        return spark.createDataFrame(
            [(0, 1, 1)], _KMEANS_PROFILE_INV_SCHEMA
        )
    corpus = scale_out(emb.select("vec_id", "embedding"), "vec_id")
    parts = corpus.mapInPandas(
        _partial_mapper(C), schema=_PARTIAL_SCHEMA
    ).toPandas()
    counts: dict[int, int] = {}
    sums: dict[int, np.ndarray] = {}
    for cid, grp in parts.groupby("cluster_id", sort=True):
        counts[int(cid)] = int(grp["cnt"].sum())
        sums[int(cid)] = np.vstack(grp["vsum"].to_numpy()).sum(axis=0)
    sq = (
        "aggregate(embedding, CAST(0.0 AS DOUBLE), "
        "(a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )
    bounds = (
        emb.select(F.expr(sq).alias("ss"))
        .agg(F.max("ss").alias("max_ss"), F.sum("ss").alias("tot_ss"))
        .first()
    )
    n_points = sum(counts.values())
    norm2 = {c: float(np.dot(sums[c] / counts[c], sums[c] / counts[c])) for c in counts}
    tol = 1.0 + 1e-9
    in_hull = int(max(norm2.values()) <= float(bounds.max_ss) * tol)
    w_ss = sum(counts[c] * norm2[c] for c in counts)
    bounded = int(w_ss <= float(bounds.tot_ss) * tol)
    return spark.createDataFrame(
        [(n_points, in_hull, bounded)], _KMEANS_PROFILE_INV_SCHEMA
    )


@register(
    "kmeans_partition_invariants",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           1 AS clusters_within_k,
           1 AS sizes_positive
    FROM embeddings
    -- Euclidean domain: finite vectors only (r13 specials sweep)
    WHERE {sql_finite_components("embedding::DOUBLE[]")}
    """,
    doc=f"Hash-checkable k-means invariants: assignments partition the "
    f"corpus exactly (sum of cluster sizes = corpus count), cluster count "
    f"<= k={KMEANS_K}, all sizes positive.  The float cluster profile "
    "itself stays rows-only (engine-specific trajectories).",
)
def kmeans_partition_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-able slice of ``kmeans_cluster_profile``: whatever the
    float trajectory does, a correct Lloyd implementation must assign every
    vector to exactly one cluster — so the size histogram must sum to the
    corpus count, have at most k bars, and no empty bars.  Those integer
    invariants hash-check against DuckDB; centroid values are covered by
    the convergence unit tests instead."""
    profile = kmeans_profile(spark, sf_dir)
    return profile.agg(
        F.sum("n_vectors").cast("long").alias("n_points"),
        (F.count("*") <= F.lit(KMEANS_K)).cast("int").alias("clusters_within_k"),
        (F.min("n_vectors") > 0).cast("int").alias("sizes_positive"),
    )


@register(
    "ann_ivf_trained_topk",
    # Promoted rows-only -> certificate oracle in r12 (r11 VERDICT ask
    # #1): the kmeans float trajectory stays engine-internal, but the
    # OUTPUT invariants hash-check (similarity.ann_topk_certificate).
    oracle=ANN_CERT_ORACLE,
    doc="ANN top-k via IVF with kmeans-TRAINED centroids (vs the sampled-"
    "centroid ann_ivf_topk): same inverted-list machinery, better lists; "
    "output projected as a per-query invariant certificate.",
)
def ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # canonical vector-store grain (r13 dup-entity leg; oracle mirrors)
    emb = entity_table_pinned(spark, sf_dir, "embeddings")
    ck = f"{sf_dir}/embeddings#canon"
    C, _ = kmeans_fit(emb, cache_key=ck)
    topk = ivf_topk(emb, centroids=(np.arange(C.shape[0]), C))
    # probing variant: bounded-count + liveness full_k (r12 ADVICE #1)
    return ann_topk_certificate(
        emb, topk, _corpus_count(emb, ck), exact_full_k=False
    )


# ---------------------------------------------------------------------------
# Distributed PCA: mergeable (n, sum, outer-product-sum) partials -> driver
# eigendecomposition (O(dim^2), corpus-size independent) -> broadcast project

PCA_COMPONENTS = 2


def pca_fit(emb: DataFrame, n_components: int = PCA_COMPONENTS):
    """Fit PCA over the embedding column: returns (mean, components).

    One corpus pass emits a single (n, sum_vec, outer_sum) partial row per
    Arrow batch — the classic mergeable-moments trick, so the reduce is
    O(batches * dim^2) on the driver and the eigendecomposition is
    O(dim^3) regardless of corpus size (dim=64 here; at 100 TB the same
    plan holds for any dim where dim^2 doubles fit a partial row).
    Component signs are canonicalized (largest-|loading| coordinate made
    positive) so refits are deterministic up to eigenvalue ties."""
    corpus = scale_out(emb.select("vec_id", "embedding"), "vec_id")

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"]).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(E)],
                    "s": [E.sum(axis=0)],
                    "ss": [(E.T @ E).ravel()],
                }
            )

    parts = corpus.mapInPandas(
        mapper, schema="n long, s array<double>, ss array<double>"
    ).toPandas()
    if len(parts) == 0:
        return np.zeros(0), np.zeros((0, 0))
    n = int(parts["n"].sum())
    s = np.vstack(parts["s"].to_numpy()).sum(axis=0)
    dim = s.shape[0]
    ss = np.vstack(parts["ss"].to_numpy()).sum(axis=0).reshape(dim, dim)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (n_components, dim)
    for i in range(comps.shape[0]):  # deterministic sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def pca_project(emb: DataFrame, mean: np.ndarray, comps: np.ndarray) -> DataFrame:
    """(vec_id, pc1..pcK): broadcast the (K x dim) loadings, project per
    Arrow batch with one BLAS matmul.  Map-only — no shuffle."""
    k = comps.shape[0]
    cols = [f"pc{i + 1}" for i in range(k)]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"]).astype(np.float64)
            P = (E - mean) @ comps.T
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            for i, c in enumerate(cols):
                out[c] = P[:, i]
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(f"{c} double" for c in cols)
    return emb.select("vec_id", "embedding").mapInPandas(mapper, schema=schema)


@register(
    "embedding_pca_project",
    # Promoted rows-only -> oracle in r5 (r4 VERDICT ask #4).  DuckDB
    # cannot run eigh, but the PROJECTIONS the fit produces obey exact
    # linear-algebra identities a SQL oracle can demand: scores are
    # zero-mean and mutually orthogonal (round to 0.0 at 4dp), component
    # variances are ordered, the top score variance (the Rayleigh quotient
    # at the top eigenvector) dominates every coordinate-axis variance,
    # and the top-2 variance total is bounded by the full trace.  The
    # inequalities are generically slack (dim=64 >> 2 components, and the
    # Marchenko-Pastur top-eigenvalue gap at n=500/dim=64 is far above
    # float noise), so rounding cannot flip them.
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           0.0 AS mean_pc1,
           0.0 AS mean_pc2,
           0.0 AS score_dot_n,
           1 AS var_ordered,
           1 AS pc1_dominates_axes,
           1 AS within_total_var
    -- quantized-moment domain (r11 embedding-magnitude sweep): at 1e25
    -- components the zero-mean/orthogonality identities drown in
    -- catastrophic cancellation far above the 4dp rounding grain
    FROM embeddings WHERE {sql_bounded_components('embedding')}
    """,
    doc="Distributed PCA: mergeable second-moment partials -> driver "
    "eigh -> broadcast top-2 projection; registered as the projection's "
    "hash-checkable invariant battery (zero-mean, orthogonal, "
    "variance-ordered, axis-dominating, trace-bounded); per-vector "
    "scores stay available via pca_fit/pca_project.",
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimensionality reduction for embedding-space inspection/indexing.
    The unit tests additionally pin orthonormal loadings and deterministic
    signs; this query hash-checks the score-level identities against the
    oracle's constants + exact count.  Out-of-domain vectors
    (|component| >= 1e4) are excluded wholesale — see
    similarity.EMB_COMPONENT_BOUND."""
    emb = table(spark, sf_dir, "embeddings").filter(
        bounded_components("embedding")
    )
    schema = (
        "n_vectors long, mean_pc1 double, mean_pc2 double, "
        "score_dot_n double, var_ordered int, pc1_dominates_axes int, "
        "within_total_var int"
    )
    mean, comps = pca_fit(emb)
    if comps.size == 0:  # empty corpus: no covariance, no components
        return spark.createDataFrame([(0, 0.0, 0.0, 0.0, 1, 1, 1)], schema)
    proj = pca_project(emb, mean, comps)
    if comps.shape[0] < 2:
        # dim=1 corpus: only one eigendirection exists; the projection
        # onto the ABSENT second component is 0 by convention, keeping
        # the output schema stable and the pc2 identities trivially true
        # (r11 dim=1 probe: F.avg("pc2") used to hard-crash here)
        proj = proj.withColumn("pc2", F.lit(0.0))
    # score-level aggregates (unrounded projections feed the identities)
    s = proj.agg(
        F.count("*").alias("n"),
        F.avg("pc1").alias("m1"),
        F.avg("pc2").alias("m2"),
        (F.sum(F.col("pc1") * F.col("pc2")) / F.count("*")).alias("dot_n"),
        F.var_pop("pc1").alias("v1"),
        F.var_pop("pc2").alias("v2"),
    ).first()
    # per-coordinate population variances straight from the raw data
    c = (
        emb.select(F.posexplode("embedding").alias("j", "v"))
        .groupBy("j")
        .agg(F.var_pop(F.col("v").cast("double")).alias("vj"))
        .agg(F.max("vj").alias("max_axis_var"), F.sum("vj").alias("trace"))
        .first()
    )
    zero = lambda x: round(float(x), 4) + 0.0  # noqa: E731 — -0.0 -> 0.0
    return spark.createDataFrame(
        [
            (
                int(s.n),
                zero(s.m1),
                zero(s.m2),
                zero(s.dot_n),
                int(float(s.v1) >= float(s.v2)),
                int(float(s.v1) >= float(c.max_axis_var)),
                int(float(s.v1) + float(s.v2) <= float(c.trace)),
            )
        ],
        schema,
    )


#: SemDeDup within-cluster duplicate threshold.  The synthetic corpus has
#: no true duplicates (max pairwise cosine ~0.51 at sf0.01), so the demo
#: threshold sits where the extreme tail lives; web-scale text dedup runs
#: this at ~0.95+.
SEMDEDUP_TAU = 0.4

#: Pairwise work inside one cluster is size², so clusters are capped
#: before pairing — same bound philosophy as the LSH hot-bucket cap
#: (dedup.HOT_BUCKET_CAP): a pathological mega-cluster degrades to a
#: deterministic prefix instead of an O(size²) blowup.
SEMDEDUP_CLUSTER_CAP = 512


def _observation_get(obs, timeout_s: float) -> dict | None:
    """``Observation.get`` with a watchdog: returns None instead of
    blocking forever when no action has executed the observed node."""
    import threading

    box: dict = {}

    def _probe() -> None:
        box["m"] = obs.get

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return box.get("m")


def kmeans_assignments_with_dist(emb: DataFrame, C: np.ndarray) -> DataFrame:
    """(vec_id, cluster_id, centroid_dist): assignment plus the euclidean
    distance to the assigned centroid (SemDeDup's keep-criterion input)."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"]).astype(np.float64)
            d2 = _dist2(E, C)
            cid = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster_id": cid,
                    "centroid_dist": np.sqrt(np.maximum(d2[np.arange(len(cid)), cid], 0.0)),
                }
            )

    corpus = scale_out(emb.select("vec_id", "embedding"), "vec_id")
    return corpus.mapInPandas(
        mapper, schema="vec_id long, cluster_id long, centroid_dist double"
    )


@register(
    "semdedup_remove_list",
    oracle=None,  # iterative k-means fit: engine-specific float trajectories
    doc=f"SemDeDup semantic dedup: k-means partition, within-cluster cosine "
    f">= {SEMDEDUP_TAU} pairs, keep the member farthest from the centroid "
    "per duplicate group.",
)
def semdedup_remove_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semdedup(
        table(spark, sf_dir, "embeddings"),
        fit_cache_key=f"{sf_dir}/embeddings",
    )


def semdedup(
    emb: DataFrame,
    tau: float = SEMDEDUP_TAU,
    cluster_cap: int = SEMDEDUP_CLUSTER_CAP,
    k: int = KMEANS_K,
    fit_cache_key: str | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup that
    only ever compares embeddings WITHIN a k-means cluster — the cluster
    partition turns the O(n²) all-pairs problem into Σ size² bounded
    local problems.  Duplicate groups (connected components of the
    within-cluster cosine>=τ graph) keep the member with the LARGEST
    distance to its centroid — the paper's choice, which biases the kept
    set toward cluster-edge (informative) examples — and list everything
    else for removal.

    Output: one row per REMOVED vector with its kept representative,
    home cluster, and duplicate-group size.

    No SQL oracle: the k-means fit is iterative with engine-specific
    float trajectories (same rationale as ``kmeans_cluster_profile``);
    correctness is pinned by the planted-duplicate unit test instead
    (tests/test_llm_ops.py).

    Scale shape: fit is one pass per Lloyd iteration (k-bounded partial
    aggregation); assignment+distance is one Arrow pass; the pairwise
    stage joins the corpus to itself ON cluster_id — an equi-join, never
    a cartesian — with per-cluster membership capped at
    {SEMDEDUP_CLUSTER_CAP} rows; components run on the sparse dup-pair
    edge list only.
    """
    spark = emb.sparkSession
    C, _ = kmeans_fit(emb, k=k, cache_key=fit_cache_key)
    if C.size == 0:
        return spark.createDataFrame(
            [], "vec_id long, keep_id long, cluster_id long, group_size long"
        )
    from pyspark.sql import Window

    from azure_func_forem_data_etl_spark.operators.dedup import connected_components

    assigned = kmeans_assignments_with_dist(emb, C).localCheckpoint()
    # Cap truncation must be OBSERVABLE (ADVICE r3) but must not cost a
    # job (r4 VERDICT ask #6): the row_number pass the pairing needs
    # anyway already sees every (cluster, rank) pair, so the counters ride
    # it as an ``observe()`` CollectMetrics node — dropped members are
    # exactly the rows with rank > cap, capped clusters the rows with
    # rank == cap+1.  CollectMetrics blocks filter pushdown, so the cap
    # filter below cannot starve the counters.
    from pyspark.sql import Observation

    obs = Observation("semdedup_cap")
    ranked = assigned.withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy("vec_id")
        ),
    ).observe(
        obs,
        F.sum((F.col("__rn") == cluster_cap + 1).cast("long")).alias(
            "capped_clusters"
        ),
        F.sum((F.col("__rn") > cluster_cap).cast("long")).alias(
            "dropped_members"
        ),
    )
    capped = ranked.filter(F.col("__rn") <= cluster_cap)
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    # r13 (guide §1.2 per-task work): each member's L2 norm is a pure
    # per-row quantity, but cosine_expr evaluated it once PER PAIR — for a
    # cap-512 cluster that is 511 redundant 64-element folds per member
    # and the dominant per-pair cost.  Hoist the norm to a member column
    # using the IDENTICAL fold expression, and keep the identical
    # dot/(na*nb) combination, so every cosine is bit-for-bit the same
    # double as before; only the redundant recomputation is gone.
    _l2 = (
        "sqrt(aggregate(zip_with({0}, {0}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    m = capped.join(vecs, "vec_id").select(
        "vec_id", "cluster_id", "e", F.expr(_l2.format("e")).alias("nrm")
    )
    a = m.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("vec_a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = m.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.expr(
        "aggregate(zip_with(ea, eb, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    edges = (
        a.join(b, "cluster_id")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos_sim") >= tau)
        .select("vec_a", "vec_b")
    )
    comps = connected_components(edges, "vec_a", "vec_b")
    # connected_components materialized the edge set (its documented
    # contract), which executed the observed row_number pass — the metrics
    # are available now.  The bounded wait is belt-and-braces: if a future
    # refactor ever makes that materialization lazy, semdedup must not
    # hang on Observation.get; it skips the log instead.  Timing
    # trade-off (round-5 review): the counters surface AFTER pairing by
    # design — that is what makes them free (r4 VERDICT ask #6); a
    # pairing-stage failure is diagnosable from the capped plan itself.
    cap_stats = _observation_get(obs, timeout_s=10.0) or {}
    if (cap_stats.get("capped_clusters") or 0) > 0:
        _LOG.warning(
            "semdedup: cluster cap %d truncated %d cluster(s), dropping %d "
            "member(s) from pairing — duplicates among dropped members go "
            "undetected; raise cluster_cap or k to shrink clusters",
            cluster_cap,
            cap_stats["capped_clusters"],
            cap_stats["dropped_members"],
        )
    members = comps.join(assigned, comps["id"] == assigned["vec_id"]).select(
        "vec_id", "comp", "cluster_id", "centroid_dist"
    )
    w = Window.partitionBy("comp")
    keep = F.first("vec_id").over(
        w.orderBy(F.col("centroid_dist").desc(), F.col("vec_id"))
    )
    labeled = members.select(
        "vec_id",
        "cluster_id",
        keep.alias("keep_id"),
        F.count("*").over(w).alias("group_size"),
    )
    return labeled.filter(F.col("vec_id") != F.col("keep_id")).select(
        "vec_id", "keep_id", "cluster_id", "group_size"
    )


@register(
    "label_centroid_similarity",
    defer=True,
    oracle=f"""
    WITH pos AS (
        SELECT label, i, CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                              AS DECIMAL(18,6)) AS v
        FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
        -- quantized-moment domain (see similarity.EMB_COMPONENT_BOUND)
        WHERE {sql_bounded_components('embedding')}
    ),
    cent AS (
        SELECT label, i,
               CAST(SUM(v) AS DOUBLE) / COUNT(*) AS c
        FROM pos GROUP BY 1, 2
    ),
    pair_terms AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(round(a.c * b.c, 12) AS DECIMAL(22,12)) AS ab,
               CAST(round(a.c * a.c, 12) AS DECIMAL(22,12)) AS aa,
               CAST(round(b.c * b.c, 12) AS DECIMAL(22,12)) AS bb
        FROM cent a JOIN cent b ON b.i = a.i AND a.label < b.label
    )
    SELECT label_a, label_b, cosine FROM (
        SELECT label_a, label_b,
               -- zero-norm centroid (all surviving components below the
               -- 6dp quantum) => cosine undefined => pair excluded on
               -- both engines (r13 combo leg; Spark ANSI raises on the
               -- division, DuckDB silently returns inf — CASE-guarded
               -- because ANSI evaluates agg projections pre-filter)
               CASE WHEN SUM(aa) = 0 OR SUM(bb) = 0 THEN NULL
                    ELSE round(CAST(SUM(ab) AS DOUBLE)
                               / sqrt(CAST(SUM(aa) AS DOUBLE)
                                      * CAST(SUM(bb) AS DOUBLE)), 6) END
                   AS cosine
        FROM pair_terms GROUP BY 1, 2
    ) WHERE cosine IS NOT NULL
    """,
    doc="Pairwise cosine similarity between per-label embedding "
    "centroids (dimension-wise exact-decimal means).",
)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-geometry audit for the labeled embedding space: labels whose
    centroids sit close (cosine -> 1) will confuse any
    nearest-centroid/kNN gate, and the matrix says which merges are
    safe.  Centroids are computed DIMENSION-WISE with 6dp-quantized
    decimal sums (a float array mean is order-dependent otherwise), and
    the pairwise cosine terms are 12dp-quantized before their
    dimension sum — deterministic end to end.

    Scale shape: one posexplode to (label, dim) grain — rows = corpus x
    dim but each row is 20 bytes and the aggregation is map-side-combined
    on a (labels x dim)-bounded key space; the pair join runs on the
    labels x dim centroid table (640 rows here).
    """
    emb = table(spark, sf_dir, "embeddings").filter(
        bounded_components("embedding")
    )
    pos = emb.select(
        "label", F.posexplode("embedding").alias("i0", "x")
    ).select(
        "label",
        (F.col("i0") + 1).alias("i"),
        F.round(F.col("x").cast("double"), 6).cast("decimal(18,6)").alias("v"),
    )
    cent = pos.groupBy("label", "i").agg(
        (F.sum("v").cast("double") / F.count("*")).alias("c")
    ).localCheckpoint(eager=True)  # both sides of the pair join
    a = cent.select(F.col("label").alias("label_a"), "i", F.col("c").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), "i", F.col("c").alias("cb"))
    terms = (
        a.join(b, "i")
        .filter(F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(F.col("ca") * F.col("cb"), 12).cast("decimal(22,12)").alias("ab"),
            F.round(F.col("ca") * F.col("ca"), 12).cast("decimal(22,12)").alias("aa"),
            F.round(F.col("cb") * F.col("cb"), 12).cast("decimal(22,12)").alias("bb"),
        )
    )
    # zero-norm centroid => cosine undefined => pair dropped (oracle
    # mirrors; r13 combo leg).  The WHEN guard runs INSIDE the agg
    # projection: ANSI evaluates it before any post-agg filter could.
    cos = F.when(
        (F.sum("aa") == 0) | (F.sum("bb") == 0), F.lit(None)
    ).otherwise(
        F.round(
            F.sum("ab").cast("double")
            / F.sqrt(F.sum("aa").cast("double") * F.sum("bb").cast("double")),
            6,
        )
    )
    return (
        terms.groupBy("label_a", "label_b")
        .agg(cos.alias("cosine"))
        .filter(F.col("cosine").isNotNull())
    )
