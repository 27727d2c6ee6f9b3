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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import scale_out, table

KNN_K = 5
KNN_QUERY_MOD = 100  # vec_id % 100 == 0 -> 1% of vectors are queries
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


@register(
    "embedding_cosine_pairs",
    oracle=f"""
    WITH s AS (
        SELECT vec_id, embedding::DOUBLE[] AS e, label
        FROM embeddings WHERE vec_id % {PAIRS_SAMPLE_MOD} = 0
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
    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % PAIRS_SAMPLE_MOD == 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"), "label")
    )
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


def _partial_topk_mapper(qids: np.ndarray, Q: np.ndarray, k: int):
    """Per-Arrow-batch cosine + partial top-k against the broadcast query
    matrix.  Emits at most len(qids) * k rows per batch."""
    qn = np.linalg.norm(Q, axis=1)

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _np_matrix(pdf["embedding"])
            ids = pdf["vec_id"].to_numpy()
            cn = np.linalg.norm(C, axis=1)
            S = np.round((C @ Q.T) / np.outer(cn, qn), 6)  # n x m
            out_q, out_n, out_c = [], [], []
            kk = min(k + 32, len(ids))  # slack so boundary ties survive
            for j, qid in enumerate(qids):
                col = S[:, j]
                mask = ids != qid
                cids, cvals = ids[mask], col[mask]
                if len(cids) == 0:
                    continue
                if len(cids) > kk:
                    part = np.argpartition(-cvals, kk - 1)[:kk]
                    cids, cvals = cids[part], cvals[part]
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
        FROM embeddings WHERE vec_id % {KNN_QUERY_MOD} = 0
    ),
    s AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(qe, c.embedding::DOUBLE[]), 6) AS cos_sim
        FROM q, embeddings c
        WHERE c.vec_id <> q.query_id
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
    emb = table(spark, sf_dir, "embeddings")
    qpd = (
        emb.filter(F.col("vec_id") % KNN_QUERY_MOD == 0)
        .select("vec_id", "embedding")
        .toPandas()
    )
    if len(qpd) == 0:  # empty corpus/queries: empty result, not a crash
        return spark.createDataFrame([], _KNN_SCHEMA)
    qids = qpd["vec_id"].to_numpy()
    Q = _np_matrix(qpd["embedding"])
    # One-file corpus scans as one partition; widen so every core runs a
    # BLAS batch (no-op when the scan is already split).
    corpus = scale_out(emb.select("vec_id", "embedding"), "vec_id")
    partial = corpus.mapInPandas(_partial_topk_mapper(qids, Q, KNN_K), schema=_KNN_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        partial.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
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
    emb: DataFrame, query_mod: int = KNN_QUERY_MOD, k: int = KNN_K
) -> DataFrame:
    """ANN top-k: same-bucket candidates only, exact cosine rescoring."""
    dim = 64
    mapper, sig_schema = _signature_mapper(_hyperplanes(dim))
    sigs = scale_out(emb.select("vec_id", "embedding"), "vec_id").mapInPandas(
        mapper, schema=sig_schema
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
    oracle=None,  # approximate by design: recall vs brute force unit-tested
    doc="ANN top-k via random-hyperplane LSH (8 tables x 8 bits), exact rescoring of candidates.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_topk(table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Approximate NN: IVF (inverted-file) coarse quantizer

# Centroids are a deterministic corpus sample (vec_id % MOD == 7) instead of
# a k-means fit — same inverted-list machinery, no training job; a real
# deployment swaps in trained centroids without touching the dataflow.
IVF_CENTROID_MOD = 37
IVF_NPROBE = 8

_ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("cluster_id", T.LongType()),
    ]
)


def _assign_mapper(cids: np.ndarray, C: np.ndarray):
    """Nearest-centroid assignment per Arrow batch (cosine; ties -> lowest
    centroid id, deterministic)."""
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    order = np.argsort(cids)
    cids_sorted, Cn_sorted = cids[order], Cn[order]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = _np_matrix(pdf["embedding"])
            En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
            best = np.argmax(En @ Cn_sorted.T, axis=1)  # first max = lowest id
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "cluster_id": cids_sorted[best]}
            )

    return mapper


def ivf_topk(
    emb: DataFrame, query_mod: int = KNN_QUERY_MOD, k: int = KNN_K, nprobe: int = IVF_NPROBE
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
    cpd = emb.filter(F.col("vec_id") % IVF_CENTROID_MOD == 7).select(
        "vec_id", "embedding"
    ).toPandas()
    if len(cpd) == 0:  # empty corpus: no centroids -> empty result
        return spark.createDataFrame([], empty)
    cids = cpd["vec_id"].to_numpy()
    C = _np_matrix(cpd["embedding"])
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    corpus = scale_out(emb.select("vec_id", "embedding"), "vec_id")
    assignments = corpus.mapInPandas(_assign_mapper(cids, C), schema=_ASSIGN_SCHEMA)

    # Query probe lists, computed driver-side (queries are a ~1% sample).
    qpd = emb.filter(F.col("vec_id") % query_mod == 0).select(
        "vec_id", "embedding"
    ).toPandas()
    if len(qpd) == 0:
        return spark.createDataFrame([], empty)
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
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
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
    "ann_ivf_topk",
    oracle=None,  # approximate by design: recall vs brute force unit-tested
    doc="ANN top-k via IVF inverted lists (sampled centroids, nprobe=8), exact rescoring.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_topk(table(spark, sf_dir, "embeddings"))


@register(
    "embedding_neardup_clusters",
    oracle=None,  # composes the iterative component fixpoint; invariants unit-tested
    doc="Embedding-space near-dup clustering: cosine candidate pairs -> "
    "connected components -> keep-one-representative groups.",
)
def embedding_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering contract as the text near-dup path
    (``neardup_cluster_components``) but with cosine-similarity edges: the
    component operator is edge-source-agnostic, which is the point — any
    pairwise similarity (MinHash, SimHash, cosine, exact hash) feeds one
    shared keep-one-per-cluster dedup step."""
    from azure_func_forem_data_etl_spark.operators.dedup import connected_components

    pairs = embedding_cosine_pairs(spark, sf_dir)
    comp = connected_components(pairs, "vec_a", "vec_b")
    sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "comp").select(
        F.col("id").alias("vec_id"),
        F.col("comp").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("comp")).cast("int").alias("is_representative"),
    )
