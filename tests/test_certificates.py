"""Tests for the r12 rows-only -> certificate-oracle promotions (r11
VERDICT ask #1): the ANN top-k and ml-minhash registered queries now
project per-output invariants that DuckDB hash-checks.

Two things need proving beyond the driver-sim green:
1. the murmur3 replay behind the minhash certificate is bit-identical to
   ``pyspark.ml.feature.HashingTF`` across every byte-length tail branch
   and multibyte text (Spark SQL's ``F.hash`` is NOT — its tail mixer is
   block-lenient, diverging whenever len(utf8) % 4 != 0);
2. the certificates are FALSIFIABLE — a forged output (self-match, wrong
   similarity, duplicate pair, missing neighbor) flips the matching
   boolean, so a green official row carries real information.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.functions.murmur3 import (
    hashing_tf_bucket,
    murmur3_x86_32,
)

SF001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# 1. murmur3 replay == HashingTF, every tail branch + multibyte


def test_murmur3_matches_hashing_tf(spark):
    from pyspark.ml.feature import HashingTF

    terms = [
        "", "a", "ab", "abc", "abcd", "abcde",            # tail 0..3 + word
        "hello world foo", "one two three",
        "é", "é 中 €", "中中中", "\U0001f600 emoji test",  # 2/3/4-byte UTF-8
        "x" * 100 + " y z",                                # long, %4 == 0
        "x" * 101,                                         # long, %4 != 0
    ]
    df = spark.createDataFrame([(t, [t]) for t in terms], "term string, arr array<string>")
    tf = HashingTF(inputCol="arr", outputCol="feat", numFeatures=1 << 18, binary=True)
    for row in tf.transform(df).collect():
        got = hashing_tf_bucket(row["term"], 1 << 18)
        assert row["feat"].indices.tolist() == [got], repr(row["term"])


def test_murmur3_signed_range():
    # Java semantics: signed int32; nonNegativeMod composes via Python %
    vals = [murmur3_x86_32(("t%d" % i).encode()) for i in range(200)]
    assert min(vals) < 0 < max(vals)
    assert all(-(1 << 31) <= v < (1 << 31) for v in vals)


# ---------------------------------------------------------------------------
# 2. ANN certificate: green on real output, falsifiable on forged output


def _cert(spark, topk, n_corpus=None):
    from azure_func_forem_data_etl_spark.operators.similarity import (
        _corpus_count,
        ann_topk_certificate,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table

    emb = table(spark, SF001, "embeddings")
    n = _corpus_count(emb, f"{SF001}/embeddings") if n_corpus is None else n_corpus
    return ann_topk_certificate(emb, topk, n)


def test_ann_certificate_green_on_real_output(spark):
    from azure_func_forem_data_etl_spark.operators.similarity import lsh_topk
    from azure_func_forem_data_etl_spark.sources.tables import table

    emb = table(spark, SF001, "embeddings")
    rows = _cert(spark, lsh_topk(emb, cache_key=f"{SF001}/embeddings")).collect()
    assert len(rows) > 0
    for r in rows:
        d = r.asDict()
        qid = d.pop("query_id")
        assert all(v is True for v in d.values()), (qid, d)


def _forge(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, neighbor_id long, cos_sim double, rnk int"
    )


def test_ann_certificate_flags_forged_outputs(spark):
    from azure_func_forem_data_etl_spark.operators.similarity import (
        ivf_topk,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table

    emb = table(spark, SF001, "embeddings")
    real = ivf_topk(emb, cache_key=f"{SF001}/embeddings")
    qid = real.select(F.min("query_id")).first()[0]
    base = {r["rnk"]: r for r in real.filter(F.col("query_id") == qid).collect()}

    # (a) self-match at rank 1 -> no_self AND sims_exact break
    forged = [(qid, qid, 1.0, 1)] + [
        (qid, base[i]["neighbor_id"], base[i]["cos_sim"], i) for i in (2, 3, 4, 5)
    ]
    row = _cert(spark, _forge(spark, forged)).filter(F.col("query_id") == qid).first()
    assert row["no_self"] is False

    # (b) tampered similarity -> sims_exact breaks
    forged = [
        (qid, base[i]["neighbor_id"],
         base[i]["cos_sim"] + (0.01 if i == 3 else 0.0), i)
        for i in (1, 2, 3, 4, 5)
    ]
    row = _cert(spark, _forge(spark, forged)).filter(F.col("query_id") == qid).first()
    assert row["sims_exact"] is False

    # (c) duplicated neighbor -> neighbors_distinct breaks
    forged = [
        (qid, base[1]["neighbor_id"], base[1]["cos_sim"], i) for i in (1, 2)
    ] + [(qid, base[i]["neighbor_id"], base[i]["cos_sim"], i) for i in (3, 4, 5)]
    row = _cert(spark, _forge(spark, forged)).filter(F.col("query_id") == qid).first()
    assert row["neighbors_distinct"] is False

    # (d) a dropped neighbor -> full_k breaks; a dropped RANK -> ranks_complete
    forged = [(qid, base[i]["neighbor_id"], base[i]["cos_sim"], i) for i in (1, 2, 3, 4)]
    row = _cert(spark, _forge(spark, forged)).filter(F.col("query_id") == qid).first()
    assert row["full_k"] is False
    forged = [
        (qid, base[i]["neighbor_id"], base[i]["cos_sim"], i + (1 if i == 5 else 0))
        for i in (1, 2, 3, 4, 5)
    ]
    row = _cert(spark, _forge(spark, forged)).filter(F.col("query_id") == qid).first()
    assert row["ranks_complete"] is False

    # (e) a query the search silently skipped -> full_k False for it,
    # vacuous invariants stay TRUE
    row = (
        _cert(spark, _forge(spark, []).filter(F.lit(False)))
        .filter(F.col("query_id") == qid)
        .first()
    )
    assert row["full_k"] is False and row["sims_exact"] is True


def _cert_relaxed(spark, topk):
    from azure_func_forem_data_etl_spark.operators.similarity import (
        _corpus_count,
        ann_topk_certificate,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table

    emb = table(spark, SF001, "embeddings")
    n = _corpus_count(emb, f"{SF001}/embeddings")
    return ann_topk_certificate(emb, topk, n, exact_full_k=False)


def test_ann_certificate_relaxed_full_k_semantics(spark):
    """exact_full_k=False (LSH/IVF/trained-IVF, r12 ADVICE #1): a
    legitimately sparse approximate result (>=1 but <k neighbors) PASSES
    full_k instead of masquerading as a correctness mismatch, while the
    structural bounds stay falsifiable — zero rows for a live query
    (liveness) and more-than-expected rows (top-k truncation) both fail."""
    from azure_func_forem_data_etl_spark.operators.similarity import ivf_topk
    from azure_func_forem_data_etl_spark.sources.tables import table

    emb = table(spark, SF001, "embeddings")
    real = ivf_topk(emb, cache_key=f"{SF001}/embeddings")
    qid = real.select(F.min("query_id")).first()[0]
    base = {r["rnk"]: r for r in real.filter(F.col("query_id") == qid).collect()}

    # sparse-but-live: 2 of 5 neighbors -> relaxed passes, exact fails
    sparse = [(qid, base[i]["neighbor_id"], base[i]["cos_sim"], i) for i in (1, 2)]
    row = _cert_relaxed(spark, _forge(spark, sparse)).filter(
        F.col("query_id") == qid
    ).first()
    assert row["full_k"] is True
    row = _cert(spark, _forge(spark, sparse)).filter(F.col("query_id") == qid).first()
    assert row["full_k"] is False

    # liveness: zero rows for a query whose corpus has neighbors -> fails
    row = (
        _cert_relaxed(spark, _forge(spark, []).filter(F.lit(False)))
        .filter(F.col("query_id") == qid)
        .first()
    )
    assert row["full_k"] is False

    # structural upper bound: k+1 emitted rows -> fails even relaxed
    extra_id = max(r["neighbor_id"] for r in base.values()) + 1
    over = [(qid, base[i]["neighbor_id"], base[i]["cos_sim"], i) for i in (1, 2, 3, 4, 5)]
    over.append((qid, extra_id, 0.0, 6))
    row = _cert_relaxed(spark, _forge(spark, over)).filter(
        F.col("query_id") == qid
    ).first()
    assert row["full_k"] is False


def test_ann_probing_variants_exact_k_on_fixtures(spark):
    """The exact-count property the relaxed certificate no longer asserts
    (r12 ADVICE #1) stays pinned HERE for the driver fixtures: every
    probing variant emits exactly least(k, corpus-1) neighbors per query
    at sf0.001 — the multi-probe bucket/list budgets are sized for it."""
    from azure_func_forem_data_etl_spark.operators.similarity import (
        KNN_K,
        _corpus_count,
        ivf_topk,
        lsh_topk,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table

    emb = table(spark, SF001, "embeddings")
    n = _corpus_count(emb, f"{SF001}/embeddings")
    expected = min(KNN_K, n - 1)
    for fn in (lsh_topk, ivf_topk):
        counts = (
            fn(emb, cache_key=f"{SF001}/embeddings")
            .groupBy("query_id")
            .count()
            .select(F.min("count"), F.max("count"))
            .first()
        )
        assert counts[0] == expected and counts[1] == expected, fn.__name__


def test_ml_minhash_neardup_builds_lazily(spark):
    """Building the registered ml_minhash_neardup plan must launch NO
    Spark jobs (r12 ADVICE #3): the certificate's pair-set checkpoint is
    lazy now, so plan-only tooling (plan lints, .explain) doesn't pay the
    MinHashLSH fit + approxSimilarityJoin.  The first ACTION still
    materializes the checkpoint and the certificate stays green."""
    from azure_func_forem_data_etl_spark.plans.registry import REGISTRY, load_all

    load_all()
    sc = spark.sparkContext
    sc.setJobGroup("r13-lazy-build", "plan construction must not run jobs")
    try:
        df = REGISTRY["ml_minhash_neardup"].fn(spark, SF001)
        built_jobs = sc.statusTracker().getJobIdsForGroup("r13-lazy-build")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
    # every builder pays 1-task parquet footer-read jobs (source-open
    # cost); what must NOT happen at build is multi-task PIPELINE
    # execution (the old eager checkpoint ran the fit + similarity join)
    tr = sc.statusTracker()
    for jid in built_jobs:
        info = tr.getJobInfo(jid)
        ntasks = sum(
            si.numTasks
            for si in (tr.getStageInfo(s) for s in info.stageIds)
            if si is not None
        )
        assert ntasks <= 1, (jid, ntasks, built_jobs)
    row = df.first()
    d = row.asDict()
    assert all(v is True for v in d.values()), d


# ---------------------------------------------------------------------------
# 3. minhash certificate: green on real output, falsifiable on forged


def test_ml_minhash_certificate_green_and_falsifiable(spark, tmp_path):
    from azure_func_forem_data_etl_spark.operators.dedup import (
        ml_minhash_certificate,
        ml_minhash_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " again"),                      # near-dup of 1
            (3, "completely different words here that share nothing at all "
                "with any other document in this tiny corpus"),
        ],
        "doc_id long, text string",
    )
    pairs = ml_minhash_pairs(docs, threshold=0.4)
    assert pairs.count() >= 1  # the planted near-dup is found
    cert = ml_minhash_certificate(docs, pairs).first().asDict()
    assert all(v is True for v in cert.values()), cert

    # forged: non-canonical order, duplicate pair, wrong similarity,
    # sub-threshold similarity
    forged = spark.createDataFrame(
        [(2, 1, 0.9), (1, 2, 0.9), (1, 2, 0.9), (1, 3, 0.1)],
        "doc_a long, doc_b long, jaccard_sim double",
    )
    cert = ml_minhash_certificate(docs, forged).first().asDict()
    assert cert["pairs_canonical"] is False
    assert cert["pairs_distinct"] is False
    assert cert["sims_match_true_jaccard"] is False
    assert cert["sims_ge_threshold"] is False


def test_ml_minhash_certificate_tolerates_exact_sim(spark):
    """The emitted sim for an exact 3-shingle overlap must match the
    replayed Jaccard within tolerance on simple controlled docs."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        ml_minhash_certificate,
        ml_minhash_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")],
        "doc_id long, text string",
    )
    pairs = ml_minhash_pairs(docs, threshold=0.3)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard_sim"] for r in pairs.collect()}
    if (1, 2) in got:  # LSH may or may not bucket them; if it does, verify
        assert got[(1, 2)] == pytest.approx(2 / 4, abs=1e-6)
        cert = ml_minhash_certificate(docs, pairs).first().asDict()
        assert all(v is True for v in cert.values()), cert


# ---------------------------------------------------------------------------
# 4. fit-cache invalidation hook (r11 VERDICT ask #8)


def test_clear_fit_caches_refits_rewritten_corpus(spark, tmp_path):
    """A session that REWRITES a table at a path previously used as a
    cache_key must call clear_fit_caches() to re-fit; the hook clears the
    kmeans/centroid/PQ/metadata memos in one call."""
    import numpy as np

    from azure_func_forem_data_etl_spark.operators.clustering import kmeans_fit
    from azure_func_forem_data_etl_spark.operators.similarity import (
        _corpus_count,
        clear_fit_caches,
    )

    path = str(tmp_path / "emb")

    def write(n, shift):
        spark.createDataFrame(
            [(i, [float(i % 7) + shift, float(i % 3), 1.0]) for i in range(n)],
            "vec_id long, embedding array<float>",
        ).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
        return spark.read.parquet(f"{path}/embeddings.parquet")

    emb_a = write(40, 0.0)
    ck = f"{path}/embeddings"
    c_a, _ = kmeans_fit(emb_a, k=4, cache_key=ck)
    assert _corpus_count(emb_a, ck) == 40

    emb_b = write(25, 100.0)  # same path, different corpus
    # documented hazard: without invalidation the memo serves stale fits
    c_stale, _ = kmeans_fit(emb_b, k=4, cache_key=ck)
    assert np.array_equal(c_stale, c_a)
    assert _corpus_count(emb_b, ck) == 40  # stale

    clear_fit_caches()
    c_b, _ = kmeans_fit(emb_b, k=4, cache_key=ck)
    assert not np.array_equal(c_b, c_a)
    assert (c_b >= 99.0).any()  # fitted on the shifted corpus
    assert _corpus_count(emb_b, ck) == 25
