"""Behavioral tests for the LLM-pipeline operators (SURVEY.md §5.2/§5.4):
planted near-duplicates for MinHash/SimHash, ANN recall vs the exact
brute-force baseline, multimodal plumbing determinism, as-of boundaries."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_pairs,
    word_shingles,
)
from azure_func_forem_data_etl_spark.operators.multimodal import (
    extract_media_features,
    with_binary_column,
)
from azure_func_forem_data_etl_spark.operators.similarity import lsh_topk
from azure_func_forem_data_etl_spark.operators.temporal import asof_join
from azure_func_forem_data_etl_spark.plans.registry import load_all
from azure_func_forem_data_etl_spark.sources.tables import table

REGISTRY = load_all()


@pytest.fixture(scope="module")
def planted_docs(spark, sf_dir):
    """Real docs + near-dup copies: copy doc i -> doc 100000+i with the
    first two words changed (high but <1.0 Jaccard)."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    mutated = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("zz qq "), F.expr("substring(text, instr(text, ' ') + 1)")).alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(mutated)


def test_minhash_lsh_finds_planted_neardups(planted_docs):
    pairs = minhash_lsh_pairs(planted_docs, threshold=0.4).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    planted = {(i, 100000 + i) for i in range(50)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.8, f"MinHash-LSH recall {recall} on planted near-dups"
    for r in pairs:
        assert r.jaccard >= 0.4


def test_minhash_no_false_high_jaccard(planted_docs):
    # every reported pair must truly exceed the threshold: spot-check via
    # exact shingle sets computed independently
    pairs = minhash_lsh_pairs(planted_docs, threshold=0.4).limit(5).collect()
    sh = word_shingles(planted_docs, 3).collect()
    by_doc: dict[int, set] = {}
    for r in sh:
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    for r in pairs:
        a, b = by_doc[r.doc_a], by_doc[r.doc_b]
        true_j = len(a & b) / len(a | b)
        assert abs(true_j - r.jaccard) < 1e-9


def test_simhash_exact_duplicates_hamming_zero(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    dup = docs.select((F.col("doc_id") + 200000).alias("doc_id"), "text", "lang", "source", "n_chars")
    corpus = docs.unionByName(dup)
    pairs = simhash_pairs(corpus, max_hamming=0).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    planted = {(i, 200000 + i) for i in range(30)}
    assert planted <= found, f"missing exact dups: {planted - found}"


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["knn_bruteforce"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(table(spark, sf_dir, "embeddings")).collect()
    }
    recall = len(exact & approx) / len(exact)
    # Random gaussian corpus (no cluster structure) is LSH's worst case;
    # the floor just guards against the bucketing being broken.
    assert recall >= 0.35, f"ANN recall@5 {recall}"


def test_multimodal_features_deterministic_and_correct(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    feats = extract_media_features(with_binary_column(docs))
    rows = {r.doc_id: r for r in feats.collect()}
    rows2 = {r.doc_id: r for r in feats.collect()}
    assert rows == rows2  # deterministic across runs
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, r in rows.items():
        buf = texts[doc_id].encode("utf-8")
        assert r.n_bytes == len(buf)
        assert r.crc32 == (zlib.crc32(buf) & 0xFFFFFFFF)
        assert r.n_frames == (len(buf) + 63) // 64
        assert len(r.byte_embedding) == 16
        assert abs(sum(x * x for x in r.byte_embedding) - 1.0) < 1e-5


def test_asof_join_boundary_semantics(spark):
    left = spark.createDataFrame(
        [Row(k=1, ts=10, lbl="at"), Row(k=1, ts=15, lbl="between"), Row(k=1, ts=5, lbl="before"), Row(k=2, ts=99, lbl="nokey")]
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=10, payload="r10"), Row(k=1, rts=12, payload="r12")]
    )
    out = {
        r.lbl: r.payload
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts", right_payload=["payload"]
        ).collect()
    }
    assert out["at"] == "r10"        # inclusive: rts == ts matches
    assert out["between"] == "r12"   # latest at-or-before
    assert out["before"] is None     # nothing before
    assert out["nokey"] is None      # key with no right rows


def test_ann_ivf_recall_vs_bruteforce(spark, sf_dir):
    from azure_func_forem_data_etl_spark.operators.similarity import ivf_topk

    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["knn_bruteforce"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(table(spark, sf_dir, "embeddings")).collect()
    }
    recall = len(exact & approx) / len(exact)
    # Sampled-centroid IVF over an unclustered gaussian corpus: the floor
    # guards the inverted-list machinery, not state-of-the-art recall.
    assert recall >= 0.35, f"IVF recall@5 {recall}"


def test_ann_pq_recall_vs_bruteforce(spark, sf_dir):
    from azure_func_forem_data_etl_spark.operators.similarity import pq_topk

    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["knn_bruteforce"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(table(spark, sf_dir, "embeddings")).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 8x16 codebooks on an unclustered gaussian corpus quantize coarsely;
    # the floor guards the encode/ADC/rescore machinery, not SOTA recall.
    assert recall >= 0.35, f"PQ recall@5 {recall}"


def test_ann_ivfpq_recall_vs_bruteforce(spark, sf_dir):
    from azure_func_forem_data_etl_spark.operators.similarity import ivfpq_topk

    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["knn_bruteforce"].fn(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_topk(table(spark, sf_dir, "embeddings")).collect()
    }
    recall = len(exact & approx) / len(exact)
    # IVF routing x PQ quantization both lose recall on a gaussian corpus;
    # the floor guards the fused route/encode/ADC machinery.
    assert recall >= 0.3, f"IVF-PQ recall@5 {recall}"


def test_pq_codes_shape_and_determinism(spark, sf_dir):
    from azure_func_forem_data_etl_spark.operators.similarity import (
        PQ_K_MAX,
        PQ_M,
        _pq_encode_mapper,
        _pq_subspaces,
        pq_train,
    )
    from azure_func_forem_data_etl_spark.sources.tables import scale_out

    emb = table(spark, sf_dir, "embeddings")
    books = pq_train(emb, cache_key=f"{sf_dir}/embeddings")
    assert len(books) == PQ_M and all(b.shape[0] <= PQ_K_MAX for b in books)
    dim = sum(b.shape[1] for b in books)
    codes = scale_out(emb.select("vec_id", "embedding"), "vec_id").mapInPandas(
        _pq_encode_mapper(books, _pq_subspaces(dim)),
        schema="vec_id long, codes array<int>",
    )
    rows = {r.vec_id: tuple(r.codes) for r in codes.collect()}
    rows2 = {r.vec_id: tuple(r.codes) for r in codes.collect()}
    assert rows == rows2  # deterministic encode
    assert all(len(c) == PQ_M for c in rows.values())
    assert all(0 <= x < PQ_K_MAX for c in rows.values() for x in c)


def test_multimodal_resize_shape_and_determinism(spark, sf_dir):
    from azure_func_forem_data_etl_spark.operators.multimodal import (
        THUMB_SIDE,
        resize_media,
    )

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    thumbs = resize_media(with_binary_column(docs))
    rows = {r.doc_id: r for r in thumbs.collect()}
    rows2 = {r.doc_id: r for r in thumbs.collect()}
    assert rows.keys() == rows2.keys()
    for doc_id, r in rows.items():
        assert (r.thumb_w, r.thumb_h) == (THUMB_SIDE, THUMB_SIDE)
        assert len(r.thumbnail) == THUMB_SIDE * THUMB_SIDE
        assert r.thumbnail == rows2[doc_id].thumbnail  # deterministic
        assert all(0.0 <= v <= 255.0 for v in r.thumbnail)


def test_count_min_sketch_bounds(spark, sf_dir):
    """CMS never underestimates; overestimate bounded by eps*N.  The raw
    estimates come from cms_build/cms_estimate directly (the registered
    query projects the invariants as booleans since the r6 promotion)."""
    from azure_func_forem_data_etl_spark.operators.sketch import (
        CMS_WIDTH,
        cms_build,
        cms_estimate,
    )

    docs = table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    n_tokens = tokens.count()
    cms = cms_build(tokens)
    top = (
        tokens.groupBy("token")
        .agg(F.count("*").alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "token")
        .limit(10)
    )
    raw = cms_estimate(cms, top.select("token")).join(top, "token").collect()
    assert raw, "no heavy hitters returned"
    eps_bound = 2.0 * n_tokens / CMS_WIDTH  # e/WIDTH, generous constant
    for r in raw:
        assert r["est"] >= r["true_cnt"], r  # one-sided error
        assert r["est"] - r["true_cnt"] <= eps_bound, r
    # and the registered invariant projection agrees
    rows = REGISTRY["cms_heavy_hitters"].fn(spark, sf_dir).collect()
    assert len(rows) == len(raw)
    for r in rows:
        assert r["est_ge_true"] is True and r["est_within_bound"] is True, r


def test_theta_sketch_setops_error_bounds(spark, sf_dir):
    """Theta estimates for A, B, A∪B, A∩B, A\\B all within 5% (+small
    absolute slack) of the exact set algebra on user ids."""
    rows = REGISTRY["theta_sketch_setops"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    events = table(spark, sf_dir, "events")
    users = {
        t: {
            x["user_id"]
            for x in events.filter(F.col("event_type") == t)
            .select("user_id")
            .distinct()
            .collect()
        }
        for t in (r["type_a"], r["type_b"])
    }
    a, b = users[r["type_a"]], users[r["type_b"]]
    exact = {
        "distinct_a": len(a),
        "distinct_b": len(b),
        "union_est": len(a | b),
        "inter_est": len(a & b),
        "a_minus_b_est": len(a - b),
    }
    for col, want in exact.items():
        got = r[col]
        assert abs(got - want) <= max(5, 0.05 * want), (col, got, want)


def test_doc_chunking_invariants(spark, sf_dir):
    """Chunks cover every token; stride-aligned starts; bounded size;
    re-concatenating the non-overlapping halves rebuilds the doc."""
    from azure_func_forem_data_etl_spark.operators.text import doc_chunking
    from azure_func_forem_data_etl_spark.sources.tables import table
    from pyspark.sql import functions as F

    chunks = doc_chunking(spark, sf_dir)
    assert chunks.filter((F.col("n_tokens") < 1) | (F.col("n_tokens") > 50)).count() == 0
    # Every doc appears; chunk 0 always exists.
    n_docs = table(spark, sf_dir, "documents").count()
    assert chunks.filter(F.col("chunk_id") == 0).count() == n_docs
    # Token-count conservation: the first 25 tokens of each chunk (its
    # stride window) tile the doc exactly — the final chunk is always <=25
    # tokens, every earlier chunk contributes exactly its stride.
    doc_tokens = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
    )
    covered = chunks.groupBy("doc_id").agg(
        F.sum(F.least(F.col("n_tokens"), F.lit(25))).alias("cov")
    )
    bad = (
        doc_tokens.join(covered, "doc_id")
        .filter(F.col("cov") != F.col("n"))
        .count()
    )
    assert bad == 0


def test_dataset_split_fractions_and_determinism(spark, sf_dir):
    """Split is total, deterministic across runs, and near the 75/12.5/12.5
    design fractions."""
    from azure_func_forem_data_etl_spark.operators.text import dataset_split_hash
    from pyspark.sql import functions as F

    a = dataset_split_hash(spark, sf_dir)
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] / total > 0.6  # 12/16 expected
    # Deterministic: a second build produces the identical assignment.
    b = dataset_split_hash(spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_gapfill_spine_is_dense(spark, sf_dir):
    """Per series: one row per hour between min and max, no holes, and LOCF
    never regresses to NULL after the first observation."""
    from azure_func_forem_data_etl_spark.operators.temporal import gapfill_hourly_locf
    from pyspark.sql import functions as F

    g = gapfill_hourly_locf(spark, sf_dir)
    span = g.groupBy("event_type").agg(
        F.count("*").alias("rows"),
        ((F.unix_timestamp(F.max("hour_start")) - F.unix_timestamp(F.min("hour_start")))
         / 3600 + 1).cast("long").alias("hours"),
    )
    assert span.filter(F.col("rows") != F.col("hours")).count() == 0
    # After any non-gap row, filled_sum is never NULL again.
    from pyspark.sql import Window
    w = Window.partitionBy("event_type").orderBy("hour_start")
    seen = F.sum((F.col("was_gap") == 0).cast("int")).over(w)
    assert g.withColumn("seen", seen).filter(
        (F.col("seen") > 0) & F.col("filled_sum").isNull()
    ).count() == 0


def test_connected_components_planted_graphs(spark):
    """Chain, star, isolated self-loop: every vertex gets the min reachable
    id; disjoint groups never merge."""
    from azure_func_forem_data_etl_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (5, 5)],
        "a: long, b: long",
    )
    got = {
        (r["id"], r["comp"])
        for r in connected_components(edges, "a", "b").collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
        (5, 5),
    }


def test_connected_components_star_matches_union_find(spark):
    """The distributed large-star/small-star tier labels identically to the
    driver union-find on adversarial shapes: a 200-node path (worst case
    for label propagation — O(n) rounds there, O(log n) star rounds), two
    cliques bridged by one edge, random sparse noise, and self-loops."""
    import random as _random

    from azure_func_forem_data_etl_spark.operators.dedup import (
        _driver_union_find,
        connected_components_star,
    )

    rng = _random.Random(7)
    chain = [(i, i + 1) for i in range(1000, 1200)]
    cliques = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    cliques += [(a, b) for a in range(20, 25) for b in range(a + 1, 25)]
    bridge = [(14, 20)]
    noise = [(rng.randrange(500, 600), rng.randrange(500, 600)) for _ in range(80)]
    loops = [(3000, 3000)]
    all_edges = chain + cliques + bridge + noise + loops

    edges = spark.createDataFrame(all_edges, "a: long, b: long")
    got = {
        (r["id"], r["comp"])
        for r in connected_components_star(edges, "a", "b").collect()
    }
    expect = set(_driver_union_find(all_edges, None))
    assert got == expect
    # one row per distinct vertex
    verts = {v for e in all_edges for v in e}
    assert len(got) == len(verts)
    # every component label is the component minimum
    comp_min: dict = {}
    for vid, comp in got:
        comp_min.setdefault(comp, []).append(vid)
    for comp, members in comp_min.items():
        assert comp == min(members + [comp])


def test_connected_components_dispatch_equivalence(spark):
    """The adaptive wrapper (driver tier at this size) and the distributed
    star path agree on the same planted graph."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    raw = [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (5, 5)]
    edges = spark.createDataFrame(raw, "a: long, b: long")
    via_driver = {
        (r["id"], r["comp"]) for r in connected_components(edges, "a", "b").collect()
    }
    via_star = {
        (r["id"], r["comp"])
        for r in connected_components_star(edges, "a", "b").collect()
    }
    assert via_driver == via_star


def test_neardup_clusters_are_consistent(spark, sf_dir):
    """Cluster invariants on the real corpus: cluster_id == min(member),
    exactly one representative per cluster, one row per doc, and every
    LSH-verified pair lands in the same cluster."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        neardup_cluster_components,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table
    from pyspark.sql import functions as F

    clusters = neardup_cluster_components(spark, sf_dir).cache()
    per = clusters.groupBy("cluster_id").agg(
        F.min("doc_id").alias("mn"),
        F.sum("is_representative").alias("n_rep"),
        F.count("*").alias("n"),
        F.max("cluster_size").alias("sz"),
    )
    assert per.filter(
        (F.col("mn") != F.col("cluster_id"))
        | (F.col("n_rep") != 1)
        | (F.col("n") != F.col("sz"))
    ).count() == 0
    assert clusters.groupBy("doc_id").count().filter("count > 1").count() == 0
    pairs = minhash_lsh_pairs(table(spark, sf_dir, "documents"))
    a = clusters.select(F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca"))
    b = clusters.select(F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb"))
    assert pairs.join(a, "doc_a").join(b, "doc_b").filter("ca != cb").count() == 0
    clusters.unpersist()


def test_hll_sketch_union_error_bound(spark, sf_dir):
    """HLL estimates: per-day and unioned overall within the standard
    ~1.6% relative error (lgConfigK=12 default) of exact distincts.  The
    registered query projects the invariant booleans (r6 promotion), so
    this test checks them plus the exact columns against a replay."""
    from azure_func_forem_data_etl_spark.operators.sketch import hll_sketch_union
    from azure_func_forem_data_etl_spark.sources.tables import table
    from pyspark.sql import functions as F

    rows = hll_sketch_union(spark, sf_dir).collect()
    events = table(spark, sf_dir, "events")
    exact_overall = events.select("user_id").distinct().count()
    overall = [r for r in rows if r["day"] is None][0]
    assert overall["distinct_users_exact"] == exact_overall
    assert overall["hll_within_bound"] is True
    exact_daily = {
        r["day"]: r["n"]
        for r in events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        if r["day"] is None:
            continue
        assert r["distinct_users_exact"] == exact_daily[r["day"]], r
        assert r["hll_within_bound"] is True, r


def test_embedding_clusters_consistent_with_pairs(spark, sf_dir):
    """Embedding clustering (IVF-bucketed edges): cluster_id is the min
    member; one representative per cluster; every IVF candidate edge
    co-clusters; and the approximate edge source recovers most of the
    exact sampled cosine pairs (recall floor)."""
    from azure_func_forem_data_etl_spark.operators.similarity import (
        embedding_cosine_pairs,
        ivf_candidate_pairs,
    )
    from pyspark.sql import functions as F

    clusters = REGISTRY["embedding_neardup_clusters"].fn(spark, sf_dir).cache()
    per = clusters.groupBy("cluster_id").agg(
        F.min("vec_id").alias("mn"), F.sum("is_representative").alias("n_rep")
    )
    assert per.filter((F.col("mn") != F.col("cluster_id")) | (F.col("n_rep") != 1)).count() == 0
    a = clusters.select(F.col("vec_id").alias("vec_a"), F.col("cluster_id").alias("ca"))
    b = clusters.select(F.col("vec_id").alias("vec_b"), F.col("cluster_id").alias("cb"))
    # the edges the clustering consumed must co-cluster exactly
    edges = ivf_candidate_pairs(table(spark, sf_dir, "embeddings"))
    assert edges.join(a, "vec_a").join(b, "vec_b").filter("ca != cb").count() == 0
    # approximate edge source vs the exact sampled ground truth: most
    # exact pairs end up in one cluster (transitivity can only help);
    # measured ~0.93 at test SF on worst-case gaussian data
    exact = embedding_cosine_pairs(spark, sf_dir)
    n_exact = exact.count()
    if n_exact:
        co = exact.join(a, "vec_a").join(b, "vec_b").filter("ca = cb").count()
        assert co / n_exact >= 0.6, f"cluster recall {co}/{n_exact}"
    clusters.unpersist()

def test_capped_bucket_pairs_allpairs_and_star(spark):
    """Small buckets emit exact all-pairs; oversized buckets collapse to a
    min-id hub star (linear), keeping the group connected."""
    from azure_func_forem_data_etl_spark.operators.dedup import capped_bucket_pairs

    rows = [(i, 1) for i in range(5)] + [(100 + i, 2) for i in range(10)]
    ex = spark.createDataFrame(rows, "doc_id long, bucket long")
    pairs = capped_bucket_pairs(ex, ["bucket"], "doc_id", cap=6)
    got = {(r.doc_id_a, r.doc_id_b) for r in pairs.collect()}
    small_expected = {(i, j) for i in range(5) for j in range(i + 1, 5)}
    star_expected = {(100, 100 + i) for i in range(1, 10)}
    assert got == small_expected | star_expected
    # every pair ordered, distinct
    assert all(a < b for a, b in got)


def test_capped_bucket_pairs_payload_rides_along(spark):
    from azure_func_forem_data_etl_spark.operators.dedup import capped_bucket_pairs

    rows = [(1, 7, 11), (2, 7, 22), (3, 7, 33)]
    ex = spark.createDataFrame(rows, "doc_id long, bucket long, fp long")
    pairs = capped_bucket_pairs(ex, ["bucket"], "doc_id", cap=2, payload=("fp",))
    got = {(r.doc_id_a, r.doc_id_b, r.fp_a, r.fp_b) for r in pairs.collect()}
    # bucket of 3 > cap 2 -> star around hub doc 1 (fp 11)
    assert got == {(1, 2, 11, 22), (1, 3, 11, 33)}


def test_minhash_hot_bucket_bounded_and_connected(spark):
    """A planted boilerplate cluster (many identical docs) must not go
    quadratic in candidates, yet must still cluster into one component."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        MAX_BUCKET_ALLPAIRS,
        MINHASH_BANDS,
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
        minhash_lsh_pairs,
    )

    n_hot = 4 * MAX_BUCKET_ALLPAIRS  # 4x over the cap
    text = "the same boilerplate banner paragraph repeated on every page of this site"
    rows = [(i, text) for i in range(n_hot)]
    rows += [(10_000 + i, f"unique document number {i} with distinct words {i * 7} {i * 13}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = word_shingles(docs, 3)
    cand = lsh_candidate_pairs(minhash_signatures(sh))
    n_cand = cand.count()
    # all-pairs would be n_hot*(n_hot-1)/2 = 32640; the star bound is
    # (n_hot - 1) hub pairs (+ small-bucket pairs from the unique docs)
    assert n_cand < MINHASH_BANDS * (MAX_BUCKET_ALLPAIRS**2 + n_hot), n_cand
    assert n_cand < n_hot * (n_hot - 1) / 4, f"quadratic blow-up: {n_cand}"

    verified = minhash_lsh_pairs(docs, threshold=0.9)
    comp = connected_components(verified, "doc_a", "doc_b")
    hot = comp.filter(F.col("id") < n_hot)
    assert hot.count() == n_hot  # every boilerplate doc is in the graph
    assert hot.select("comp").distinct().count() == 1  # ... in ONE cluster


def test_knn_chunked_passes_match_single_pass(spark, sf_dir):
    from azure_func_forem_data_etl_spark.operators.similarity import (
        knn_bruteforce_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    one = {tuple(r) for r in knn_bruteforce_topk(emb).collect()}
    chunked = {tuple(r) for r in knn_bruteforce_topk(emb, queries_per_pass=2).collect()}
    assert one == chunked and len(one) > 0


def test_knn_query_cap_raises(spark, sf_dir):
    from azure_func_forem_data_etl_spark.operators.similarity import (
        knn_bruteforce_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="query set exceeds"):
        # query_mod=1 makes every vector a query; tiny cap must fail loudly
        knn_bruteforce_topk(emb, query_mod=1, max_queries=10)


def test_curation_statuses_partition_corpus(spark, sf_dir):
    """Every doc gets exactly one status; splits only on kept docs; kept
    docs are unique by content hash."""
    from azure_func_forem_data_etl_spark.operators.curation import doc_status

    docs = table(spark, sf_dir, "documents")
    st = doc_status(spark, sf_dir).cache()
    assert st.count() == docs.count()
    assert st.select("doc_id").distinct().count() == docs.count()
    assert st.filter((F.col("status") == "kept") & F.col("split").isNull()).count() == 0
    assert st.filter((F.col("status") != "kept") & F.col("split").isNotNull()).count() == 0
    kept_texts = st.filter(F.col("status") == "kept").join(docs, "doc_id").select(
        F.md5("text").alias("fp")
    )
    assert kept_texts.count() == kept_texts.distinct().count()
    st.unpersist()


def test_curation_exact_dup_stage(spark, sf_dir, tmp_path):
    """Planted exact copies of quality-passing docs are dropped as
    exact_dup, keeping the min doc_id."""
    from azure_func_forem_data_etl_spark.operators import curation

    docs = table(spark, sf_dir, "documents")
    kept_ids = [
        r.doc_id
        for r in curation.doc_status(spark, sf_dir)
        .filter("status = 'kept'")
        .limit(5)
        .collect()
    ]
    dup = docs.filter(F.col("doc_id").isin(kept_ids)).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    aug_dir = str(tmp_path / "aug")
    docs.unionByName(dup).write.parquet(f"{aug_dir}/documents.parquet")
    st = curation.doc_status(spark, aug_dir)
    dup_rows = {r.doc_id: r.status for r in st.filter(F.col("doc_id") >= 500000).collect()}
    assert set(dup_rows) == {i + 500000 for i in kept_ids}
    assert all(s == "exact_dup" for s in dup_rows.values()), dup_rows


def test_curation_summary_conserves_docs(spark, sf_dir):
    from azure_func_forem_data_etl_spark.operators.curation import (
        curation_pipeline_summary,
    )

    docs_n = table(spark, sf_dir, "documents").count()
    rows = curation_pipeline_summary(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == docs_n
    buckets = {r.bucket for r in rows}
    assert buckets <= {"train", "val", "test", "low_quality", "exact_dup", "near_dup"}
    assert {"train"} <= buckets  # the dominant split must be present


def test_quantize_int8_reconstruction_bound(spark, sf_dir):
    """Round-trip error per element <= scale/2; values within int8 range."""
    from azure_func_forem_data_etl_spark.operators.similarity import quantized_vectors

    qv = quantized_vectors(table(spark, sf_dir, "embeddings")).limit(50).collect()
    assert qv
    for r in qv:
        assert len(r.qv) == len(r.e)
        for q, x in zip(r.qv, r.e):
            assert -127 <= q <= 127
            assert abs(q * r.scale - x) <= r.scale / 2 + 1e-12


def test_fuzzy_levenshtein_finds_planted_edits(spark, sf_dir, tmp_path):
    """Docs with a few character edits (same lang + length band) must pair;
    unrelated docs must not."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        FUZZY_MAX_DIST,
        fuzzy_levenshtein_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    # mutate 3 chars of the prefix; same n_chars => same block
    mutated = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.concat(F.lit("xyz"), F.expr("substring(text, 4)")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    aug = str(tmp_path / "fz")
    docs.unionByName(mutated).write.parquet(f"{aug}/documents.parquet")
    pairs = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in fuzzy_levenshtein_pairs(spark, aug).collect()
    }
    for i in range(10):
        assert (i, 700000 + i) in pairs, f"missing planted fuzzy pair {i}"
        assert pairs[(i, 700000 + i)] <= 3
    assert all(d <= FUZZY_MAX_DIST for d in pairs.values())


def test_ml_minhash_finds_planted_neardups(planted_docs):
    """The pyspark.ml MinHashLSH path must recover the same planted
    near-dups as the hand-rolled banded implementation."""
    from azure_func_forem_data_etl_spark.operators.dedup import ml_minhash_pairs

    pairs = ml_minhash_pairs(planted_docs, threshold=0.4).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    planted = {(i, 100000 + i) for i in range(50)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.8, f"ml MinHashLSH recall {recall} on planted near-dups"
    for r in pairs:
        assert r.jaccard_sim >= 0.4 - 1e-9


def test_kmeans_inertia_nonincreasing_and_trained_ivf_recall(spark, sf_dir):
    """Lloyd's objective must be non-increasing across iterations, and
    IVF with trained centroids must beat (or match) the recall floor of
    the sampled-centroid path."""
    import numpy as np

    from azure_func_forem_data_etl_spark.operators.clustering import (
        kmeans_assignments,
        kmeans_fit,
    )
    from azure_func_forem_data_etl_spark.operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings")
    C, trace = kmeans_fit(emb, k=16, iters=4, trace_inertia=True)
    assert len(trace) == 4
    for a, b in zip(trace, trace[1:]):
        assert b <= a + 1e-6, f"inertia increased: {trace}"
    sizes = kmeans_assignments(emb, C).groupBy("cluster_id").count().collect()
    assert sum(r["count"] for r in sizes) == emb.count()

    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["knn_bruteforce"].fn(spark, sf_dir).collect()
    }
    C5, _ = kmeans_fit(emb)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, centroids=(np.arange(C5.shape[0]), C5)).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.35, f"trained-IVF recall@5 {recall}"


def test_repetition_rules_invariants(spark, sf_dir):
    """Fractions bounded, keep is 0/1, and a pathologically repetitive doc
    must be rejected while a diverse doc survives."""
    from azure_func_forem_data_etl_spark.operators.text import (
        quality_repetition_rules,
    )

    docs = table(spark, sf_dir, "documents")
    loop_doc = docs.limit(1).select(
        F.lit(800000).alias("doc_id"),
        F.lit(" ".join(["spam ham"] * 40)).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.lit(640).alias("n_chars"),
    )
    import tempfile

    aug = tempfile.mkdtemp(prefix="rep_rules_")
    docs.unionByName(loop_doc).write.mode("overwrite").parquet(
        f"{aug}/documents.parquet"
    )
    rows = {r.doc_id: r for r in quality_repetition_rules(spark, aug).collect()}
    for r in rows.values():
        assert 0.0 < r.uniq_word_frac <= 1.0
        assert 0.0 < r.top_word_frac <= 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0
        assert r.keep in (0, 1)
    planted = rows[800000]
    assert planted.keep == 0, "80x-repeated bigram doc must be rejected"
    assert planted.top_bigram_frac > 0.4


def test_retention_cohort_invariants(spark, sf_dir):
    """Offset-0 count equals cohort size (everyone is active on their own
    first day) and no offset is negative."""
    from azure_func_forem_data_etl_spark.operators.relational import (
        retention_cohorts,
    )

    rows = retention_cohorts(spark, sf_dir).collect()
    assert rows
    by_cohort: dict[str, dict[int, int]] = {}
    for r in rows:
        assert r.day_offset >= 0
        by_cohort.setdefault(r.cohort_day, {})[r.day_offset] = r.n_users
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets, f"cohort {cohort} missing day-0 row"
        assert offsets[0] == max(offsets.values()), (
            f"cohort {cohort}: day-0 must be the largest retention bucket"
        )


def test_unigram_logprob_monotone_in_word_rarity(spark, sf_dir):
    """A doc made entirely of the corpus's most common word must score
    higher (less negative per-word) than one of the rarest word."""
    from azure_func_forem_data_etl_spark.operators.text import (
        unigram_logprob_score,
    )

    docs = table(spark, sf_dir, "documents")
    w = docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
    freq = w.groupBy("word").count().collect()
    common = max(freq, key=lambda r: r["count"])["word"]
    rare = min(freq, key=lambda r: r["count"])["word"]
    extra = spark.createDataFrame(
        [
            (900000, " ".join([common] * 20), "en", "synthetic", 0),
            (900001, " ".join([rare] * 20), "en", "synthetic", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("n_chars", F.length("text"))
    import tempfile

    aug = tempfile.mkdtemp(prefix="unigram_")
    docs.unionByName(extra).write.mode("overwrite").parquet(
        f"{aug}/documents.parquet"
    )
    rows = {r.doc_id: r for r in unigram_logprob_score(spark, aug).collect()}
    per_word = {
        i: rows[i].sum_log10_prob / rows[i].n_words for i in (900000, 900001)
    }
    assert per_word[900000] > per_word[900001], per_word


# ---------------------------------------------------------------------------
# quadratic-tier guards + curation funnel twin


def test_quadratic_guard_raises_on_oversized_input(spark, sf_dir):
    """The all-pairs oracle tiers must refuse inputs beyond their sample
    bound instead of silently compiling an O(n^2) join."""
    from azure_func_forem_data_etl_spark.operators._guards import (
        assert_bounded_input,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    with pytest.raises(ValueError, match="all-pairs bound"):
        assert_bounded_input(docs, "test_tier", bound=5)
    # Bounded input passes through unchanged.
    assert assert_bounded_input(docs.limit(3), "test_tier", bound=5) is not None


def test_curation_summary_twin_consistent_with_full_pipeline(spark, sf_dir):
    """The oracle-backed no-neardup twin must agree with the full pipeline
    on everything except the near-dup reassignment: identical totals,
    identical low_quality/exact_dup buckets, and the near_dup bucket drains
    only from the split buckets."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    full = {
        r["bucket"]: (r["n_docs"], r["n_words_total"])
        for r in reg["curation_pipeline_summary"].fn(spark, sf_dir).collect()
    }
    twin = {
        r["bucket"]: (r["n_docs"], r["n_words_total"])
        for r in reg["curation_summary_no_neardup"].fn(spark, sf_dir).collect()
    }
    assert sum(v[0] for v in full.values()) == sum(v[0] for v in twin.values())
    for b in ("low_quality", "exact_dup"):
        assert full.get(b) == twin.get(b), b
    n_near = full.get("near_dup", (0, 0))[0]
    for b in ("train", "val", "test"):
        assert full.get(b, (0, 0))[0] <= twin.get(b, (0, 0))[0]
    drained = sum(
        twin.get(b, (0, 0))[0] - full.get(b, (0, 0))[0]
        for b in ("train", "val", "test")
    )
    assert drained == n_near


def test_pagerank_invariants(spark):
    """Rank conservation (sum == |V| in exact decimal arithmetic), star
    center dominance, and bit-determinism across two runs."""
    from azure_func_forem_data_etl_spark.operators.graph import pagerank

    star = [(1, i) for i in range(2, 12)]
    ring = [(i, i + 1) for i in range(20, 30)] + [(30, 20)]
    edges = spark.createDataFrame(star + ring, "a: long, b: long")

    pr = pagerank(edges, "a", "b").collect()
    ranks = {r["id"]: float(r["rank"]) for r in pr}
    n_vertices = len({v for e in star + ring for v in e})
    assert len(ranks) == n_vertices
    # teleport floor and conservation
    assert all(v >= 0.1499 for v in ranks.values())
    assert abs(sum(ranks.values()) - n_vertices) < 0.01
    # star center out-ranks every leaf; ring is symmetric (all equal)
    assert ranks[1] > max(ranks[i] for i in range(2, 12)) * 2
    ring_ranks = [ranks[i] for i in range(20, 31)]
    assert max(ring_ranks) - min(ring_ranks) < 1e-12
    # bit-determinism: identical output on a re-run
    again = {r["id"]: float(r["rank"]) for r in pagerank(edges, "a", "b").collect()}
    assert again == ranks


def test_cms_join_cardinality_bounds(spark, sf_dir):
    """The sketch estimate never underestimates the true join size and
    stays within the CMS collision bound (checked in-plan as booleans
    since the r6 promotion); the exact size replays independently."""
    row = REGISTRY["cms_join_cardinality"].fn(spark, sf_dir).collect()[0]
    assert row["est_ge_exact"] is True and row["est_within_bound"] is True, row
    exact = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .count()
    )
    assert row["exact_join_size"] == exact
    assert row["n_orders"] == table(spark, sf_dir, "orders").count()
    assert row["n_lineitem"] == table(spark, sf_dir, "lineitem").count()


def test_audio_stats_match_pure_python_replay(spark, sf_dir):
    """mapInPandas PCM16 stats equal a pure-Python recomputation over the
    same payload bytes (decode-stub contract), and are deterministic."""
    import math

    import numpy as np

    from azure_func_forem_data_etl_spark.operators.multimodal import (
        AUDIO_SAMPLE_RATE,
        extract_audio_stats,
        with_binary_column,
    )

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 25)
    got = {r["doc_id"]: r for r in extract_audio_stats(with_binary_column(docs)).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got.keys() == texts.keys()
    for doc_id, text in texts.items():
        b = text.encode("utf-8")
        if len(b) % 2:
            b = b[:-1]
        x = np.frombuffer(b, dtype="<i2").astype(np.int64)
        r = got[doc_id]
        assert r["n_samples"] == x.size
        assert r["duration_ms"] == x.size * 1000 // AUDIO_SAMPLE_RATE
        if x.size:
            assert math.isclose(
                r["rms"], float(np.sqrt(np.mean(x.astype(float) ** 2))), rel_tol=1e-6
            )
            assert r["peak"] == int(np.max(np.abs(x)))


def test_ivf_index_save_load_roundtrip(spark, sf_dir, tmp_path):
    """A saved IVF index (centroids + assignments parquet) answers queries
    identically to the build-and-query path — sampling, assignment, and
    rescoring are all deterministic — and degrades cleanly when empty."""
    from azure_func_forem_data_etl_spark.operators.similarity import (
        ivf_query_index,
        ivf_save_index,
        ivf_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf_index")
    ivf_save_index(emb, idx, cache_key=f"{sf_dir}/embeddings")
    live = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rnk"])
        for r in ivf_topk(emb, cache_key=f"{sf_dir}/embeddings").collect()
    }
    saved = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rnk"])
        for r in ivf_query_index(emb, idx).collect()
    }
    assert saved == live
    assert len(saved) > 0
    # empty corpus: empty index tables, empty query result, no crash
    empty = emb.filter(F.lit(False))
    idx2 = str(tmp_path / "ivf_empty")
    ivf_save_index(empty, idx2, cache_key=None)
    assert ivf_query_index(empty, idx2).count() == 0


def test_pointer_jumping_forest_and_chain(spark):
    """Pointer jumping labels a multi-tree forest correctly, including a
    100-deep chain (7 doubling rounds, not 100 sequential steps)."""
    from azure_func_forem_data_etl_spark.operators.graph import (
        pointer_jumping_roots,
    )

    chain = [(i, i - 1) for i in range(1001, 1100)] + [(1000, 1000)]
    star = [(i, 2000) for i in range(2001, 2010)] + [(2000, 2000)]
    singleton = [(3000, 3000)]
    nodes = spark.createDataFrame(
        chain + star + singleton, "id: long, parent: long"
    )
    got = {
        r["id"]: (r["root"], r["depth"])
        for r in pointer_jumping_roots(nodes, "id", "parent").collect()
    }
    assert got[1000] == (1000, 0)
    for i in range(1001, 1100):
        assert got[i] == (1000, i - 1000), i
    assert got[2000] == (2000, 0)
    for i in range(2001, 2010):
        assert got[i] == (2000, 1), i
    assert got[3000] == (3000, 0)
    assert len(got) == len(chain) + len(star) + len(singleton)


def test_bloom_prefilter_guard_and_selectivity(spark, sf_dir, monkeypatch):
    """The bloom guard refuses oversized benchmark sides, and the bitmap
    probe actually prunes: non-benchmark grams rarely pass (fp rate ~1%),
    while every benchmark gram always passes (no false negatives)."""
    from azure_func_forem_data_etl_spark.operators import curation as C
    from pyspark.sql import functions as F

    monkeypatch.setattr(C, "BLOOM_MAX_BENCH_GRAMS", 1)
    with pytest.raises(ValueError, match="BLOOM_MAX_BENCH_GRAMS"):
        C.decontamination_bloom_prefilter(spark, sf_dir)
    monkeypatch.undo()

    grams = C._decontam_grams(spark, sf_dir)
    bench = grams.filter(F.col("split") == "test").select("gram").distinct()
    positions = (
        bench.select(
            F.explode(F.array(*C._bloom_positions(F.col("gram")))).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (C.BLOOM_M_BITS // 64)
    for (p,) in positions:
        words[p >> 6] |= 1 << (p & 63)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    bitmap = F.lit(words)

    def bit_set(pos):
        word = F.element_at(bitmap, F.shiftright(pos, 6).cast("int") + F.lit(1))
        return F.getbit(word, pos.bitwiseAND(F.lit(63))) == F.lit(1)

    probe = C._bloom_positions(F.col("gram"))
    cond = probe[0].isNotNull()
    for p in probe:
        cond = cond & bit_set(p)

    # No false negatives: every benchmark gram passes its own bitmap.
    n_bench = bench.count()
    assert bench.filter(cond).count() == n_bench

    # Real pruning: train grams NOT in the benchmark set pass at the bloom
    # false-positive rate, far below 50%.
    train = grams.filter(F.col("split") == "train").select("gram")
    true_hits = train.join(bench, "gram", "left_semi")
    non_members = train.exceptAll(true_hits)
    n_non = non_members.count()
    n_pass = non_members.filter(cond).count()
    assert n_pass <= max(10, n_non // 2), (n_pass, n_non)


def test_intradoc_segment_dedup_counts_repeats(spark):
    """A document made of one repeated segment has dup_ratio near 1."""
    from azure_func_forem_data_etl_spark.operators.hygiene import (
        SEGMENT_WORDS,
        intradoc_segment_dedup,
    )

    assert SEGMENT_WORDS == 2  # fixture text below assumes W=2
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b a b", "en", "s", 15),
            (2, "a b c d e f g h", "en", "s", 15),
            (3, "x", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: (
                r["n_segments"],
                r["n_distinct_segments"],
                r["dup_ratio"],
            )
            for r in intradoc_segment_dedup(spark, d).collect()
        }
    assert got[1] == (4, 1, 0.75)
    assert got[2] == (4, 4, 0.0)
    assert got[3] == (1, 1, 0.0)  # short doc: one partial segment, no crash


def test_source_quota_cap_deterministic_and_capped(spark, sf_dir):
    """Every source keeps at most the quota, ranks are 1..k, and the kept
    set is stable across runs (hash-ordered, not ingestion-ordered)."""
    from azure_func_forem_data_etl_spark.operators.hygiene import (
        SOURCE_QUOTA,
        source_quota_cap,
    )

    a = source_quota_cap(spark, sf_dir).collect()
    b = source_quota_cap(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_source = {}
    for r in a:
        per_source.setdefault(r["source"], []).append(r["rk"])
    for src, rks in per_source.items():
        assert len(rks) <= SOURCE_QUOTA, src
        assert sorted(rks) == list(range(1, len(rks) + 1)), src


def test_pca_contract(spark, sf_dir):
    """PCA loadings are orthonormal with deterministic signs; projections
    are zero-mean with variance(pc1) >= variance(pc2)."""
    import numpy as np

    from azure_func_forem_data_etl_spark.operators.clustering import (
        pca_fit,
        pca_project,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table

    emb = table(spark, sf_dir, "embeddings")
    mean, comps = pca_fit(emb)
    assert comps.shape[0] == 2
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(2), atol=1e-9)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        assert comps[i, j] > 0  # canonical sign

    mean2, comps2 = pca_fit(emb)
    assert np.allclose(mean, mean2) and np.allclose(comps, comps2)

    pdf = pca_project(emb, mean, comps).toPandas()
    assert abs(pdf["pc1"].mean()) < 1e-6 and abs(pdf["pc2"].mean()) < 1e-6
    assert pdf["pc1"].var() >= pdf["pc2"].var() - 1e-12


def test_phash_groups_collide_on_identical_payloads(spark):
    """Byte-identical payloads share a phash; the signature is a 64-char
    bit string; groups report the lowest doc_id as representative."""
    import os
    import tempfile

    from azure_func_forem_data_etl_spark.operators.multimodal import (
        multimodal_phash_groups,
    )

    docs = spark.createDataFrame(
        [
            (1, "the same payload text here", "en", "s", 26),
            (7, "the same payload text here", "en", "s", 26),
            (3, "a completely different body of text", "en", "s", 35),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = multimodal_phash_groups(spark, d).collect()
    # the two identical payloads band-collide with one shared full phash;
    # the third doc may only join their band by 1/2^16 chance
    assert len(got) == 1
    row = got[0]
    assert row["n_docs"] == 2 and row["rep_doc_id"] == 1
    assert row["n_distinct_phash"] == 1
    from azure_func_forem_data_etl_spark.operators.multimodal import (
        PHASH_BAND_BITS,
    )
    assert len(row["band"]) == PHASH_BAND_BITS and set(row["band"]) <= {"0", "1"}


def test_compression_ratio_flags_both_tails(spark):
    """Highly repetitive text compresses hard (flagged too_repetitive);
    incompressible noise stays near 1 (flagged too_random); normal prose
    lands between."""
    import os
    import tempfile

    from azure_func_forem_data_etl_spark.operators.text import (
        compression_ratio_quality,
    )

    import base64
    import hashlib

    # chained-hash base64: deterministic yet incompressible at zlib scale
    chunks, seed = [], b"forem"
    for _ in range(20):
        seed = hashlib.sha256(seed).digest()
        chunks.append(base64.b64encode(seed).decode())
    noise = "".join(chunks)
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam " * 50, "en", "s", 750),
            (2, noise, "en", "s", len(noise)),
            (3, "the quick brown fox jumps over the lazy dog near the river "
                "bank while morning light settles over quiet fields and a "
                "distant train crosses the old iron bridge carrying timber "
                "toward the coastal towns where fishermen mend their nets "
                "before the tide turns and gulls wheel above the harbor "
                "markets that open early with crates of silver herring and "
                "baskets of dark bread while children race along the pier "
                "counting sails on the horizon as the lighthouse keeper "
                "climbs the spiral stairs to polish the great lamp before "
                "dusk settles over the breakwater", "en", "s", 560),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r["doc_id"]: (r["compression_ratio"], r["verdict"])
            for r in compression_ratio_quality(spark, d).collect()
        }
    assert got[1][1] == "too_repetitive" and got[1][0] < 0.1
    assert got[2][0] > got[3][0]
    assert got[3][1] == "ok"
    # determinism
    with tempfile.TemporaryDirectory() as d:
        docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        again = {
            r["doc_id"]: (r["compression_ratio"], r["verdict"])
            for r in compression_ratio_quality(spark, d).collect()
        }
    assert got == again


def test_prefix_filter_simjoin_complete_vs_bruteforce(spark, sf_dir):
    """Prefix filtering is EXACT: the candidate pruning may not drop any
    pair at or above the threshold, so the join must equal the brute-force
    all-pairs result at smoke scale."""
    import duckdb

    from azure_func_forem_data_etl_spark.operators.dedup import (
        PREFIX_JOIN_THRESHOLD,
        prefix_filter_simjoin,
    )

    got = {
        (r["doc_a"], r["doc_b"]): (r["inter_size"], r["jaccard"])
        for r in prefix_filter_simjoin(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    brute = con.execute(rf"""
        WITH toks AS (SELECT doc_id, string_split(text,' ') ts FROM documents),
        bg AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(range(1, len(ts)),
                             i -> ts[i] || ' ' || ts[i+1])) AS tok
               FROM toks WHERE len(ts) >= 2),
        sizes AS (SELECT doc_id, count(*) n FROM bg GROUP BY 1),
        inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i
                  FROM bg a JOIN bg b ON a.tok = b.tok AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT da, db, i
        FROM inter JOIN sizes sa ON da = sa.doc_id
                   JOIN sizes sb ON db = sb.doc_id
        WHERE i / CAST(sa.n + sb.n - i AS DOUBLE) >= {PREFIX_JOIN_THRESHOLD}
    """).fetchall()
    assert {(da, db) for da, db, _ in brute} == set(got)
    for da, db, i in brute:
        assert got[(da, db)][0] == i


def test_bfd_packing_invariants(spark, sf_dir):
    """BFD packing: hard budget honored (except singleton oversized docs),
    every doc packed exactly once, bin count never worse than the
    theoretical upper bound, deterministic across partitionings."""
    from azure_func_forem_data_etl_spark.operators.curation import (
        PACK_BUDGET_TOKENS,
        sequence_packing_bfd,
    )

    out = sequence_packing_bfd(spark, sf_dir)
    rows = out.collect()
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "source", F.size(F.split("text", r"\s+")).alias("n"))
        .collect()
    )
    n_docs_by_source = {}
    for r in docs:
        n_docs_by_source[r.source] = n_docs_by_source.get(r.source, 0) + 1
    # full coverage per source
    packed = {}
    for r in rows:
        packed[r.source] = packed.get(r.source, 0) + r.n_docs
    assert packed == n_docs_by_source
    # hard budget: a multi-doc bin never exceeds it; a singleton may only
    # when its doc alone is oversized
    for r in rows:
        if r.n_docs > 1:
            assert r.n_tokens_total <= PACK_BUDGET_TOKENS, r
    # determinism across physical layouts
    rows2 = sequence_packing_bfd(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_kcore_planted_graph(spark):
    """2-core peeling on a planted graph: a triangle (2-core) survives, a
    pendant path hanging off it is fully peeled."""
    from azure_func_forem_data_etl_spark.operators.graph import kcore_vertices

    # triangle 1-2-3 plus path 3-4-5 (4 and 5 peel off; then nothing else)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    core = sorted(r.id for r in kcore_vertices(edges, 2).collect())
    assert core == [1, 2, 3]
    # 3-core of the same graph is empty (triangle vertices have degree 2)
    assert kcore_vertices(edges, 3).count() == 0


def test_semdedup_planted_duplicates(spark):
    """SemDeDup on a tiny corpus with planted near-identical vectors:
    each planted group must collapse to exactly one kept representative,
    and well-separated singletons must never be removed."""
    import numpy as np

    from azure_func_forem_data_etl_spark.operators.clustering import semdedup

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    # 4 well-separated base directions, one singleton each
    bases = []
    for i in range(4):
        v = np.zeros(8)
        v[i * 2] = 1.0
        bases.append(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    # planted dup group: 3 tiny perturbations of base 0
    dup_ids = []
    for _ in range(3):
        v = bases[0] + rng.normal(0, 1e-3, 8)
        rows.append((vid, [float(x) for x in v]))
        dup_ids.append(vid)
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(emb, tau=0.99, cluster_cap=512, k=4).collect()
    removed = {r.vec_id for r in out}
    keeps = {r.keep_id for r in out}
    group = set(dup_ids) | {0}  # base 0 plus its three perturbations
    # exactly one member of the planted group survives
    assert len(group - removed) == 1
    assert keeps <= group
    for r in out:
        assert r.group_size == 4
    # singletons (bases 1-3) untouched
    assert removed.isdisjoint({1, 2, 3})


def test_bpe_learn_textbook_corpus(spark):
    """The Sennrich-paper corpus: {low:5, lower:2, newest:6, widest:3}.
    Known merge sequence under count-then-lexicographic tie-breaks:
    (e,s)->es 9, (es,t)->est 9, (l,o)->lo 7."""
    from azure_func_forem_data_etl_spark.operators.tokenize import bpe_learn

    words = (["low"] * 5) + (["lower"] * 2) + (["newest"] * 6) + (["widest"] * 3)
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged_sym, r.pair_count)
        for r in bpe_learn(docs, n_merges=3).orderBy("merge_rank").collect()
    ]
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
    ]


def test_bpe_learn_releases_all_cached_blocks(spark):
    """bpe_learn persists the evolving symbol table round over round; every
    cached block must be released by the time it returns, or repeated
    callers (the bench harness) accumulate MEMORY_AND_DISK blocks for the
    session lifetime (ADVICE r4).

    Compares the SET of persistent RDD ids, not the count: Spark's async
    ContextCleaner may release OTHER tests' GC'd localCheckpoint blocks
    while bpe_learn runs, so a before/after count equality is flaky (seen
    in r6: before=24, after=16 — eight unrelated blocks cleaned mid-test).
    What this test owns is only "no NEW block survives bpe_learn"."""
    from azure_func_forem_data_etl_spark.operators.tokenize import bpe_learn

    def cached_ids() -> set:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {k for k in m.keySet().toArray()}

    before = cached_ids()
    words = (["low"] * 5) + (["lower"] * 2) + (["newest"] * 6)
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    bpe_learn(docs, n_merges=5).collect()
    assert cached_ids() - before == set()
    # max_batch=1 forces one round per merge, so 7 merges crosses the
    # BPE_CHECKPOINT_EVERY=6 boundary — the localCheckpoint tier, which
    # DataFrame.unpersist() cannot release, must ALSO come back to
    # baseline (round-5 review: the r4-era fix only covered persist()).
    bpe_learn(docs, n_merges=7, max_batch=1).collect()
    assert cached_ids() - before == set()


def test_label_propagation_releases_round_blocks(spark):
    """label_propagation localCheckpoints every round; all but the RETURNED
    frame's blocks must be released by return time (ADVICE r6: the same
    leak class as bpe_learn — DataFrame.unpersist() is a no-op on
    checkpointed frames, so the dead rounds accumulated MEMORY_AND_DISK
    blocks for the session lifetime).

    Leak oracle: the number of NEW persistent-RDD ids surviving the call
    must not grow with the round count — a leaky loop leaves O(rounds)
    blocks, a clean one leaves only the returned checkpoint's.  The driver
    path must leave zero (it no longer checkpoints at all)."""
    from azure_func_forem_data_etl_spark.operators import graph as G

    def cached_ids() -> set:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    def release(ids: set) -> None:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in m.keySet().toArray():
            if int(rid) in ids:
                m.get(rid).unpersist(True)

    edges = [(a, b) for a in range(8) for b in range(a + 1, 8)] + [(7, 8), (8, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")

    # Driver path (default bound): no checkpoint, no new blocks.
    before = cached_ids()
    G.label_propagation(df, "src", "dst").collect()
    assert cached_ids() - before == set()

    # Distributed path: force it by dropping the driver bound to 0.
    bound = G.LPA_DRIVER_EDGE_BOUND
    G.LPA_DRIVER_EDGE_BOUND = 0
    try:
        survivors = []
        for iters in (1, 5):
            before = cached_ids()
            G.label_propagation(df, "src", "dst", max_iter=iters).collect()
            new = cached_ids() - before
            survivors.append(len(new))
            release(new)  # drop the returned frame's blocks for the next run
        assert survivors[0] == survivors[1], (
            f"persistent blocks grew with round count: {survivors} — "
            "a dead round's localCheckpoint was not released"
        )
    finally:
        G.LPA_DRIVER_EDGE_BOUND = bound


def test_avg_clustering_releases_dead_checkpoints(spark, sf_dir):
    """graph_avg_clustering eagerly checkpoints edges, deg, oriented and
    tri; edges and oriented are dead once tri materializes and must be
    released by RDD id (ADVICE r7 — same leak class as label_propagation).
    Only deg and tri back the returned lazy frame and may survive."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    def cached_ids() -> set:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in m.keySet().toArray()}

    def release(ids: set) -> None:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in m.keySet().toArray():
            if int(rid) in ids:
                m.get(rid).unpersist(True)

    q = load_all()["graph_avg_clustering"]
    before = cached_ids()
    q.fn(spark, sf_dir).collect()
    new = cached_ids() - before
    release(new)
    # 4 eager checkpoints run; only the 2 backing the result may survive
    assert len(new) <= 2, (
        f"{len(new)} persistent blocks survived — a dead checkpoint "
        "(edges/oriented) was not released"
    )


def test_label_propagation_planted_cliques(spark):
    """Two 4-cliques joined by one bridge edge: LPA must keep the cliques
    in distinct communities (CC would merge them through the bridge)."""
    from azure_func_forem_data_etl_spark.operators.graph import label_propagation

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.community for r in label_propagation(df, "src", "dst").collect()}
    left = {got[i] for i in (0, 1, 2)}
    right = {got[i] for i in (11, 12, 13)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_ewma_hand_computed(spark, sf_dir):
    """EWMA recurrence spot-check: recompute one user's series by hand."""
    from azure_func_forem_data_etl_spark.operators.temporal import (
        EWMA_ALPHA,
        ewma_user_value,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table

    out = ewma_user_value(spark, sf_dir)
    uid = out.select("user_id").first().user_id
    got = [
        r.ewma
        for r in out.filter(F.col("user_id") == uid).orderBy("ts", "event_id").collect()
    ]
    vals = [
        r.value
        for r in table(spark, sf_dir, "events")
        .filter(F.col("user_id") == uid)
        .orderBy("ts", "event_id")
        .collect()
    ]
    s = vals[0]
    want = [round(s, 6)]
    for x in vals[1:]:
        s = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * s
        want.append(round(s, 6))
    assert got == pytest.approx(want, abs=1e-6)


def test_minhash_incremental_delta_only(spark):
    """Incremental near-dup: planted dup pairs across old/new and within
    new are found; a planted OLD-OLD dup pair must NOT be reported."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        minhash_incremental_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    other = "one two three four five six seven eight nine ten " * 5
    old = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, other), (10, "unrelated text " * 10)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(21, base + " fresh"), (22, other), (23, other + " more")],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_incremental_pairs(old, new, threshold=0.4).collect()
    }
    assert (1, 21) in pairs or (2, 21) in pairs      # new-vs-old found
    assert (3, 22) in pairs                          # new-vs-old found
    assert (22, 23) in pairs                         # new-vs-new found
    assert (1, 2) not in pairs                       # old-vs-old excluded


def test_binaryfile_source_feeds_multimodal_pipeline(spark, tmp_path):
    """Media ingestion end-to-end: raw files on disk -> binaryFile source
    (content + path/length metadata, no decode) -> the multimodal feature
    extractor.  This is the 100 TB media-lake entry path: the source
    never inflates payloads, pushes a pathGlobFilter, and the Arrow
    feature pass is the first byte-touching stage."""
    import zlib

    payloads = {f"m{i}.bin": bytes([i]) * (100 + i) for i in range(4)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    (tmp_path / "ignore.txt").write_text("not media")

    from azure_func_forem_data_etl_spark.operators.multimodal import (
        extract_media_features,
    )

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(tmp_path))
    )
    assert set(raw.columns) == {"path", "modificationTime", "length", "content"}
    media = raw.select(
        F.regexp_extract(F.col("path"), r"m(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    feats = {r.doc_id: r for r in extract_media_features(media).collect()}
    assert len(feats) == 4  # ignore.txt filtered at the source
    for i in range(4):
        data = payloads[f"m{i}.bin"]
        assert feats[i].n_bytes == len(data)
        assert feats[i].crc32 == (zlib.crc32(data) & 0xFFFFFFFF)


def _bpe_sequential_py(word_counts: dict, n_merges: int):
    """Pure-Python textbook sequential BPE (the oracle for the distributed
    learner's merge-batch planner): full pair recount each round, argmax by
    (count desc, lex asc), greedy leftmost rewrite."""
    syms = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict = {}
        for s, c in syms.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        a, b = best
        merged = a + b
        merges.append((rank, a, b, merged, pairs[best]))
        new_syms: dict = {}
        for s, c in syms.items():
            res = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            new_syms[tuple(res)] = new_syms.get(tuple(res), 0) + c
        syms = new_syms
    return merges


def _bpe_batched_py(word_counts: dict, n_merges: int, max_batch: int = 8):
    """Driver-loop mirror of bpe_learn's round structure, minus Spark:
    gram stats from the current word table, _simulate_batch plans, greedy
    rewrite applies — so hypothesis can hammer the planner's interval
    algebra on corpora full of self-pairs, overlaps, and collisions."""
    from azure_func_forem_data_etl_spark.operators.tokenize import _simulate_batch

    syms = {tuple(w): c for w, c in word_counts.items()}
    merges: list = []
    while len(merges) < n_merges:
        pairs: dict = {}
        tris: dict = {}
        for s, c in syms.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + c
            for i in range(len(s) - 2):
                g = (s[i], s[i + 1], s[i + 2])
                tris[g] = tris.get(g, 0) + c
        if not pairs:
            break
        batch = _simulate_batch(pairs, tris, min(max_batch, n_merges - len(merges)))
        if not batch:
            break
        for a, b, cnt in batch:
            merges.append((len(merges) + 1, a, b, a + b, cnt))
            new_syms: dict = {}
            for s, c in syms.items():
                res = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                new_syms[tuple(res)] = new_syms.get(tuple(res), 0) + c
            syms = new_syms
    return merges


def test_bpe_simulate_batch_matches_sequential_property():
    """The merge-batch planner must be choice-, order-, and count-identical
    to sequential BPE on adversarial corpora: tiny alphabet forces
    self-pairs ('aa'), overlap contexts ('abab'), chained merges, and
    merged-string collisions ('a'+'b' when 'ab'-ish symbols recur)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abc", min_size=1, max_size=8)
    corpus = st.dictionaries(word, st.integers(min_value=1, max_value=9),
                             min_size=1, max_size=12)

    @settings(max_examples=300, deadline=None)
    @given(corpus)
    def check(wc):
        assert _bpe_batched_py(wc, 10) == _bpe_sequential_py(wc, 10)

    check()


def test_bpe_batched_identical_and_3x_fewer_jobs(spark):
    """r3 VERDICT ask #3 acceptance: identical merge table at n_merges=24
    on the real corpus, with >=3x fewer Spark jobs than one-merge-per-round
    (the r3 loop's scheduling-latency wall at real vocab budgets)."""
    from azure_func_forem_data_etl_spark.operators.tokenize import bpe_learn
    from azure_func_forem_data_etl_spark.sources.tables import table

    sc = spark.sparkContext
    docs = table(spark, "/root/testdata/sf0.001", "documents")

    def run(max_batch, group):
        sc.setJobGroup(group, group)
        stats: dict = {}
        out = [
            (r.merge_rank, r.left_sym, r.right_sym, r.merged_sym, r.pair_count)
            for r in bpe_learn(docs, 24, max_batch=max_batch, stats=stats)
            .orderBy("merge_rank")
            .collect()
        ]
        sc.setJobGroup("", "")
        return out, stats["rounds"], len(sc.statusTracker().getJobIdsForGroup(group))

    batched, rounds_b, jobs_b = run(8, "bpe-batched-test")
    seq, rounds_s, jobs_s = run(1, "bpe-seq-test")
    assert batched == seq
    assert len(batched) == 24
    assert rounds_s == 24
    assert rounds_b * 3 <= rounds_s
    assert jobs_b * 3 <= jobs_s


def test_bpe_learn_symbols_with_quotes(spark):
    """Learned symbols containing quotes/backslashes must not break the
    learner (ADVICE r3: symbols were once interpolated into SQL text)."""
    from azure_func_forem_data_etl_spark.operators.tokenize import bpe_learn

    words = (["do'nt"] * 9) + (["ca\\n't"] * 4)
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    got = [
        (r.left_sym, r.right_sym, r.merged_sym, r.pair_count)
        for r in bpe_learn(docs, 4).orderBy("merge_rank").collect()
    ]
    ref = _bpe_sequential_py({"do'nt": 9, "ca\\n't": 4}, 4)
    assert got == [(a, b, m, c) for _, a, b, m, c in ref]
    assert any("'" in m for _, _, m, _ in got)


def test_semdedup_cluster_cap_truncation_is_observable(spark, caplog):
    """When the per-cluster pairing cap truncates, semdedup must say so
    (ADVICE r3: silent truncation hides undetected duplicates)."""
    import logging

    from azure_func_forem_data_etl_spark.operators.clustering import semdedup

    # 12 near-identical vectors -> one cluster; cap 4 must truncate it
    rows = [(i, [1.0, 0.0, 0.001 * i], 0) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    with caplog.at_level(logging.WARNING,
                         logger="azure_func_forem_data_etl_spark.operators.clustering"):
        semdedup(emb, cluster_cap=4, k=2).count()
    assert any("truncated" in r.message and "dropped" in r.message
               for r in caplog.records)
