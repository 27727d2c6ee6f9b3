"""Empty-corpus robustness: every heavy operator must degrade to an empty
result, not crash, when a table has zero rows (a real state during cold
starts and backfill gaps; the sf oracles never exercise it)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """An sf dir whose documents/embeddings/events have correct schemas
    and zero rows."""
    d = tmp_path_factory.mktemp("empty_sf")
    spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(d / "documents.parquet"))
    spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    spark.createDataFrame(
        [],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(str(d / "events.parquet"))
    spark.createDataFrame(
        [],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate date",
    ).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_dedup_suite_on_empty_corpus(spark, empty_sf):
    from azure_func_forem_data_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table

    docs = table(spark, empty_sf, "documents")
    assert minhash_lsh_pairs(docs).count() == 0
    assert simhash_pairs(docs).count() == 0


def test_similarity_on_empty_corpus(spark, empty_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    assert reg["knn_bruteforce"].fn(spark, empty_sf).count() == 0
    assert reg["ann_lsh_topk"].fn(spark, empty_sf).count() == 0


def test_ivf_on_empty_corpus(spark, empty_sf):
    from azure_func_forem_data_etl_spark.operators.similarity import ivf_topk
    from azure_func_forem_data_etl_spark.sources.tables import table

    assert ivf_topk(table(spark, empty_sf, "embeddings")).count() == 0


def test_text_and_sketch_on_empty_corpus(spark, empty_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    for name in ["tfidf_top_terms", "text_quality_score", "cms_heavy_hitters"]:
        assert reg[name].fn(spark, empty_sf).count() == 0, name


def test_streaming_windows_on_empty_events(spark, empty_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    assert reg["streaming_tumbling_window"].fn(spark, empty_sf).count() == 0
    assert reg["streaming_sessionize_state"].fn(spark, empty_sf).count() == 0


def test_new_ops_on_empty_inputs(spark, empty_sf):
    """Round-late additions degrade to empty (or all-zero) results on
    zero-row tables: gap-fill, chunking, split, clustering, arrow
    normalizer, HLL union."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        connected_components,
        neardup_cluster_components,
    )
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    for name in [
        "gapfill_hourly_locf",
        "doc_chunking",
        "dataset_split_hash",
        "arrow_normalize_embeddings",
        "neardup_cluster_components",
        "histogram_event_values",
    ]:
        assert reg[name].fn(spark, empty_sf).count() == 0, name
    # HLL union over zero days: only the overall row, estimating 0.
    rows = reg["hll_sketch_union"].fn(spark, empty_sf).collect()
    assert len(rows) == 1 and rows[0]["day"] is None
    # components on an explicitly empty edge list
    edges = spark.createDataFrame([], "a: long, b: long")
    assert connected_components(edges, "a", "b").count() == 0


def test_new_curation_ops_on_empty_corpus(spark, empty_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    for name in [
        "quality_repetition_rules",
        "unigram_logprob_score",
        "sequence_packing_greedy",
        "mixture_sampling_weighted",
        "decontamination_ngram_overlap",
        "fuzzy_levenshtein_pairs",
        "multimodal_frame_sample",
        "multimodal_png_decode",
        "multimodal_audio_stats",
        "retention_cohorts",
        "gapfill_hourly_interp",
    ]:
        assert reg[name].fn(spark, empty_sf).count() == 0, name


def test_ml_minhash_certificate_on_empty_corpus(spark, empty_sf):
    """The r12 certificate form is a single-row invariant summary: on an
    empty corpus there are no pairs, every vacuous invariant is TRUE, and
    the row count matches the oracle's constant projection (1 row)."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    rows = load_all()["ml_minhash_neardup"].fn(spark, empty_sf).collect()
    assert len(rows) == 1
    assert all(v is True for v in rows[0].asDict().values())


def test_kmeans_on_empty_corpus(spark, empty_sf):
    """kmeans_fit on an empty corpus returns an empty centroid matrix
    and assignments are empty (not a crash)."""
    from azure_func_forem_data_etl_spark.operators.clustering import (
        kmeans_assignments,
        kmeans_fit,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table

    emb = table(spark, empty_sf, "embeddings")
    C, trace = kmeans_fit(emb, k=4, iters=1)
    assert C.shape[0] == 0
    assert kmeans_assignments(emb, C).count() == 0


def test_round3_ops_on_empty_inputs(spark, empty_sf):
    """Round-3 additions degrade to empty results on zero-row tables;
    the star-CC path and PageRank handle an explicitly empty edge list."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        connected_components_star,
    )
    from azure_func_forem_data_etl_spark.operators.graph import pagerank
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    for name in [
        "sessionize_gap_islands",
        "graph_degree_histogram",
        "graph_triangle_count",
        "pagerank_copurchase",
        "snapshot_diff_user_state",
        "cumulative_new_users",
        "inverted_index_postings",
        "streaming_upsert_latest",
        "profile_lineitem_columns",
        "association_rules_parts",
        "changelog_apply_roundtrip",
        "salted_join_cohorts",
        "bucketed_quantile_estimates",
        "zorder_cluster_stats",
        "ngram_novelty_score",
        "quality_percentile_normalize",
        "seasonality_dow_profile",
    ]:
        df = reg[name].fn(spark, empty_sf)
        if name == "graph_triangle_count":
            rows = df.collect()  # single summary row with zero counts
            assert [(r["n_triangles"], r["n_edges"]) for r in rows] == [(0, 0)]
        elif name == "profile_lineitem_columns":
            rows = df.collect()  # one row per profiled column, all-null stats
            assert len(rows) == 6
            assert all(r["n_distinct"] == 0 and r["min_repr"] is None for r in rows)
        else:
            assert df.count() == 0, name
    edges = spark.createDataFrame([], "a: long, b: long")
    assert connected_components_star(edges, "a", "b").count() == 0
    assert pagerank(edges, "a", "b").count() == 0
    # theta sketch over zero events: the two-type aggregate has no rows
    assert reg["theta_sketch_setops"].fn(spark, empty_sf).count() <= 1


def test_round3_ops_on_empty_corpus(spark, empty_sf):
    """The round-3 additions degrade to empty results on a zero-row
    corpus: bloom decontamination (empty benchmark side), segment dedup,
    boilerplate shingles, quotas, keep-decisions, bigram LM, PCA, phash
    bands, ES sampling, MAD anomalies, histogram."""
    from azure_func_forem_data_etl_spark.operators.clustering import (
        embedding_pca_project,
    )
    from azure_func_forem_data_etl_spark.operators.curation import (
        decontamination_bloom_prefilter,
        grouped_split_leakage_safe,
        weighted_sample_es,
    )
    from azure_func_forem_data_etl_spark.operators.hygiene import (
        boilerplate_shingles,
        dedup_keep_decision,
        intradoc_segment_dedup,
        source_quota_cap,
    )
    from azure_func_forem_data_etl_spark.operators.multimodal import (
        multimodal_phash_groups,
    )
    from azure_func_forem_data_etl_spark.operators.profile import (
        event_anomaly_mad,
        histogram_extendedprice,
    )
    from azure_func_forem_data_etl_spark.operators.text import (
        bigram_lm_score,
        compression_ratio_quality,
    )

    for fn in (
        decontamination_bloom_prefilter,
        grouped_split_leakage_safe,
        weighted_sample_es,
        boilerplate_shingles,
        dedup_keep_decision,
        intradoc_segment_dedup,
        source_quota_cap,
        multimodal_phash_groups,
        event_anomaly_mad,
        histogram_extendedprice,
        bigram_lm_score,
        compression_ratio_quality,
    ):
        assert fn(spark, empty_sf).count() == 0, fn.__name__
    # invariant-summary queries return their 1-row oracle shape on empty
    (pca_row,) = embedding_pca_project(spark, empty_sf).collect()
    assert pca_row.n_vectors == 0 and pca_row.var_ordered == 1


def test_round3_batch3_ops_on_empty_inputs(spark, empty_sf):
    """PQ, substring overlap, fertility, OHLC, CEP regex on empty tables."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    for name in (
        "ann_pq_topk",
        "substring_overlap_pairs",
        "tokenizer_fertility_stats",
        "ohlc_hourly_bars",
        "event_pattern_regex",
        "attribution_multi_touch",
        "equidepth_histogram_price",
    ):
        assert reg[name].fn(spark, empty_sf).count() == 0, name


def test_round3_batch4_ops_on_empty_inputs(spark, empty_sf):
    """Evaluation, semantic-dedup, tokenizer, LPA, EWMA, PSI families on
    empty tables: empty result (or empty-safe scalars), never a crash."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    for name in (
        "eval_ndcg_at_k",
        "semdedup_remove_list",
        "bpe_merge_learn",
        "bpe_first_pairs",
        "graph_label_propagation",
        "graph_jaccard_linkpred",
        "ewma_user_value",
        "psi_value_drift",
        "eval_mutual_information",
        "eval_calibration_bins",
        "negative_sampling_inbatch",
        "text_log_odds_terms",
        "window_rolling_median",
        "forecast_smape_naive",
        "dp_noisy_lang_counts",
    ):
        assert reg[name].fn(spark, empty_sf).count() == 0, name


def test_tail_index_hill_degenerate_inputs(spark, empty_sf, tmp_path):
    """Hill estimator: empty events and a single positive value must both
    yield an EMPTY result (k-1 divisor would be 0 -> NaN/inf row;
    ADVICE r3 flagged the missing guard + missing sweep coverage)."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    assert reg["tail_index_hill"].fn(spark, empty_sf).count() == 0

    one = tmp_path / "one_event_sf"
    one.mkdir()
    spark.createDataFrame(
        [(1, None, 7, "click", 42.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.parquet(str(one / "events.parquet"))
    assert reg["tail_index_hill"].fn(spark, str(one)).count() == 0


def test_round7_stats_on_empty_tables(spark, empty_sf, tmp_path):
    """The round-7 statistical queries must yield empty (or gracefully
    degenerate) results on zero-row inputs, not divide-by-zero under ANSI
    mode.  orders/customer/nation-based queries get their own empty star
    schema; events/documents/lineitem queries reuse the shared fixture."""
    import pytest as _pytest

    from azure_func_forem_data_etl_spark.plans.registry import load_all

    d = tmp_path / "empty_star"
    d.mkdir()
    spark.createDataFrame(
        [],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string, "
        "o_clerk string, o_shippriority int, o_comment string",
    ).write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        [], "c_custkey bigint, c_name string, c_nationkey int"
    ).write.parquet(str(d / "customer.parquet"))
    spark.createDataFrame(
        [], "n_nationkey int, n_name string, n_regionkey int"
    ).write.parquet(str(d / "nation.parquet"))
    spark.createDataFrame(
        [],
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.parquet(str(d / "part.parquet"))
    for f in ("documents", "embeddings", "events", "lineitem"):
        (d / f"{f}.parquet").symlink_to(f"{empty_sf}/{f}.parquet")

    reg = load_all()
    empty_ok = [
        # group-level stats: no groups -> no rows
        "jackknife_revenue_ci",
        "anova_f_groups",
        "cramers_v_nation_priority",
        "weighted_median_price",
        "monetary_unit_sample",
        "cohort_ltv_curve",
        "holt_linear_forecast",
        "theil_sen_daily_trend",
        "changepoint_binary_split",
        "heaps_law_fit",
        "js_divergence_langs",
        "vocab_coverage_curve",
        "term_burstiness_vmr",
        "span_corruption_stats",
        "source_concentration_hhi",
        "eval_map_at_k",
        "kendall_tau_daily",
    ]
    for name in empty_ok:
        rows = reg[name].fn(spark, str(d)).collect()
        for r in rows:  # degenerate single-row outputs must carry no data
            assert (r[0] in (0, None)) or all(
                v in (0, None, 0.0) for v in r[1:]
            ), f"{name}: unexpected non-empty result {r}"


@pytest.fixture(scope="module")
def empty_sf_orders(spark, tmp_path_factory):
    """Empty-orders companion for the round-9 order-grain queries."""
    d = tmp_path_factory.mktemp("empty_sf_orders")
    spark.createDataFrame(
        [],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(d / "orders.parquet"))
    return str(d)


def test_round9_event_queries_on_empty_corpus(spark, empty_sf):
    """Cold-start behavior for every round-9 events-grain query: empty in,
    empty out — no collect()[0] crash, no sequence(null) blow-up."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    for name in [
        "window_funnel_steps",
        "session_path_topk",
        "cuped_adjusted_lift",
        "dau_mau_stickiness",
        "eb_beta_binomial_shrinkage",
        "quantile_treatment_effect",
        "group_sequential_ab_monitor",
    ]:
        assert reg[name].fn(spark, empty_sf).count() == 0, name


def test_round9_doc_graph_vec_queries_on_empty_corpus(spark, empty_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    for name in [
        "shingle_containment_pairs",
        "graph_sssp_weighted",
        "mmr_diversified_topk",
    ]:
        assert reg[name].fn(spark, empty_sf).count() == 0, name


def test_round9_order_queries_on_empty_corpus(spark, empty_sf_orders):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    reg = load_all()
    for name in ["poisson_bootstrap_totals", "conformal_interval_coverage"]:
        out = reg[name].fn(spark, empty_sf_orders)
        # a self-contained observed row (replicate 0 / summary) with zero
        # counts is also acceptable cold-start behavior
        rows = out.collect()
        for r in rows:
            for v in r.asDict().values():
                assert v is None or v == 0 or v == 0.0, (name, rows)
