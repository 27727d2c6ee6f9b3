"""Physical-plan audits: assert the optimizations we designed for actually
appear in the compiled plans (SURVEY.md §4.2).  These are the properties
that decide whether a query survives a 100x scale-up:

- dimension joins broadcast (no fact-table shuffle),
- predicates and projections reach the parquet scan,
- global top-N compiles to TakeOrderedAndProject (no full sort),
- hot aggregations use partial (map-side) aggregation,
- nothing in the LSH/knn paths degenerates to a cartesian product.
"""

from __future__ import annotations

import re
from collections import Counter

from azure_func_forem_data_etl_spark.plans.registry import load_all


def _formatted_plan(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def _plan(spark, sf_dir, name) -> str:
    return _formatted_plan(load_all()[name].fn(spark, sf_dir))


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast_dims")
    assert plan.count("BroadcastHashJoin") >= 2  # nation and region builds
    assert "SortMergeJoin" not in plan  # the fact side never shuffles


def test_filter_and_projection_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_like_project")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(p_size,10)" in plan
    assert "StringContains(p_type,a)" in plan
    # column pruning: unused p_size/p_type are scanned (filter needs them)
    # but p_name-only projection must not drag every column at the sink.
    assert "ReadSchema" in plan


def test_q1_scan_prunes_columns_and_pushes_shipdate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate at the scan
    # only the 7 needed columns of 11 are read
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_global_topn_avoids_full_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sort_limit_topn")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_topk_per_group_is_single_shuffle(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "window_topk")
    # one hash exchange for the window partition key; no extra exchanges
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    # rank-limit pushdown: per-partition top-k before the shuffle
    assert "WindowGroupLimit" in plan


def test_lsh_and_knn_never_cartesian(spark, sf_dir):
    for name in ["minhash_lsh_neardup", "simhash_neardup", "knn_bruteforce"]:
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_asof_join_is_one_shuffle_one_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "asof_join_purchase")
    assert "CartesianProduct" not in plan
    assert "WindowExec" in plan or "Window" in plan


def test_q3_topn_and_join_strategy(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan  # top-10 never global-sorts
    assert "CartesianProduct" not in plan
    # one shuffle for the aggregation; joins broadcast at this SF (AQE
    # upgrades the orders-lineitem side to SMJ at scale)
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) <= 2
    assert "partial_sum" in plan


def test_q5_snowflake_broadcasts(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 3
    # region filter pruned before the join arm is built
    assert "r_name" in plan and "EqualTo(r_name,ASIA)" in plan


def test_q10_broadcast_dims_and_topn(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan  # top-20 never global-sorts
    # customer and nation explicitly broadcast - the fact side shuffles
    # only for the orderkey join + final aggregation
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 2
    # returnflag filter pushed into the lineitem scan
    assert "l_returnflag" in plan and "EqualTo(l_returnflag,R)" in plan


def test_gapfill_no_cross_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "gapfill_hourly_locf")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Explode" in plan or "Generate" in plan


def test_scaling_doc_covers_every_registry_query():
    """Every registered query must be analyzed (at least mentioned) in
    SCALING.md — r8 found three missing rows by hand, so the completeness
    check is now mechanical (r9 VERDICT ask #5).  Names are matched
    literally; family rows that cover several queries must list each
    name (the per-query index section exists for exactly that)."""
    from pathlib import Path

    from azure_func_forem_data_etl_spark.plans.registry import load_all

    text = (Path(__file__).resolve().parents[1] / "SCALING.md").read_text()
    missing = sorted(n for n in load_all() if n not in text)
    assert not missing, f"registry queries with no SCALING.md entry: {missing}"


def test_plan_lint_every_registry_query(spark):
    """Sweep every (batch) registry query's compiled plan for the two
    always-wrong patterns at 100 TB:

    - CartesianProduct / unbounded BroadcastNestedLoopJoin — quadratic
      data movement (allowlisted: embedding_cosine_pairs, whose BNLJ is a
      documented bounded-sample pairwise op);
    - BatchEvalPython — row-at-a-time Python UDF in the plan (all Python
      must go through Arrow: ArrowEvalPython / MapInPandas / ...InPandas).

    Streaming queries are excluded: building them executes the stream.
    Runs at sf0.001 so build-time jobs (knn/ivf query matrices) stay cheap.
    """
    sf = "/root/testdata/sf0.001"
    BNLJ_OK = {
        "embedding_cosine_pairs",  # bounded-sample pairwise op (documented)
        "tfidf_top_terms",  # 1-row broadcast (corpus size scalar) — O(n)·1
        # decorrelated scalar subqueries: the subquery side is a one-row
        # aggregate broadcast against the outer relation — O(n)·1
        "q11_important_volume",
        "q15_top_supplier",
        "q22_dormant_customers",
        "unigram_logprob_score",  # 1-row corpus-total broadcast — O(n)·1
        "bm25_topk_docs",  # 1-row n_docs/avgdl stats broadcast — O(n)·1
        "snapshot_diff_user_state",  # 1-row snapshot-bounds broadcast — O(n)·1
        "changelog_apply_roundtrip",  # same 1-row bounds broadcast as the diff
        "bucketed_quantile_estimates",  # 1-row min/max-bounds broadcast — O(n)·1
        "hll_sketch_union",  # 1-row exact-overall broadcast onto the 1-row union agg
        "benford_digit_profile",  # 1-row digit-total broadcast over 9 rows
        "collocation_pmi",  # 1-row bigram-total broadcast — O(n)·1
        # r13: n_edges attached as a 1-row broadcast onto the 1-row
        # triangle aggregate (replaced a separate edges.count() action)
        "graph_triangle_count",
        "chisq_independence_cells",  # 1-row grand-total broadcast onto cells
        "hybrid_search_rrf",  # 1-row query-embedding broadcast — O(n)·1
        # |query terms| (3-row) + 1-row collection-stats broadcasts — O(n)·1
        "ql_dirichlet_topk",
        # deliberate rollup-grain grid: distinct-days x distinct-users
        # (bounded by grain, never event-grain); see its docstring
        "cumulative_topk_users",
        "eval_cohens_kappa",  # 1-row expected-agreement broadcast — O(1)·1
        "eval_mutual_information",  # 1-row grand-total broadcast onto cells
        "psi_value_drift",  # 1-row period-totals broadcast onto 7 cells
        "ks_two_sample_drift",  # 1-row period-totals broadcast onto ~500 bins
        "tail_index_hill",  # 1-row x_k broadcast onto the 200-row top-k
        "text_log_odds_terms",  # 1-row corpus-totals broadcast — O(n)·1
        # shared negative pool (~1% mod-sample) broadcast against the
        # anchor sample — bounded-sample product, documented in-batch trick
        "negative_sampling_inbatch",
        # round-7 statistical queries: every BNLJ below is a bounded
        # broadcast — a 1-row total/grand-mean, a fixed checkpoint/
        # threshold list, or the day-grain rollup (<= 366 rows) — against
        # an O(n) or grain-bounded side; see each query's docstring
        "jackknife_revenue_ci",  # 1-row (n, s, k) totals broadcast
        "anova_f_groups",  # 1-row grand-mean broadcast onto 5 groups
        "eval_brier_decomposition",  # 1-row totals broadcast onto 10 bins
        "source_concentration_hhi",  # 1-row corpus-total onto ~20 sources
        "term_burstiness_vmr",  # 1-row n_docs broadcast — O(vocab)·1
        "heaps_law_fit",  # 16-row fixed checkpoint list — O(n)·16
        "js_divergence_langs",  # 5-row lang totals x vocab + 1-row total
        "vocab_coverage_curve",  # 5-row threshold list x ranked vocab
        # day-grain pairwise joins: both sides <= 366 rows by construction
        "theil_sen_daily_trend",
        "kendall_tau_daily",
        # round-8 deferred queries: every BNLJ is a 1-row totals/bounds
        # broadcast or a fixed spine (<= 7 rows) against a grain-bounded
        # side; see each docstring
        "good_turing_tail_mass",  # 4-row threshold spine x freq-of-freq
        "mixture_temperature_weights",  # 1-row total + 1-row normalizer
        "eval_lift_table",  # 1-row totals onto the 10-row bucket table
        "levene_brown_forsythe",  # 1-row grand-mean onto 5 groups
        "mcnemar_purchase_shift",  # 1-row epoch-bounds broadcast — O(n)·1
        "runs_test_daily_revenue",  # 1-row median onto the day series
        "simpson_slope_reversals",  # 1-row pooled moments onto 25 brands
        "acf_daily_revenue_lags",  # 7-row lag spine x <=366-day index
        "markov_entropy_rate",  # 1-row total onto <=25 transition cells
        "user_churn_hazard",  # 1-row week-bounds broadcast — O(n)·1
        "eval_cost_curve_threshold",  # 1-row min-cost onto the bin table
        "customer_decile_mobility",  # 1-row epoch-bounds broadcast
        "weekend_effect_did",  # 1-row epoch-bounds broadcast
        "user_overdispersion_index",  # 1-row day-span broadcast
        "basket_size_geometric_fit",  # 1-row MLE totals onto the size hist
        # round-9: 1-row time-midpoint broadcast onto the events scan +
        # 1-row (theta, rho_sq, grand moments) broadcast onto user grain
        "cuped_adjusted_lift",
        # two-phase rework (VERDICT r8 #2): the band-offset join is a
        # keyed broadcast; only the 1-row (n, tot) totals cross-join
        # remains a BNLJ — O(customer grain)·1
        "pareto_8020_customers",
        # 1-row beta-binomial prior (m_f, c) broadcast onto user grain
        "eb_beta_binomial_shrinkage",
        # 1-row user-count broadcast onto the ranked user grain
        "uplift_qini_deciles",
    }
    # Scan budget (round 9): a table appearing more than SCAN_BUDGET times
    # in the AQE-printed plan (initial + final, so budget 6 = 3 real
    # derivations) means a shared subframe is being re-derived per
    # reference — Spark does not reuse non-broadcast aggregation subplans,
    # so the fix is one eager localCheckpoint on the shared grain (the
    # round-9 sweep found and fixed 10-scan shapes in assortativity /
    # link prediction / DAU-MAU).  Three real passes is the ceiling any
    # current query needs by design (3-step funnels, incremental deltas).
    SCAN_BUDGET = 6
    scan_re = re.compile(r"Location:[^\n]*/(\w+)\.parquet")
    checked = 0
    for name, q in sorted(load_all().items()):
        if q.fn.__module__.split(".")[-2] == "streaming":
            continue
        plan = _formatted_plan(q.fn(spark, sf))
        assert "CartesianProduct" not in plan, name
        if name not in BNLJ_OK:
            assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name
        worst = Counter(scan_re.findall(plan)).most_common(1)
        if worst:
            table_name, n = worst[0]
            assert n <= SCAN_BUDGET, f"{name}: {table_name} scanned {n}x"
        checked += 1
    assert checked >= 55


def test_q2_decorrelated_min_broadcasts_dims(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "q2_min_cost_supplier")
    assert "CartesianProduct" not in plan
    # part (filtered) and supplier broadcast; only the per-part MIN
    # aggregate and its join-back shuffle the fact side
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 2
    # size/type filters prune part before the join arm is built
    assert "p_size" in plan and "p_type" in plan


def test_q16_not_in_is_broadcast_anti_join(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "q16_supplier_part_counts")
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan
    # single COUNT(DISTINCT): planner rewrites to two aggregate levels
    # (group+key dedup, then count) — no Expand, no extra shuffle beyond
    # the one repartition on the grouping keys
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 3


def test_q17_catalyst_decorrelates_avg_subquery(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q17_small_quantity_revenue")
    # the correlated scalar AVG must become an aggregate + join,
    # never a per-row subquery execution or a cartesian shape
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan or "partial_avg" in plan


def test_gapfill_interp_single_window_exchange(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "gapfill_hourly_interp")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # TWO sorts by design since r11: the LOCF side runs on the ascending
    # sort and the NOCB side on the DESCENDING sort as a running frame —
    # a shared-sort plan would need a (currentRow, unboundedFollowing)
    # frame, which Spark evaluates by rescanning current..end per row,
    # O(n^2) per series (36 min on a 10-year hourly spine, r11 long-span
    # probe).  Both Window nodes still share ONE hash partitioning.
    n_sort = len(re.findall(r"\(\d+\) Sort\b", plan))
    assert n_sort == 2, f"expected asc+desc sorts for the frames, got {n_sort}"
    assert "unboundedfollowing" not in plan.lower().replace(" ", ""), (
        "the O(n^2) unbounded-following frame is back"
    )
    n_exch = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exch <= 3, f"expected <=3 Exchanges, got {n_exch}"


def test_hygiene_ops_are_map_only(spark, sf_dir):
    # Scrubbing passes must stay embarrassingly parallel: no Exchange at all.
    for name in ("pii_redaction", "text_normalize_stats"):
        plan = _plan(spark, sf_dir, name)
        assert "Exchange" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_full_outer_aggregates_before_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_full_outer_snapshot")
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    # partial aggregation collapses the fact table before the join's shuffle:
    # each side shuffles HashAggregate output, not raw orders rows.
    assert plan.count("HashAggregate") >= 4  # partial+final per side


def test_embedding_dim_stats_partial_agg(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "embedding_dim_stats")
    # one shuffle keyed by dim, with map-side combine before it
    n_exch = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exch == 1, f"expected 1 Exchange, got {n_exch}"
    assert "partial_count" in plan and "partial_sum" in plan


def test_transition_counts_single_exchange_chain(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "event_transition_counts")
    # window by user (1 exchange) + pair agg (1 exchange); no more
    n_exch = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exch == 2, f"expected 2 Exchanges (window + agg), got {n_exch}"
    assert "partial_count" in plan  # map-side combine before the pair shuffle
    assert "BatchEvalPython" not in plan


def test_weighted_sample_es_uses_takeordered(spark, sf_dir):
    """A-ES sampling must be a per-partition-heap top-k, never a global
    sort of the corpus."""
    from azure_func_forem_data_etl_spark.operators.curation import (
        weighted_sample_es,
    )

    plan = weighted_sample_es(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_source_quota_cap_uses_window_group_limit(spark, sf_dir):
    """The quota filter must push into WindowGroupLimit so mega-sources
    cost O(quota) per task, not a full per-source sort."""
    from azure_func_forem_data_etl_spark.operators.hygiene import (
        source_quota_cap,
    )

    plan = source_quota_cap(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_prefix_filter_simjoin_no_nested_loop(spark, sf_dir):
    """Candidate generation must be an equi-join on prefix tokens; a
    BroadcastNestedLoopJoin would mean the a.doc_id < b.doc_id predicate
    became the join condition (all-pairs)."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        prefix_filter_simjoin,
    )

    plan = prefix_filter_simjoin(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_on_partitioned_silver(spark, sf_dir, tmp_path):
    """A date-partitioned silver table joined to a filtered dim must plan a
    DynamicPruningExpression on the fact scan — the runtime partition-skip
    that makes dim-filtered fact joins cheap at 100 TB (only the days the
    dim selects are ever read)."""
    from pyspark.sql import functions as F

    from azure_func_forem_data_etl_spark.sources.tables import table

    d = str(tmp_path / "events_by_day")
    (
        table(spark, sf_dir, "events")
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .write.partitionBy("day")
        .parquet(d)
    )
    fact = spark.read.parquet(d)
    dim = (
        spark.createDataFrame(
            [("2024-01-03", "keep"), ("2024-01-04", "drop")],
            "day string, tag string",
        )
        .filter(F.col("tag") == "keep")
    )
    j = fact.join(dim, "day").groupBy("event_type").count()
    plan = _formatted_plan(j)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
