"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query executes end-to-end into the noop sink — full compute, no
driver-side result transfer — so the number reflects scan+shuffle+agg cost.

``value``/``queries`` are steady-state times: each query runs in three
passes and reports the per-query minimum, so neither JVM JIT/codegen
warm-up (all charged to pass 1) nor transient co-tenant load spikes skew
the number (standard min-of-N microbenchmark practice; min-of-3 per the
r5 VERDICT ask #4).  The raw first pass — cold: includes JIT — is
reported alongside as ``cold_value``/``queries_cold``.

The printed line also carries a ``canary`` object — the machine-drift
normalizer the r5 VERDICT asked for ("What's wrong" #3): this host's
throughput drifts up to ~2x between rounds, so every sidecar embeds the
untouched-since-r1 ``join_broadcast_dims`` time next to its r1-recorded
value.  A reader divides any cross-round delta by ``canary.ratio``
before calling it a regression (full method: BENCH_NOTES.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from azure_func_forem_data_etl_spark.plans.registry import load_all  # noqa: E402
from azure_func_forem_data_etl_spark.session import get_spark  # noqa: E402

# Headline queries: the heavy representatives of each operator family.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_fact_fact",
    "join_broadcast_dims",
    "cube_orders",
    "q13_order_count_distribution",
    "q17_small_quantity_revenue",
    "agg_exact_percentiles",
    "grouping_sets_orders",
    "pivot_event_values",
    "window_topk",
    "window_rolling_sum",
    "asof_join_purchase",
    "range_join_followup",
    "gapfill_hourly_locf",
    "q10_returned_items",
    "q12_late_shipments",
    "doc_chunking",
    "tumbling_window_agg",
    "session_window_agg",
    "streaming_tumbling_window",
    "streaming_sessionize_state",
    "dedup_exact_text",
    "curation_pipeline_summary",
    "minhash_lsh_neardup",
    "quality_repetition_rules",
    "unigram_logprob_score",
    "retention_cohorts",
    "decontamination_ngram_overlap",
    "sequence_packing_greedy",
    "simhash_neardup",
    "knn_bruteforce",
    "embedding_quantize_int8",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "text_quality_score",
    "tfidf_top_terms",
    "explode_token_counts",
    # round 3 additions: one heavy representative per new family
    "graph_triangle_count",
    "sessionize_gap_islands",
    "streaming_upsert_latest",
    "inverted_index_postings",
    # round-3 family representatives (see BENCH_NOTES.md)
    "bigram_lm_score",
    "decontamination_bloom_prefilter",
    "customer_rfm_scores",
    "streaming_topk_per_window",
    # round-3 additions (third batch): PQ compression tier + suffix-array-
    # style verbatim-overlap dedup
    "ann_pq_topk",
    "substring_overlap_pairs",
    # round-3 additions (fourth batch): evaluation metrics, semantic dedup,
    # tokenizer training, probabilistic linkage
    "eval_ndcg_at_k",
    "semdedup_remove_list",
    "bpe_merge_learn",
    "record_linkage_fs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    # Optional subset override (comma-separated names): lets CI smoke the
    # bench CONTRACT (one parseable JSON line, correct keys) in seconds
    # without paying for the full 53-query headline run.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    global BENCH_QUERIES
    if subset:
        BENCH_QUERIES = [q.strip() for q in subset.split(",") if q.strip()]
    registry = load_all()
    # Partition-size the scans for the benchmark's data scale: test-SF files
    # are ~10 MB, so the 128 MB cluster default would scan single-partition.
    # (Same knob a real deployment sets relative to its file sizes.)
    spark = get_spark(
        app_name="forem-etl-bench",
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session on a trivial action so query 1 isn't charged
    # session startup.
    spark.range(1).collect()

    def run_all() -> dict[str, float]:
        times: dict[str, float] = {}
        for name in BENCH_QUERIES:
            q = registry.get(name)
            if q is None:
                continue
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        return times

    cold = run_all()   # pass 1: includes JIT/codegen warm-up
    warm = run_all()   # pass 2: steady state
    warm2 = run_all()  # pass 3: min-of-3 (r5 VERDICT ask #4)
    times = {k: round(min(cold[k], warm[k], warm2[k]), 2) for k in warm}

    total = round(sum(times.values()), 3)
    headline = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    # Drift canary: join_broadcast_dims has been untouched since r1, so
    # its ratio vs the r1-recorded value measures MACHINE speed, not code.
    # Embedded in the printed line so BENCH_r{N}.json is self-interpreting
    # (divide cross-round deltas by `ratio` before reading them as real).
    CANARY_R1_SEC = 0.443  # BENCH_r01.json, same query, same sf0.1
    if "join_broadcast_dims" in times and sf == 0.1:
        c = times["join_broadcast_dims"]
        headline["canary"] = {
            "query": "join_broadcast_dims",
            "r1_sec": CANARY_R1_SEC,
            "sec": c,
            "ratio": round(c / CANARY_R1_SEC, 3),
        }
    # Full detail (incl. cold pass) goes to a file; stdout gets ONE compact
    # line as the very last output.  The driver captures only a bounded tail
    # of stdout, so the printed line must stay well under ~1.5 KB — r2's
    # headline was unparseable because queries_cold pushed it past the
    # window (VERDICT.md "What's missing" #2).
    detail = dict(headline)
    detail["cold_value"] = round(sum(cold.values()), 3)
    detail["queries_cold"] = cold
    # The sidecar is the OFFICIAL full-headline record; a subset smoke run
    # (SPARK_GRAFT_BENCH_QUERIES set) must never clobber it — r3 did, and
    # the committed sidecar silently became a 2-query sf0.001 run.  Subset
    # runs write to a scratch name instead.
    sidecar = "BENCH_headline.json" if not subset else "BENCH_smoke.json"
    Path(REPO, sidecar).write_text(
        json.dumps(detail, separators=(",", ":"))
    )
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(headline, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
