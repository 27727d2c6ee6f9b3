"""Registry-wide oracle sweep on a RANDOM fixture (round 10).

test_parity.py proves every query matches its DuckDB twin on the driver's
seed-42 fixtures; this sweep proves it on data the queries have never
seen (tests/randfix.py, same schemas/alphabets, different seed and
shapes).  The first run of this sweep found a real bug: duckdb 1.0's
``list_reduce`` mixes lanes across grouped rows when the lambda carries a
struct accumulator with a data-dependent branch — the streaming CUSUM
oracle leaked one event type's alarms into another's log on random data
(invisible on the fixtures, where alarms are rare).  Its oracle is now a
per-key recursive CTE; this sweep keeps the whole registry honest on
arbitrary shapes.

Runtime: one seed, ~5-6 min for ~365 oracle-backed queries (tiny tables,
Spark per-query overhead dominates).  Streaming queries execute a real
AvailableNow stream each, like everywhere else in the suite.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pytest

from azure_func_forem_data_etl_spark.plans.registry import load_all
from tests.oracle import assert_matches_oracle
from tests.randfix import write_random_fixture

REGISTRY = load_all()

#: Queries whose oracle encodes fixture-scale constants that a different
#: corpus shape legitimately changes are still swept — the oracle runs on
#: the SAME random tables, so any mismatch is a real engine divergence.
_ORACLE_BACKED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)

# ---------------------------------------------------------------------------
# Chunked, thread-parallel sweep execution (r14, VERDICT item 2).
#
# The sweeps grew to ~30 legs x up-to-374 queries; run one-test-per-query
# they dominate the suite (~7.6k of 8.4k tests) and the full suite never
# finished inside the driver's verification window (VERIFY_r13
# tests_ok=false with only passes in the tail).  Each leg now runs its
# (unchanged) query list in chunks, each chunk fanning its queries over a
# small driver-side thread pool — Spark's scheduler runs concurrent jobs
# from one session natively (optimization guide §2.6), each
# assert_matches_oracle opens its own DuckDB connection, and no two
# registry queries share mutable session state (temp view names are
# query-unique; fit memos are keyed and idempotent).  Coverage is
# IDENTICAL to the per-test form — same queries, same fixtures, same
# bit-exact oracle compare — only the pytest granularity changes: a
# failing chunk reports every failing query in its assert message.
#
# SPARK_GRAFT_SWEEP_SERIAL=1 restores in-order single-threaded execution
# inside each chunk (debugging); SPARK_GRAFT_SWEEP_THREADS sizes the pool.

_SWEEP_THREADS = (
    1
    if os.environ.get("SPARK_GRAFT_SWEEP_SERIAL")
    else int(os.environ.get("SPARK_GRAFT_SWEEP_THREADS", "6"))
)
_CHUNK = 24


def _chunks(names) -> list[list[str]]:
    names = list(names)
    return [names[i : i + _CHUNK] for i in range(0, len(names), _CHUNK)]


def _chunk_id(c) -> str:
    return f"{c[0]}..{c[-1]}" if len(c) > 1 else c[0]


def _sweep(spark, sf: str, names) -> None:
    def one(n: str):
        q = REGISTRY[n]
        try:
            assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)
        except Exception as e:  # noqa: BLE001
            return f"{n}: {e!r}"[:500]
        return None

    if _SWEEP_THREADS == 1:
        fails = [r for r in map(one, names) if r]
    else:
        with ThreadPoolExecutor(max_workers=_SWEEP_THREADS) as ex:
            fails = [r for r in ex.map(one, names) if r]
    assert not fails, f"{len(fails)} sweep failures:\n" + "\n".join(fails)


@pytest.fixture(scope="session")
def random_sf(tmp_path_factory):
    return write_random_fixture(tmp_path_factory.mktemp("randfix") / "sf", seed=1)


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_random_fixture(spark, random_sf, chunk):
    _sweep(spark, random_sf, chunk)


#: Ordering/tie-break-sensitive queries: re-swept on a TIE-HEAVY shape
#: (2-day span, whole-hour timestamp grain — massive ts collisions).
#: The r10 offline sweep of the full registry at this shape found the
#: six DIVIDE_BY_ZERO degenerates; this pins the families where ties
#: and short spans bite hardest.
_TIE_SENSITIVE = [
    "sessionize_gap_islands",
    "session_bounce_rate_daily",
    "session_path_topk",
    "session_window_agg",
    "session_window_dynamic_gap",
    "peak_concurrent_sessions",
    "attribution_multi_touch",
    "window_funnel_steps",
    "dau_mau_stickiness",
    "streaming_cusum_drift",
    "event_pattern_regex",
    "interevent_time_profile",
    "watermark_lateness_audit",
    "psi_value_drift",
    "ks_two_sample_drift",
    "poisson_rate_weekend_test",
    "runs_test_daily_revenue",
    "autocorr_daily_revenue",
    "acf_daily_revenue_lags",
]

#: Degenerate-shape-sensitive queries: re-swept on a SPARSE shape (tiny
#: tables — empty groups, single-digit day series, short-of-cursor pages).
_SPARSE_SENSITIVE = _TIE_SENSITIVE + [
    "keyset_pagination_orders",
    "theil_sen_daily_trend",
    "holt_winters_seasonal",
    "kaplan_meier_survival",
    "croston_intermittent_demand",
    "lttb_downsample_daily",
    "pareto_8020_customers",
]


@pytest.fixture(scope="session")
def tieheavy_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_tie") / "sf", seed=11, n_customers=20,
        n_events=1200, span_days=2, ts_grain_s=3600, n_orders=800,
        n_docs=300, n_vecs=300,
    )


@pytest.fixture(scope="session")
def sparse_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_sparse") / "sf", seed=23,
        n_customers=8, n_suppliers=2, n_parts=12, n_orders=30, n_events=40,
        n_docs=15, n_vecs=30, emb_dim=16, span_days=3,
    )


@pytest.mark.parametrize("chunk", _chunks(sorted(set(_TIE_SENSITIVE))), ids=_chunk_id)
def test_oracle_parity_on_tieheavy_fixture(spark, tieheavy_sf, chunk):
    _sweep(spark, tieheavy_sf, chunk)


@pytest.mark.parametrize("chunk", _chunks(sorted(set(_SPARSE_SENSITIVE))), ids=_chunk_id)
def test_oracle_parity_on_sparse_fixture(spark, sparse_sf, chunk):
    _sweep(spark, sparse_sf, chunk)


#: Skew-sensitive queries: one hot user/part/lang owns ~60% of the mass,
#: leaving the cold keys with huge inter-event gaps (the shape that
#: pushed time_weighted_avg_user's decimal->double cast past 2^53) and
#: concentrating group sizes (salting, pareto, top-k tie regions).
_SKEW_SENSITIVE = [
    "time_weighted_avg_user",
    "time_weighted_avg_events",
    "salted_agg_events",
    "pareto_8020_customers",
    "brand_revenue_pareto",
    "user_event_entropy",
    "dau_mau_stickiness",
    "session_path_topk",
    "peak_concurrent_sessions",
    "mixture_sampling_weighted",
    "stratified_sample_per_lang",
    "graph_degree_histogram",
    "q18_large_volume_customers",
]


@pytest.fixture(scope="session")
def skew_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_skew") / "sf", seed=31, hot_frac=0.6
    )


@pytest.mark.parametrize("chunk", _chunks(sorted(set(_SKEW_SENSITIVE))), ids=_chunk_id)
def test_oracle_parity_on_skew_fixture(spark, skew_sf, chunk):
    _sweep(spark, skew_sf, chunk)


#: NULL/blank-sensitive queries: 25% NULL props + 25% blank documents —
#: shapes the driver fixtures never produce.  The r10 sweep at this
#: shape caught sequence(1,0) phantom frames, an ANSI element_at crash
#: on the empty frame list, and a zero-weight A-ES division.
_NULL_SENSITIVE = [
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_full_features",
    "multimodal_resize",
    "weighted_sample_es",
    "json_functions_props",
    "map_functions_props",
    "variant_shred_props",
    "token_count",
    "doc_chunking",
    "text_quality_score",
    "char_class_entropy",
    "doc_fingerprint",
    "tokenizer_fertility_stats",
    "dataset_card_summary",
    "pipeline_observe_metrics",
]


@pytest.fixture(scope="session")
def nullish_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_null") / "sf", seed=41, null_frac=0.25
    )


@pytest.mark.parametrize(
    "chunk",
    _chunks(sorted(n for n in set(_NULL_SENSITIVE) if REGISTRY[n].oracle)),
    ids=_chunk_id,
)
def test_oracle_parity_on_nullish_fixture(spark, nullish_sf, chunk):
    _sweep(spark, nullish_sf, chunk)


#: Variance-sensitive queries: every money/value column pinned to one
#: constant — maximal ordering ties and ZERO variance everywhere.  The
#: r10 sweep at this shape found seven ANSI DIVIDE_BY_ZERO crashes
#: (zero within-group SS, zero Pearson variance, all-tied rank variance,
#: all-equal Hill log-sum, zero regression variance, zero bucket width).
_CONST_SENSITIVE = [
    "anova_f_groups",
    "levene_brown_forsythe",
    "agg_correlation",
    "mann_whitney_value_shift",
    "tail_index_hill",
    "brand_price_qty_regression",
    "simpson_slope_reversals",
    "bucketed_quantile_estimates",
    "agg_variance_stddev",
    "winsorized_value_stats",
    "regression_value_trend",
    "runs_test_daily_revenue",
    "autocorr_daily_revenue",
    "acf_daily_revenue_lags",
    "ks_two_sample_drift",
    "psi_value_drift",
    "window_topk",
    "sort_limit_topn",
    "agg_exact_percentiles",
]


@pytest.fixture(scope="session")
def const_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_const") / "sf", seed=53,
        const_values=True,
    )


@pytest.mark.parametrize(
    "chunk",
    _chunks(sorted(n for n in set(_CONST_SENSITIVE) if REGISTRY[n].oracle)),
    ids=_chunk_id,
)
def test_oracle_parity_on_const_fixture(spark, const_sf, chunk):
    _sweep(spark, const_sf, chunk)


#: Degenerate-embedding-sensitive queries: every 50th vector is the zero
#: vector (cosine undefined — must be excluded from queries AND
#: candidates on both engines, incl. query ids 0/100/200 themselves) and
#: labels collapse to one class (AUC/KS/Hanley undefined => no rows).
_EMB_SENSITIVE = [
    "knn_bruteforce",
    "knn_margin_profile",
    "knn_hubness_histogram",
    "knn_label_accuracy",
    "embedding_cosine_pairs",
    "mmr_diversified_topk",
    "eval_ndcg_at_k",
    "eval_map_at_k",
    "eval_roc_auc",
    "eval_ks_separation",
    "auc_confidence_hanley",
    "eval_auprc",
    "eval_calibration_bins",
    "eval_pr_threshold_sweep",
    "label_centroid_similarity",
    "embedding_quantize_int8",
    "embedding_dim_stats",
    "isotonic_calibration_pav",
]


@pytest.fixture(scope="session")
def degenerate_emb_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_emb") / "sf", seed=99, n_vecs=300,
        zero_vec_every=50, single_label=True,
    )


@pytest.mark.parametrize(
    "chunk",
    _chunks(sorted(n for n in set(_EMB_SENSITIVE) if REGISTRY[n].oracle)),
    ids=_chunk_id,
)
def test_oracle_parity_on_degenerate_embeddings(spark, degenerate_emb_sf, chunk):
    _sweep(spark, degenerate_emb_sf, chunk)


#: Multibyte-text leg (r11): the WHOLE oracle-backed registry runs on a
#: corpus of mixed ASCII/Latin-1/CJK/emoji words.  The multimodal byte
#: replays moved to hex(encode(text)) nibble pairs in r10; r11 ported the
#: same extractor through functions/xxh64_sql.py, so the last three
#: ASCII-scoped oracles (simhash, feature hashing, bloom FPR) are now
#: byte-exact on any UTF-8 input and NOTHING is excluded from this leg.
_UNI_WORDS = (
    "the key naive café über 数据 запрос mañana schön 東京 "
    "Ωμέγα emoji🙂 ligature ﬁle accent́"
).split()


@pytest.fixture(scope="session")
def unicode_sf(tmp_path_factory):
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("randfix_uni") / "sf"
    write_random_fixture(d, seed=71)
    rng = random.Random(71)
    texts = [
        " ".join(rng.choice(_UNI_WORDS) for _ in range(rng.randint(8, 90)))
        for _ in range(400)
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(400), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([rng.choice(["en", "es", "de", "fr", "zh"])
                              for _ in range(400)]),
            "source": pa.array([f"src{rng.randint(0, 19)}" for _ in range(400)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_unicode_fixture(spark, unicode_sf, chunk):
    _sweep(spark, unicode_sf, chunk)


#: Extreme-timestamp leg (r11): the full temporal family — plus the
#: batch window/subquery/rollup families, which are equally date-heavy —
#: on a fixture whose event/order timestamps span pre-1970 (negative
#: epoch micros), the epoch straddle, both US DST-transition weeks, and
#: >2100 — the regime where floor-vs-truncate epoch division,
#: date_trunc, and day-delta arithmetic diverge between engines.
#: Streaming queries are excluded here (pre-epoch event time is outside
#: the platform domain — see the post-epoch leg below).
_TEMPORAL_FAMILY = sorted(
    n for n, q in REGISTRY.items()
    if q.fn.__module__.rsplit(".", 1)[-1]
    in ("temporal", "windows", "subqueries", "rollup")
    and q.oracle is not None and not n.startswith("streaming_")
)


@pytest.fixture(scope="session")
def extreme_ts_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_xts") / "sf", seed=61, ts_eras=True
    )


@pytest.mark.parametrize("chunk", _chunks(_TEMPORAL_FAMILY), ids=_chunk_id)
def test_oracle_parity_on_extreme_timestamps(spark, extreme_ts_sf, chunk):
    _sweep(spark, extreme_ts_sf, chunk)


#: The STREAMING family gets its own extreme-timestamp leg scoped to the
#: POST-epoch eras (DST weeks + year 2105): Structured Streaming's
#: initial watermark is epoch 0, so stateful append/update queries drop
#: pre-1970 event times as late-by-definition — probed r11 with a
#: three-row dedup stream ([1965, 1969, 1970+] -> only 1970+ emitted).
#: That is a documented platform domain limit (COVERAGE.md), not an
#: engine bug; this leg proves the family correct INSIDE that domain on
#: shapes the driver fixture never produces.
_STREAMING_FAMILY = sorted(
    n for n, q in REGISTRY.items()
    if n.startswith("streaming_") and q.oracle is not None
)


@pytest.fixture(scope="session")
def extreme_ts_post1970_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_xts_post") / "sf", seed=62,
        ts_eras="post1970",
    )


@pytest.mark.parametrize("chunk", _chunks(_STREAMING_FAMILY), ids=_chunk_id)
def test_streaming_parity_on_post_epoch_extremes(spark, extreme_ts_post1970_sf, chunk):
    _sweep(spark, extreme_ts_post1970_sf, chunk)


#: All-duplicates leg (r11): 190 of 200 documents are byte-identical
#: (plus 10 near-dups of the same base) — the COMPLETE candidate graph
#: regime for every near-dup family: one giant LSH band bucket, one
#: connected component spanning ~the whole corpus, maximal group sizes
#: for keep-one selection.  The dedup/curation/hygiene/tokenize modules
#: all run here (48 queries, probed green r11).
_DUP_SENSITIVE = sorted(
    n for n, q in REGISTRY.items()
    if q.fn.__module__.rsplit(".", 1)[-1]
    in ("dedup", "curation", "hygiene", "tokenize")
    and q.oracle is not None
)


@pytest.fixture(scope="session")
def all_dup_docs_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("randfix_alldup") / "sf"
    write_random_fixture(d, seed=77, n_docs=200)
    base = (
        "the quick brown fox jumps over the lazy dog again and again " * 3
    )
    texts = [base] * 190 + [base + f" tail{i}" for i in range(10)]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(200), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 200),
            "source": pa.array([f"src{i % 5}" for i in range(200)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("chunk", _chunks(_DUP_SENSITIVE), ids=_chunk_id)
def test_oracle_parity_on_all_duplicates(spark, all_dup_docs_sf, chunk):
    _sweep(spark, all_dup_docs_sf, chunk)


#: Single-row leg (r11): EVERY table has exactly one row — the regime
#: between empty (test_empty_inputs.py) and sparse, where (n-1), (k-1),
#: "the rest of the corpus", discordant pairs, probe sets, and all-pairs
#: spaces all collapse to zero.  The first run of this leg found 12
#: queries across 9 modules crashing with ANSI DIVIDE_BY_ZERO (or
#: diverging on NULL-vs-0) instead of honoring the repo contract
#: "undefined stat => 0 rows on BOTH engines"; each now carries an
#: explicit degenerate guard mirrored in its oracle.
@pytest.fixture(scope="session")
def single_row_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_n1") / "sf", seed=97,
        n_customers=1, n_suppliers=1, n_parts=1, n_orders=1, n_events=1,
        n_docs=1, n_vecs=1, emb_dim=8, span_days=1,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_single_row_tables(spark, single_row_sf, chunk):
    _sweep(spark, single_row_sf, chunk)


#: All-blank-documents leg (r11): every document row exists but carries
#: "" — the zero-token regime (empty vocab, zero character mass, zero
#: batch capacity), distinct from BOTH the empty-corpus tests (no rows)
#: and the 25%-blank nullish leg.  Its first run found five queries
#: crashing with ANSI DIVIDE_BY_ZERO on zero totals
#: (length_grouped_batches, mixture_temperature_weights,
#: source_concentration_hhi, tokenizer_fertility_stats,
#: zipf_exponent_fit); each now carries an explicit degenerate guard.
_TEXT_FAMILIES = ("text", "tokenize", "dedup", "curation", "hygiene",
                  "multimodal")
_BLANK_SENSITIVE = sorted(
    n for n, q in REGISTRY.items()
    if q.fn.__module__.rsplit(".", 1)[-1] in _TEXT_FAMILIES
    and q.oracle is not None
)


@pytest.fixture(scope="session")
def all_blank_docs_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("randfix_blank") / "sf"
    write_random_fixture(d, seed=103, n_docs=50)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(50), pa.int64()),
            "text": pa.array([""] * 50),
            "lang": pa.array(["en", "es", "de", "fr", "zh"] * 10),
            "source": pa.array([f"src{i % 5}" for i in range(50)]),
            "n_chars": pa.array([0] * 50, pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("chunk", _chunks(_BLANK_SENSITIVE), ids=_chunk_id)
def test_oracle_parity_on_all_blank_docs(spark, all_blank_docs_sf, chunk):
    _sweep(spark, all_blank_docs_sf, chunk)


#: Adversarial-text leg (r11): a corpus of PII look-alikes (emails,
#: phones, SSNs, URLs, IPs), regex metacharacters as standalone tokens
#: (".*", "[x]", "a|b", backslashes), quote/apostrophe variants (ASCII
#: and curly), punctuation runs, numerics (hex, float, scientific), and
#: embedded tabs/newlines as token separators — the regime where Java
#: regex (Spark) vs RE2-ish (DuckDB) semantics, tokenizer whitespace
#: assumptions, and PII patterns would diverge.  The word-salad driver
#: fixture exercises none of this.  First probe: 92/92 text-family
#: queries pass — pinned here so regex/tokenizer changes can't regress
#: onto clean-prose-only evidence.
_ADV_TOKENS = [
    "alice@example.com", "bob.smith+tag@mail.co.uk", "555-867-5309",
    "(415) 555-0100", "+1 212 555 0199", "123-45-6789",
    "https://example.com/a?b=c&d=e#frag", "http://a.b/c%20d",
    "192.168.1.1", ".*", "a+b", "[x]", "(y)", "{3}", "a|b", "^start",
    "end$", "back\\slash", "it's", '"quoted"', "`tick`", "don’t",
    "!!!", "...", "--", "::", "42", "0xFF", "3.14159", "1e10", "-7",
    "CamelCase", "snake_case", "kebab-case", "the", "data", "query",
]
_ADV_SEPS = [" ", " ", " ", " ", "\t", "\n", " "]


@pytest.fixture(scope="session")
def adversarial_text_sf(tmp_path_factory):
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("randfix_advtext") / "sf"
    write_random_fixture(d, seed=113, n_docs=300)
    rng = random.Random(113)
    texts = []
    for _ in range(300):
        n = rng.randint(8, 80)
        parts = [rng.choice(_ADV_TOKENS) for _ in range(n)]
        out = parts[0]
        for p in parts[1:]:
            out += rng.choice(_ADV_SEPS) + p
        texts.append(out)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(300), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([rng.choice(["en", "es", "de", "fr", "zh"])
                              for _ in range(300)]),
            "source": pa.array([f"src{rng.randint(0, 19)}"
                                for _ in range(300)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("chunk", _chunks(_BLANK_SENSITIVE), ids=_chunk_id)
def test_oracle_parity_on_adversarial_text(spark, adversarial_text_sf, chunk):
    _sweep(spark, adversarial_text_sf, chunk)


#: Adversarial-JSON leg (r11): the events.props payload rewritten so 70%
#: of rows carry hostile JSON — NULL/empty/truncated docs, non-object
#: roots, wrong-typed / null / missing k, >int64 and 1e308 numerics,
#: duplicate top-level keys, escaped control characters, nested objects,
#: arrays, whitespace variants.  First sweep found four defects: FAILFAST
#: parse_json aborting the job (variant_shred_props), ANSI CAST overflow
#: on >int64 digit runs (malformed_filter, json_functions_props), and
#: [DUPLICATED_MAP_KEY] crashing map construction (map_functions_props).
#: Each now carries a shared both-engine gate: k counts only as an
#: optionally-signed <=18-digit integer string, duplicate-key payloads
#: are contractually NULL, and map parsing hides behind a flat-object
#: regex the oracle evaluates verbatim.  Scope: no NESTED duplicate keys
#: in the corpus (Spark's try_parse_json rejects them at any depth; the
#: SQL mirror checks the top level).
_PROPS_QUERIES = [
    "malformed_filter", "pipeline_observe_metrics", "variant_shred_props",
    "scalar_try_functions", "json_functions_props", "map_functions_props",
]

_ADV_PROPS = [
    None, "", "not json at all", "{", '{"k": 1', "[1, 2, 3]", "42",
    '"bare string"', "null", "true", '{"k": null}', '{"k": "str"}',
    '{"k": 3.5}', '{"k": -7}', '{"k": 99999999999999999999}',
    '{"k": 1e308}', '{"k": 12, "extra": {"nested": [1, {"deep": true}]}}',
    '{"K": 12}', '{"k": 12, "k": 13}', '{"k\\u0020x": 1, "k": 8}',
    '{"k": "line1\\nline2\\ttab"}', '{"k": "quote\\"inside"}',
    '{"k": "unicode \\u00e9\\u4e2d"}', '{"k": [1, 2]}', '{"k": {}}',
    '{ "k" : 5 }', '{"k":5}', '\t{"k": 6}\n', '{"other": 1}',
    '{"k": 0}', '{"k": 99}',
]


@pytest.fixture(scope="session")
def adversarial_json_sf(tmp_path_factory):
    import json
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("randfix_advjson") / "sf"
    write_random_fixture(d, seed=127, n_events=600)
    t = pq.read_table(str(d / "events.parquet"))
    rng = random.Random(127)
    props = [
        rng.choice(_ADV_PROPS) if rng.random() < 0.7
        else json.dumps({"k": rng.randint(0, 99)})
        for _ in range(t.num_rows)
    ]
    cols = {c: t.column(c) for c in t.column_names}
    cols["props"] = pa.array(props, pa.string())
    pq.write_table(pa.table(cols), str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("chunk", _chunks(_PROPS_QUERIES), ids=_chunk_id)
def test_oracle_parity_on_adversarial_json(spark, adversarial_json_sf, chunk):
    _sweep(spark, adversarial_json_sf, chunk)


#: Magnitude-spread leg (r11): every money column multiplied by a
#: log-uniform power of ten, capped just inside its DECLARED decimal
#: width (events.value to 2e9, o_totalprice to 3e11, l_extendedprice
#: under DECIMAL(9,2)'s 1e7).  The regime where scale-4 decimal sums
#: pass 2^53 — duckdb's direct decimal->double cast compounds two
#: roundings there and lands 1 ulp off Spark's correctly-rounded cast —
#: and where scaled round() (x*10^k then half-away) flips last digits.
#: Its first run failed 11 queries in 4 classes: the whole sql_dsum /
#: sql_decsum oracle backbone (now STRING round-tripped), too-narrow
#: DECIMAL(12,2) anova factors + duckdb's narrow-width DECIMAL(18)
#: multiply (anova, autocorr), scaled-round flips (ewma, gapfill
#: interp, poisson bootstrap, weekly seasonal), and engine regr_*
#: accumulation noise exceeding absolute 4dp rounding
#: (regression_value_trend, rebuilt on exact decimal moments).
@pytest.fixture(scope="session")
def magnitude_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_mag") / "sf", seed=77,
        magnitude_spread=True,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_magnitude_spread(spark, magnitude_sf, chunk):
    _sweep(spark, magnitude_sf, chunk)


#: Long-documents leg (r11): a dozen documents rewritten as extreme
#: length shapes — ~24k-char running prose, a single unbroken 8k-char
#: token, one word repeated 4000 times, and a ~34k-byte multibyte
#: (CJK + emoji) body.  The regime where tokenizer/shingle counts,
#: whole-text byte replays, and per-doc statistics meet length
#: extremes.  Its first run found two divergences: IEEE negative zero
#: from a single-class entropy (char_class_entropy, normalized with
#: + 0.0 on both engines) and a scaled-half rounding flip on a
#: 4000-word single-sentence Flesch score (readability_flesch, now on
#: the shortest-repr dround contract).
_LONGDOC_SENSITIVE = sorted(
    n for n, q in REGISTRY.items()
    if q.fn.__module__.rsplit(".", 1)[-1] in _TEXT_FAMILIES
    and q.oracle is not None
)


@pytest.fixture(scope="session")
def longdocs_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_long") / "sf", seed=78,
        long_docs=12, n_docs=120,
    )


@pytest.mark.parametrize("chunk", _chunks(_LONGDOC_SENSITIVE), ids=_chunk_id)
def test_oracle_parity_on_long_docs(spark, longdocs_sf, chunk):
    _sweep(spark, longdocs_sf, chunk)


#: Duplicate-event-id leg (r11): 30% of events re-delivered with the
#: SAME event_id/type/user but a drifted ts (≤30 min, inside any 1-hour
#: lateness bound) and a different value/props payload — the
#: at-least-once-delivery shape, invisible on the unique-key driver
#: fixtures.  Its first run found three divergences: the asof oracle's
#: re-pair by event_id fanned out (now paired on a surrogate row key),
#: attribution grouped two payloads under one purchase_id with an
#: engine-arbitrary ANY_VALUE pick (now first-write-wins dedup on both
#: engines), and the streaming dedup oracle counted rows where the
#: engine counts ids (now COUNT(DISTINCT event_id)).
@pytest.fixture(scope="session")
def dupkeys_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_dup") / "sf", seed=79,
        dup_event_frac=0.3,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_dup_event_ids(spark, dupkeys_sf, chunk):
    _sweep(spark, dupkeys_sf, chunk)


#: Embedding-magnitude leg (r11): each vector scaled by a log-uniform
#: power of ten across float32's usable range (1e-30..1e25; every 7th
#: vector scaled per-component).  Its first run found five failures:
#: numpy np.dot's pairwise accumulation vs the oracle's sequential list
#: fold past 1e14 norms + sub-quantum/scientific-parse holes in the
#: first dround draft (arrow_normalize_embeddings — the piecewise dround
#: regimes exist because of this leg), fixed-scale decimal quantizers
#: overflowing on 1e12+ components (embedding_dim_stats,
#: label_centroid_similarity), PCA invariants drowned in catastrophic
#: cancellation (embedding_pca_project), and a scaled-round flip on the
#: int8 quantizer's display scale.  Outcome: the quantized-moment
#: analytics declare a |component| < 1e4 domain with vector-level
#: exclusion, observable via the embedding_component_range DQ rule.
_EMB_FAMILIES = ("similarity", "clustering", "udfs", "evaluation",
                 "dedup", "curation", "profile")
_EMB_SENSITIVE = sorted(
    n for n, q in REGISTRY.items()
    if q.fn.__module__.rsplit(".", 1)[-1] in _EMB_FAMILIES
    and q.oracle is not None
)


@pytest.fixture(scope="session")
def embmag_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_embmag") / "sf", seed=83,
        emb_magnitude_spread=True,
    )


@pytest.mark.parametrize("chunk", _chunks(_EMB_SENSITIVE), ids=_chunk_id)
def test_oracle_parity_on_embedding_magnitudes(spark, embmag_sf, chunk):
    _sweep(spark, embmag_sf, chunk)


#: Id-domain legs (r11): every surrogate id (and its FK references)
#: shifted by a constant — ids are opaque int64s, and the two extremes
#: break different assumptions.  NEGATIVE ids (offset -5e6): Python's
#: floored % vs SQL's truncated % split the media-synthesis replays,
#: and (id*C) % P went negative into ln() (weighted_sample_es).
#: NEAR-2^62 ids: id*k products overflow int64 on one or both engines
#: (bitwise shl, heaps checkpoint grid, BFS id checksums) and the
#: id-div-2 heap tree pointed outside the id set entirely
#: (tree_root_pointer_jumping, now rank-based).  Media synthesis runs on
#: media_base = doc_id mod 2^31 (multimodal.SQL_MEDIA_BASE) — identity
#: on every realistic id, total on all of them.
@pytest.fixture(scope="session")
def idneg_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_idneg") / "sf", seed=89,
        id_offset=-5_000_000,
    )


@pytest.fixture(scope="session")
def idbig_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_idbig") / "sf", seed=91,
        id_offset=2**62,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_negative_ids(spark, idneg_sf, chunk):
    _sweep(spark, idneg_sf, chunk)


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_huge_ids(spark, idbig_sf, chunk):
    _sweep(spark, idbig_sf, chunk)


#: Combined-extremes leg (r11): every r11 axis TOGETHER — magnitude-
#: spread money, 25% duplicate event ids, long docs, embedding-magnitude
#: spread, negative id offset, plus hot-key skew, nulls, and a 15-min
#: timestamp grain.  Interactions are where single-axis fixes leak; its
#: first run found three: a 2^53 decimal->double cast + scaled round in
#: changepoint_binary_split's oracle (revenue magnitudes only reach the
#: boundary under the combined skew+grain shape — rev now stays decimal
#: end-to-end), and IEEE -0.0 leaking from score bins (eval_ks_
#: separation + every AUC_BIN_DECIMALS site, now `+ 0.0`-normalized) and
#: single-type-user entropies (user_event_entropy).
@pytest.fixture(scope="session")
def combo_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_combo") / "sf", seed=101,
        magnitude_spread=True, dup_event_frac=0.25, long_docs=8,
        emb_magnitude_spread=True, id_offset=-5_000_000,
        hot_frac=0.3, null_frac=0.15, ts_grain_s=900,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_combined_extremes(spark, combo_sf, chunk):
    _sweep(spark, combo_sf, chunk)


#: Long-span leg (r11): a 10-YEAR event window (3650 days, 2000 events)
#: — the regime where per-series spines inflate 120x (the hourly
#: gap-fill spine reaches ~435k rows) and anything superlinear in the
#: series length surfaces.  Its first probe passed 374/374 for
#: CORRECTNESS but exposed a quadratic PLAN: Spark evaluates a
#: (currentRow, unboundedFollowing) window frame by rescanning
#: current..end for every row, so gapfill_hourly_interp's NOCB side ran
#: 36 minutes on the long spine (asof_join_nearest's forward pass had
#: the same shape on hot users).  Both now run as RUNNING frames over
#: the reversed sort — incremental O(n), same results, 8 s on the same
#: spine.  Scoped to the families where series length bites.
_SPAN_FAMILIES = ("temporal", "windows")
_SPAN_SENSITIVE = sorted(
    n for n, q in REGISTRY.items()
    if q.fn.__module__.rsplit(".", 1)[-1] in _SPAN_FAMILIES
    and q.oracle is not None
)


@pytest.fixture(scope="session")
def longspan_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_span") / "sf", seed=107,
        span_days=3650, n_events=2000,
    )


@pytest.mark.parametrize("chunk", _chunks(_SPAN_SENSITIVE), ids=_chunk_id)
def test_oracle_parity_on_long_spans(spark, longspan_sf, chunk):
    _sweep(spark, longspan_sf, chunk)


#: Null-FK leg (r11): 20% of events.user_id is NULL — the
#: anonymous-traffic shape.  Plain GROUP BY pools NULLs identically on
#: both engines (most user-grain queries pass untouched), but its first
#: probe failed 13 queries where NULL keys are genuinely ill-defined:
#: assignment hashing (Spark xxhash64 SKIPS null inputs, pooling all
#: anonymous traffic into one arm, across the whole A/B family),
#: user-equality joins vs NULL-pooling window partitions (the asof
#: pair, CDC roundtrip, the full-outer stream join), per-user state
#: (applyInPandasWithState crashes on a NULL key), theta sketches
#: (updates skip NULL while DISTINCT keeps it and NOT IN goes
#: three-valued), and dau/mau's own COUNT(*) vs COUNT(DISTINCT)
#: disagreeing about the NULL row.  Contract: user-KEYED analytics run
#: over identified traffic (user_id IS NOT NULL on both engines),
#: observable via the user_id_present DQ rule; NULL-pooling aggregates
#: stay total over all rows.
@pytest.fixture(scope="session")
def nullfk_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_nullfk") / "sf", seed=109,
        null_fk_frac=0.2,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_null_fks(spark, nullfk_sf, chunk):
    _sweep(spark, nullfk_sf, chunk)


#: Unicode-grapheme leg (r12): combining-mark / astral-plane documents —
#: NFD decomposed accents (one grapheme = two code points), mathematical
#: alphanumerics (every letter a UTF-16 surrogate pair), ZWJ emoji
#: families + variation selectors + skin tones (one grapheme spans up to
#: 7 code points), Indic virama clusters — with exact and near duplicates
#: planted INSIDE the unicode region.  Distinct from the r11 multibyte
#: leg, which varies BYTE lengths: this one makes code points, code
#: units, and grapheme clusters all disagree.  First probe: 374/374
#: clean — the engine's string surface counts code points consistently
#: on both engines; pinned so it stays that way.
@pytest.fixture(scope="session")
def unicode_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_unicode") / "sf", seed=139,
        unicode_docs=12,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_unicode_graphemes(spark, unicode_sf, chunk):
    _sweep(spark, unicode_sf, chunk)


#: NULL-heavy leg (r12): EVERY optional column NULL at 50% — user_id,
#: event_type, value, props, documents.text (true NULL, not blank),
#: embeddings.label.  First probe failed 26 queries across four contract
#: classes, all fixed with symmetric domain filters or NULL-propagation
#: alignment: (1) labeled-rows-only for the binary-eval family (NULL
#: labels silently counted as negatives, and NULL-keyed argmax picks
#: diverged); (2) measured-values-only for value statistics (quantiles,
#: gini, KS, Mann-Whitney, QTE, rolling median, LTTB — Spark orders NULL
#: FIRST, DuckDB LAST, and COUNT(*) vs NULL-skipping aggregates mixed
#: denominators); (3) text-bearing-docs-only for media synthesis,
#: packing, ml-minhash (NULL text crashed RegexTokenizer / payload
#: encode), with NULL-propagating fingerprints (DuckDB concat() treats
#: NULL as '' — replaced with ||); (4) typed-events-only for sequence
#: analytics (markov states, session paths), and IS DISTINCT FROM in the
#: CDC diff (three-valued <> dropped NULL-state transitions from the
#: changelog, which the apply roundtrip could not reconstruct).
@pytest.fixture(scope="session")
def nullheavy_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_nullheavy") / "sf", seed=131,
        null_val_frac=0.5, null_text_frac=0.5, null_etype_frac=0.5,
        null_label_frac=0.5, null_fk_frac=0.5, null_frac=0.5,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_null_heavy(spark, nullheavy_sf, chunk):
    _sweep(spark, nullheavy_sf, chunk)


#: All-NULL leg (r12): every optional column NULL at 100% — the
#: degenerate extreme where whole domains vanish (no identified users,
#: no measured values, no text, no labels).  Its probe added the
#: empty-domain contracts: theta set-ops with no qualifying types emit
#: NULL estimates on both engines, the Holt/Holt-Winters recurrences
#: NULL-poison like their oracles' NULL arithmetic, observe() metrics
#: keep SUM/MAX NULLs, and LTTB runs on measured days only.
@pytest.fixture(scope="session")
def allnull_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_allnull") / "sf", seed=137,
        null_val_frac=1.0, null_text_frac=1.0, null_etype_frac=1.0,
        null_label_frac=1.0, null_fk_frac=1.0, null_frac=1.0,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_all_null(spark, allnull_sf, chunk):
    _sweep(spark, allnull_sf, chunk)


#: Case-fold leg (r12): documents laced with CASE-MAPPING traps —
#: Turkish dotted/dotless I, ß/ẞ, Greek final sigma, titlecase digraphs,
#: compatibility ligatures.  Java's full contextual lowercase (Spark:
#: İ -> i + combining dot, word-final Σ -> ς) and utf8proc's simple map
#: (DuckDB: İ -> i, Σ -> σ everywhere) return DIFFERENT strings, which
#: diverged 12 lexical statistics at once on first probe.  The fix is a
#: contract, not a workaround: tokenization case-folds ASCII A-Z only
#: (functions/textfold.py ascii_fold / sql_ascii_fold — both engines
#: implement translate() identically, byte-stable across JDK/UCD
#: versions), every other code point passing verbatim.  Scoped to the
#: text-analysis families that fold.
_FOLD_FAMILIES = ("text", "tokenize", "curation", "hygiene", "dedup")
_FOLD_SENSITIVE = sorted(
    n for n, q in REGISTRY.items()
    if q.fn.__module__.rsplit(".", 1)[-1] in _FOLD_FAMILIES
    and q.oracle is not None
)


@pytest.fixture(scope="session")
def casefold_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_casefold") / "sf", seed=151,
        casefold_docs=8,
    )


@pytest.mark.parametrize("chunk", _chunks(_FOLD_SENSITIVE), ids=_chunk_id)
def test_oracle_parity_on_casefold_traps(spark, casefold_sf, chunk):
    _sweep(spark, casefold_sf, chunk)


#: Combined-extremes leg (r12): the r11 combined shape PLUS every new
#: r12 axis — 30% NULLs on every optional column, unicode-grapheme and
#: case-trap documents — on top of magnitude-spread money, 25% duplicate
#: event ids, long docs, embedding-magnitude spread, negative ids,
#: hot-key skew, and a 15-min timestamp grain.  Interactions are where
#: single-axis fixes leak; its first run found two: the anova
#: cross-group sum hit the engines' double->decimal conversion gap at
#: 1e22 (Spark converts via the shortest decimal repr, DuckDB scales in
#: the float domain — now an explicit grp-ordered sequential double
#: fold on both engines), and knn_label_accuracy had escaped the
#: labeled-rows-only contract (it lives in similarity.py, outside the
#: evaluation.py blanket fix).
@pytest.fixture(scope="session")
def combo12_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_combo12") / "sf", seed=157,
        magnitude_spread=True, dup_event_frac=0.25, long_docs=8,
        emb_magnitude_spread=True, id_offset=-5_000_000,
        hot_frac=0.3, null_frac=0.15, ts_grain_s=900,
        null_val_frac=0.3, null_text_frac=0.3, null_etype_frac=0.3,
        null_label_frac=0.3, null_fk_frac=0.3,
        unicode_docs=8, casefold_docs=6,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_combined_extremes_r12(spark, combo12_sf, chunk):
    _sweep(spark, combo12_sf, chunk)


#: Zero-time-span leg (r12): every event carries the SAME timestamp
#: (1-day span truncated to a 86400 s grain) — the degenerate extreme of
#: the tie-heavy shape where every inter-event duration is zero.  First
#: probe found one crash: time_weighted_avg_events divided by a zero
#: total span (Spark ANSI raises DIVIDE_BY_ZERO, DuckDB returns inf);
#: the contract is now zero rows on both engines (a series spanning no
#: time has no time-weighted average), CASE-guarded because ANSI
#: evaluates aggregate-projection divisions before any post-agg filter.
@pytest.fixture(scope="session")
def constts_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_constts") / "sf", seed=163,
        span_days=1, ts_grain_s=86400,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_zero_time_span(spark, constts_sf, chunk):
    _sweep(spark, constts_sf, chunk)


#: Exotic-whitespace leg (r12): documents carrying NBSP, ideographic /
#: thin / em spaces, zero-width spaces inside words, line and paragraph
#: separators, and ASCII control whitespace including \x0b — where
#: Java's \s (Spark) includes the vertical tab and RE2's \s (DuckDB)
#: does not, which diverged 18 lexical statistics on first probe.  The
#: fix is the explicit split class textfold.WS_RE (= Java's \s set
#: exactly, read identically by both engines) replacing every paired
#: bare-\s+ tokenizer split; Unicode spaces stay NON-separators on both
#: engines by the same contract.  Scoped to the folding text families.
@pytest.fixture(scope="session")
def wsp_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_wsp") / "sf", seed=167,
        wsp_docs=7,
    )


@pytest.mark.parametrize("chunk", _chunks(_FOLD_SENSITIVE), ids=_chunk_id)
def test_oracle_parity_on_exotic_whitespace(spark, wsp_sf, chunk):
    _sweep(spark, wsp_sf, chunk)


#: Physical-layout leg (r13): every table written as a DIRECTORY of 8
#: part files with rows SHUFFLED across them — the shape of any real
#: multi-executor dataset (thousands of files, no global row order;
#: the driver fixtures are one sorted file each).  Every result must be
#: invariant to physical layout; a divergence here is a hidden
#: input-order or partitioning dependence.  First probe (seed 131)
#: found one: ALL 14 streaming queries silently streamed ZERO files —
#: stream_table's pathGlobFilter matches leaf names and the parts are
#: part-*.parquet, not <table>.parquet (streaming/core.py now streams
#: the table directory directly when the table is a directory).
@pytest.fixture(scope="session")
def layout_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_layout") / "sf", seed=173,
        layout_files=8,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_multifile_layout(spark, layout_sf, chunk):
    _sweep(spark, layout_sf, chunk)


#: Orphan-FK leg (r13): 15% of FK values (o_custkey, l_partkey,
#: l_suppkey, events.user_id; l_orderkey at half rate) point OUTSIDE the
#: referenced table — the dirty-upstream shape where inner joins must
#: drop rows identically, outer joins must agree on unmatched rows, and
#: referential-integrity/linkage analytics meet real violations.  First
#: probe (seed 137): zero divergences — the join surface was already
#: orphan-clean; the leg pins it.
@pytest.fixture(scope="session")
def orphanfk_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_orphan") / "sf", seed=179,
        orphan_fk_frac=0.15,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_orphan_fks(spark, orphanfk_sf, chunk):
    _sweep(spark, orphanfk_sf, chunk)


#: IEEE-specials leg (r13): NaN / +Inf / -Inf components planted across
#: the embedding corpus (every 11th/13th/17th vector).  First probe
#: (seed 139) found five divergences — one CRASH (embedding_quantize_int8:
#: ANSI CAST_OVERFLOW rounding NaN/scale to int — at 100 TB one dirty
#: vector would kill the whole job) and four value splits rooted in the
#: engines' different non-finite conventions (Spark propagates NaN and
#: treats it as largest in ALL comparisons; DuckDB's
#: list_cosine_similarity silently returns -1 for any non-finite input).
#: The fix is the FINITE-DOMAIN contract, the same shape as
#: EMB_COMPONENT_BOUND: nonzero_norm now means positive AND finite
#: (cosine domain), finite_components gates the Euclidean family
#: (k-means, quantization), and both twins are written `x < Inf` so
#: they reject NaN under either engine's NaN-comparison convention
#: (similarity.sql_cosine_domain / sql_finite_components).  Scoped to
#: the embedding-consuming families.
_SPECIALS_FAMILIES = ("similarity", "clustering", "evaluation", "udfs")
_SPECIALS_SENSITIVE = sorted(
    {
        n for n, q in REGISTRY.items()
        if q.fn.__module__.rsplit(".", 1)[-1] in _SPECIALS_FAMILIES
        and q.oracle is not None
    }
    | {"hybrid_search_rrf"}
)


@pytest.fixture(scope="session")
def specials_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_specials") / "sf", seed=181,
        emb_specials=True,
    )


@pytest.mark.parametrize("chunk", _chunks(_SPECIALS_SENSITIVE), ids=_chunk_id)
def test_oracle_parity_on_ieee_specials(spark, specials_sf, chunk):
    _sweep(spark, specials_sf, chunk)


#: Combined-extremes leg (r13): the r12 combined shape PLUS the four
#: r13 axes — 4-way shuffled multi-file layout, 10% orphan FKs, IEEE
#: specials in the embeddings, 10% duplicate entity ids — because
#: interactions are where single-axis fixes leak.  Its first probe
#: found three: the cuped midpoint ran over the all-events domain in
#: the oracle but the identified-user domain in Spark (anonymous
#: traffic at the time extremes shifted every pre/post split), a label
#: whose surviving components all 6dp-quantize to zero produced a
#: zero-norm centroid whose cosine Spark ANSI-raised on and DuckDB
#: silently inf'd, and duckdb's int64-domain DECIMAL(18,4) x seconds
#: product overflowed at 1e9-magnitude values x multi-hour gaps where
#: Spark's int128 product was fine.
@pytest.fixture(scope="session")
def combo13_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_combo13") / "sf", seed=191,
        magnitude_spread=True, dup_event_frac=0.25, long_docs=8,
        emb_magnitude_spread=True, id_offset=-5_000_000,
        hot_frac=0.3, null_frac=0.15, ts_grain_s=900,
        null_val_frac=0.3, null_text_frac=0.3, null_etype_frac=0.3,
        null_label_frac=0.3, null_fk_frac=0.3,
        unicode_docs=8, casefold_docs=6, wsp_docs=5,
        layout_files=4, orphan_fk_frac=0.1, emb_specials=True,
        dup_doc_frac=0.1, dup_vec_frac=0.1,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_combined_extremes_r13(spark, combo13_sf, chunk):
    _sweep(spark, combo13_sf, chunk)


#: Duplicate-entity leg (r13): 15% of documents and embeddings re-emitted
#: with the SAME doc_id/vec_id but a DRIFTED payload — the at-least-once
#: ingest shape for the two ENTITY tables (the r11 dup_event_frac leg
#: covered only events).  First probe (seed 193) failed 24 queries at
#: once: every per-id analytic, pair miner, and representative pick
#: diverged where an engine-arbitrary row won (per-row vs per-id grain in
#: the UDTF counts, merged word multisets in the repetition stats, dup
#: query_ids breaking the ANN certificates' per-query invariants, the
#: curation funnel's md5 rep-pick keyed on a drifted text).  The fix is
#: ONE contract, the engine's own silver semantics (SURVEY §4.3 dedup-
#: by-id): per-entity analytics read the CANONICAL grain — exactly one
#: row per id, picked by a NULL-safe total order over the payload both
#: engines evaluate identically (sources/tables.py entity_table /
#: SQL_DOCS_CANON / SQL_EMB_CANON; a no-op pick on unique-id data).
#: Per-ROW analytics (quality scores, token counts per physical doc)
#: legitimately keep the physical grain — both engines see the same
#: duplicated rows and agree.
@pytest.fixture(scope="session")
def dupent_sf(tmp_path_factory):
    return write_random_fixture(
        tmp_path_factory.mktemp("randfix_dupent") / "sf", seed=197,
        dup_doc_frac=0.15, dup_vec_frac=0.15,
    )


@pytest.mark.parametrize("chunk", _chunks(_ORACLE_BACKED), ids=_chunk_id)
def test_oracle_parity_on_duplicate_entities(spark, dupent_sf, chunk):
    _sweep(spark, dupent_sf, chunk)
