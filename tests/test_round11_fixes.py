"""Regression tests for the round-11 fixes: each test plants the exact
degenerate shape that round's sweep legs or ADVICE flagged and asserts
Spark and the registered DuckDB oracle agree on it (not just on the
driver fixtures, where the shape never occurs).

Shapes covered:
1. the DuckDB 1.0 ``WITH RECURSIVE`` footgun — a non-self-referencing
   ``A UNION B`` member runs as UNION ALL — via a transition matrix with
   NON-uniform per-state duplicate counts (markov oracle);
2. PSI one-sided buckets (mass in exactly one period) must emit an
   epsilon-smoothed finite term instead of vanishing (r10 ADVICE);
3. the xxh64 SQL replay must be byte-exact on MULTIBYTE text across all
   geometry branches (stripes / words / 4-byte word / tail bytes) for
   the three queries whose oracles were ASCII-scoped until r11;
4. zero-vs-nonzero norm classification must run in DOUBLE: components
   around 1e-23 square to 0 in float32 but stay positive in double, and
   both engines must agree on WHICH vectors are excluded (r10 ADVICE).
"""

from __future__ import annotations

import datetime as dt

import pytest

from tests.oracle import assert_matches_oracle

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


# ---------------------------------------------------------------------------
# 1. markov state-set dedup under the WITH RECURSIVE UNION-ALL footgun


@pytest.fixture(scope="module")
def skewed_transition_sf(spark, tmp_path_factory):
    """Event sequences whose transition-count matrix has NON-uniform
    per-state cell counts: 'view' appears as a source in 3 distinct cells
    but 'error' in exactly 1, so if the oracle's state-set CTE fails to
    dedup (DuckDB 1.0 runs it as UNION ALL), the duplicated pi-anchor
    rows NO LONGER cancel through the first GROUP BY re-sum and the
    stationary vector skews — the exact shape the r11 extreme-timestamp
    sweep hit.  (Uniform duplicate counts — e.g. the driver fixtures'
    all-25-cells matrix — cancel exactly, which is why this hid for ten
    rounds.)"""
    t0 = dt.datetime(2024, 1, 1)
    seqs = {
        1: ["view", "click", "view", "purchase", "view", "signup"],
        2: ["click", "error", "error", "error"],
        3: ["view", "click", "purchase", "signup", "error"],
        4: ["signup", "signup", "click", "click"],
    }
    rows = []
    eid = 0
    for uid, types in seqs.items():
        for i, et in enumerate(types):
            rows.append(
                (eid, t0 + dt.timedelta(minutes=10 * i), uid, et, 1.0, "{}")
            )
            eid += 1
    d = tmp_path_factory.mktemp("skewtrans")
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_markov_oracle_state_set_dedup(spark, skewed_transition_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["markov_stationary_event_mix"]
    assert_matches_oracle(q.fn(spark, skewed_transition_sf), q.oracle,
                          skewed_transition_sf)


# ---------------------------------------------------------------------------
# 2. PSI one-sided buckets: epsilon-smoothed, not dropped


@pytest.fixture(scope="module")
def one_sided_psi_sf(spark, tmp_path_factory):
    """Bucket 0 (< 5.0) has mass ONLY in the baseline period and bucket 6
    (>= 200) ONLY in the current period — the sharpest drift signals in
    classical PSI.  Pre-r11 both cells were silently dropped, so the
    psi_term sum under-reported exactly these."""
    base_ts = dt.datetime(2024, 1, 10)   # < PSI_SPLIT_DATE 2024-01-16
    cur_ts = dt.datetime(2024, 1, 20)
    rows = []
    eid = 0
    for v, ts, n in [
        (2.0, base_ts, 5),    # bucket 0: baseline only
        (50.5, base_ts, 10),  # bucket 4: both periods
        (50.5, cur_ts, 8),
        (250.0, cur_ts, 4),   # bucket 6: current only
    ]:
        for _ in range(n):
            rows.append((eid, ts, 1, "view", v, "{}"))
            eid += 1
    d = tmp_path_factory.mktemp("psi1side")
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_psi_one_sided_buckets_emit_smoothed_terms(spark, one_sided_psi_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["psi_value_drift"]
    df = q.fn(spark, one_sided_psi_sf)
    assert_matches_oracle(df, q.oracle, one_sided_psi_sf)
    pdf = df.toPandas().set_index("bucket")
    # the one-sided buckets are PRESENT with large positive terms
    assert 0 in pdf.index and 6 in pdf.index
    assert pdf.loc[0, "psi_term"] > 1.0   # (1/3 - eps) * ln((1/3)/eps) ~ 4.2
    assert pdf.loc[6, "psi_term"] > 1.0
    # two-sided buckets keep the classical unsmoothed value
    assert pdf.loc[4, "n_base"] == 10 and pdf.loc[4, "n_cur"] == 8


# ---------------------------------------------------------------------------
# 3. xxh64 replay byte-exact on multibyte text (simhash / feature
#    hashing / bloom — the three oracles that were ASCII-scoped pre-r11)


@pytest.fixture(scope="module")
def multibyte_docs_sf(spark, tmp_path_factory):
    """Documents mixing 1-to-4-byte UTF-8 chars, with byte lengths planted
    across every xxh64 geometry branch (tail-only, exact 32-byte stripe,
    straddling) and exact + near duplicates so the near-dup queries emit
    pairs.  'é'*16 is 16 chars but 32 BYTES — the char-length geometry
    would route it through the wrong branch entirely."""
    texts = [
        "é",                                  # 2 bytes: tail-byte branch
        "€ab",                                # 5 bytes: 4-byte word + tail
        "é" * 16,                             # 32 bytes = exactly 1 stripe
        "é" * 16 + "中",                      # stripe + 3-byte tail
        "\U0001F600" * 9,                     # 36 bytes: stripe + 4-byte word
        "naïve café über mañana schön 東京 数据 запрос",
        "naïve café über mañana schön 東京 数据 запрос",   # exact dup
        "naïve café über mañana schön 東京 数据 запрос extra",  # near dup
        "the quick brown fox jumps over the lazy dog",      # pure ASCII
        "Ωμέγα " * 12,
    ] * 4  # 40 docs so shingle/bloom stages have some mass
    rows = [
        (i, t, ["en", "es", "zh", "de"][i % 4], f"src{i % 5}", len(t))
        for i, t in enumerate(texts)
    ]
    d = tmp_path_factory.mktemp("mbdocs")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name", ["simhash_neardup", "feature_hashing_collisions", "bloom_fpr_audit"]
)
def test_xxh64_oracles_byte_exact_on_multibyte(spark, multibyte_docs_sf, name):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()[name]
    assert_matches_oracle(q.fn(spark, multibyte_docs_sf), q.oracle,
                          multibyte_docs_sf)


# ---------------------------------------------------------------------------
# 4. norm classification in double: 1e-23 components underflow float32


@pytest.fixture(scope="module")
def tiny_norm_sf(spark, tmp_path_factory):
    """vec 0 has components ~1e-23: each square is 1e-46, which underflows
    to 0.0 in float32 (min subnormal ~1.4e-45) but stays positive in
    double — so a float-domain norm test calls it a zero vector while the
    oracle's double-domain test keeps it.  vec 5 is a true zero vector
    (excluded by both).  Both ids are ``% PAIRS_SAMPLE_MOD == 0`` so they
    land in embedding_cosine_pairs' sample."""
    import random

    rng = random.Random(3)
    dim = 64
    rows = []
    for i in range(20):
        if i == 0:
            v = [1e-23] * dim
        elif i == 5:
            v = [0.0] * dim
        elif i == 10:
            # parallel to vec 0 at normal magnitude: cosine(0, 10) = 1.0,
            # so the (0, 10) pair is emitted IFF vec 0 survives the norm
            # classification — making the double-vs-float decision visible
            v = [0.5] * dim
        else:
            v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        rows.append((i, [float(x) for x in v], i % 3))
    d = tmp_path_factory.mktemp("tinynorm")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_nonzero_norm_double_domain(spark, tiny_norm_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["embedding_cosine_pairs"]
    df = q.fn(spark, tiny_norm_sf)
    assert_matches_oracle(df, q.oracle, tiny_norm_sf)
    pdf = df.toPandas()
    ids = set(pdf["vec_a"]) | set(pdf["vec_b"])
    assert 0 in ids, "1e-23 vector wrongly classified as zero-norm"
    assert 5 not in ids, "true zero vector must stay excluded"


# ---------------------------------------------------------------------------
# 5. concurrent stateful streams: the isolation the stream_session clone
#    buys (r10 VERDICT ask #7) exercised for real, not just asserted on
#    conf values — two interval joins run SIMULTANEOUSLY from different
#    threads of one shared session and must both match their oracle.
#    Under the old set/restore contract this raced: thread B could start
#    its (or a batch) plan inside thread A's reduced-partitions window.


def test_concurrent_stateful_streams_are_isolated(spark, sf_dir):
    import threading

    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["streaming_interval_join"]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results: dict[int, object] = {}

    def run(slot: int) -> None:
        try:
            results[slot] = q.fn(spark, sf_dir).collect()
        except Exception as e:  # noqa: BLE001 - surfaced via results
            results[slot] = e

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for slot, res in results.items():
        assert not isinstance(res, Exception), f"thread {slot}: {res}"
    a = sorted(tuple(r) for r in results[0])
    b = sorted(tuple(r) for r in results[1])
    assert a == b and len(a) > 0
    # the shared session's conf was never touched by either stream
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


# ---------------------------------------------------------------------------
# 6. adaptive ANN knobs: bounds + monotonicity across six decades of
#    corpus size (the sqrt-scaling contract behind the r11 recall lift)


def test_adaptive_ann_knob_bounds():
    from azure_func_forem_data_etl_spark.operators.similarity import (
        IVF_MAX_CENTROIDS,
        IVF_NPROBE,
        PQ_K_MAX,
        PQ_K_MIN,
        _centroid_budget,
        _ivf_nprobe,
        _pq_codewords,
    )

    prev_k = prev_np = 0
    for n in [0, 1, 10, 500, 2_000, 50_000, 1_000_000, 10**9, 10**12]:
        k = _pq_codewords(n)
        assert PQ_K_MIN <= k <= PQ_K_MAX and (k & (k - 1)) == 0  # pow2
        assert k >= prev_k, "codebooks must not shrink as the corpus grows"
        prev_k = k
        nc = _centroid_budget(max(1, n))
        np_ = _ivf_nprobe(nc)
        assert IVF_NPROBE <= np_ <= max(IVF_NPROBE, nc)
        assert np_ >= prev_np or nc <= prev_np, "nprobe tracks list count"
        prev_np = min(np_, nc)
    # the probed FRACTION shrinks as lists grow: 4% at the centroid cap
    assert _ivf_nprobe(IVF_MAX_CENTROIDS) / IVF_MAX_CENTROIDS < 0.05
    # measured operating points from the r11 recall sweep
    assert _pq_codewords(500) == 32 and _pq_codewords(2000) == 64
    assert _ivf_nprobe(11) == 9 and _ivf_nprobe(42) == 17


# ---------------------------------------------------------------------------
# 7. finite-domain gate: the value_finite DQ rule detects NaN/Inf money
#    values (the r11 NaN/Inf probe showed the exact-decimal backbone is
#    definitionally finite on BOTH engines — COVERAGE.md §Finite-domain
#    contract; this rule is the quarantine gate for that whole regime)


@pytest.fixture(scope="module")
def nan_laced_sf(tmp_path_factory):
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.randfix import write_random_fixture

    d = tmp_path_factory.mktemp("nanlace") / "sf"
    write_random_fixture(d, seed=137, n_events=200)
    t = pq.read_table(str(d / "events.parquet"))
    vals = t.column("value").to_pylist()
    vals[3], vals[17], vals[42] = math.nan, math.inf, -math.inf
    cols = {c: t.column(c) for c in t.column_names}
    cols["value"] = pa.array(vals, pa.float64())
    pq.write_table(pa.table(cols), str(d / "events.parquet"))
    e = pq.read_table(str(d / "embeddings.parquet"))
    embs = e.column("embedding").to_pylist()
    embs[5][0], embs[9][3] = math.nan, math.inf
    ecols = {c: e.column(c) for c in e.column_names}
    ecols["embedding"] = pa.array(embs, pa.list_(pa.float32()))
    pq.write_table(pa.table(ecols), str(d / "embeddings.parquet"))
    return str(d)


def test_dq_value_finite_rule_fires_on_nan_inf(spark, nan_laced_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["dq_expectations_report"]
    df = q.fn(spark, nan_laced_sf)
    assert_matches_oracle(df, q.oracle, nan_laced_sf)
    rows = {r["rule"]: r for r in df.collect()}
    row = rows["value_finite"]
    assert row["violations"] == 3 and row["passed"] == 0
    assert row["n_rows"] == 200
    emb = rows["embedding_finite"]
    assert emb["violations"] == 2 and emb["passed"] == 0


def test_dq_value_finite_rule_passes_on_clean_corpus(spark, sf_dir):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["dq_expectations_report"]
    row = {
        r["rule"]: r for r in q.fn(spark, sf_dir).collect()
    }["value_finite"]
    assert row["violations"] == 0 and row["passed"] == 1

# ---------------------------------------------------------------------------
# 5. the magnitude-sweep rounding contracts (r11): shortest-repr rounding
#    (exact.dround / sql_dround) and the STRING-round-tripped
#    decimal->double casts must agree bit-exactly on the exact boundary
#    values that split the engines' native round/cast implementations


def test_dround_agrees_at_scaled_half_boundary(spark):
    """-3973.06434999999965…: x*1e4 lands EXACTLY on -39730643.5 in
    double, so duckdb's native round(x, 4) flips to -3973.0644 while
    Spark's exact-expansion Round gives -3973.0643 (the
    readability_flesch find).  Both sides of the dround contract must
    produce the same double here."""
    import duckdb
    from pyspark.sql import functions as F

    from azure_func_forem_data_etl_spark.functions.exact import (
        dround,
        sql_dround,
    )

    # double literals on BOTH engines (Spark SQL parses bare 206.835 as
    # a decimal; the D suffix forces the double arithmetic the flesch
    # query performs via Column ops)
    sp_expr = "206.835D - 1.015D * 4000.0D - 84.6D * (5669.0D / 4000.0D)"
    dk_expr = ("206.835::DOUBLE - 1.015::DOUBLE * 4000.0::DOUBLE "
               "- 84.6::DOUBLE * (5669.0::DOUBLE / 4000.0::DOUBLE)")
    got = (
        spark.range(1)
        .select(dround(F.expr(sp_expr), 4).alias("r"))
        .collect()[0]["r"]
    )
    want = duckdb.sql(
        f"SELECT {sql_dround(f'({dk_expr})', 4)} AS r"
    ).fetchone()[0]
    assert got == want == -3973.0643
    # duckdb's NATIVE round really does disagree — the reason the
    # contract exists (if an engine upgrade changes this, revisit)
    native = duckdb.sql(f"SELECT round(({dk_expr}), 4)").fetchone()[0]
    assert native == -3973.0644


def test_sql_dsum_string_trip_past_2_53(spark, tmp_path):
    """The decimal sum 7114608573322.4500 (the agg_distinct find): its
    scale-4 integer form 71146085733224500 is past 2^53, where duckdb's
    direct decimal->double cast (int128 to double, then /1e4) lands on
    7114608573322.449 — one ulp under the correctly-rounded
    7114608573322.45 Spark computes.  sql_dsum's STRING round-trip must
    restore bit-agreement."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from azure_func_forem_data_etl_spark.functions.exact import (
        dsum,
        sql_dsum,
    )

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"v": pa.array([7114608573322.0, 0.45], pa.float64())}),
        str(d / "t.parquet"),
    )
    got = (
        spark.read.parquet(str(d / "t.parquet"))
        .agg(dsum("v").alias("s"))
        .collect()[0]["s"]
    )
    want = duckdb.sql(
        f"SELECT {sql_dsum('v')} AS s FROM read_parquet('{d}/t.parquet')"
    ).fetchone()[0]
    assert got == want == 7114608573322.45
    direct = duckdb.sql(
        "SELECT CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) "
        f"FROM read_parquet('{d}/t.parquet')"
    ).fetchone()[0]
    assert direct == 7114608573322.449  # the bug the trip fixes


def test_dround_property_across_magnitudes(spark, tmp_path):
    """dround == sql_dround bit-for-bit over a deterministic sample
    spanning the full double range the contract claims: exponents
    1e-40..1e+40 (both signs), exact zeros, sub-half-quantum values with
    every leading digit (the DuckDB first-digit parse bug region),
    scaled-half boundaries, and values straddling the 1e15 identity
    cut — for k in {4, 6, 9}."""
    import random

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from azure_func_forem_data_etl_spark.functions.exact import (
        dround,
        sql_dround,
    )

    rng = random.Random(7)
    vals = [0.0, -0.0, 1e15, -1e15, 999999999999999.9, 1.0000000000000002e15]
    # every leading digit at deep-tiny exponents (first-digit bug region)
    vals += [s * d * 10.0 ** -e for s in (1, -1) for d in range(1, 10)
             for e in (8, 12, 20, 30)]
    # random magnitudes across the whole claimed range
    vals += [rng.uniform(1, 10) * 10.0 ** rng.randint(-40, 40)
             * rng.choice((1, -1)) for _ in range(2000)]
    # scaled-half neighborhoods: x where x*10^k prints as .5
    vals += [(n + 0.5) / 10.0 ** 4 for n in
             (rng.randrange(10 ** 10) for _ in range(200))]
    d = tmp_path / "v.parquet"
    pq.write_table(pa.table({"i": pa.array(range(len(vals)), pa.int64()),
                             "x": pa.array(vals, pa.float64())}), str(d))
    for k in (4, 6, 9):
        got = [
            r["r"]
            for r in spark.read.parquet(str(d))
            .select("i", dround(F.col("x"), k).alias("r"))
            .orderBy("i")
            .collect()
        ]
        want = [
            r[0]
            for r in duckdb.sql(
                f"SELECT {sql_dround('x', k)} AS r "
                f"FROM read_parquet('{d}') ORDER BY i"
            ).fetchall()
        ]
        assert len(got) == len(want)
        # repr-compare: the driver's value hash distinguishes -0.0 from
        # 0.0, so the contract must match signs too (Python == does not)
        bad = [
            (i, vals[i], g, w)
            for i, (g, w) in enumerate(zip(got, want))
            if repr(g) != repr(w)
        ]
        assert not bad, f"k={k}: first divergences {bad[:5]}"
