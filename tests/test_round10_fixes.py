"""Regression tests for the round-9 ADVICE fixes: each test plants the
exact degenerate shape the advisor flagged and asserts Spark and the
registered DuckDB oracle agree on it (not just on the fixtures, where the
shape never occurs)."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.oracle import assert_matches_oracle

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _write_events(spark, d, rows):
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(d / "events.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def fractional_gap_sf(spark, tmp_path_factory):
    """Events whose consecutive gaps straddle the 30-min session boundary
    at SUB-SECOND precision (ADVICE r9, temporal.py): user 1's second gap
    is exactly 1800.5 s — second-truncated arithmetic reads it as 1800 s
    (<= boundary, merge) while the oracle's full-precision INTERVAL
    compare reads 1800.5 s (> boundary, split).  User 2 plants the exact
    1800.000000 s gap (merge on both sides) and a 1800.999999 s gap
    (split on both sides only under exact micros)."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: A --1799.5s-- B --1800.5s-- C   => sessions {A,B} | {C}
        (0, t0, 1, "A", 1.0, "{}"),
        (1, t0 + dt.timedelta(seconds=1799, microseconds=500_000), 1, "B", 2.0, "{}"),
        (2, t0 + dt.timedelta(seconds=3600), 1, "C", 3.0, "{}"),
        # user 2: A --1800.0s-- B --1800.999999s-- C => sessions {A,B} | {C}
        (3, t0, 2, "A", 1.0, "{}"),
        (4, t0 + dt.timedelta(seconds=1800), 2, "B", 2.0, "{}"),
        (5, t0 + dt.timedelta(seconds=3600, microseconds=999_999), 2, "C", 3.0, "{}"),
    ]
    d = tmp_path_factory.mktemp("fracgap")
    return _write_events(spark, d, rows)


def test_sessionize_gap_exact_micros(spark, fractional_gap_sf):
    """A 1800.5 s gap must START a new session (30 min = 1800 s exactly;
    the old ts.cast('long') truncation read it as 1800 s and merged)."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["sessionize_gap_islands"]
    df = q.fn(spark, fractional_gap_sf)
    pdf = df.toPandas().sort_values(["user_id", "session_no"])
    # both users: exactly 2 sessions, split after the 2nd event
    counts = {
        (int(r.user_id), int(r.session_no)): int(r.n_events)
        for r in pdf.itertuples()
    }
    assert counts == {(1, 1): 2, (1, 2): 1, (2, 1): 2, (2, 2): 1}
    assert_matches_oracle(df, q.oracle, fractional_gap_sf)


def test_session_path_exact_micros(spark, fractional_gap_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["session_path_topk"]
    df = q.fn(spark, fractional_gap_sf)
    paths = {r["path"]: r["n_sessions"] for r in df.collect()}
    assert paths == {"A>B": 2, "C": 2}
    assert_matches_oracle(df, q.oracle, fractional_gap_sf)


@pytest.mark.parametrize(
    "name",
    [
        "psi_value_drift",
        "ks_two_sample_drift",
        "poisson_rate_weekend_test",
        "runs_test_daily_revenue",
        "autocorr_daily_revenue",
        "acf_daily_revenue_lags",
    ],
)
def test_drift_stats_degenerate_inputs_yield_no_rows(spark, tmp_path, name):
    """A 2-weekday corpus leaves these statistics undefined (empty period
    / zero exposure arm / zero variance); the contract is NO ROWS on both
    engines — previously the Spark side died with ANSI DIVIDE_BY_ZERO
    (found by the r10 tie-heavy random sweep)."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)  # Mon; Jan 1-4 has no weekend
    rows = [
        (i, t0 + dt.timedelta(days=i), 1 + i % 3, "view", 50.0, "{}")
        for i in range(4)  # one event/day, constant value -> zero variance
    ]
    sf = _write_events(spark, tmp_path, rows)
    q = load_all()[name]
    df = q.fn(spark, sf)
    assert df.count() == 0, f"{name} must return no rows on degenerate input"
    assert_matches_oracle(df, q.oracle, sf)


def test_multimodal_byte_replay_handles_multibyte_text(spark, tmp_path):
    """The raw-tier byte replays must agree on NON-ASCII payloads: byte
    extraction via hex(encode(text)) nibble pairs (r10) — the old
    ascii(substring(text, i, 1)) read code points at character offsets,
    so 'café😀' (9 UTF-8 bytes, 5 characters) diverged everywhere."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    texts = ["café😀", "数据 запрос", "plain ascii", ""]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    for name in ("multimodal_resize", "multimodal_features"):
        q = load_all()[name]
        assert_matches_oracle(q.fn(spark, str(tmp_path)), q.oracle, str(tmp_path))


def test_twap_huge_weight_product_rounds_identically(spark, tmp_path):
    """A value x microsecond weight whose scale-4 integer exceeds 2^53
    must still hash-match: DuckDB's direct decimal->double cast compounds
    two roundings there and lands 1 ulp off Spark's correctly-rounded
    BigDecimal cast (r10 skew sweep, user with one 15-day gap); the
    oracle now round-trips the cast through VARCHAR."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    t0 = dt.datetime(2024, 1, 11, 13, 48, 10, 191365)
    rows = [
        (174, t0, 59, "view", 88.12, "{}"),
        # 15-day gap: 88.12 * 1.31e12 us = 1.158e14 -> scale-4 int 1.16e18
        (36, t0 + dt.timedelta(microseconds=1314684008111), 59, "view",
         119.06, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    q = load_all()["time_weighted_avg_user"]
    row = q.fn(spark, sf).collect()[0]
    # the exact rational is 88.12, but the contract is floor-quantization
    # of the CORRECTLY-ROUNDED double (which sits one ulp below here) —
    # replicate it: one string-roundtrip cast, one division, one floor
    import math

    wsum = float(str(round(88.12 * 10_000) * 1_314_684_008_111 / 10_000))
    expected = math.floor(wsum / 1_314_684_008_111 * 1e6) / 1e6
    assert row["twap"] == expected == 88.119999
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


def test_keyset_pagination_short_table_returns_empty_page(spark, tmp_path):
    """Fewer orders than the cursor depth (40) = no page after the cursor:
    both engines must return ZERO rows (the Spark side previously raised
    IndexError on the empty cursor collect — r10 sparse random sweep)."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    t0 = dt.datetime(2024, 1, 5)
    rows = [
        (k, k % 3 + 1, "O", 1000.0 + k, t0, "1-URGENT") for k in range(1, 11)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    q = load_all()["keyset_pagination_orders"]
    df = q.fn(spark, str(tmp_path))
    assert df.count() == 0
    assert_matches_oracle(df, q.oracle, str(tmp_path))


def test_attribution_first_touch_is_by_time_not_id(spark, tmp_path):
    """First/last touch must follow the (c_ts, touch_id) total order even
    when event ids run AGAINST time (found by the r10 random-fixture
    sweep: DuckDB silently ignores ORDER BY inside MIN/MAX, so the old
    oracle returned smallest/largest id — invisible on fixtures where
    ids correlate with ts)."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    t0 = dt.datetime(2024, 2, 1, 12, 0, 0)
    rows = [
        # ids anti-correlated with time: earliest click has the LARGEST id
        (900, t0, 1, "click", 1.0, "{}"),
        (500, t0 + dt.timedelta(hours=1), 1, "click", 1.0, "{}"),
        (100, t0 + dt.timedelta(hours=2), 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(hours=3), 1, "purchase", 30.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    q = load_all()["attribution_multi_touch"]
    row = q.fn(spark, sf).collect()[0]
    assert row["n_touches"] == 3
    assert row["first_touch_id"] == 900   # earliest by time
    assert row["last_touch_id"] == 100    # latest by time
    assert row["credit_per_touch"] == 10.0
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


def test_materialize_ctes_asserts_substitution():
    """Formatting drift in a shared CTE constant must raise, not silently
    drop the AS MATERIALIZED performance guard (ADVICE r9, dedup.py)."""
    from azure_func_forem_data_etl_spark.operators.dedup import _materialize_ctes

    sql = "WITH a AS (SELECT 1), b AS (SELECT 2) SELECT * FROM a, b"
    out = _materialize_ctes(sql, "a", "b")
    assert "a AS MATERIALIZED (" in out and "b AS MATERIALIZED (" in out
    with pytest.raises(ValueError, match="missing_cte"):
        _materialize_ctes(sql, "missing_cte")
    # newline between name and AS ( — the exact drift shape flagged
    with pytest.raises(ValueError, match="'c'"):
        _materialize_ctes("WITH c\nAS (SELECT 1) SELECT * FROM c", "c")


def test_scoped_checkpoint_releases_only_its_own_blocks(spark):
    """release() must unpersist exactly the checkpoint's RDD and leave a
    concurrently persisted frame's blocks alone (ADVICE r9, ckpt.py: the
    old context-wide snapshot diff could sweep up unrelated persists)."""
    from azure_func_forem_data_etl_spark.operators.ckpt import (
        persistent_rdd_ids,
        scoped_checkpoint,
    )

    bystander = spark.range(100).persist()
    bystander.count()
    base = persistent_rdd_ids(bystander)
    ckpt, release = scoped_checkpoint(spark.range(50).selectExpr("id * 2 AS x"))
    created = persistent_rdd_ids(ckpt) - base
    assert len(created) == 1
    assert ckpt.count() == 50
    release()
    after = persistent_rdd_ids(ckpt)
    assert created.isdisjoint(after), "checkpoint blocks must be released"
    assert base <= after, "bystander persist must survive release()"
    release()  # idempotent
    bystander.unpersist(True)


def test_session_bounce_exact_micros(spark, fractional_gap_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["session_bounce_rate_daily"]
    df = q.fn(spark, fractional_gap_sf)
    pdf = df.toPandas()
    # 4 sessions on one day, the two singleton {C} sessions are bounces
    assert len(pdf) == 1
    assert int(pdf.n_sessions.iloc[0]) == 4
    assert int(pdf.n_bounces.iloc[0]) == 2
    assert_matches_oracle(df, q.oracle, fractional_gap_sf)
