"""Regression tests for the round-12 ADVICE fixes: each test plants the
exact divergence shape the r11 advisor flagged and asserts Spark and the
registered DuckDB oracle agree on it (the driver fixtures never produce
these shapes, which is why they survived eleven rounds).

Shapes covered:
1. theta_sketch_setops: a lexicographically-FIRST event type that occurs
   only on anonymous (NULL user_id) traffic — pre-fix the oracle picked
   it from the unfiltered universe while Spark picked from the
   identified-user universe, so type_a/type_b and every set count
   diverged; plus a NULL event_type (Spark sorts NULLS FIRST, DuckDB
   NULLS LAST) that must be excluded symmetrically.
2. attribution_multi_touch: at-least-once re-delivery of an event_id
   with KEY DRIFT — two rows tying on (ts, value) but differing in
   user_id — must pick one total-ordered representative on both engines
   (user_id joined the first-write-wins ORDER BY, NULLS FIRST pinned).
3. embedding_dim_stats: a double component in the open band
   [1e4 - ulp, 1e4) passes the |x| < 1e4 domain bound but 9dp-rounds to
   exactly 10000.000000000, which overflows a DECIMAL(13,9) quantizer —
   the r12 ADVICE latent trap, now held by DECIMAL(14,9) on both engines.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from tests.oracle import assert_matches_oracle

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _load(name):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    return load_all()[name]


# ---------------------------------------------------------------------------
# 1. theta sketch type pick: identified-user universe on BOTH engines


@pytest.fixture(scope="module")
def anon_first_type_sf(spark, tmp_path_factory):
    """'aaa_prelogin' sorts lexicographically FIRST but occurs only with
    NULL user_id (pre-login pageviews); a NULL event_type row rides along
    with an identified user.  The two types both engines must agree on
    are ('click', 'view')."""
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for et, uid, n in [
        ("aaa_prelogin", None, 6),  # anonymous-only, lexicographic first
        (None, 7, 2),               # NULL type with an identified user
        ("click", 1, 4),
        ("click", 2, 3),
        ("view", 2, 5),
        ("view", 3, 2),
        ("zzz_late", 4, 1),         # identified but outside the first two
    ]:
        for i in range(n):
            rows.append((eid, t0 + dt.timedelta(minutes=eid), uid, et, 1.0, "{}"))
            eid += 1
    d = tmp_path_factory.mktemp("anonfirst")
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_theta_type_pick_skips_anonymous_only_types(spark, anon_first_type_sf):
    q = _load("theta_sketch_setops")
    df = q.fn(spark, anon_first_type_sf)
    assert_matches_oracle(df, q.oracle, anon_first_type_sf)
    row = df.collect()[0]
    # the anonymous-only and NULL types are skipped on BOTH engines
    assert (row["type_a"], row["type_b"]) == ("click", "view")
    assert row["distinct_a"] == 2.0 and row["distinct_b"] == 2.0
    assert row["inter_est"] == 1.0  # user 2 did both


# ---------------------------------------------------------------------------
# 2. attribution first-write-wins under key drift (tie on ts+value)


@pytest.fixture(scope="module")
def key_drift_events_sf(spark, tmp_path_factory):
    """event_id 100 (a purchase) is re-delivered with the SAME (ts, value)
    but a drifted user_id (2 vs 1); event_id 10 (a click) likewise.  Both
    users own clicks inside the 24h window, so whichever representative
    wins changes the join result — the pick must be the (ts, value,
    user_id) total-order minimum on both engines."""
    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        # clicks for user 1 and user 2 inside the window
        (10, t0 - dt.timedelta(hours=2), 2, "click", 1.0, "{}"),   # drifted dup
        (10, t0 - dt.timedelta(hours=2), 1, "click", 1.0, "{}"),   # winner (uid 1)
        (11, t0 - dt.timedelta(hours=3), 1, "click", 1.0, "{}"),
        (12, t0 - dt.timedelta(hours=4), 2, "click", 1.0, "{}"),
        # the purchase, re-delivered with key drift tying on (ts, value)
        (100, t0, 2, "purchase", 60.0, "{}"),
        (100, t0, 1, "purchase", 60.0, "{}"),   # winner (uid 1)
        # an unrelated clean purchase for user 2
        (101, t0 + dt.timedelta(hours=1), 2, "purchase", 30.0, "{}"),
    ]
    d = tmp_path_factory.mktemp("keydrift")
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_attribution_key_drift_total_order(spark, key_drift_events_sf):
    q = _load("attribution_multi_touch")
    df = q.fn(spark, key_drift_events_sf)
    assert_matches_oracle(df, q.oracle, key_drift_events_sf)
    rows = {r["purchase_id"]: r for r in df.collect()}
    # purchase 100 resolved to user 1 (total-order min), credited to
    # user 1's clicks only: ids 10 and 11 -> 2 touches, 30.0 each
    assert rows[100]["user_id"] == 1
    assert rows[100]["n_touches"] == 2
    assert rows[100]["first_touch_id"] == 11  # earliest: t0-3h
    assert rows[100]["last_touch_id"] == 10   # latest: t0-2h
    assert rows[100]["credit_per_touch"] == pytest.approx(30.0)
    # purchase 101 (user 2): clicks 10 deduped AWAY from user 2, so only 12
    assert rows[101]["n_touches"] == 1


# ---------------------------------------------------------------------------
# 3. embedding_dim_stats quantizer holds the [1e4-ulp, 1e4) rounding band


@pytest.fixture(scope="module")
def boundary_component_sf(spark, tmp_path_factory):
    """A double component just below the 1e4 domain bound whose 9dp
    rounding is exactly 10000.000000000 — representable in DECIMAL(14,9)
    but not DECIMAL(13,9).  Written as array<double> (the float32 tables
    cannot reach the band; the trap is latent until the column widens)."""
    near = math.nextafter(1e4, 0.0)  # 9999.999999999998..., rounds to 1e4
    rows = [
        (1, [near, -1.5, 0.25, 2.0], 0),
        (2, [-near, 3.0, -0.125, 1.0], 1),
        (3, [1.0, 2.0, 3.0, 4.0], 0),
        (4, [1e7, 0.0, 0.0, 0.0], 1),  # out of domain: excluded wholesale
    ]
    d = tmp_path_factory.mktemp("nearband")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_dim_stats_quantizer_holds_1e4_rounding_band(
    spark, boundary_component_sf
):
    q = _load("embedding_dim_stats")
    df = q.fn(spark, boundary_component_sf)
    assert_matches_oracle(df, q.oracle, boundary_component_sf)
    pdf = df.toPandas().set_index("dim")
    # vector 4 excluded wholesale; dim 0 mean over {near, -near, 1.0}
    assert pdf.loc[0, "n"] == 3
    assert pdf.loc[0, "mean"] == pytest.approx(1.0 / 3, abs=1e-6)
    # the raw (unquantized) min/max still see the sub-1e4 double
    assert pdf.loc[0, "mx"] == pytest.approx(9999.999999999998)
