"""Regression tests for the round-8 ADVICE fixes: each test plants the
exact degenerate shape the advisor flagged and asserts Spark and the
registered DuckDB oracle agree on it (not just on the fixtures, where the
shape never occurs)."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.oracle import assert_matches_oracle, run_oracle

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _write_events(spark, d, rows):
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_markov_stationary_absorbing_state(spark, tmp_path):
    """An event type appearing ONLY as next_type (every user's final
    event) has no outgoing transitions; the fold must still carry its pi
    mass (implicit self-loop) instead of raising KeyError, and the oracle
    must replay the identical recurrence (ADVICE r7, temporal.py)."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # u1: A->B->Z ; u2: B->A->Z — Z is absorbing (never a source)
    for uid, seq in ((1, "ABZ"), (2, "BAZ")):
        for i, et in enumerate(seq):
            rows.append((eid, t0 + dt.timedelta(minutes=i), uid, et, 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    q = load_all()["markov_stationary_event_mix"]
    df = q.fn(spark, sf)
    pdf = df.toPandas()
    assert set(pdf["event_type"]) == {"A", "B", "Z"}
    # mass drains into the absorbing state and is conserved at 6dp
    probs = dict(zip(pdf["event_type"], pdf["stationary_prob"]))
    assert probs["Z"] > probs["A"] and probs["Z"] > probs["B"]
    assert abs(sum(probs.values()) - 1.0) < 5e-6
    assert_matches_oracle(df, q.oracle, sf)


def test_theil_sen_single_day_returns_no_rows(spark, tmp_path):
    """Degenerate single-day input: the slopes set is empty, so BOTH
    engines return zero rows (the oracle previously returned a 1-row
    NULL-slope aggregate — ADVICE r7)."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    t0 = dt.datetime(2024, 3, 5)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "view", float(i), "{}")
        for i in range(5)
    ]
    sf = _write_events(spark, tmp_path, rows)
    q = load_all()["theil_sen_daily_trend"]
    assert q.fn(spark, sf).count() == 0
    assert len(run_oracle(q.oracle, sf)) == 0


@pytest.fixture()
def tied_gap_sf(spark, tmp_path):
    """Embeddings whose KS gap numerator ties across two bins: scores
    neg@0.1, pos@0.2, neg@0.3 give |cp*tq - cq*tp| = 1 at BOTH 0.1 and
    0.2 — the unspecified-MIN_BY shape ADVICE r7 flagged."""
    from azure_func_forem_data_etl_spark.operators.evaluation import POS_LABEL

    neg = POS_LABEL + 1
    rows = [
        (1, [0.1, 0.0], neg),
        (2, [0.2, 0.0], POS_LABEL),
        (3, [0.3, 0.0], neg),
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_ks_threshold_tie_breaks_low(spark, tied_gap_sf):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["eval_ks_separation"]
    df = q.fn(spark, tied_gap_sf)
    row = df.collect()[0]
    assert row["ks_threshold"] == pytest.approx(0.1)
    assert_matches_oracle(df, q.oracle, tied_gap_sf)


def test_kendall_tau_counts_both_tied_pairs(spark, tmp_path):
    """tau-b tie terms follow scipy's n1/n2 convention: a day pair tied on
    BOTH variables counts toward tx AND ty (ADVICE r7).  Two identical
    days (same revenue, same count) must therefore shrink both
    denominator factors."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    t0 = dt.datetime(2024, 6, 1)
    rows = []
    eid = 0
    # day1 and day2 identical (2 events, value 3.0+4.0); day3 differs
    for d, vals in ((0, (3.0, 4.0)), (1, (3.0, 4.0)), (2, (1.0,))):
        for v in vals:
            rows.append((eid, t0 + dt.timedelta(days=d, minutes=eid), 1, "view", v, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    q = load_all()["kendall_tau_daily"]
    df = q.fn(spark, sf)
    pdf = df.toPandas()
    # pairs: (d1,d2) both-tied; (d1,d3) & (d2,d3) concordant (rev and
    # n_ev drop together on day 3)
    assert int(pdf["n_pairs"][0]) == 3
    # tx = ty = 1 (the both-tied pair), so tau_b = 2/sqrt(2*2) = 1.0;
    # under the OLD convention tx = ty = 0 and tau_b = 2/3
    assert pdf["tau_b"][0] == pytest.approx(1.0)
    assert_matches_oracle(df, q.oracle, sf)
