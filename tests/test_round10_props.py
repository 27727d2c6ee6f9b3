"""Triple-vote property tests for the round-8 statistical family
(r9 VERDICT ask #4): Kaplan-Meier, Croston, Holt, Holt-Winters, one-way
ANOVA, and isotonic PAV each get the guarantee the round-9 operators
already have — on random inputs the Spark plan, the registered DuckDB
oracle, and an INDEPENDENT Python reference (different algorithm or at
least a from-scratch replay of the exact arithmetic contract) must all
agree bit-for-bit."""

from __future__ import annotations

import datetime as dt
import math
import random
from decimal import ROUND_HALF_UP, Decimal

import pytest

from tests.oracle import assert_matches_oracle

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
_T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _q(name):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    return load_all()[name]


def _q6(v: float) -> float:
    """floor-quantize to 6dp — the repo's midpoint-free output contract."""
    return math.floor(v * 1e6) / 1e6


def _round_half_up(v: float, digits: int) -> float:
    """Replicate Spark's F.round on DOUBLE (BigDecimal.valueOf == repr
    shortest, then HALF_UP) — Python's built-in round is half-even."""
    q = Decimal(1).scaleb(-digits) if digits > 0 else Decimal(1)
    return float(Decimal(repr(v)).quantize(q, rounding=ROUND_HALF_UP))


def _daily_rev(rows):
    """Day -> exact-decimal revenue as ONE double (the dsum contract:
    integer ten-thousandths summed exactly, a single /10^4 division)."""
    per = {}
    for _, ts, _, _, v, _ in rows:
        d = ts.date()
        per[d] = per.get(d, 0) + round(v * 10_000)
    return {d: s / 10_000 for d, s in sorted(per.items())}


# ---------------------------------------------------------------------------
# Kaplan-Meier


@pytest.mark.parametrize("seed", [0, 1])
def test_kaplan_meier_random_activity_triple_vote(spark, tmp_path, seed):
    """Spark reverse-cumsum fold == DuckDB recursive HUGEINT replay ==
    direct at-risk recount (n_at_risk counted per step from the raw span
    list, not via the cumulative trick) on random user activity spans."""
    from azure_func_forem_data_etl_spark.operators.temporal import (
        _KM_SCALE,
        KM_CHURN_GAP_DAYS,
    )

    rng = random.Random(seed)
    spans = {}
    for u in range(1, 15):
        f = rng.randint(0, 30)
        spans[u] = (f, f + rng.randint(0, 25))
    rows, eid = [], 0
    for u, (f, l) in spans.items():
        for d in {f, l, rng.randint(f, l)}:
            rows.append((eid, _T0 + dt.timedelta(days=d, hours=3), u, "view", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    horizon = max(l for _, l in spans.values())
    per = [
        (l - f, 1 if horizon - l >= KM_CHURN_GAP_DAYS else 0)
        for f, l in spans.values()
    ]
    expect, s = {}, _KM_SCALE
    for t in sorted({t for t, _ in per}):
        d = sum(o for tt, o in per if tt == t and o)
        if d == 0:
            continue
        n_risk = sum(1 for tt, _ in per if tt >= t)  # direct recount
        s = (s * (n_risk - d)) // n_risk
        expect[t] = (n_risk, d, s / _KM_SCALE)
    q = _q("kaplan_meier_survival")
    sf = str(tmp_path)
    got = {
        r["duration_days"]: (r["n_at_risk"], r["n_churned"], r["survival"])
        for r in q.fn(spark, sf).collect()
    }
    assert got == expect
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


# ---------------------------------------------------------------------------
# Croston


@pytest.mark.parametrize("seed", [0, 1])
def test_croston_random_demand_triple_vote(spark, tmp_path, seed):
    """Spark driver fold == DuckDB recursive IEEE replay == from-scratch
    Python recurrence on a random intermittent demand series (ties on
    the most-shipped part broken by lowest key, as registered)."""
    from azure_func_forem_data_etl_spark.operators.temporal import CROSTON_ALPHA

    rng = random.Random(seed)
    rows = []
    for k in range(400):
        part = rng.randint(1, 6)
        rows.append(
            (
                k,
                part,
                float(rng.randint(1, 50)),
                _T0 + dt.timedelta(days=rng.randint(0, 45), hours=rng.randint(0, 23)),
            )
        )
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint, l_quantity double, l_shipdate timestamp"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    counts = {}
    for _, p, _, _ in rows:
        counts[p] = counts.get(p, 0) + 1
    tgt = min((p for p in counts), key=lambda p: (-counts[p], p))
    daily = {}
    for _, p, qty, ts in rows:
        if p == tgt:
            daily[ts.date()] = daily.get(ts.date(), 0.0) + qty
    ship = sorted(daily.items())
    a = CROSTON_ALPHA
    z = p_st = prev = None
    for day, qty in ship:
        if prev is None:
            z, p_st = qty, 1.0
        else:
            z = a * qty + (1.0 - a) * z
            p_st = a * float((day - prev).days) + (1.0 - a) * p_st
        prev = day
    q = _q("croston_intermittent_demand")
    sf = str(tmp_path)
    row = q.fn(spark, sf).collect()[0]
    assert row["part_key"] == tgt
    assert row["n_days"] == (ship[-1][0] - ship[0][0]).days + 1
    assert row["n_demand_days"] == len(ship)
    assert row["demand_size_z"] == _q6(z)
    assert row["interval_p"] == _q6(p_st)
    assert row["croston_forecast"] == _q6(z / p_st)
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


# ---------------------------------------------------------------------------
# Holt / Holt-Winters


def _random_events(rng, n_users=10, n_events=140, span_days=20):
    types = ["view", "click", "purchase", "signup", "error"]
    return [
        (
            eid,
            _T0 + dt.timedelta(minutes=rng.randint(0, 60 * 24 * span_days)),
            rng.randint(1, n_users),
            rng.choice(types),
            round(rng.uniform(0.5, 200.0), 2),
            "{}",
        )
        for eid in range(n_events)
    ]


@pytest.mark.parametrize("seed", [0, 1])
def test_holt_linear_random_series_triple_vote(spark, tmp_path, seed):
    from azure_func_forem_data_etl_spark.operators.temporal import (
        HOLT_ALPHA,
        HOLT_BETA,
    )

    rng = random.Random(seed)
    rows = _random_events(rng)
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    a, g = HOLT_ALPHA, HOLT_BETA
    expect, l, b = {}, None, 0.0
    for day, x in _daily_rev(rows).items():
        if l is None:
            l = x
        else:
            l_new = a * x + (1.0 - a) * (l + b)
            b = g * (l_new - l) + (1.0 - g) * b
            l = l_new
        expect[day.isoformat()] = (x, _q6(l), _q6(b), _q6(l + b))
    q = _q("holt_linear_forecast")
    sf = str(tmp_path)
    got = {
        r["day"]: (r["rev"], r["level"], r["trend"], r["forecast_next"])
        for r in q.fn(spark, sf).collect()
    }
    assert got == expect
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


@pytest.mark.parametrize("seed", [0, 1])
def test_holt_winters_random_series_triple_vote(spark, tmp_path, seed):
    from azure_func_forem_data_etl_spark.operators.temporal import (
        HW_ALPHA,
        HW_BETA,
        HW_GAMMA,
        HW_PERIOD,
    )

    rng = random.Random(seed + 3)
    rows = _random_events(rng, n_events=200, span_days=24)
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    daily = _daily_rev(rows)
    days = list(daily)
    xs = [daily[d] for d in days]
    m = HW_PERIOD
    assert len(xs) > m, "need more than one period of distinct days"
    # seed: exact first-week decimal sum, then two correctly-rounded
    # double divisions (mirrors CAST(SUM(decimal) AS DOUBLE) / 7)
    scaled = sum(round(x * 10_000) for x in xs[:m])
    l = (scaled / 10_000) / m
    b = 0.0
    sl = [x - l for x in xs[:m]]
    a, g, c = HW_ALPHA, HW_BETA, HW_GAMMA
    expect = {}
    for t in range(m, len(xs)):
        x = xs[t]
        s_old = sl.pop(0)
        l_new = a * (x - s_old) + (1.0 - a) * (l + b)
        b = g * (l_new - l) + (1.0 - g) * b
        s_new = c * (x - l_new) + (1.0 - c) * s_old
        sl.append(s_new)
        l = l_new
        expect[days[t].isoformat()] = (x, _q6(l), _q6(b), _q6(s_new))
    q = _q("holt_winters_seasonal")
    sf = str(tmp_path)
    got = {
        r["day"]: (r["rev"], r["level"], r["trend"], r["seasonal"])
        for r in q.fn(spark, sf).collect()
    }
    assert got == expect
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


# ---------------------------------------------------------------------------
# one-way ANOVA


@pytest.mark.parametrize("seed", [0, 1])
def test_anova_random_orders_triple_vote(spark, tmp_path, seed):
    """Spark decimal partials == DuckDB == Python exact-integer moments
    (cents / ten-thousandths of a squared cent) pushed through the same
    double + HALF_UP rounding chain."""
    rng = random.Random(seed)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rows = [
        (
            k,
            rng.randint(1, 25),
            rng.choice("OFP"),
            round(rng.uniform(900.0, 300000.0), 2),
            _T0 + dt.timedelta(hours=rng.randint(0, 24 * 300)),
            rng.choice(prios),
        )
        for k in range(1, 161)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    groups = {}
    for *_, price, _, prio in rows:
        cents = round(price * 100)  # exact decimal(18,2) in integer cents
        n, s, qq = groups.get(prio, (0, 0, 0))
        groups[prio] = (n + 1, s + cents, qq + cents * cents)
    n_tot = sum(n for n, _, _ in groups.values())
    k = len(groups)
    m = (sum(s for _, s, _ in groups.values()) / 100) / n_tot
    ssb = ssw = 0
    for n, s, qq in groups.values():
        m_i = (s / 100) / n
        ssb += int(
            Decimal(repr(n * (m_i - m) * (m_i - m))).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )
        ssw += int(
            Decimal(repr(qq / 10_000 - (s / 100) * (s / 100) / n)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )
    q = _q("anova_f_groups")
    sf = str(tmp_path)
    row = q.fn(spark, sf).collect()[0]
    assert (row["k_groups"], row["n_total"]) == (k, n_tot)
    assert row["ssb"] == float(ssb) and row["ssw"] == float(ssw)
    assert row["f_stat"] == _round_half_up(
        (float(ssb) / (k - 1)) / (float(ssw) / (n_tot - k)), 6
    )
    assert row["eta_sq"] == _round_half_up(float(ssb) / (float(ssb) + float(ssw)), 6)
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


# ---------------------------------------------------------------------------
# isotonic PAV


@pytest.mark.parametrize("seed", [0, 1])
def test_isotonic_pav_random_bins_triple_vote(spark, tmp_path, seed):
    """Spark's PAV stack fold == DuckDB's minimax SQL == a from-scratch
    Python MINIMAX (max over k<=i of min over j>=i of block rate) — the
    standard theorem says they coincide, so the two genuinely different
    algorithms voting with the SQL is the strongest check available."""
    from azure_func_forem_data_etl_spark.operators.evaluation import (
        ISO_BIN_DECIMALS,
        POS_LABEL,
    )

    rng = random.Random(seed)
    step = 10 ** (-ISO_BIN_DECIMALS)
    rows = []
    for vid in range(260):
        score = rng.randint(0, 40) * step  # already at the bin grain
        rows.append((vid, [score, rng.uniform(-1, 1)], rng.choice([0, 1])))
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    bins = {}
    for _, emb, label in rows:
        key = round(emb[0] / step)  # integer bin id (scores are on-grain)
        n, p = bins.get(key, (0, 0))
        bins[key] = (n + 1, p + (1 if label == POS_LABEL else 0))
    keys = sorted(bins)
    n_arr = [bins[k][0] for k in keys]
    p_arr = [bins[k][1] for k in keys]
    nb = len(keys)

    def block_rate(lo, hi):  # inclusive bin range
        return sum(p_arr[lo : hi + 1]) / sum(n_arr[lo : hi + 1])

    expect = {}
    for i, key in enumerate(keys):
        fit = max(
            min(block_rate(lo, hi) for hi in range(i, nb)) for lo in range(0, i + 1)
        )
        expect[key] = (n_arr[i], p_arr[i], fit)
    q = _q("isotonic_calibration_pav")
    sf = str(tmp_path)
    got = {
        round(r["score_b"] / step): (r["n_rows"], r["n_pos"], r["isotonic_rate"])
        for r in q.fn(spark, sf).collect()
    }
    assert got == expect
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)
