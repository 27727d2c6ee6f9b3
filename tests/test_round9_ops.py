"""Planted-shape tests for the round-9 operator additions.

1. ``window_funnel_steps`` — ClickHouse-style windowFunnel with
   first-touch anchoring: each step extends from the EARLIEST qualifying
   predecessor and the whole chain must land within 24h of the user's
   first step-1 event.  Plant users that stress the boundary (step
   exactly at t1+24h counts, step after it doesn't), the ordering rule
   (a click BEFORE the first view doesn't count), and the anchor rule
   (a second view never re-anchors the window).
2. ``shingle_containment_pairs`` — Broder containment on 4-gram
   shingles: a verbatim quote is containment 1.0 regardless of the host
   document's length (where Jaccard would be ~0), and the >=50%
   threshold is an integer ppm comparison with no float round-trip.
"""

from __future__ import annotations

import datetime as dt

from tests.oracle import assert_matches_oracle

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

_DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ev(eid, user, etype, minutes):
    return (eid, _T0 + dt.timedelta(minutes=minutes), user, etype, 1.0, "{}")


def test_window_funnel_planted_depths(spark, tmp_path):
    """Hand-computed funnel histogram over seven planted users:

    u1 view(0) click(+10m) purchase(+20m)          -> depth 3
    u2 view(0) click(+10m) purchase(+25h)          -> depth 2 (outside window)
    u3 click(0) purchase(+10m)                     -> depth 0 (never entered)
    u4 view(0)                                     -> depth 1
    u5 scroll(0)                                   -> depth 0 (non-step type)
    u6 click(-10m) view(0) click(+10m) purchase(+20m) -> depth 3
       (the pre-view click must NOT satisfy step 2)
    u7 view(0) click(+10m) view(+30h) purchase(+30h10m) -> depth 2
       (the second view never re-anchors the 24h window)
    u8 view(0) purchase(exactly +24h after a click at +1m) -> depth 3
       (<= boundary is inclusive)
    """
    rows = [
        _ev(0, 1, "view", 0), _ev(1, 1, "click", 10), _ev(2, 1, "purchase", 20),
        _ev(3, 2, "view", 0), _ev(4, 2, "click", 10),
        _ev(5, 2, "purchase", 25 * 60),
        _ev(6, 3, "click", 0), _ev(7, 3, "purchase", 10),
        _ev(8, 4, "view", 0),
        _ev(9, 5, "scroll", 0),
        _ev(10, 6, "click", -10), _ev(11, 6, "view", 0),
        _ev(12, 6, "click", 10), _ev(13, 6, "purchase", 20),
        _ev(14, 7, "view", 0), _ev(15, 7, "click", 10),
        _ev(16, 7, "view", 30 * 60), _ev(17, 7, "purchase", 30 * 60 + 10),
        _ev(18, 8, "view", 0), _ev(19, 8, "click", 1),
        _ev(20, 8, "purchase", 24 * 60),
    ]
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    sf = str(tmp_path)
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["window_funnel_steps"]
    got = {r["funnel_depth"]: r["n_users"] for r in q.fn(spark, sf).collect()}
    assert got == {0: 2, 1: 1, 2: 2, 3: 3}
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


def test_containment_quote_vs_jaccard(spark, tmp_path):
    """doc 2 is an 8-word verbatim quote inside the 40-word doc 1:
    containment 1.0 (1,000,000 ppm) even though Jaccard is ~5/37.  doc 3
    shares one 4-word phrase with doc 2 (1 of its 5 shingles = 20%) —
    below the 50% gate, so only the (1,2) pair survives."""
    quote = "the quick brown fox jumps over lazy dogs"
    host = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        + quote
        + " lambda mu nu xi omicron pi rho sigma tau upsilon "
        "phi chi psi omega one two"
    )
    partial = "the quick brown fox sat very still today"
    rows = [
        (1, host, "en", "web", len(host)),
        (2, quote, "en", "web", len(quote)),
        (3, partial, "en", "web", len(partial)),
    ]
    spark.createDataFrame(rows, _DOCS_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    sf = str(tmp_path)
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["shingle_containment_pairs"]
    got = {(r["doc_a"], r["doc_b"]): r for r in q.fn(spark, sf).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)]["n_inter"] == 5  # 8-word quote -> 5 distinct 4-grams
    assert got[(1, 2)]["containment_ppm"] == 1_000_000
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


def test_containment_exact_half_boundary(spark, tmp_path):
    """Integer threshold at exactly 50%: doc 5 has 4 shingles, 2 of them
    inside doc 4 -> 2*1e6 >= 5e5*4 holds with equality, ppm = 500000."""
    # doc 5: 7 words -> 4 shingles; its first 5 words (2 shingles) open doc 4.
    d5 = "a b c d e f g"
    d4 = "a b c d e x y z w v u t"
    rows = [
        (4, d4, "en", "web", len(d4)),
        (5, d5, "en", "web", len(d5)),
    ]
    spark.createDataFrame(rows, _DOCS_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    sf = str(tmp_path)
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["shingle_containment_pairs"]
    rows_out = q.fn(spark, sf).collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert (r["doc_a"], r["doc_b"], r["n_inter"], r["containment_ppm"]) == (
        4, 5, 2, 500_000,
    )
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


# ---------------------------------------------------------------------------
# poisson_bootstrap_totals / conformal_interval_coverage / session_path_topk

_ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate date, o_orderpriority string, "
    "o_clerk string, o_shippriority int, o_comment string"
)


def _order(key, price, pri="1-URGENT"):
    return (key, 1, "O", price, dt.date(2024, 1, 1), pri, "c", 0, "")


def test_poisson_bootstrap_weights_replay_python(spark, tmp_path):
    """The Spark aggregate must equal a pure-Python replay of the weight
    function: w(key, b) = #{k : xxh64_chain(key, b) >= T_k} with the
    frozen Poisson(1) u64 thresholds.  Five rows, exact decimal totals."""
    from azure_func_forem_data_etl_spark.functions.xxh64_sql import (
        SPARK_HASH_SEED,
        xxh64_long,
    )
    from azure_func_forem_data_etl_spark.operators.evaluation import (
        BOOT_B,
        _POIS1_CDF_U64,
    )
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    prices = {11: 100.25, 12: 200.50, 13: 300.75, 14: 400.00, 15: 500.10}
    rows = [_order(k, p) for k, p in prices.items()]
    spark.createDataFrame(rows, _ORDERS_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    sf = str(tmp_path)

    def w(key, b):
        h = xxh64_long(b, xxh64_long(key, SPARK_HASH_SEED))
        return sum(1 for t in _POIS1_CDF_U64 if h >= t)

    expect = {0: (5, round(sum(prices.values()), 4))}
    for b in range(1, BOOT_B + 1):
        ws = {k: w(k, b) for k in prices}
        expect[b] = (
            sum(ws.values()),
            round(sum(ws[k] * prices[k] for k in prices), 4),
        )

    q = load_all()["poisson_bootstrap_totals"]
    got = {
        r["replicate"]: (r["n_eff"], round(r["boot_total"], 4))
        for r in q.fn(spark, sf).collect()
    }
    assert got == expect
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


def test_conformal_small_cal_infinite_interval(spark, tmp_path):
    """Finite-sample rule: with n_cal = 2, k = ceil(0.9 * 3) = 3 > 2, so
    q_hat is NULL and every test row counts as covered.  Split membership
    is a pure function of xxhash64(o_orderkey) — pick keys per split by
    replaying the hash in Python."""
    from azure_func_forem_data_etl_spark.functions.xxh64_sql import (
        SPARK_HASH_SEED,
        to_signed,
        xxh64_long,
    )
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    def s(key):
        return to_signed(xxh64_long(key, SPARK_HASH_SEED)) % 10

    train, cal, test = [], [], []
    key = 1
    while min(len(train), len(cal) // 2 if cal else 0) >= 0 and (
        len(train) < 5 or len(cal) < 2 or len(test) < 3
    ):
        b = s(key)
        if b <= 6 and len(train) < 5:
            train.append(key)
        elif b in (7, 8) and len(cal) < 2:
            cal.append(key)
        elif b == 9 and len(test) < 3:
            test.append(key)
        key += 1
    rows = (
        [_order(k, 100.0 + i) for i, k in enumerate(train)]
        + [_order(k, 200.0) for k in cal]
        + [_order(k, 10_000.0) for k in test]  # far outside any residual
    )
    spark.createDataFrame(rows, _ORDERS_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    sf = str(tmp_path)
    q = load_all()["conformal_interval_coverage"]
    out = q.fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_train"] == 5 and r["n_cal"] == 2 and r["n_test"] == 3
    assert r["q_hat"] is None
    assert r["n_covered"] == 3 and r["coverage_ppm"] == 1_000_000
    # train prices 100..104 -> lower median = 102
    assert r["pred_median"] == 102.0
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


def test_session_path_truncation_and_gaps(spark, tmp_path):
    """u1 has two sessions split by a 31-min gap (paths a>b>c and a>b);
    u2 has one 7-event session truncated to its first 5 types.  Ties on
    ts inside u2 resolve by event_id."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    rows = [
        _ev(0, 1, "a", 0), _ev(1, 1, "b", 5), _ev(2, 1, "c", 10),
        _ev(3, 1, "a", 41), _ev(4, 1, "b", 45),
    ]
    t2 = [(_T0 + dt.timedelta(minutes=m)) for m in range(7)]
    rows += [
        (10, t2[0], 2, "x", 1.0, "{}"),
        (11, t2[0], 2, "y", 1.0, "{}"),  # same ts as event 10: id order
        (12, t2[1], 2, "z", 1.0, "{}"),
        (13, t2[2], 2, "x", 1.0, "{}"),
        (14, t2[3], 2, "y", 1.0, "{}"),
        (15, t2[4], 2, "z", 1.0, "{}"),
        (16, t2[5], 2, "x", 1.0, "{}"),
    ]
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    sf = str(tmp_path)
    q = load_all()["session_path_topk"]
    got = {r["path"]: r["n_sessions"] for r in q.fn(spark, sf).collect()}
    assert got == {"a>b>c": 1, "a>b": 1, "x>y>z>x>y": 1}
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


# ---------------------------------------------------------------------------
# graph_sssp_weighted / cuped_adjusted_lift


def test_sssp_planted_weights_and_tiebreak(spark, tmp_path):
    """Graph: (1,2) support 2 (w=500000), (1,4) support 2, (2,3) support 4
    (w=250000).  Degrees tie 1 and 2 at 2 — the smaller id (1) must win
    the start tie-break.  Hand-computed: d(1)=0, d(2)=d(4)=500000,
    d(3)=750000 via 1->2->3."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    baskets = [(1, [1, 2]), (2, [1, 2]), (3, [1, 4]), (4, [1, 4])] + [
        (o, [2, 3]) for o in (5, 6, 7, 8)
    ]
    rows = [(o, p) for o, parts in baskets for p in parts]
    spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    sf = str(tmp_path)
    q = load_all()["graph_sssp_weighted"]
    got = {r["id"]: r["dist_ppm"] for r in q.fn(spark, sf).collect()}
    assert got == {1: 0, 2: 500_000, 4: 500_000, 3: 750_000}
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


def test_cuped_planted_perfect_covariate(spark, tmp_path):
    """When post = 2 * pre exactly for every user, theta = 2, rho_sq = 1,
    and the adjusted means collapse to the grand post mean for BOTH arms
    (all arm differences are explained by the pre-period covariate).
    Arm membership is replayed in Python to plant two users per arm."""
    from azure_func_forem_data_etl_spark.functions.xxh64_sql import (
        SPARK_HASH_SEED,
        to_signed,
        xxh64_long,
    )
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    def arm(uid):
        return to_signed(xxh64_long(uid, SPARK_HASH_SEED)) % 2

    a0, a1, uid = [], [], 1
    while len(a0) < 2 or len(a1) < 2:
        (a0 if arm(uid) == 0 else a1)[:] += [uid] if (
            (arm(uid) == 0 and len(a0) < 2) or (arm(uid) == 1 and len(a1) < 2)
        ) else []
        uid += 1
    users = {a0[0]: 10.0, a0[1]: 20.0, a1[0]: 30.0, a1[1]: 40.0}
    rows, eid = [], 0
    for u, pre in users.items():
        rows.append((eid, _T0, u, "view", pre, "{}")); eid += 1
        rows.append(
            (eid, _T0 + dt.timedelta(hours=10), u, "view", 2 * pre, "{}")
        ); eid += 1
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    sf = str(tmp_path)
    q = load_all()["cuped_adjusted_lift"]
    got = {r["arm"]: r for r in q.fn(spark, sf).collect()}
    assert set(got) == {0, 1}
    grand_post = 2 * sum(users.values()) / 4
    for a, uids in ((0, a0), (1, a1)):
        r = got[a]
        assert r["n_users"] == 2
        assert r["theta"] == 2.0
        assert r["rho_sq"] == 1.0
        assert r["mean_pre"] == sum(users[u] for u in uids) / 2
        assert r["mean_post"] == 2 * r["mean_pre"]
        assert abs(r["adj_mean_post"] - grand_post) < 1e-6
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


# ---------------------------------------------------------------------------
# dau_mau_stickiness / setsim_prefix_filter_pairs / eb_beta_binomial_shrinkage


def test_dau_mau_interval_merge(spark, tmp_path):
    """Three planted users stress the island merge that prevents
    double-counting: u1 active Jan 1/5/20 (1 and 5 OVERLAP in the 7-day
    window — an unmerged sweep would report WAU=3 on Jan 5), u3 active
    Jan 1/9 (disjoint week islands), u2 once.  Hand-computed curve:

    day     dau  wau  mau
    Jan 1    3    3    3
    Jan 5    1    3    3   (u1 merged: NOT 1+extra from its own overlap)
    Jan 9    1    2    3
    Jan 20   1    1    3
    """
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    def day(n):
        return dt.datetime(2024, 1, n, 10, 0, 0)

    active = {1: [1, 5, 20], 2: [1], 3: [1, 9]}
    rows, eid = [], 0
    for u, days in active.items():
        for n in days:
            rows.append((eid, day(n), u, "view", 1.0, "{}")); eid += 1
            rows.append((eid, day(n), u, "click", 1.0, "{}")); eid += 1  # same-day dup
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    sf = str(tmp_path)
    q = load_all()["dau_mau_stickiness"]
    got = {r["day"]: (r["dau"], r["wau"], r["mau"]) for r in q.fn(spark, sf).collect()}
    assert got == {
        "2024-01-01": (3, 3, 3),
        "2024-01-05": (1, 3, 3),
        "2024-01-09": (1, 2, 3),
        "2024-01-20": (1, 1, 3),
    }
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


def test_prefix_filter_simjoin_planted_boundary(spark, tmp_path):
    """Bigram Jaccard hand-computed on planted docs against the existing
    PPJoin operator: identical pair 1.0, superset pair 5/6, a pair at
    EXACTLY the 0.6 threshold (3 shared of union 5 — must be admitted:
    3/5 is the correctly-rounded double 0.6, so >= holds), and a
    0.6-adjacent pair at 3/7 that must not."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    docs = [
        (0, "a b c d e f"),       # bigrams {ab,bc,cd,de,ef}
        (1, "a b c d x y"),       # inter 3, union 7 with doc0 -> 0.43, out
        (2, "a b c d e f"),       # identical to doc0
        (3, "a b c d e f g"),     # superset: inter 5, union 6 -> 0.8333
        (4, "z z z"),             # single bigram, disjoint
        (5, "p q r s t"),         # {pq,qr,rs,st}
        (6, "p q r s u"),         # inter 3, union 5 -> exactly 0.6, in
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs], _DOCS_SCHEMA
    ).write.parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    q = load_all()["prefix_filter_simjoin"]
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter_size"], r["jaccard"])
        for r in q.fn(spark, sf).collect()
    }
    assert got == {
        (0, 2): (5, 1.0),
        (0, 3): (5, 0.833333),
        (2, 3): (5, 0.833333),
        (5, 6): (3, 0.6),
    }
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


def test_eb_shrinkage_closed_form(spark, tmp_path):
    """Rates 1/4, 1/4, 3/4, 3/4 give exact moments m=0.5, v=0.0625 ->
    alpha = beta = 1.5 (c = 3) by hand; posterior means are 2.5/7 and
    4.5/7.  A second dataset with zero cross-user variance must yield
    NULL prior/shrunk columns, not a division blow-up."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    rows, eid = [], 0
    for u, k in ((1, 1), (2, 1), (3, 3), (4, 3)):
        for j in range(4):
            et = "purchase" if j < k else "view"
            rows.append((eid, _T0 + dt.timedelta(minutes=eid), u, et, 1.0, "{}"))
            eid += 1
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    sf = str(tmp_path)
    q = load_all()["eb_beta_binomial_shrinkage"]
    got = {r["user_id"]: r for r in q.fn(spark, sf).collect()}
    for u in (1, 2, 3, 4):
        assert got[u]["alpha_x1e6"] == 1_500_000
        assert got[u]["beta_x1e6"] == 1_500_000
    assert got[1]["rate_ppm"] == 250_000 and got[1]["shrunk_ppm"] == 357_142
    assert got[3]["rate_ppm"] == 750_000 and got[3]["shrunk_ppm"] == 642_857
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)

    deg = tmp_path / "deg"
    deg.mkdir()
    rows = []
    for eid, u in enumerate((1, 2, 3)):
        rows.append((eid, _T0, u, "purchase", 1.0, "{}"))
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(deg / "events.parquet")
    )
    out = {r["user_id"]: r for r in q.fn(spark, str(deg)).collect()}
    assert all(
        out[u]["shrunk_ppm"] is None and out[u]["alpha_x1e6"] is None
        for u in (1, 2, 3)
    )
    assert_matches_oracle(q.fn(spark, str(deg)), q.oracle, str(deg))


# ---------------------------------------------------------------------------
# quantile_treatment_effect


def test_qte_exact_order_statistics(spark, tmp_path):
    """Five users per hash arm with distinct single-event totals: with
    n=5 the type-1 ranks are ceil(q*5) = 2/3/4/5 for p25/50/75/90, so
    every output value is hand-checkable, including the p90 = max rule
    and the per-quantile treat-minus-control differences."""
    from azure_func_forem_data_etl_spark.functions.xxh64_sql import (
        SPARK_HASH_SEED,
        to_signed,
        xxh64_long,
    )
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    def arm(uid):
        return to_signed(xxh64_long(uid, SPARK_HASH_SEED)) % 2

    a0, a1, uid = [], [], 1
    while len(a0) < 5 or len(a1) < 5:
        if arm(uid) == 0 and len(a0) < 5:
            a0.append(uid)
        elif arm(uid) == 1 and len(a1) < 5:
            a1.append(uid)
        uid += 1
    ctrl_vals = [10.0, 20.0, 30.0, 40.0, 50.0]
    treat_vals = [15.0, 25.0, 35.0, 45.0, 95.0]
    rows, eid = [], 0
    for u, v in list(zip(a0, ctrl_vals)) + list(zip(a1, treat_vals)):
        rows.append((eid, _T0, u, "view", v, "{}")); eid += 1
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    sf = str(tmp_path)
    q = load_all()["quantile_treatment_effect"]
    got = {r["q_ppm"]: r for r in q.fn(spark, sf).collect()}
    # rank-2/3/4/5 of the sorted per-arm totals
    expect = {
        250_000: (25.0, 20.0),
        500_000: (35.0, 30.0),
        750_000: (45.0, 40.0),
        900_000: (95.0, 50.0),
    }
    assert set(got) == set(expect)
    for p, (qt, qc) in expect.items():
        r = got[p]
        assert (r["n_treat"], r["n_ctrl"]) == (5, 5)
        assert (r["q_treat"], r["q_ctrl"], r["qte"]) == (qt, qc, qt - qc)
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


# ---------------------------------------------------------------------------
# group_sequential_ab_monitor


def test_gsd_two_looks_hand_counts(spark, tmp_path):
    """Four users per hash arm, all first seen in epoch-week 1; arm-0
    converts 1 then 1 more, arm-1 converts 2 then 1 more.  Hand-checked
    cumulative counts per look; z and the OBF boundary are replayed with
    the identical IEEE-double formula; neither look crosses."""
    import math

    from azure_func_forem_data_etl_spark.functions.xxh64_sql import (
        SPARK_HASH_SEED,
        to_signed,
        xxh64_long,
    )
    from azure_func_forem_data_etl_spark.operators.evaluation import GSD_OBF_C
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    def arm(uid):
        return to_signed(xxh64_long(uid, SPARK_HASH_SEED)) % 2

    a0, a1, uid = [], [], 1
    while len(a0) < 4 or len(a1) < 4:
        (a0 if arm(uid) == 0 else a1).append(uid)
        uid += 1
    a0, a1 = a0[:4], a1[:4]
    rows, eid = [], 0

    def ev(u, et, days):
        nonlocal eid
        rows.append((eid, _T0 + dt.timedelta(days=days), u, et, 1.0, "{}"))
        eid += 1

    for u in a0 + a1:
        ev(u, "view", 0)                      # all seen in look 1
    ev(a0[0], "purchase", 1)                  # look-1 converters
    ev(a1[0], "purchase", 1)
    ev(a1[1], "purchase", 1)
    ev(a0[1], "purchase", 8)                  # look-2 converters (next
    ev(a1[2], "purchase", 8)                  # epoch week: Thu boundary)
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    sf = str(tmp_path)
    q = load_all()["group_sequential_ab_monitor"]
    got = {r["week_k"]: r for r in q.fn(spark, sf).collect()}
    assert set(got) == {1, 2}

    def z_of(cx0, cn0, cx1, cn1):
        p = (cx0 + cx1) / (cn0 + cn1)
        return (cx1 / cn1 - cx0 / cn0) / math.sqrt(
            p * (1.0 - p) * (1.0 / cn0 + 1.0 / cn1)
        )

    for k, (cx0, cx1) in {1: (1, 2), 2: (2, 3)}.items():
        r = got[k]
        assert (r["n_ctrl"], r["x_ctrl"], r["n_treat"], r["x_treat"]) == (
            4, cx0, 4, cx1,
        )
        assert r["z_x1e6"] == math.floor(z_of(cx0, 4, cx1, 4) * 1_000_000.0)
        assert r["bound_x1e6"] == math.floor(
            GSD_OBF_C * math.sqrt(2.0 / k) * 1_000_000.0
        )
        assert r["crossed"] == 0
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


# ---------------------------------------------------------------------------
# mmr_diversified_topk

_EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def test_mmr_skips_exact_twin(spark, tmp_path):
    """Three candidates tie on relevance (cos = 1/sqrt(2) to the query);
    c2 is an exact-direction twin of c1 (sim 1.0), c3 is half-similar
    (sim 0.5).  Pick 1 is the smallest-id tiebreak (c1); pick 2 must
    SKIP the twin for c3 (integer scores hand-computed:
    344,974,900,000 > 194,974,900,000); the twin only enters at pick 3.
    Pure top-k would have returned c1, c2 adjacent — the redundancy MMR
    exists to break."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # query (vec_id % 100 == 0)
        (1, [1.0, 1.0, 0.0, 0.0], 0),   # rel 707107
        (2, [2.0, 2.0, 0.0, 0.0], 0),   # exact twin of c1, rel 707107
        (3, [1.0, 0.0, 1.0, 0.0], 0),   # rel 707107, sim(c1) = 0.5
        (4, [0.0, 1.0, 1.0, 0.0], 0),   # rel 0
    ]
    spark.createDataFrame(vecs, _EMB_SCHEMA).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    sf = str(tmp_path)
    q = load_all()["mmr_diversified_topk"]
    got = {
        r["pick_rank"]: (r["vec_id"], r["rel_u"], r["score_u"])
        for r in q.fn(spark, sf).collect()
    }
    assert got == {
        1: (1, 707_107, 700_000 * 707_107),
        2: (3, 707_107, 700_000 * 707_107 - 300_000 * 500_000),
        3: (2, 707_107, 700_000 * 707_107 - 300_000 * 1_000_000),
        4: (4, 0, -300_000 * 500_000),
    }
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


# ---------------------------------------------------------------------------
# uplift_qini_deciles


def test_qini_hand_computed_curve(spark, tmp_path):
    """Ten users (five per hash arm) with distinct click-count scores
    1..10 — one user per decile, fully hand-traceable.  Treated users
    convert only in the TOP half of the score order, so the qini curve
    bows up early and flattens: the shape a real uplift score produces.
    The control arm converts only in the bottom half (negative
    increments late in the curve)."""
    from azure_func_forem_data_etl_spark.functions.xxh64_sql import (
        SPARK_HASH_SEED,
        to_signed,
        xxh64_long,
    )
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    def arm(uid):
        return to_signed(xxh64_long(uid, SPARK_HASH_SEED)) % 2

    a0, a1, uid = [], [], 1
    while len(a0) < 5 or len(a1) < 5:
        if arm(uid) == 0 and len(a0) < 5:
            a0.append(uid)
        elif arm(uid) == 1 and len(a1) < 5:
            a1.append(uid)
        uid += 1
    # interleave arms down the score order: rank i (0-based) has score 10-i
    order = [a1[0], a0[0], a1[1], a0[1], a1[2], a0[2], a1[3], a0[3], a1[4], a0[4]]
    converts = {a1[0], a1[1], a0[4], a0[3]}  # treated top-2, control bottom-2
    rows, eid = [], 0
    for i, u in enumerate(order):
        for c in range(10 - i):  # score = click count = 10 - rank
            rows.append((eid, _T0 + dt.timedelta(minutes=eid), u, "click", 1.0, "{}"))
            eid += 1
        if u in converts:
            rows.append((eid, _T0, u, "purchase", 1.0, "{}")); eid += 1
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    sf = str(tmp_path)
    q = load_all()["uplift_qini_deciles"]
    got = {r["decile"]: r for r in q.fn(spark, sf).collect()}
    assert set(got) == set(range(1, 11))
    # replay the curve: cumulative counts down the planted order
    cn_t = cx_t = cn_c = cx_c = 0
    for d, u in enumerate(order, start=1):
        if u in a1:
            cn_t += 1; cx_t += u in converts
        else:
            cn_c += 1; cx_c += u in converts
        r = got[d]
        assert (r["cn_t"], r["cx_t"], r["cn_c"], r["cx_c"]) == (
            cn_t, cx_t, cn_c, cx_c,
        )
        if cn_c > 0:
            import math
            assert r["qini_x1e6"] == math.floor(
                (cx_t - cx_c * cn_t / cn_c) * 1_000_000.0
            )
        else:
            assert r["qini_x1e6"] is None
    # the headline property: qini peaks mid-curve then falls as the
    # control-arm converters arrive in the bottom deciles
    curve = [got[d]["qini_x1e6"] for d in range(1, 11) if got[d]["qini_x1e6"] is not None]
    assert max(curve) > curve[-1]
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)
