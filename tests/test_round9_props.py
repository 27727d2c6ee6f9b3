"""Random-input property checks for the round-9 operators.

Two tiers, mirroring test_round8_stats.py's guarantee:

- Triple-vote: where a pure-Python brute force is tractable (SSSP,
  DAU/MAU, set-similarity, EB shrinkage), the Spark plan, the DuckDB
  oracle, and an independent Python reference must all agree on random
  inputs — three implementations, one answer.
- Oracle-on-random-data: for the remaining round-9 queries the DuckDB
  oracle is already an independent implementation; re-running the
  bit-exact compare on random fixtures (not just the planted shapes and
  the sf fixtures) closes the "works only on the fixture" gap.
"""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest

from tests.oracle import assert_matches_oracle

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
_DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
_T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _q(name):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    return load_all()[name]


# ---------------------------------------------------------------------------
# triple-vote tier


@pytest.mark.parametrize("seed", [0, 1])
def test_sssp_random_graphs_triple_vote(spark, tmp_path, seed):
    """Spark Bellman-Ford == DuckDB recursive replay == Python reference
    on random basket graphs (same 6-round truncation, same max-degree /
    smallest-id start rule, same 1e6 div support weights)."""
    from azure_func_forem_data_etl_spark.operators.graph import (
        EDGE_MIN_SUPPORT,
        SSSP_ROUNDS,
    )

    rng = random.Random(seed)
    rows = []
    for o in range(40):
        for p in rng.sample(range(1, 13), rng.randint(2, 4)):
            rows.append((o, p))
    spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    # Python reference
    support = {}
    baskets = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
    for parts in baskets.values():
        sp = sorted(parts)
        for i, a in enumerate(sp):
            for b in sp[i + 1 :]:
                support[(a, b)] = support.get((a, b), 0) + 1
    adj = {}
    for (a, b), s in support.items():
        if s >= EDGE_MIN_SUPPORT:
            w = 1_000_000 // s
            adj.setdefault(a, []).append((b, w))
            adj.setdefault(b, []).append((a, w))
    if not adj:
        pytest.skip("random graph produced no supported edges")
    start = max(adj, key=lambda n: (len(adj[n]), -n))
    dist = {start: 0}
    for _ in range(SSSP_ROUNDS):
        relaxed = dict(dist)
        for node, d in dist.items():
            for nb, w in adj[node]:
                if d + w < relaxed.get(nb, float("inf")):
                    relaxed[nb] = d + w
        dist = relaxed
    q = _q("graph_sssp_weighted")
    sf = str(tmp_path)
    got = {r["id"]: r["dist_ppm"] for r in q.fn(spark, sf).collect()}
    assert got == dist
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


@pytest.mark.parametrize("seed", [0, 1])
def test_dau_mau_random_activity_triple_vote(spark, tmp_path, seed):
    """Island-merged sweep == DuckDB window join == brute-force trailing
    distinct count on random user-day activity."""
    rng = random.Random(seed)
    active = {}
    for u in range(1, 9):
        active[u] = sorted(rng.sample(range(1, 61), rng.randint(1, 12)))
    rows, eid = [], 0
    for u, days in active.items():
        for d in days:
            rows.append(
                (eid, _T0 + dt.timedelta(days=d, hours=u % 24), u, "view", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    all_days = sorted({d for days in active.values() for d in days})
    expect = {}
    for d in all_days:
        dau = sum(1 for days in active.values() if d in days)
        wau = sum(
            1 for days in active.values() if any(d - 6 <= x <= d for x in days)
        )
        mau = sum(
            1 for days in active.values() if any(d - 27 <= x <= d for x in days)
        )
        day = (_T0 + dt.timedelta(days=d)).strftime("%Y-%m-%d")
        expect[day] = (dau, wau, mau, 1_000_000 * dau // wau, 1_000_000 * dau // mau)
    q = _q("dau_mau_stickiness")
    sf = str(tmp_path)
    got = {
        r["day"]: (r["dau"], r["wau"], r["mau"], r["dau_wau_ppm"], r["dau_mau_ppm"])
        for r in q.fn(spark, sf).collect()
    }
    assert got == expect
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


@pytest.mark.parametrize("seed", [0, 1])
def test_prefix_filter_simjoin_random_docs_triple_vote(spark, tmp_path, seed):
    """Prefix-filtered join == its oracle == brute-force bigram Jaccard
    on random docs salted with mutated near-copies — the zero-false-
    negative guarantee checked against an implementation with no filter
    at all.  The reference replicates Spark's HALF_UP F.round via
    Decimal so the float jaccard column compares exactly."""
    from decimal import ROUND_HALF_UP, Decimal

    from azure_func_forem_data_etl_spark.operators.dedup import (
        PREFIX_JOIN_THRESHOLD,
    )

    rng = random.Random(seed)
    vocab = list("abcdefgh")
    texts = []
    for _ in range(12):
        texts.append(" ".join(rng.choice(vocab) for _ in range(rng.randint(4, 12))))
    for i in range(4):  # mutated copies force some pairs over the threshold
        base = texts[i].split()
        base[rng.randrange(len(base))] = rng.choice(vocab)
        texts.append(" ".join(base))
    docs = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(docs, _DOCS_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    bigrams = {}
    for i, t in enumerate(texts):
        w = t.split()
        if len(w) >= 2:
            bigrams[i] = {" ".join(w[j : j + 2]) for j in range(len(w) - 1)}
    expect = {}
    ids = sorted(bigrams)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            inter = len(bigrams[a] & bigrams[b])
            union = len(bigrams[a] | bigrams[b])
            j = inter / union
            if inter and j >= PREFIX_JOIN_THRESHOLD:
                jr = float(
                    Decimal(repr(j)).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP
                    )
                )
                expect[(a, b)] = (inter, jr)
    q = _q("prefix_filter_simjoin")
    sf = str(tmp_path)
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter_size"], r["jaccard"])
        for r in q.fn(spark, sf).collect()
    }
    assert got == expect
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


@pytest.mark.parametrize("seed", [0, 1])
def test_eb_shrinkage_random_counts_triple_vote(spark, tmp_path, seed):
    """Spark moments == DuckDB == Python IEEE-double replay of the
    closed-form prior and posterior on random per-user counts."""
    rng = random.Random(seed)
    users = {u: rng.randint(1, 20) for u in range(1, 13)}
    succ = {u: rng.randint(0, n) for u, n in users.items()}
    rows, eid = [], 0
    for u, n in users.items():
        for j in range(n):
            et = "purchase" if j < succ[u] else "view"
            rows.append((eid, _T0 + dt.timedelta(minutes=eid), u, et, 1.0, "{}"))
            eid += 1
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    rates = {u: 1_000_000 * succ[u] // n for u, n in users.items()}
    k = len(users)
    s1 = sum(rates.values())
    s2 = sum(r * r for r in rates.values())
    m_f = (s1 / k) / 1_000_000.0
    v_f = (s2 / k - (s1 / k) * (s1 / k)) / 1_000_000_000_000.0
    c = m_f * (1.0 - m_f) / v_f - 1.0 if v_f > 0 else None
    q = _q("eb_beta_binomial_shrinkage")
    sf = str(tmp_path)
    got = {r["user_id"]: r for r in q.fn(spark, sf).collect()}
    for u, n in users.items():
        assert got[u]["rate_ppm"] == rates[u]
        if c is None:
            assert got[u]["shrunk_ppm"] is None
        else:
            assert got[u]["alpha_x1e6"] == math.floor(m_f * c * 1_000_000.0)
            assert got[u]["shrunk_ppm"] == math.floor(
                (succ[u] + m_f * c) / (n + c) * 1_000_000.0
            )
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


# ---------------------------------------------------------------------------
# oracle-on-random-data tier


def _random_events(rng, n_users=10, n_events=120):
    types = ["view", "click", "purchase", "signup", "error"]
    rows = []
    for eid in range(n_events):
        rows.append(
            (
                eid,
                _T0 + dt.timedelta(minutes=rng.randint(0, 60 * 24 * 20)),
                rng.randint(1, n_users),
                rng.choice(types),
                round(rng.uniform(0.5, 200.0), 2),
                "{}",
            )
        )
    return rows


_ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _random_orders(rng, n=150):
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return [
        (
            k,
            rng.randint(1, 25),
            rng.choice("OFP"),
            round(rng.uniform(900.0, 300000.0), 2),
            _T0 + dt.timedelta(hours=rng.randint(0, 24 * 400)),
            rng.choice(prios),
        )
        for k in range(1, n + 1)
    ]


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize(
    "name",
    [
        "window_funnel_steps",
        "session_path_topk",
        "cuped_adjusted_lift",
        "quantile_treatment_effect",
        "group_sequential_ab_monitor",
    ],
)
def test_round9_event_queries_oracle_on_random_events(spark, tmp_path, name, seed):
    rng = random.Random(hash((name, seed)) & 0xFFFF)
    rows = _random_events(rng)
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    q = _q(name)
    sf = str(tmp_path)
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize(
    "name",
    ["poisson_bootstrap_totals", "conformal_interval_coverage"],
)
def test_round9_order_queries_oracle_on_random_orders(spark, tmp_path, name, seed):
    rng = random.Random(hash((name, seed)) & 0xFFFF)
    spark.createDataFrame(_random_orders(rng), _ORDERS_SCHEMA).write.parquet(
        str(tmp_path / "orders.parquet")
    )
    q = _q(name)
    sf = str(tmp_path)
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


@pytest.mark.parametrize("seed", [0, 1])
def test_containment_oracle_on_random_docs(spark, tmp_path, seed):
    rng = random.Random(seed)
    vocab = list("abcdefghij")
    texts = []
    for _ in range(10):
        texts.append(" ".join(rng.choice(vocab) for _ in range(rng.randint(5, 16))))
    for i in range(3):  # embed a verbatim quote inside a longer host
        host = texts[i].split() + texts[(i + 1) % 10].split()
        texts.append(" ".join(host))
    docs = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(docs, _DOCS_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    q = _q("shingle_containment_pairs")
    sf = str(tmp_path)
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


_EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


@pytest.mark.parametrize("seed", [0, 1])
def test_mmr_oracle_on_random_embeddings(spark, tmp_path, seed):
    """Random unit-ball embeddings salted with near-duplicate clusters
    around the query vectors — the regime where MMR's picks diverge
    hardest from pure top-k; the recursive-CTE oracle must replay every
    greedy step."""
    rng = random.Random(seed)
    rows = []
    for vid in range(0, 220):
        rows.append((vid, [rng.uniform(-1, 1) for _ in range(8)], 0))
    # clone each query's vector with small jitter so twins exist
    for j, (vid, emb, _) in enumerate([r for r in rows if r[0] % 100 == 0]):
        for c in range(3):
            rows.append(
                (
                    1000 + 10 * j + c,
                    [x + rng.uniform(-0.01, 0.01) for x in emb],
                    0,
                )
            )
    spark.createDataFrame(rows, _EMB_SCHEMA).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    q = _q("mmr_diversified_topk")
    sf = str(tmp_path)
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


@pytest.mark.parametrize("seed", [0, 1])
def test_qte_random_events_triple_vote(spark, tmp_path, seed):
    """Spark banded two-phase ranks == DuckDB == Python type-1 order
    statistics (rank ceil(q*n) under the (total, user_id) order, arms
    replayed through the xxh64 helper) on random events."""
    from azure_func_forem_data_etl_spark.functions.xxh64_sql import (
        SPARK_HASH_SEED,
        to_signed,
        xxh64_long,
    )
    from azure_func_forem_data_etl_spark.operators.evaluation import (
        QTE_QUANTILES_PPM,
    )

    rng = random.Random(seed)
    rows = _random_events(rng, n_users=14, n_events=150)
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    totals = {}
    for _, _, u, _, v, _ in rows:
        # replicate decimal(18,4) sums exactly via integer ten-thousandths
        totals[u] = totals.get(u, 0) + round(v * 10_000)
    arms = {0: [], 1: []}
    for u, t in totals.items():
        a = to_signed(xxh64_long(u, SPARK_HASH_SEED)) % 2
        arms[a].append((t, u))
    expect = {}
    for p in QTE_QUANTILES_PPM:
        row = {}
        for a in (0, 1):
            s = sorted(arms[a])
            k = (p * len(s) + 999_999) // 1_000_000
            row[a] = (len(s), s[k - 1][0] / 10_000.0)
        expect[p] = (
            row[1][0], row[0][0], row[1][1], row[0][1], row[1][1] - row[0][1]
        )
    q = _q("quantile_treatment_effect")
    sf = str(tmp_path)
    got = {
        r["q_ppm"]: (
            r["n_treat"], r["n_ctrl"], r["q_treat"], r["q_ctrl"], r["qte"]
        )
        for r in q.fn(spark, sf).collect()
    }
    assert got == expect
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


@pytest.mark.parametrize("seed", [0, 1])
def test_gsd_random_events_triple_vote(spark, tmp_path, seed):
    """Spark week-grain cumsums == DuckDB cross-join counts == Python
    brute-force looks (first-seen / first-conversion weeks per user,
    identical IEEE z and boundary formulas) on random events."""
    import math

    from azure_func_forem_data_etl_spark.functions.xxh64_sql import (
        SPARK_HASH_SEED,
        to_signed,
        xxh64_long,
    )
    from azure_func_forem_data_etl_spark.operators.evaluation import (
        GSD_OBF_C,
        GSD_WEEK_US,
    )

    rng = random.Random(seed + 7)
    rows = _random_events(rng, n_users=12, n_events=140)
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    seen, conv, last = {}, {}, {}
    for _, ts, u, et, _, _ in rows:
        w = int(ts.timestamp() * 1_000_000) // GSD_WEEK_US
        seen[u] = min(seen.get(u, w), w)
        last[u] = max(last.get(u, w), w)
        if et == "purchase":
            conv[u] = min(conv.get(u, w), w)
    w0, w1 = min(seen.values()), max(last.values())
    kk = w1 - w0 + 1
    expect = {}
    for week in range(w0, w1 + 1):
        c = {0: [0, 0], 1: [0, 0]}
        for u in seen:
            a = to_signed(xxh64_long(u, SPARK_HASH_SEED)) % 2
            if seen[u] <= week:
                c[a][0] += 1
            if conv.get(u, 10**9) <= week:
                c[a][1] += 1
        (cn0, cx0), (cn1, cx1) = c[0], c[1]
        k = week - w0 + 1
        bound = GSD_OBF_C * math.sqrt(kk / k)
        if cn0 > 0 and cn1 > 0 and 0 < cx0 + cx1 < cn0 + cn1:
            p = (cx0 + cx1) / (cn0 + cn1)
            z = (cx1 / cn1 - cx0 / cn0) / math.sqrt(
                p * (1.0 - p) * (1.0 / cn0 + 1.0 / cn1)
            )
            zq, crossed = math.floor(z * 1e6), int(abs(z) >= bound)
        else:
            zq, crossed = None, 0
        expect[k] = (cn0, cx0, cn1, cx1, zq, math.floor(bound * 1e6), crossed)
    q = _q("group_sequential_ab_monitor")
    sf = str(tmp_path)
    got = {
        r["week_k"]: (
            r["n_ctrl"], r["x_ctrl"], r["n_treat"], r["x_treat"],
            r["z_x1e6"], r["bound_x1e6"], r["crossed"],
        )
        for r in q.fn(spark, sf).collect()
    }
    assert got == expect
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)
