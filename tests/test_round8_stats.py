"""Random-input property checks for the round-8 fold/replay pairs: the
DuckDB recursive-CTE replays must track the driver-side folds on data
OTHER than the fixtures (same guarantee test_round7_stats.py gives the
Holt/Holt-Winters replays)."""

from __future__ import annotations

import math
import random

import duckdb
import pytest


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kaplan_meier_recursive_cte_matches_fold(seed):
    """Scaled-integer product-limit fold == HUGEINT recursive CTE on a
    random (t, n_all, d) duration histogram."""
    rng = random.Random(seed)
    hist = []
    for t in sorted(rng.sample(range(0, 200), 40)):
        n_all = rng.randint(1, 50)
        d = rng.randint(0, n_all)
        hist.append((t, n_all, d))
    scale = 10**12
    total = sum(n for _, n, _ in hist)
    rows, seen, s = [], 0, scale
    for t, n_all, d in hist:
        n_risk = total - seen
        seen += n_all
        if d > 0:
            s = (s * (n_risk - d)) // n_risk
            rows.append((t, n_risk, d, s / scale))
    con = duckdb.connect()
    con.execute("CREATE TABLE hist(t INT, n_all HUGEINT, d HUGEINT)")
    con.executemany("INSERT INTO hist VALUES (?, ?, ?)", hist)
    got = con.execute(f"""
    WITH RECURSIVE steps AS (
        SELECT t, d,
               SUM(n_all) OVER (ORDER BY t DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
        FROM hist
    ),
    ev AS (
        SELECT t, d, n, row_number() OVER (ORDER BY t) AS rn
        FROM steps WHERE d > 0
    ),
    km(rn, t, n, d, s) AS (
        SELECT 0, -1, CAST(0 AS HUGEINT), CAST(0 AS HUGEINT),
               CAST({scale} AS HUGEINT)
        UNION ALL
        SELECT e.rn, e.t, e.n, e.d, (km.s * (e.n - e.d)) // e.n
        FROM km JOIN ev e ON e.rn = km.rn + 1
    )
    SELECT t, CAST(n AS BIGINT), CAST(d AS BIGINT),
           CAST(s AS DOUBLE) / {float(scale)}
    FROM km WHERE rn > 0 ORDER BY t
    """).fetchall()
    assert [tuple(r) for r in got] == rows


def _lttb_reference(ys: list[int], k: int) -> list[int]:
    """0-based indices LTTB keeps (the operator's exact integer fold)."""
    n = len(ys)
    if n <= k:
        return list(range(n))
    nb = k - 2
    mid = list(range(1, n - 1))
    raw = [((i - 1) * nb) // (n - 2) for i in mid]
    uniq = sorted(set(raw))
    dense = {r: j for j, r in enumerate(uniq)}
    buckets: list[list[int]] = [[] for _ in uniq]
    for i, r in zip(mid, raw):
        buckets[dense[r]].append(i)
    sel, ax, ay = [], 1, ys[0]
    for bi, bucket in enumerate(buckets):
        if bi + 1 < len(buckets):
            nxt = buckets[bi + 1]
            nn, sxn, syn = len(nxt), sum(i + 1 for i in nxt), sum(ys[i] for i in nxt)
        else:
            nn, sxn, syn = 1, n, ys[n - 1]
        best = None
        for i in bucket:
            px, py = i + 1, ys[i]
            area = abs((ax * nn - sxn) * (py - ay) - (ax - px) * (syn - ay * nn))
            enc = area * 4096 + (4095 - px)
            if best is None or enc > best:
                best = enc
        wx = 4095 - (best % 4096)
        ax, ay = wx, ys[wx - 1]
        sel.append(wx - 1)
    return [0] + sel + [n - 1]


@pytest.mark.parametrize("seed,n", [(0, 120), (1, 37), (2, 23)])
def test_lttb_recursive_cte_matches_fold(seed, n):
    """LTTB argmax fold == recursive CTE replay on random integer series,
    including sparse shapes (fewer middle points than buckets)."""
    rng = random.Random(seed)
    ys = [rng.randint(0, 10**9) for _ in range(n)]
    k = 20
    keep = _lttb_reference(ys, k)
    con = duckdb.connect()
    con.execute("CREATE TABLE s(x INT, ys HUGEINT)")
    con.executemany("INSERT INTO s VALUES (?, ?)", [(i + 1, y) for i, y in enumerate(ys)])
    got = con.execute(f"""
    WITH RECURSIVE pts AS MATERIALIZED (
        SELECT x, ys, COUNT(*) OVER () AS n FROM s
    ),
    mid AS (
        SELECT x, ys, ((x - 2) * {k - 2}) // (n - 2) AS raw_bucket
        FROM pts WHERE x > 1 AND x < n
    ),
    cand AS MATERIALIZED (
        SELECT x, ys, dense_rank() OVER (ORDER BY raw_bucket) - 1 AS b FROM mid
    ),
    nb AS (SELECT MAX(b) + 1 AS nbuckets FROM cand),
    cent AS MATERIALIZED (
        SELECT b - 1 AS b, CAST(COUNT(*) AS HUGEINT) AS nn,
               CAST(SUM(x) AS HUGEINT) AS sxn, CAST(SUM(ys) AS HUGEINT) AS syn
        FROM cand WHERE b > 0 GROUP BY 1
        UNION ALL
        SELECT (SELECT nbuckets FROM nb) - 1, 1,
               CAST((SELECT MAX(x) FROM pts) AS HUGEINT),
               (SELECT ys FROM pts WHERE x = (SELECT MAX(x) FROM pts))
    ),
    rec(b, ax, ay) AS (
        SELECT -1, CAST(1 AS HUGEINT), (SELECT ys FROM pts WHERE x = 1)
        UNION ALL
        SELECT q.b, CAST(4095 - (q.best % 4096) AS HUGEINT),
               (SELECT c2.ys FROM cand c2 WHERE c2.x = 4095 - (q.best % 4096))
        FROM (
            SELECT s2.b + 1 AS b,
                   MAX(abs((s2.ax * ct.nn - ct.sxn) * (c.ys - s2.ay)
                           - (s2.ax - c.x) * (ct.syn - s2.ay * ct.nn)) * 4096
                       + (4095 - c.x)) AS best
            FROM rec s2
                JOIN cand c ON c.b = s2.b + 1
                JOIN cent ct ON ct.b = s2.b + 1
            WHERE s2.b + 1 < (SELECT nbuckets FROM nb)
            GROUP BY s2.b + 1
        ) q
    )
    SELECT CAST(ax AS BIGINT) FROM rec WHERE b >= 0 ORDER BY b
    """).fetchall()
    assert [r[0] - 1 for r in got] == keep[1:-1]


@pytest.mark.parametrize("seed", [0, 1])
def test_croston_recursive_cte_matches_fold(seed):
    """Croston demand-day fold (literal IEEE) == recursive CTE replay on
    random intermittent series."""
    rng = random.Random(seed)
    days = sorted(rng.sample(range(0, 1000), 60))
    qs = [float(rng.randint(1, 200)) for _ in days]
    a = 0.2
    z = p = prev = None
    for d, q in zip(days, qs):
        if prev is None:
            z, p = q, 1.0
        else:
            z = a * q + (1.0 - a) * z
            p = a * float(d - prev) + (1.0 - a) * p
        prev = d
    con = duckdb.connect()
    con.execute("CREATE TABLE ship(d INT, q DOUBLE)")
    con.executemany("INSERT INTO ship VALUES (?, ?)", list(zip(days, qs)))
    got = con.execute("""
    WITH RECURSIVE series AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY d) AS rn, q,
               CAST(d - lag(d) OVER (ORDER BY d) AS DOUBLE) AS iv
        FROM ship
    ),
    n AS MATERIALIZED (SELECT MAX(rn) AS nmax FROM series),
    cr(rn, z, p) AS (
        SELECT 1, CAST(q AS DOUBLE), CAST(1.0 AS DOUBLE)
        FROM series WHERE rn = 1
        UNION ALL
        SELECT s.rn, 0.2 * s.q + (1.0 - 0.2) * cr.z,
               0.2 * s.iv + (1.0 - 0.2) * cr.p
        FROM cr JOIN series s ON s.rn = cr.rn + 1
        WHERE cr.rn < (SELECT nmax FROM n)
    )
    SELECT z, p FROM cr WHERE rn = (SELECT nmax FROM n)
    """).fetchone()
    assert got[0] == z and got[1] == p  # bit-identical IEEE folds


def test_pav_minimax_equals_stack_fold():
    """The isotonic minimax characterization (the oracle's SQL form) must
    equal the PAV stack fold on random weighted bins."""
    rng = random.Random(3)
    bins = [(i, rng.randint(1, 30)) for i in range(40)]
    bins = [(s, n, rng.randint(0, n)) for s, n in bins]
    # stack fold
    stack: list[list[int]] = []
    for _, n, p in bins:
        stack.append([p, n, 1])
        while len(stack) >= 2 and stack[-2][0] * stack[-1][1] >= stack[-1][0] * stack[-2][1]:
            p2, n2, c2 = stack.pop()
            stack[-1][0] += p2
            stack[-1][1] += n2
            stack[-1][2] += c2
    fold_fit = []
    for p_blk, n_blk, c_blk in stack:
        fold_fit.extend([p_blk / n_blk] * c_blk)
    # minimax: fit_i = max_{k<=i} min_{j>=i} avg(k..j)
    m = len(bins)
    pre_p = [0]
    pre_n = [0]
    for _, n, p in bins:
        pre_p.append(pre_p[-1] + p)
        pre_n.append(pre_n[-1] + n)
    mm_fit = []
    for i in range(m):
        best = -math.inf
        for k in range(i + 1):
            lo = min(
                (pre_p[j + 1] - pre_p[k]) / (pre_n[j + 1] - pre_n[k])
                for j in range(i, m)
            )
            best = max(best, lo)
        mm_fit.append(best)
    assert fold_fit == pytest.approx(mm_fit, abs=0)  # identical doubles
