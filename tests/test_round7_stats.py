"""Direct tests for the round-7 statistical/sampling operators, beyond the
registry-wide oracle parity sweep: the replay oracles get random-input
property checks (the oracle SQL must track the engine fold on data OTHER
than the fixtures), and the graph/sampling ops get planted-shape tests
with hand-computable answers.
"""

from __future__ import annotations

import duckdb
import pytest


def _holt_reference(xs, alpha, beta):
    """Literal-IEEE Holt fold (the same expressions the operator uses)."""
    import math

    def q6(v):
        return math.floor(v * 1e6) / 1e6

    out = []
    l = b = None
    for x in xs:
        if l is None:
            l, b = x, 0.0
        else:
            l_new = alpha * x + (1.0 - alpha) * (l + b)
            b = beta * (l_new - l) + (1.0 - beta) * b
            l = l_new
        out.append((q6(l), q6(b), q6(l + b)))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_holt_recursive_cte_matches_python_fold(seed):
    """The DuckDB recursive-CTE replay used by the holt_linear_forecast
    oracle must be bit-identical to the Python fold on RANDOM series, not
    just the fixture's daily revenue (same guarantee the BPE replay oracle
    carries).  Values are 2-decimal-quantized like the corpus."""
    import random

    from azure_func_forem_data_etl_spark.operators.temporal import (
        HOLT_ALPHA,
        HOLT_BETA,
    )

    rng = random.Random(seed)
    xs = [round(rng.uniform(0, 20000), 2) for _ in range(300)]
    # seed 0 historically produced a 7th-digit midpoint at step 3 —
    # the case that forced floor-quantization over round()
    con = duckdb.connect()
    con.execute("CREATE TABLE s(rn INT, v DOUBLE)")
    con.executemany("INSERT INTO s VALUES (?, ?)", list(enumerate(xs, 1)))
    got = con.execute(
        f"""
        WITH RECURSIVE h(rn, v, l, b) AS (
          SELECT rn, v, v AS l, CAST(0.0 AS DOUBLE) AS b FROM s WHERE rn = 1
          UNION ALL
          SELECT o.rn, o.v,
                 {HOLT_ALPHA} * o.v + (1.0 - {HOLT_ALPHA}) * (h.l + h.b) AS l,
                 {HOLT_BETA} * (({HOLT_ALPHA} * o.v
                                 + (1.0 - {HOLT_ALPHA}) * (h.l + h.b)) - h.l)
                     + (1.0 - {HOLT_BETA}) * h.b AS b
          FROM h JOIN s o ON o.rn = h.rn + 1
        )
        SELECT floor(l * 1000000) / 1000000, floor(b * 1000000) / 1000000,
               floor((l + b) * 1000000) / 1000000 FROM h ORDER BY rn
        """
    ).fetchall()
    assert [tuple(r) for r in got] == _holt_reference(xs, HOLT_ALPHA, HOLT_BETA)


def test_monetary_unit_sample_invariants(spark, sf_dir):
    """Systematic PPS accounting identity: within each month the number of
    step multiples crossed by selected rows equals tot div step (every
    interval multiple is crossed exactly once, by exactly one row), so
    n_selected <= tot div step <= target picks; and coverage is the
    selected-cents ratio."""
    from azure_func_forem_data_etl_spark.operators.profile import (
        MUS_PICKS_PER_MONTH,
        monetary_unit_sample,
    )

    rows = monetary_unit_sample(spark, sf_dir).collect()
    assert rows
    for r in rows:
        step = max(r["total_cents"] // MUS_PICKS_PER_MONTH, 1)
        n_multiples = r["total_cents"] // step
        assert 1 <= r["n_selected"] <= n_multiples
        # a selected row can cross several multiples (big-ticket rows),
        # so selected count <= multiples, but never more than target+1
        assert n_multiples <= MUS_PICKS_PER_MONTH + 1
        assert r["selected_cents"] <= r["total_cents"]
        assert abs(r["coverage"] - round(r["selected_cents"] / r["total_cents"], 6)) < 1e-9


def test_bfs_levels_planted_barbell(spark):
    """Two triangles joined by a 2-edge path: levels from the smallest
    node are hand-checkable.  Uses the operator's internals via a
    monkeypatched edge source so the planted graph replaces the
    co-purchase derivation."""
    from azure_func_forem_data_etl_spark.operators import graph as G

    #    0-1, 0-2, 1-2   (triangle at 0)
    #    2-3, 3-4        (path)
    #    4-5, 4-6, 5-6   (triangle at 4)
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    orig = G.copurchase_edges
    G.copurchase_edges = lambda _spark, _sf: df
    try:
        got = {
            r["dist"]: (r["n_nodes"], r["id_checksum"])
            for r in G.graph_bfs_levels(spark, "unused").collect()
        }
    finally:
        G.copurchase_edges = orig
    assert got == {
        0: (1, 0),  # {0}
        1: (2, 3),  # {1, 2}
        2: (1, 3),  # {3}
        3: (1, 4),  # {4}
        4: (2, 11),  # {5, 6}
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_holt_winters_recursive_cte_matches_python_fold(seed):
    """The LIST-state recursive CTE behind the holt_winters_seasonal
    oracle must track the Python fold bit-for-bit on RANDOM series — the
    seasonal list rotation (slice + append) is the novel part no scalar
    replay exercises."""
    import math
    import random
    from collections import deque

    from azure_func_forem_data_etl_spark.operators.temporal import (
        HW_ALPHA,
        HW_BETA,
        HW_GAMMA,
        HW_PERIOD,
    )

    def q6(v):
        return math.floor(v * 1e6) / 1e6

    rng = random.Random(seed)
    xs = [round(rng.uniform(0, 20000), 2) for _ in range(100)]
    m = HW_PERIOD
    scaled = sum(round(x * 10000) for x in xs[:m])
    l = (scaled / 10000) / m
    b = 0.0
    sl = deque(x - l for x in xs[:m])
    a, g, c = HW_ALPHA, HW_BETA, HW_GAMMA
    want = []
    for t in range(m, len(xs)):
        x = xs[t]
        s_old = sl[0]
        l_new = a * (x - s_old) + (1.0 - a) * (l + b)
        b = g * (l_new - l) + (1.0 - g) * b
        s_new = c * (x - l_new) + (1.0 - c) * s_old
        sl.popleft()
        sl.append(s_new)
        l = l_new
        want.append((q6(l), q6(b), q6(s_new)))

    con = duckdb.connect()
    con.execute("CREATE TABLE s(rn INT, x DOUBLE, rev DECIMAL(18,4))")
    con.executemany(
        "INSERT INTO s VALUES (?, ?, ?)",
        [(i + 1, x, x) for i, x in enumerate(xs)],
    )
    got = con.execute(
        f"""
        WITH RECURSIVE seed AS (
            SELECT CAST((SELECT SUM(rev) FROM (
                           SELECT rev FROM s ORDER BY rn
                           LIMIT {m}) t) AS DOUBLE) / {m} AS l0
        ),
        s0 AS (
            SELECT list(o.x - sd.l0 ORDER BY o.rn) AS sl
            FROM s o, seed sd WHERE o.rn <= {m}
        ),
        hw(rn, x, l, b, sl) AS (
            SELECT o.rn, o.x, sd.l0, CAST(0.0 AS DOUBLE), s0.sl
            FROM s o, seed sd, s0 WHERE o.rn = {m}
            UNION ALL
            SELECT o.rn, o.x,
                   {a} * (o.x - h.sl[1]) + (1.0 - {a}) * (h.l + h.b),
                   {g} * (({a} * (o.x - h.sl[1])
                           + (1.0 - {a}) * (h.l + h.b)) - h.l)
                     + (1.0 - {g}) * h.b,
                   list_append(h.sl[2:{m}],
                       {c} * (o.x - ({a} * (o.x - h.sl[1])
                                     + (1.0 - {a}) * (h.l + h.b)))
                       + (1.0 - {c}) * h.sl[1])
            FROM hw h JOIN s o ON o.rn = h.rn + 1
        )
        SELECT floor(l * 1000000) / 1000000,
               floor(b * 1000000) / 1000000,
               floor(sl[{m}] * 1000000) / 1000000
        FROM hw WHERE rn > {m} ORDER BY rn
        """
    ).fetchall()
    assert [tuple(r) for r in got] == want
