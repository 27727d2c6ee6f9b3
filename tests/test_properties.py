"""Property-based tests (SURVEY.md §5.4): random article batches — shuffled
timestamps, missing/garbage fields, duplicate ids — through the incremental
pipeline; invariants that must hold for ANY input:

- ingested ids are a subset of input ids,
- silver has no duplicate ids after compaction,
- the committed watermark equals max(published_at) over ingested rows,
- an immediate rerun ingests nothing (idempotence under strict >),
- minhash signatures are independent of physical partitioning.
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import tempfile
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from azure_func_forem_data_etl_spark.plans.incremental import (
    compact_silver,
    run_incremental,
)
from azure_func_forem_data_etl_spark.sources.paginated import (
    FetchPolicy,
    directory_fetcher,
)
from azure_func_forem_data_etl_spark.sources.state import load_watermark
from tests.fixtures import make_article

# (id, published_at) pairs: small id range forces duplicates; published_at
# mixes valid ISO-Z, None, and garbage.
_valid_ts = st.builds(
    lambda d, h, m: f"2024-03-{d:02d}T{h:02d}:{m:02d}:00Z",
    st.integers(1, 28),
    st.integers(0, 23),
    st.integers(0, 59),
)
_published = st.one_of(_valid_ts, st.none(), st.just("not-a-timestamp"))
_batches = st.lists(
    st.tuples(st.integers(1, 15), _published), min_size=0, max_size=25
)


def _parse(ts: str) -> dt.datetime:
    return dt.datetime.fromisoformat(ts.replace("Z", "+00:00")).replace(tzinfo=None)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=_batches)
def test_incremental_pipeline_invariants(spark, batch):
    work = Path(tempfile.mkdtemp(prefix="prop_"))
    try:
        pages = work / "pages"
        pages.mkdir()
        arts = [make_article(i, ts) for i, ts in batch]
        (pages / "page_1.json").write_text(json.dumps(arts, indent=2))

        bronze, silver, state = str(work / "bronze"), str(work / "silver"), str(work / "state")
        res = run_incremental(
            spark, directory_fetcher(str(pages)), bronze, state, FetchPolicy()
        )

        valid = [(i, _parse(ts)) for i, ts in batch if ts not in (None, "not-a-timestamp")]
        assert res.n_ingested == len(valid)
        assert res.n_quarantined == len(batch) - len(valid)

        if valid:
            # watermark == max ingested published_at, committed after data
            assert load_watermark(spark, state) == max(t for _, t in valid)
            n_silver = compact_silver(spark, bronze, silver)
            silver_ids = {
                r["id"] for r in spark.read.parquet(silver).select("id").collect()
            }
            assert silver_ids == {i for i, _ in valid}  # subset AND complete
            assert n_silver == len(silver_ids)  # no duplicate ids survive
        else:
            # empty batch: no state write (L2)
            assert load_watermark(spark, state) is None

        # rerun: strict > watermark filter ingests nothing new
        res2 = run_incremental(
            spark, directory_fetcher(str(pages)), bronze, state, FetchPolicy()
        )
        assert res2.n_ingested == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


@settings(max_examples=3, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(nparts=st.integers(1, 7), seed=st.integers(0, 10_000))
def test_minhash_signatures_partition_invariant(spark, nparts, seed):
    """Signatures (and thus candidate pairs) must not depend on physical
    partitioning — required for the driver's rows-only repeatability."""
    import random

    from pyspark.sql import functions as F

    from azure_func_forem_data_etl_spark.operators.dedup import (
        MINHASH_NGRAM,
        minhash_signatures,
        word_shingles,
    )

    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    base = minhash_signatures(word_shingles(docs.coalesce(1), MINHASH_NGRAM))
    other = minhash_signatures(
        word_shingles(docs.repartition(nparts, "doc_id"), MINHASH_NGRAM)
    )
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, other.collect()))
    assert a == b


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=1, max_size=60
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_star_cc_matches_union_find_on_random_graphs(spark, edges):
    """For ANY edge list (self-loops, duplicates, dense collisions), the
    distributed large-star/small-star labeling equals the driver
    union-find's min-id labeling."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        _driver_union_find,
        connected_components_star,
    )

    df = spark.createDataFrame(edges, "a: long, b: long")
    got = {
        (r["id"], r["comp"])
        for r in connected_components_star(df, "a", "b").collect()
    }
    assert got == set(_driver_union_find(edges, None))


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=50,
    ).filter(lambda es: any(a != b for a, b in es))
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lpa_driver_path_matches_distributed(spark, edges):
    """The r6 adaptive small-graph LPA (driver loop, LPA_DRIVER_EDGE_BOUND)
    must return EXACTLY the labels of the distributed round loop on any
    graph — same synchronous argmax tie-breaks, same even-round stop rule.
    Forces the distributed path by monkeypatching the bound to -1."""
    from azure_func_forem_data_etl_spark.operators import graph as G

    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    fast = {(r["id"], r["community"]) for r in G.label_propagation(df, "src", "dst").collect()}
    orig = G.LPA_DRIVER_EDGE_BOUND
    G.LPA_DRIVER_EDGE_BOUND = -1
    try:
        slow = {(r["id"], r["community"]) for r in G.label_propagation(df, "src", "dst").collect()}
    finally:
        G.LPA_DRIVER_EDGE_BOUND = orig
    assert fast == slow


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=30,
    ).filter(lambda es: any(a != b for a, b in es))
)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pagerank_matches_integer_rounding_model(spark, edges):
    """The pagerank_copurchase oracle replays Spark's DECIMAL rounding
    chain in HUGEINT arithmetic (graph.py::_PR_REPLAY).  This pins that
    model against the ENGINE on random graphs: the Python integer replica
    of the oracle's arithmetic must reproduce Spark's round-10 ranks
    bit-for-bit — if a Spark upgrade changes decimal type propagation,
    this fails before the fixture oracle silently diverges."""
    from azure_func_forem_data_etl_spark.operators.graph import (
        PAGERANK_ITERS,
        pagerank,
    )

    edges = [(a, b) for a, b in edges if a != b]
    und: set[tuple[int, int]] = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    deg: dict[int, int] = {}
    for s, _ in und:
        deg[s] = deg.get(s, 0) + 1

    def divru(a: int, b: int) -> int:  # HALF_UP for positive ints
        return (2 * a + b) // (2 * b)

    rank = {v: 10**15 for v in deg}  # scale-15 integers
    for _ in range(PAGERANK_ITERS):
        acc: dict[int, int] = {v: 0 for v in deg}
        for s, t in und:
            r28 = divru(rank[s] * 10**13, deg[s])
            acc[t] += divru(r28, 10**10)
        rank = {
            v: divru(15 * 10**14 + divru(85 * acc[v], 10**4), 10) for v in deg
        }
    expect = {v: divru(r, 10**5) for v, r in rank.items()}  # scale-10 ints

    df = spark.createDataFrame(edges, "src: long, dst: long")
    from pyspark.sql import functions as F

    got = {
        r["id"]: int((r["rank"] * 10**10).to_integral_value())
        for r in pagerank(df, "src", "dst")
        .select("id", F.round(F.col("rank"), 10).alias("rank"))
        .collect()
    }
    assert got == expect


@given(
    corpus=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=8),  # adversarial: tiny
        st.integers(1, 9),  # alphabet forces self-pairs, overlaps, collisions
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=15, deadline=None)
def test_bpe_oracle_replay_matches_sequential_bpe(corpus):
    """The bpe_merge_learn recursive-CTE oracle (r6 promotion) must replay
    textbook sequential BPE on adversarial corpora — self-pairs ('aa' over
    'aaaa' runs), overlap contexts ('abab'), merged-string collisions —
    not just the fixture corpus.  Pure DuckDB vs the same _bpe_sequential_py
    reference the engine's batch planner is tested against, closing the
    triangle engine == reference == oracle."""
    import duckdb

    from azure_func_forem_data_etl_spark.operators.tokenize import BPE_MERGES
    from azure_func_forem_data_etl_spark.plans.registry import REGISTRY
    from tests.test_llm_ops import _bpe_sequential_py

    text = " ".join(w for w, c in sorted(corpus.items()) for _ in range(c))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (0, ?)", [text])
    got = sorted(map(tuple, con.execute(REGISTRY["bpe_merge_learn"].oracle).fetchall()))
    assert got == sorted(_bpe_sequential_py(corpus, BPE_MERGES))


@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 3),      # source index
            st.integers(1, 640),    # token count — crosses the 512 budget
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_bfd_oracle_replay_matches_python_bfd(docs):
    """The sequence_packing_bfd recursive-CTE oracle (r6 promotion) must
    replay best-fit-decreasing EXACTLY on any corpus — including docs
    larger than the budget (singleton bins with negative headroom), a
    branch the fixture corpora may not exercise.  Pure DuckDB vs a direct
    Python BFD; no Spark involved, so this pins the SQL itself."""
    import duckdb

    from azure_func_forem_data_etl_spark.operators.curation import (
        PACK_BUDGET_TOKENS,
    )
    from azure_func_forem_data_etl_spark.plans.registry import REGISTRY

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, source VARCHAR, text VARCHAR)")
    for i, (s, n) in enumerate(docs):
        con.execute(
            "INSERT INTO documents VALUES (?, ?, ?)",
            [i, f"s{s}", " ".join(["w"] * n)],
        )
    got = sorted(map(tuple, con.execute(REGISTRY["sequence_packing_bfd"].oracle).fetchall()))

    by_src: dict[str, list[tuple[int, int]]] = {}
    for i, (s, n) in enumerate(docs):
        by_src.setdefault(f"s{s}", []).append((n, i))
    expect = []
    for src, lst in by_src.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        headroom: list[int] = []
        n_docs: list[int] = []
        tok: list[int] = []
        for n, _ in lst:
            best, best_room = -1, None
            for b, room in enumerate(headroom):
                if room >= n and (best_room is None or room < best_room):
                    best, best_room = b, room
            if best < 0:
                headroom.append(PACK_BUDGET_TOKENS - n)
                n_docs.append(1)
                tok.append(n)
            else:
                headroom[best] -= n
                n_docs[best] += 1
                tok[best] += n
        expect += [(src, b, n_docs[b], tok[b]) for b in range(len(headroom))]
    assert got == sorted(expect)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),        # price (small domain -> many ties)
            st.integers(0, 365 * 4),       # date offset days
        ),
        min_size=0,
        max_size=120,
    )
)
def test_skyline_local_prune_is_sound(spark, rows):
    """Two-phase skyline (per-year local sweep, then global sweep) must
    equal the direct global sweep on arbitrary data, including duplicate
    (price, date) points — the soundness claim in its docstring."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from azure_func_forem_data_etl_spark.operators.relational import skyline_sweep

    data = [
        (i, float(p), _dt.date(1995, 1, 1) + _dt.timedelta(days=d))
        for i, (p, d) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "o_orderkey long, o_totalprice double, o_orderdate date"
    )
    direct = {tuple(r) for r in skyline_sweep(df).collect()}
    local = skyline_sweep(df.withColumn("_yr", F.year("o_orderdate")), "_yr").drop("_yr")
    two_phase = {tuple(r) for r in skyline_sweep(local).collect()}
    assert two_phase == direct


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),  # score in 0.01 steps
            st.booleans(),
        ),
        min_size=2,
        max_size=60,
    ).filter(lambda xs: any(p for _, p in xs) and any(not p for _, p in xs))
)
def test_binned_auc_equals_exact_pairwise(spark, rows):
    """binned_auc must equal the exact tie-aware pairwise AUC whenever the
    scores are already on the bin grid (binning is the ONLY approximation)."""
    from azure_func_forem_data_etl_spark.operators.evaluation import binned_auc

    data = [(s / 100.0, int(p)) for s, p in rows]
    df = spark.createDataFrame(data, "score double, is_pos int")
    got = binned_auc(df).collect()[0]
    pos = [s for s, p in data if p]
    neg = [s for s, p in data if not p]
    wins = sum(1.0 for sp in pos for sn in neg if sp > sn) + sum(
        0.5 for sp in pos for sn in neg if sp == sn
    )
    # quantize HALF_UP like the engine's round: Python's round() is
    # half-EVEN, and exact midpoints genuinely occur (2*wins is an
    # integer, so wins/n lands on x.xxxxx5 whenever 2*wins*10^6/n is an
    # odd integer — hypothesis found 46.5/64 = 0.7265625)
    from decimal import ROUND_HALF_UP, Decimal

    want = float(
        (Decimal(int(wins * 2)) / (2 * len(pos) * len(neg))).quantize(
            Decimal("1e-6"), ROUND_HALF_UP
        )
    )
    assert got.auc == want
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
