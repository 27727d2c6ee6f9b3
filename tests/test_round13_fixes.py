"""Regression tests for the round-13 sweep finds: each test plants the
exact minimal divergence shape a r13 leg's first probe surfaced and
asserts Spark and the registered DuckDB oracle agree on it (the driver
fixtures never produce these shapes, which is why they survived twelve
rounds).

Shapes covered:
1. stream_table on a DIRECTORY-form table (layout leg): the old
   pathGlobFilter branch matched leaf names only, so a multi-file table
   streamed ZERO files and every streaming query "succeeded" on empty
   input — silent data loss on any real multi-executor layout.
2. cuped_adjusted_lift midpoint domain (combo leg): with anonymous
   traffic at the corpus time extremes, the oracle's all-events
   midpoint shifted every user's pre/post split while Spark computed it
   over identified users only.
3. label_centroid_similarity zero-norm centroid (combo leg): a label
   whose surviving components all 6dp-quantize to zero has an undefined
   cosine against every other label — Spark ANSI raised DIVIDE_BY_ZERO
   while DuckDB silently emitted inf; the pair is now dropped on both.
4. time_weighted_avg_events decimal width (combo leg): duckdb multiplies
   in the narrower operand's storage domain, so an int64-backed
   DECIMAL(18,4) value x multi-hour seconds overflowed at ~1e15 while
   Spark's int128 product was fine; the oracle now widens first.
5. embedding_quantize_int8 on IEEE specials (specials leg): one NaN
   component made scale NaN and the ANSI int cast CRASHED the job; the
   finite_components gate quarantines the vector on both engines.
6. arrow_normalize_embeddings on IEEE specials: non-finite norms pass
   the vector through RAW on both engines (the oracle used to divide —
   NaN lanes — while numpy's n > 0 check passed it through).
7. nonzero_norm / finite_components predicate truth tables — the two
   shared gates behind the finite-domain contract.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from tests.oracle import assert_matches_oracle
from tests.randfix import write_random_fixture

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
_EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"

NAN, INF = float("nan"), float("inf")


def _load(name):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    return load_all()[name]


# ---------------------------------------------------------------------------
# 1. directory-form tables stream ALL their rows


def test_stream_table_reads_directory_form_tables(spark, tmp_path_factory):
    sf = write_random_fixture(
        tmp_path_factory.mktemp("layoutstream") / "sf",
        seed=77,
        n_events=200,
        n_customers=20,
        n_orders=50,
        n_docs=30,
        n_vecs=30,
        layout_files=4,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table

    n_batch = table(spark, sf, "events").count()
    assert n_batch > 0
    q = _load("streaming_tumbling_window")
    df = q.fn(spark, sf)
    # the stream saw every file: its per-window counts sum to the batch
    # row count, and the result hash-matches the batch oracle
    got = df.agg(F.sum("n_events")).first()[0]
    assert got == n_batch, (got, n_batch)
    assert_matches_oracle(df, q.oracle, sf)


# ---------------------------------------------------------------------------
# 2. cuped midpoint over the identified-user domain


@pytest.fixture(scope="module")
def anon_extremes_sf(spark, tmp_path_factory):
    """The corpus MIN and MAX timestamps belong to ANONYMOUS events, far
    outside the identified span — an all-events midpoint lands a month
    early and flips several identified events across the pre/post
    boundary."""
    t0 = dt.datetime(2024, 6, 1)
    rows = [
        # anonymous extremes: 60 days before / 1 day after the cohort
        (0, t0 - dt.timedelta(days=60), None, "view", 1.0, "{}"),
        (999, t0 + dt.timedelta(days=11), None, "view", 1.0, "{}"),
    ]
    eid = 1
    for uid in range(1, 9):
        for d in range(10):
            rows.append(
                (eid, t0 + dt.timedelta(days=d, minutes=uid), uid,
                 "purchase", 10.0 * uid + d, "{}")
            )
            eid += 1
    d_ = tmp_path_factory.mktemp("anonextremes")
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(d_ / "events.parquet")
    )
    return str(d_)


def test_cuped_midpoint_ignores_anonymous_extremes(spark, anon_extremes_sf):
    q = _load("cuped_adjusted_lift")
    df = q.fn(spark, anon_extremes_sf)
    assert_matches_oracle(df, q.oracle, anon_extremes_sf)
    # the identified span is days 0..9, so the midpoint splits it 5/5;
    # an all-events midpoint (day -60..+11) would land pre-cohort and
    # push every value into the post bucket (mean_pre = 0)
    rows = df.collect()
    assert rows and all(r["mean_pre"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# 3. zero-norm label centroid => pair dropped on both engines


@pytest.fixture(scope="module")
def subquantum_label_sf(spark, tmp_path_factory):
    """Label 0's components are all 1e-9 — inside the bounded-components
    domain but below the 6dp centroid quantum, so its centroid is
    exactly zero after quantization; labels 1 and 2 are ordinary."""
    rows = []
    vid = 0
    for _ in range(4):
        rows.append((vid, [1e-9, -1e-9, 1e-9, -1e-9], 0))
        vid += 1
    for lab, base in ((1, 0.5), (2, -0.25)):
        for j in range(4):
            rows.append((vid, [base, base / 2, 0.1 * j, base], lab))
            vid += 1
    d = tmp_path_factory.mktemp("subquantum")
    spark.createDataFrame(rows, _EMB_SCHEMA).write.parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


def test_label_centroid_drops_zero_norm_centroid_pairs(
    spark, subquantum_label_sf
):
    q = _load("label_centroid_similarity")
    df = q.fn(spark, subquantum_label_sf)
    assert_matches_oracle(df, q.oracle, subquantum_label_sf)
    pairs = {(r["label_a"], r["label_b"]) for r in df.collect()}
    assert pairs == {(1, 2)}  # every label-0 pair is out of domain


# ---------------------------------------------------------------------------
# 4. time-weighted average survives 1e9-magnitude value x multi-hour gap


@pytest.fixture(scope="module")
def big_value_gap_sf(spark, tmp_path_factory):
    t0 = dt.datetime(2024, 2, 1)
    rows = [
        # 1.94e9 value held for 21 hours: scale-4 int product ~1.5e19,
        # past int64 — the old oracle's DECIMAL(18) multiply overflowed
        (1, t0, 1, "view", 1944917604.23, "{}"),
        (2, t0 + dt.timedelta(seconds=75651), 1, "view", 2.0, "{}"),
        (3, t0 + dt.timedelta(seconds=80000), 1, "view", 7.5, "{}"),
        # a small ordinary series rides along
        (4, t0, 2, "click", 1.0, "{}"),
        (5, t0 + dt.timedelta(hours=1), 2, "click", 3.0, "{}"),
    ]
    d = tmp_path_factory.mktemp("bigvaluegap")
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(d / "events.parquet")
    )
    return str(d)


def test_time_weighted_avg_survives_large_decimal_products(
    spark, big_value_gap_sf
):
    q = _load("time_weighted_avg_events")
    df = q.fn(spark, big_value_gap_sf)
    assert_matches_oracle(df, q.oracle, big_value_gap_sf)
    tw = {r["event_type"]: r["twa_value"] for r in df.collect()}
    # the big value dominates ~94.6% of the weighted span
    expected = (1944917604.23 * 75651 + 2.0 * 4349) / 80000
    assert math.isclose(tw["view"], expected, rel_tol=1e-9)


# ---------------------------------------------------------------------------
# 5 + 6. IEEE specials: quantizer quarantines, normalizer passes through


@pytest.fixture(scope="module")
def specials_emb_sf(spark, tmp_path_factory):
    rows = [
        (0, [1.0, 2.0, -3.0, 0.5], 0),
        (1, [NAN, 1.0, 1.0, 1.0], 1),      # NaN component
        (2, [1.0, INF, 1.0, 1.0], 2),      # +Inf component
        (3, [1.0, 1.0, -INF, 1.0], 0),     # -Inf component
        (4, [0.25, -0.5, 0.75, -1.0], 1),
        (5, [0.0, 0.0, 0.0, 0.0], 2),      # zero vector: finite, norm 0
    ]
    d = tmp_path_factory.mktemp("specialsemb")
    spark.createDataFrame(rows, _EMB_SCHEMA).write.parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


def test_quantize_int8_quarantines_nonfinite_vectors(spark, specials_emb_sf):
    q = _load("embedding_quantize_int8")
    df = q.fn(spark, specials_emb_sf)  # pre-fix: ANSI CAST_OVERFLOW crash
    assert_matches_oracle(df, q.oracle, specials_emb_sf)
    ids = sorted(r["vec_id"] for r in df.collect())
    assert ids == [0, 4, 5]  # the three dirty vectors are quarantined


def test_arrow_normalize_passes_nonfinite_norms_through(
    spark, specials_emb_sf
):
    q = _load("arrow_normalize_embeddings")
    df = q.fn(spark, specials_emb_sf)
    assert_matches_oracle(df, q.oracle, specials_emb_sf)
    by_id = {r["vec_id"]: r for r in df.collect()}
    assert len(by_id) == 6  # identity projection: every vector kept
    # non-finite norm => first component passes through RAW
    assert math.isnan(by_id[1]["unit_x0"])      # raw NaN component
    assert by_id[2]["unit_x0"] == 1.0           # raw 1.0 (norm = Inf)
    assert by_id[3]["unit_x0"] == 1.0
    assert by_id[5]["unit_x0"] == 0.0           # zero vector stays raw
    # finite vectors still normalize
    assert abs(by_id[0]["norm"] - math.sqrt(1 + 4 + 9 + 0.25)) < 1e-6


# ---------------------------------------------------------------------------
# 7. the two shared gates


def test_finite_domain_gates_truth_table(spark):
    from azure_func_forem_data_etl_spark.operators.similarity import (
        finite_components,
        nonzero_norm,
    )

    rows = [
        (0, [1.0, 2.0]),        # ordinary: in both domains
        (1, [0.0, 0.0]),        # zero: finite, NOT in cosine domain
        (2, [NAN, 1.0]),        # NaN: in neither
        (3, [INF, 1.0]),        # +Inf: in neither
        (4, [-INF, 1.0]),       # -Inf: in neither
        (5, [1e150, 1.0]),      # huge but finite: in both (norm2 ~1e300)
        (6, []),                # empty: finite, zero norm
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cos = sorted(
        r["vec_id"] for r in df.filter(nonzero_norm("embedding")).collect()
    )
    fin = sorted(
        r["vec_id"]
        for r in df.filter(finite_components("embedding")).collect()
    )
    assert cos == [0, 5]
    assert fin == [0, 1, 5, 6]


# ---------------------------------------------------------------------------
# 8. canonical entity grain (dup-entity leg): deterministic total-order
# pick, identical on both engines, no-op on unique ids


@pytest.fixture(scope="module")
def dup_entities_sf(spark, tmp_path_factory):
    """doc 1 and vec 1 are each delivered twice with drifted payloads;
    doc 2's two copies differ ONLY in lang NULL-vs-'' (the tie the
    null-flag order keys exist for)."""
    docs = [
        (0, "alpha beta gamma alpha beta", "en", "src1", 27),
        (1, "delta epsilon zeta", "en", "src2", 18),
        (1, "delta epsilon zeta redelivered", "en", "src9", 30),
        (2, "eta theta iota", None, "src3", 14),
        (2, "eta theta iota", "", "src3", 14),
        (3, "kappa lambda mu kappa", "de", "src4", 21),
    ]
    embs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0, 0.0], 1),
        (1, [0.0, 1.0, 0.001, 0.0], 1),
        (2, [0.0, 0.0, 1.0, 0.0], None),
        (2, [0.0, 0.0, 1.0, 0.0], 2),
        (3, [0.5, 0.5, 0.5, 0.5], 3),
        (4, [0.9, 0.1, 0.0, 0.1], 0),
        (5, [0.1, 0.9, 0.1, 0.0], 1),
    ]
    d = tmp_path_factory.mktemp("dupent")
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(d / "documents.parquet"))
    spark.createDataFrame(embs, _EMB_SCHEMA).write.parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


def test_canonical_entity_pick_matches_sql_twin(spark, dup_entities_sf):
    import duckdb

    from azure_func_forem_data_etl_spark.sources.tables import (
        SQL_DOCS_CANON,
        SQL_EMB_CANON,
        entity_table,
    )

    got = {
        r["doc_id"]: (r["text"], r["lang"], r["source"])
        for r in entity_table(spark, dup_entities_sf, "documents").collect()
    }
    assert len(got) == 4  # one row per id
    # doc 1: the shorter (n_chars-minimal) payload wins
    assert got[1][0] == "delta epsilon zeta"
    # doc 2: the null-flag key breaks the NULL-vs-'' tie COALESCE alone
    # would collapse — non-NULL ('') sorts first (false < true), same on
    # both engines; the point is determinism, verified against the twin
    assert got[2][1] == ""

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{dup_entities_sf}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT doc_id, text, lang, source FROM {SQL_DOCS_CANON} d"
        ).fetchall()
    }
    assert got == want

    gote = {
        r["vec_id"]: (r["embedding"], r["label"])
        for r in entity_table(spark, dup_entities_sf, "embeddings").collect()
    }
    assert len(gote) == 6
    # vec 1: the component-wise smaller drifted copy wins
    assert gote[1][0] == [0.0, 1.0, 0.0, 0.0]
    # vec 2: identical vectors — the label null-flag breaks the tie
    # (non-NULL first, false < true)
    assert gote[2][1] == 2
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{dup_entities_sf}/embeddings.parquet/*.parquet')"
    )
    wante = {
        r[0]: ([round(float(x), 6) for x in r[1]], r[2])
        for r in con.execute(
            f"SELECT vec_id, embedding, label FROM {SQL_EMB_CANON} e"
        ).fetchall()
    }
    gote_r = {k: ([round(float(x), 6) for x in v[0]], v[1]) for k, v in gote.items()}
    assert gote_r == wante


def test_dup_entity_queries_match_oracle_on_planted_corpus(
    spark, dup_entities_sf
):
    """Three representative per-id queries agree with their oracles on a
    corpus with duplicate entity ids (pre-fix: engine-arbitrary picks)."""
    for name in ("udtf_repeated_terms", "dedup_keep_decision"):
        q = _load(name)
        if q.oracle is None:
            continue
        try:
            assert_matches_oracle(
                q.fn(spark, dup_entities_sf), q.oracle, dup_entities_sf
            )
        except Exception as exc:  # pragma: no cover - explicit skip note
            if "events.parquet" in str(exc) or "lineitem" in str(exc):
                continue  # query needs tables this planted dir omits
            raise
