"""Unit tests for the scalar/relational coverage operators that are not
(fully) oracle-checkable: approx distinct error bound, TF-IDF ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.plans.registry import load_all


def test_approx_distinct_within_error_bound(spark, sf_dir):
    """The r6 invariant projection: exact distincts replayed independently
    here, and the in-plan 3x-rsd bound boolean must hold for every group."""
    q = load_all()["agg_approx_distinct"]
    rows = q.fn(spark, sf_dir).collect()
    got = {r["o_orderstatus"]: r for r in rows}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for status, n in exact.items():
        assert got[status]["exact_custkeys"] == n
        # rsd=0.02 requested; the projection checks 3x slack in-plan.
        assert got[status]["acd_within_3rsd"] is True, (status, n)


def test_tfidf_rare_term_outranks_common(spark, tmp_path):
    """A term unique to one doc must outscore a corpus-wide term there."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["zebra common common", "common filler", "common filler"],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [10] * 3,
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).write.parquet(f"{sf}/documents.parquet")
    q = load_all()["tfidf_top_terms"]
    rows = q.fn(spark, sf).filter(F.col("doc_id") == 1).collect()
    by_rank = [r["term"] for r in rows]
    # zebra: tf=1, df=1 -> score 3e6; common: tf=2, df=3 -> score 2e6.
    assert by_rank[0] == "zebra"
    zebra = next(r for r in rows if r["term"] == "zebra")
    assert zebra["score"] == 3_000_000


def test_grouping_sets_covers_three_sets(spark, sf_dir):
    q = load_all()["grouping_sets_orders"]
    out = q.fn(spark, sf_dir).collect()
    # () set: exactly one grand-total row with both markers = 1.
    grand = [r for r in out if r["g_status"] == 1 and r["g_prio"] == 1]
    assert len(grand) == 1
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert grand[0]["n_orders"] == orders.count()


def test_approx_percentile_bounds(spark, sf_dir):
    """Sketch percentiles must land within a small rank-error band of the
    exact quantiles."""
    import numpy as np

    from azure_func_forem_data_etl_spark.plans.registry import load_all

    rows = load_all()["agg_approx_percentile"].fn(spark, sf_dir).collect()
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    for r in rows:
        # in-plan bracket containment (the r6 oracle invariant)
        assert r["p50_in_bracket"] is True, r
        assert r["p95_in_bracket"] is True, r
        assert r["p50_lo"] <= r["p50_hi"] <= r["p95_lo"] <= r["p95_hi"], r
        # the exact bracket values themselves straddle the true quantile
        vals = np.array(
            [
                x["value"]
                for x in events.filter(
                    F.col("event_type") == r["event_type"]
                ).collect()
            ]
        )
        assert r["n"] == len(vals)
        assert r["p50_lo"] <= np.quantile(vals, 0.5) <= r["p50_hi"], r
        assert r["p95_lo"] <= np.quantile(vals, 0.95) + 1e-9, r
