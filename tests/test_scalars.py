"""Unit tests for the scalar/relational coverage operators that are not
(fully) oracle-checkable: approx distinct error bound, TF-IDF ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.plans.registry import load_all


def test_approx_distinct_within_error_bound(spark, sf_dir):
    q = load_all()["agg_approx_distinct"]
    got = {r["o_orderstatus"]: r["approx_custkeys"] for r in q.fn(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for status, n in exact.items():
        # rsd=0.02 requested; allow 3x slack for small-n variance.
        assert abs(got[status] - n) <= max(3, 0.06 * n), (status, got[status], n)


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

    got = {
        r["event_type"]: (r["p50_approx"], r["p95_approx"])
        for r in load_all()["agg_approx_percentile"].fn(spark, sf_dir).collect()
    }
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    for etype, (p50, p95) in got.items():
        vals = np.array(
            [r["value"] for r in events.filter(F.col("event_type") == etype).collect()]
        )
        lo50, hi50 = np.quantile(vals, [0.45, 0.55])
        lo95, hi95 = np.quantile(vals, [0.92, 0.98])
        assert lo50 <= p50 <= hi50, (etype, p50, lo50, hi50)
        assert lo95 <= p95 <= hi95, (etype, p95, lo95, hi95)
