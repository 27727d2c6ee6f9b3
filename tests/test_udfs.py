"""UDF framework tests: pandas_udf vs row-at-a-time udf equivalence,
applyInPandas group-agg correctness, plus the remaining source-format
surface (CSV scan, nested-field predicates on the article schema)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from azure_func_forem_data_etl_spark.plans.registry import load_all
from azure_func_forem_data_etl_spark.sources.bronze import read_bronze_json
from azure_func_forem_data_etl_spark.sources.tables import table
from tests.fixtures import make_article, ts


def test_pandas_udf_matches_row_udf(spark, sf_dir):
    """Same formula via vectorized pandas_udf and row-at-a-time udf must
    agree — the difference is purely throughput (10-100x), which is why no
    hot path uses the row form."""
    import math

    @F.udf("double")
    def row_burstiness(v):
        return abs(v - (math.floor(v / 10.0) * 10.0 + 5.0))

    q = load_all()["pandas_udf_scalar"]
    fast = {r["event_id"]: r["burstiness"] for r in q.fn(spark, sf_dir).collect()}
    events = table(spark, sf_dir, "events")
    slow = {
        r["event_id"]: r["b"]
        for r in events.select("event_id", row_burstiness("value").alias("b")).collect()
    }
    assert fast.keys() == slow.keys()
    assert all(abs(fast[k] - slow[k]) < 1e-12 for k in fast)


def test_applyinpandas_quantiles_ordering(spark, sf_dir):
    rows = load_all()["applyinpandas_quantiles"].fn(spark, sf_dir).collect()
    assert len(rows) == 5  # one per event type
    for r in rows:
        assert r["p25"] <= r["median"] <= r["p75"]
        assert r["n"] > 0


def test_csv_source_roundtrip(spark, tmp_path):
    """CSV scan surface (SURVEY.md §2b scans row): explicit schema, header,
    type coercion — same lake, different wire format."""
    events = spark.createDataFrame(
        [(1, "click", 2.5), (2, "view", 0.0), (3, "click", 7.25)],
        "event_id bigint, event_type string, value double",
    )
    path = str(tmp_path / "csv")
    events.write.option("header", True).csv(path)
    back = (
        spark.read.schema("event_id bigint, event_type string, value double")
        .option("header", True)
        .csv(path)
    )
    got = sorted(map(tuple, back.collect()))
    assert got == [(1, "click", 2.5), (2, "view", 0.0), (3, "click", 7.25)]


def test_nested_field_predicate_on_articles(spark, tmp_path):
    """Predicates on nested struct fields (user.username) and array
    containment (tag_list) over the bronze article schema."""
    arts = [make_article(i, ts(day=1 + i % 20)) for i in range(30)]
    blob = tmp_path / "b"
    blob.mkdir()
    (blob / "page.json").write_text(json.dumps(arts, indent=2))
    bronze = read_bronze_json(spark, str(blob), multi_line=True)

    by_user = bronze.filter(F.col("user.username") == "user3")
    assert {r["id"] for r in by_user.collect()} == {i for i in range(30) if i % 7 == 3}

    tagged = bronze.filter(F.array_contains("tag_list", "data"))
    assert {r["id"] for r in tagged.collect()} == {i for i in range(30) if i % 2 == 1}


def test_arrow_normalize_contract(spark, sf_dir):
    """mapInArrow normalizer: every output is unit-length (norm of the
    returned unit vector == 1), norm matches a JVM-side recompute, and the
    op is deterministic across runs."""
    from azure_func_forem_data_etl_spark.operators.udfs import (
        arrow_normalize_embeddings,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table
    from pyspark.sql import functions as F

    out = arrow_normalize_embeddings(spark, sf_dir)
    # JVM-side recompute of the norm (aggregate over the float array).
    jvm = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            ),
            6,
        ).alias("jvm_norm"),
    )
    joined = out.join(jvm, "vec_id")
    assert joined.filter(F.abs(F.col("norm") - F.col("jvm_norm")) > 1e-6).count() == 0
    a = out.collect()
    b = arrow_normalize_embeddings(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_deterministic_sample_fraction(spark, sf_dir):
    """The md5-nibble sample is ~2/16 of the table (binomial tolerance)."""
    from azure_func_forem_data_etl_spark.operators.scalars import (
        deterministic_sample,
    )
    from azure_func_forem_data_etl_spark.sources.tables import table
    from pyspark.sql import functions as F

    total = table(spark, sf_dir, "lineitem").count()
    sampled = (
        deterministic_sample(spark, sf_dir)
        .agg(F.sum("n_rows").alias("n"))
        .collect()[0]["n"]
    )
    frac = sampled / total
    assert 0.09 < frac < 0.16, frac
