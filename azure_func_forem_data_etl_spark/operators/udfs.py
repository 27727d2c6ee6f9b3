"""UDF framework surface (SURVEY.md §2b, last row): vectorized scalar
``pandas_udf`` and ``applyInPandas`` custom per-group aggregation.

Placement rules these demonstrate (and the rest of the engine follows):
- built-in Catalyst expressions wherever possible (every other operator
  module) — whole-stage codegen, no Python;
- when Python is genuinely needed, Arrow-vectorized ``pandas_udf`` /
  ``applyInPandas`` — never row-at-a-time ``udf`` in a hot path.  A
  row-at-a-time ``udf`` is ~10-100x slower (tested in
  tests/test_udfs.py::test_pandas_udf_matches_row_udf).

At 100 TB: the scalar UDF is embarrassingly parallel over Arrow batches;
the grouped agg shuffles once on the group key and holds one group per
invocation in memory — groups here are event types (5), so a real
deployment salts or pre-aggregates if a single group outgrows an executor.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from typing import Iterator

from pyspark.sql.functions import pandas_udf

from azure_func_forem_data_etl_spark.functions.exact import dround, sql_dround
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import (
    SQL_DOCS_CANON,
    entity_table,
    table,
)


def _burstiness_fn(values: pd.Series) -> pd.Series:
    """Vectorized scalar: |value| distance from its bucket center —
    arbitrary-but-deterministic arithmetic; the point is the
    Arrow-vectorized plumbing, not the formula.

    Wrapped with ``pandas_udf`` at call time (not module level with a DDL
    string): executors re-import this module inside UDF workers, where no
    SparkSession exists to parse a DDL return type."""
    v = values.to_numpy(dtype=np.float64)
    bucket = np.floor(v / 10.0) * 10.0 + 5.0
    return pd.Series(np.abs(v - bucket))


@register(
    "pandas_udf_scalar",
    oracle="""
    SELECT event_id,
           value,
           abs(value - (floor(value / 10.0) * 10.0 + 5.0)) AS burstiness
    FROM events
    """,
    doc="Vectorized scalar pandas_udf (Arrow batches); oracle mirrors the arithmetic.",
)
def pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    burstiness = pandas_udf(_burstiness_fn, T.DoubleType())
    return events.select("event_id", "value", burstiness("value").alias("burstiness"))


_QUANTILE_SCHEMA = "event_type string, p25 double, median double, p75 double, n bigint"


def _group_quantiles(pdf: pd.DataFrame) -> pd.DataFrame:
    """Custom per-group aggregate: exact quantiles via numpy (linear
    interpolation — the quantile_cont definition DuckDB uses).

    NULL values are MEASUREMENTS THAT DIDN'T HAPPEN (r12 NULL-heavy
    sweep): they are excluded like quantile_cont excludes them, ``n``
    counts measurements (COUNT(value), not COUNT(*)), and an all-NULL
    group keeps its row with NULL quantiles on both engines."""
    v = pdf["value"].dropna().to_numpy(dtype=np.float64)
    if len(v):
        q25, q50, q75 = (round(q, 6) for q in np.quantile(v, [0.25, 0.5, 0.75]))
    else:
        q25 = q50 = q75 = None
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "p25": [q25],
            "median": [q50],
            "p75": [q75],
            "n": [len(v)],
        }
    )


@register(
    "applyinpandas_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS median,
           round(quantile_cont(value, 0.75), 6) AS p75,
           -- COUNT(value), not COUNT(*): n counts MEASUREMENTS, matching
           -- the NULL-skipping quantiles (r12 NULL-heavy sweep)
           COUNT(value) AS n
    FROM events
    GROUP BY event_type
    """,
    doc="applyInPandas custom aggregation: exact per-group quantiles (quantile_cont).",
)
def applyinpandas_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_group_quantiles, schema=_QUANTILE_SCHEMA)
    )


def _l2_normalize_batches(batches):
    """mapInArrow worker: L2-normalize each embedding in-place per Arrow
    batch.  Pure numpy on the Arrow buffers — no pandas conversion at all,
    the cheapest Python path Spark offers."""
    import pyarrow as pa

    for batch in batches:
        tbl = batch.to_pydict()
        vecs = [np.asarray(v, dtype=np.float64) for v in tbl["embedding"]]
        normed = []
        norms = []
        for v in vecs:
            # sequential left-to-right sum of squares (cumsum), NOT
            # np.dot: dot's pairwise/SIMD accumulation diverges from the
            # oracle's sequential list fold by >1 ulp once norms reach
            # 1e14 (r11 embedding-magnitude sweep) — the fold order IS
            # the cross-engine contract
            sq = v * v
            n = float(np.sqrt(np.cumsum(sq)[-1])) if len(sq) else 0.0
            norms.append(n)
            # normalization domain = finite positive norm (r13 specials
            # sweep): zero / NaN / Inf norms pass the vector through RAW
            # on BOTH engines (the oracle mirrors this CASE) — dividing
            # by a non-finite norm turns finite components into NaN/0
            # lane-by-lane differently per engine
            normed.append(
                (v / n).tolist() if (n > 0 and math.isfinite(n)) else v.tolist()
            )
        yield pa.RecordBatch.from_pydict(
            {"vec_id": tbl["vec_id"], "norm": norms, "unit": normed}
        )


@register(
    "arrow_normalize_embeddings",
    # The fold order is the contract: both sides sum squares
    # SEQUENTIALLY left-to-right (numpy cumsum / list_sum), because any
    # pairwise accumulation diverges by >1 ulp once norms reach 1e14
    # (r11 embedding-magnitude sweep); rounding is the shortest-repr
    # dround contract (plain round re-rounds 1e14-magnitude norms on the
    # scaled path), and + 0.0 normalizes the IEEE -0.0 a tiny-negative
    # first component leaves behind after rounding.
    oracle=f"""
    WITH s AS (
        SELECT vec_id, embedding::DOUBLE[] AS e,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
                   AS nrm
        FROM embeddings
    )
    SELECT vec_id,
           {sql_dround("nrm", 6)} AS norm,
           -- normalize only under a finite positive norm; zero/NaN/Inf
           -- norms pass the raw component through (r13 specials sweep —
           -- the nrm < Inf leg rejects NaN under either engine's NaN
           -- comparison convention, see similarity.sql_cosine_domain)
           {sql_dround(
               "CASE WHEN nrm < 'Infinity'::DOUBLE AND nrm > 0"
               " THEN e[1] / nrm ELSE e[1] END", 6)}
               + 0.0 AS unit_x0,
           CAST(len(e) AS INT) AS dim
    FROM s
    """,
    doc="mapInArrow embedding L2-normalization: numpy directly on Arrow "
    "batches, zero pandas overhead; surfaced scalars oracle-checked.",
)
def arrow_normalize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third Python-integration tier after pandas_udf/applyInPandas:
    ``mapInArrow`` hands the raw Arrow RecordBatch to Python.  For vector
    workloads (normalization, quantization, feature hashing) this skips the
    pandas wrap entirely; at 100 TB it is a map-only pass that parallelizes
    with the scan, no shuffle."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("norm", T.DoubleType()),
            T.StructField("unit", T.ArrayType(T.DoubleType())),
        ]
    )
    out = emb.mapInArrow(_l2_normalize_batches, schema)
    # Surface scalar columns for the rows-only driver check (array col
    # stays internal-friendly but the check hashes only what we return).
    return out.select(
        "vec_id",
        # shortest-repr rounding (exact.dround): plain round re-rounds
        # 1e14-magnitude norms on the scaled path; + 0.0: -0.0 -> +0.0
        dround(F.col("norm"), 6).alias("norm"),
        (dround(F.element_at("unit", 1), 6) + F.lit(0.0)).alias("unit_x0"),
        F.size("unit").alias("dim"),
    )


# ---------------------------------------------------------------------------
# Python UDTF (table function) — Spark 4 surface, Arrow-optimized


@register(
    "udtf_repeated_terms",
    oracle=f"""
    WITH documents_canon AS {SQL_DOCS_CANON}
    SELECT doc_id, word, CAST(COUNT(*) AS INT) AS cnt
    FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
        FROM documents_canon
    ) t
    WHERE word <> ''
    GROUP BY doc_id, word
    HAVING COUNT(*) >= 2
    """,
    doc="Python UDTF (LATERAL, Arrow-optimized): per-doc repeated terms "
    "with in-row counting — the table-function UDF surface.",
)
def udtf_repeated_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDTF completes the UDF family (scalar pandas_udf, grouped
    applyInPandas, mapInArrow, and now table functions): one input row ->
    many output rows with per-row Python state, which neither a scalar
    UDF nor explode can express when the fanout logic is imperative.

    Arrow-optimized (``useArrow=True`` -> ArrowEvalPythonUDTF in the
    plan, never row-pickled BatchEvalPython).  The counting is row-local,
    so the operator is map-only — fanout happens executor-side with zero
    shuffles, and at 100 TB it parallelizes with file splits exactly like
    doc_chunking's JVM explode."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, cnt int", useArrow=True)
    class RepeatedTerms:
        def eval(self, doc_id, text):  # noqa: ANN001 (Spark calls positionally)
            from collections import Counter

            # split(" ") — single-space delimiter, identical to the oracle's
            # string_split(text, ' '); empty tokens dropped on BOTH sides so
            # the tokenizers are defined identically, not coincidentally
            # equal on a corpus with no runs of whitespace.
            for w, c in Counter((text or "").split(" ")).items():
                if c >= 2 and w:
                    yield w, int(c)

    spark.udtf.register("repeated_terms_udtf", RepeatedTerms)
    # canonical doc grain (r13 dup-entity leg; oracle mirrors): the
    # per-(doc_id, word) counts are per-ID semantics
    entity_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.word, t.cnt "
        "FROM _udtf_docs, LATERAL repeated_terms_udtf(doc_id, text) t"
    )


def _gini_fn(values: pd.Series) -> float:
    """Gini coefficient of a non-negative series (sorted-rank formula)."""
    x = values.sort_values().to_numpy(dtype="float64")
    n = x.size
    s = x.sum()
    if n == 0 or s == 0:
        return 0.0
    i = pd.RangeIndex(1, n + 1).to_numpy(dtype="float64")
    return float((2.0 * (i * x).sum()) / (n * s) - (n + 1.0) / n)


@register(
    "pandas_udaf_gini",
    oracle="""
    -- measured values only (r12 NULL-heavy sweep): the old unfiltered
    -- form ranked NULLs (engine-opposite default order) and mixed
    -- NULL-skipping SUMs with COUNT(*) — concentration is a statistic
    -- of the observed values
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS i
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           round((2.0 * SUM(i * value)) / (COUNT(*) * SUM(value))
                 - (COUNT(*) + 1.0) / COUNT(*), 9) AS gini
    FROM r GROUP BY event_type
    """,
    doc="Grouped-aggregate pandas UDF (the UDAF flavor): Gini "
    "concentration of value per event type; oracle re-derives the "
    "sorted-rank formula with a window + aggregate.",
)
def pandas_udaf_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED_AGG pandas_udf flavor — Arrow ships each group's
    column once, the UDAF returns one scalar; Spark plans it like any
    aggregate (partial-less: full group to Python), so groups must fit
    an Arrow batch — true for per-type series; a 100 TB variant
    pre-reduces per partition first.  Ties sort identically on both
    sides because equal values contribute the same regardless of rank
    order within the tie (i*x summed over a tie block is
    order-invariant); rounding absorbs float-order ulps."""
    gini = pandas_udf(_gini_fn, "double")  # Series -> scalar: GROUPED_AGG
    # measured values only — see the oracle note (r12 NULL-heavy sweep);
    # filtering BEFORE the groupBy also drops all-NULL groups on both
    # engines symmetrically
    events = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # NB: a GROUPED_AGG pandas UDF cannot mix with built-in aggregates
    # in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — single-output UDAF.
    return events.groupBy("event_type").agg(
        F.round(gini("value"), 9).alias("gini")
    )


@register(
    "pandas_udf_scalar_iter",
    oracle="""
    SELECT event_id,
           value,
           round(value * 0.0875 + 0.30, 6) AS fee
    FROM events
    """,
    doc="Iterator-form pandas_udf (SCALAR_ITER): per-worker one-time init amortized over every Arrow batch of the partition; oracle mirrors the fee arithmetic.",
)
def pandas_udf_scalar_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALAR_ITER tier completes the Python-integration matrix
    (scalar pandas_udf / grouped-agg / applyInPandas / mapInArrow / UDTF /
    ...WithState): the UDF receives an *iterator of batches*, so expensive
    per-worker setup — loading a model, compiling a regex set, opening a
    codec — runs ONCE per task rather than once per batch.  Here the
    'model' is a fee schedule materialized before the loop; the arithmetic
    stays vectorized per batch.  At 100 TB this is the pattern for any
    inference-in-pipeline step: init cost amortizes over the whole
    partition, Arrow keeps the transfer columnar."""
    @pandas_udf(T.DoubleType())
    def fee_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-task init (stand-in for a model/codec load)
        rate, fixed = 0.0875, 0.30
        for values in batches:
            yield (values * rate + fixed).round(6)

    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", "value", fee_iter("value").alias("fee"))


UDTF_SPLIT_PARTS = 3


@register(
    "udtf_dynamic_split",
    oracle=f"""
    SELECT doc_id,
           substring(text, 1, w) AS chunk_0,
           substring(text, w + 1, w) AS chunk_1,
           substring(text, 2 * w + 1, w) AS chunk_2
    FROM (
        SELECT doc_id, text,
               CAST(ceil(length(text) / {UDTF_SPLIT_PARTS}.0) AS INT) AS w
        FROM documents
    )
    """,
    doc=f"Polymorphic Python UDTF: output schema (chunk_0..chunk_"
    f"{UDTF_SPLIT_PARTS - 1}) computed at PLAN time by analyze() from the "
    "constant part-count argument.",
)
def udtf_dynamic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dynamic-schema half of the UDTF surface: ``analyze()`` runs at
    analysis time, reads the CONSTANT part-count argument, and returns
    the output StructType — so one table function serves any width
    without N hardcoded variants (Spark 4's polymorphic UDTF contract).
    The static-schema UDTF above covers the fanout case; this one covers
    schema-from-arguments.

    Runtime is Arrow-optimized and row-local (equal-width string split),
    so the plan stays map-only — same zero-shuffle scale story as every
    codegen string op, with the Python boundary batched.
    """
    import math

    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FixedWidthSplit:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(k.value, int) or k.value < 1:
                raise ValueError("part count must be a constant positive int")
            return AnalyzeResult(
                StructType(
                    [StructField(f"chunk_{i}", StringType()) for i in range(k.value)]
                )
            )

        def eval(self, text, k):  # noqa: ANN001 (Spark calls positionally)
            # NULL text -> NULL chunks, exactly like substring(NULL)
            # (r12 NULL-heavy sweep: `text or ""` conflated NULL with
            # the empty string, whose chunks are '' not NULL)
            if text is None:
                yield tuple(None for _ in range(k))
                return
            w = math.ceil(len(text) / k) if text else 0
            yield tuple(text[i * w : (i + 1) * w] for i in range(k))

    spark.udtf.register("fixed_width_split", udtf(FixedWidthSplit, useArrow=True))
    table(spark, sf_dir, "documents").select("doc_id", "text").createOrReplaceTempView(
        "__docs_for_split"
    )
    return spark.sql(
        f"SELECT doc_id, s.* FROM __docs_for_split, "
        f"LATERAL fixed_width_split(text, {UDTF_SPLIT_PARTS}) s"
    )
