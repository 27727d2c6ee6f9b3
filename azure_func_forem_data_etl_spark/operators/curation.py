"""Training-data curation pipeline: the end-to-end composition the
LLM-data north star exists for (SURVEY.md §2b) — quality filter -> exact
dedup -> near-dup dedup -> deterministic split — expressed as one
declarative DataFrame chain so Catalyst fuses the scan/filter/project
stages and the only shuffles are the dedup aggregations themselves.

Stage order matters at 100 TB: quality scoring is a map-only pass and
runs FIRST so every later (shuffling) stage sees a smaller corpus;
exact dedup (32-byte hash shuffle) runs before MinHash so near-dup
bucketing never wastes work on byte-identical copies.

The SQL-expressible prefix (quality + exact dedup + split) is
oracle-checked as ``curation_doc_status``; the full pipeline including
the MinHash near-dup stage is ``curation_pipeline_summary`` (rows-only:
engine-specific hashes, invariants unit-tested in tests/test_llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.operators.text import _SW_SQL, text_quality_score
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table

QUALITY_THRESHOLD = 0.25  # drops the bottom ~quartile of the test corpus


def _split_expr(id_col: str) -> F.Column:
    """75/12.5/12.5 split from the md5 hex nibble of the stable id —
    engine-portable and rerun-stable (same rule as dataset_split_hash)."""
    hx = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    return (
        F.when(hx.between("0", "b"), "train")
        .when(hx.isin("c", "d"), "val")
        .otherwise("test")
    )


def doc_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, quality_score, status, split): the SQL-expressible pipeline
    prefix.  status ∈ {low_quality, exact_dup, kept}; split only for kept.
    Exact dedup runs among quality survivors (keep min doc_id per md5)."""
    docs = table(spark, sf_dir, "documents")
    q = text_quality_score(spark, sf_dir).select(
        "doc_id", F.round("quality_score", 6).alias("qs"), "n_words"
    )
    d = docs.select("doc_id", "text").join(q, "doc_id", "left")
    passing = d.filter(F.col("qs") >= QUALITY_THRESHOLD)
    reps = (
        passing.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("rep_id"))
    )
    with_rep = passing.join(reps, F.md5(passing["text"]) == reps["fp"], "left")
    status = (
        d.join(with_rep.select("doc_id", "rep_id"), "doc_id", "left")
        .withColumn(
            "status",
            F.when(F.col("qs").isNull() | (F.col("qs") < QUALITY_THRESHOLD), "low_quality")
            .when(F.col("doc_id") != F.col("rep_id"), "exact_dup")
            .otherwise("kept"),
        )
    )
    return status.select(
        "doc_id",
        F.col("qs").alias("quality_score"),
        "status",
        F.when(F.col("status") == "kept", _split_expr("doc_id")).alias("split"),
        "n_words",
    )


@register(
    "curation_doc_status",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, n_words,
               round(0.5 * stopword_ratio
                 + 0.3 * least(n_words / 100.0, 1.0)
                 + 0.2 * (n_distinct_words / n_words), 6) AS qs
        FROM (
            SELECT doc_id,
                   len(words) AS n_words,
                   len(list_distinct(words)) AS n_distinct_words,
                   len(list_filter(words, w -> w IN ({_SW_SQL}))) / len(words) AS stopword_ratio
            FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents)
            WHERE len(words) > 0
        )
    ),
    d AS (
        SELECT doc.doc_id, doc.text, q.qs, q.n_words
        FROM documents doc LEFT JOIN q ON doc.doc_id = q.doc_id
    ),
    passing AS (SELECT doc_id, text FROM d WHERE qs >= {QUALITY_THRESHOLD}),
    reps AS (SELECT md5(text) AS fp, MIN(doc_id) AS rep_id FROM passing GROUP BY md5(text)),
    status AS (
        SELECT d.doc_id, d.qs, d.n_words,
               CASE WHEN d.qs IS NULL OR d.qs < {QUALITY_THRESHOLD} THEN 'low_quality'
                    WHEN d.doc_id <> r.rep_id THEN 'exact_dup'
                    ELSE 'kept' END AS status
        FROM d LEFT JOIN passing p ON d.doc_id = p.doc_id
               LEFT JOIN reps r ON md5(p.text) = r.fp
    )
    SELECT doc_id, qs AS quality_score, status,
           CASE WHEN status = 'kept' THEN
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
                    ELSE 'test' END
           END AS split,
           n_words
    FROM status
    """,
    doc="Curation pipeline prefix: quality filter -> exact dedup (among "
    "survivors, keep min id) -> split assignment; one status row per doc.",
)
def curation_doc_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_status(spark, sf_dir)


@register(
    "curation_pipeline_summary",
    oracle=None,  # MinHash near-dup stage: engine-specific hashes (rows-only)
    doc="Full curation pipeline incl. MinHash near-dup dedup: per-status "
    "doc and word counts (train/val/test/low_quality/exact_dup/near_dup).",
)
def curation_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation funnel in one result: how many docs each stage
    dropped and what survived into each split.  The near-dup stage runs
    MinHash-LSH + connected components over the kept docs only (the
    smallest corpus any stage sees) and keeps one representative (min
    doc_id) per duplicate cluster."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    status = doc_status(spark, sf_dir)
    kept = status.filter(F.col("status") == "kept").select("doc_id", "split", "n_words")
    kept_docs = kept.join(docs.select("doc_id", "text"), "doc_id")
    pairs = minhash_lsh_pairs(kept_docs)
    comp = connected_components(pairs, "doc_a", "doc_b")
    neardup_losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    final = (
        status.join(neardup_losers.withColumn("_nd", F.lit(1)), "doc_id", "left")
        .withColumn(
            "bucket",
            F.when(F.col("_nd") == 1, "near_dup")
            .when(F.col("status") != "kept", F.col("status"))
            .otherwise(F.col("split")),
        )
    )
    return (
        final.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("n_words", F.lit(0))).alias("n_words_total"),
        )
    )
