"""Data-hygiene operators for training-data curation: PII redaction,
text normalization, and prefix-fingerprint dedup.

These are the scrubbing passes that run over every document before
training (public methodology: C4 / RefinedWeb / Dolma cleaning stages).
All three are pure map or map+one-agg shapes — no join, no explode fanout
— so they scale linearly with corpus bytes and stay inside whole-stage
codegen (no Python in the hot path).

Reference parity note: the reference ETL (fetch_articles.py:79-114) lands
raw article JSON untouched; these operators are the engine-side cleaning
surface SURVEY.md §2b adds on top of that bronze layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table

# Regexes kept to the RE2 ∩ java.util.regex common subset so Spark (Java
# regex) and the DuckDB oracle (RE2) match byte-for-byte.
EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+"
PHONE_RE = r"\+1-555-[0-9]{4}"


@register(
    "pii_redaction",
    oracle=rf"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || doc_id ||
               '@example.com or +1-555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5,
           CAST(length(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                      '{PHONE_RE}', '<PHONE>', 'g')) AS INT)
               AS redacted_len
    FROM aug
    """,
    doc="PII redaction: email/phone patterns found, counted, and replaced "
    "with typed placeholders; verified via digest of the redacted text.",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus carries no real PII, so each doc is augmented
    with a deterministic contact line derived from ``doc_id`` — the
    redaction machinery (find/count/replace + digest verification) is the
    operator under test, and it is exactly what runs on a real corpus.

    Map-only: regex scan + replace per row inside codegen, zero shuffles.
    At 100 TB this is embarrassingly parallel and IO-bound — the right
    shape for a scrubbing pass."""
    aug = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(EMAIL_RE), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(PHONE_RE), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("int").alias("redacted_len"),
    )


@register(
    "text_normalize_stats",
    oracle=r"""
    WITH n AS (
        SELECT doc_id, n_chars,
               trim(regexp_replace(regexp_replace(lower(text),
                                                  '[^a-z0-9 ]', ' ', 'g'),
                                   ' +', ' ', 'g')) AS norm
        FROM documents
    )
    SELECT doc_id,
           md5(norm) AS norm_md5,
           CAST(length(norm) AS INT) AS n_chars_norm,
           CAST(n_chars - length(norm) AS INT) AS n_chars_removed,
           CAST(length(norm) = n_chars AS INT) AS unchanged
    FROM n
    """,
    doc="Text normalization: lowercase, strip non-alphanumerics, collapse "
    "whitespace; digest + size accounting of the canonical form.",
)
def text_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form normalization is the first stage of every dedup
    pipeline (exact dedup over raw bytes misses trivially-reformatted
    copies).  The canonical text is digest-verified against the oracle so
    the *transform* is checked, not just row counts.  Map-only, codegen,
    zero shuffles."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("int").alias("n_chars_norm"),
        (F.col("n_chars") - F.length(norm)).cast("int").alias("n_chars_removed"),
        (F.length(norm) == F.col("n_chars")).cast("int").alias("unchanged"),
    )


PREFIX_CHARS = 64


@register(
    "prefix_dedup_groups",
    oracle=f"""
    SELECT md5(substring(text, 1, {PREFIX_CHARS})) AS prefix_fp,
           CAST(COUNT(*) AS INT) AS n_docs,
           MIN(doc_id) AS rep_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) >= 2
    """,
    doc="Prefix-fingerprint dedup: docs sharing a 64-char prefix digest "
    "grouped; smallest doc_id kept as representative.",
)
def prefix_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection via shared prefixes (cheap complement to
    MinHash: templated pages differ only past their header).  Shuffles
    16-byte digests, never document bodies — the same never-shuffle-
    payloads discipline as ``dedup_exact_text`` — so the shuffle is
    O(rows * 16 B) regardless of document size."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            F.md5(F.substring("text", 1, PREFIX_CHARS)).alias("prefix_fp")
        )
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.min("doc_id").alias("rep_doc_id"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .filter(F.col("n_docs") >= 2)
    )
