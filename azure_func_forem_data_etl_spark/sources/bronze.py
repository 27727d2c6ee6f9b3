"""Bronze layer: Forem article JSON.

The reference lands each fetched batch as a pretty-printed JSON **array**
blob (fetch_articles.py:128-133, ``indent=2``) under a date-partitioned
name (``{YYYY-MM-DD}/page={N}_{ts}.json``, fetch_articles.py:123-126) and
treats articles as ``dict[str, Any]`` — schema-on-read, the only
interpreted field being ``published_at`` (fetch_articles.py:95-97).

Engine decisions (SURVEY.md §1.3, §7 risk register):
- explicit ``ARTICLE_SCHEMA`` (FIXTURES.md §A) instead of dict-of-any;
- PERMISSIVE parse with a ``_corrupt_record`` quarantine column instead
  of silently skipping malformed rows (reference F2, fetch_articles.py:94-100);
- we can *read* the reference's multiLine JSON-array blobs for
  compatibility, but *write* line-delimited JSON / parquet ourselves:
  multiLine JSON is not splittable — a real hazard at 100 TB;
- timestamps parse with ``to_timestamp`` (ISO-8601 ``Z`` handled
  natively — the reference needed a manual ``Z``→``+00:00`` replace,
  fetch_articles.py:95-97).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from azure_func_forem_data_etl_spark.session import ensure_query_session_conf

USER_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("twitter_username", T.StringType()),
        T.StructField("github_username", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("website_url", T.StringType()),
        T.StructField("profile_image", T.StringType()),
        T.StructField("profile_image_90", T.StringType()),
    ]
)

ORG_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("slug", T.StringType()),
        T.StructField("profile_image", T.StringType()),
        T.StructField("profile_image_90", T.StringType()),
    ]
)

FLARE_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("bg_color_hex", T.StringType()),
        T.StructField("text_color_hex", T.StringType()),
    ]
)

# Public dev.to /api/articles shape (FIXTURES.md §A).  published_at stays
# a string here — parsing to timestamp is an explicit projection so the
# malformed-record filter (F2) can quarantine rather than crash.
ARTICLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("slug", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("canonical_url", T.StringType()),
        T.StructField("cover_image", T.StringType()),
        T.StructField("social_image", T.StringType()),
        T.StructField("published_at", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("edited_at", T.StringType()),
        T.StructField("last_comment_at", T.StringType()),
        T.StructField("comments_count", T.IntegerType()),
        T.StructField("positive_reactions_count", T.IntegerType()),
        T.StructField("public_reactions_count", T.IntegerType()),
        T.StructField("reading_time_minutes", T.IntegerType()),
        T.StructField("tag_list", T.ArrayType(T.StringType())),
        T.StructField("user", USER_SCHEMA),
        T.StructField("organization", ORG_SCHEMA),
        T.StructField("flare_tag", FLARE_SCHEMA),
    ]
)

BRONZE_SCHEMA = T.StructType(
    [*ARTICLE_SCHEMA.fields, T.StructField("_corrupt_record", T.StringType())]
)


def read_bronze_json(
    spark: SparkSession, path: str, multi_line: bool = True
) -> DataFrame:
    """Read article blobs with quarantine.

    ``multi_line=True`` reads the reference's pretty-printed JSON-array
    blobs (compat mode — NOT splittable, fine for small bronze pages);
    ``False`` reads line-delimited JSON (our own sink format — splittable,
    the only sane choice at 100 TB).
    """
    ensure_query_session_conf(spark)
    return (
        spark.read.schema(BRONZE_SCHEMA)
        .option("multiLine", multi_line)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def parse_articles(bronze: DataFrame) -> DataFrame:
    """P1 + F2 as explicit columns: ``published_at_ts`` (NULL when
    missing/malformed — reference skipped such rows with a warning,
    fetch_articles.py:98-100) and ``is_corrupt``."""
    return bronze.withColumn(
        "published_at_ts", F.try_to_timestamp("published_at")
    ).withColumn(
        "is_corrupt",
        F.col("_corrupt_record").isNotNull()
        | (F.col("published_at").isNotNull() & F.col("published_at_ts").isNull()),
    )


def quarantine_split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — the engine's version of log-and-skip."""
    clean = parsed.filter(~F.col("is_corrupt") & F.col("published_at_ts").isNotNull())
    bad = parsed.filter(F.col("is_corrupt") | F.col("published_at_ts").isNull())
    return clean, bad
