"""PySpark-native analytics engine with the capabilities of
``eremina-official/azure-func-forem-data-etl`` (an Azure Functions ETL that
incrementally ingests paginated REST article pages into date-partitioned
blob storage), re-expressed Spark-first and extended with the relational +
LLM-data-pipeline surface described in SURVEY.md §2.

Layout
------
- ``session``    : tuned SparkSession builder (UTC, AQE, Arrow).
- ``sources``    : parquet table loaders, bronze JSON reader, paginated REST
                   source simulator, watermark/cursor state tables.
- ``operators``  : relational query builders, as-of/range joins, dedup
                   (exact / MinHash-LSH / SimHash / Jaccard / embedding),
                   similarity search, multimodal column plumbing.
- ``functions``  : reusable column expressions (exact decimal aggregates,
                   text statistics, vector math).
- ``plans``      : the query registry (Spark callable + DuckDB oracle SQL
                   pairs) and batch pipeline drivers (incremental ingest,
                   backfill).
- ``streaming``  : Structured Streaming jobs and window builders.
"""

__version__ = "0.1.0"
