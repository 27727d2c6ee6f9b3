"""Data sources: parquet test tables, bronze JSON articles, the paginated
REST source simulator, and persisted pipeline state (watermark / cursor)."""

from azure_func_forem_data_etl_spark.sources.tables import TABLES, load_tables, table

__all__ = ["TABLES", "load_tables", "table"]
