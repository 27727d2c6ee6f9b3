"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship incremental-ingest query at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2, one callable
each, backed by ``azure_func_forem_data_etl_spark.plans.registry``.
``oracle_sql()`` — DuckDB twin SQL for each oracle-checkable query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's cwd.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from azure_func_forem_data_etl_spark.plans.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["watermark_incremental"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
