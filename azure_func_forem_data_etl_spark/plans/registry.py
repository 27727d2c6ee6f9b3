"""Central query registry: every implemented operator from SURVEY.md §2 is
registered here as a (Spark callable, DuckDB oracle SQL) pair.

The correctness driver (``__spark_entry__.py``) runs each Spark callable at
sf=0.01 and hash-compares it against the oracle SQL run by DuckDB on the
same parquet files.  Queries whose semantics are not ANSI-SQL-expressible
(e.g. MinHash-LSH with engine-specific hashes) register ``oracle=None`` and
get the driver's weaker rows-only check.

Column-name discipline: the driver sorts columns by name before hashing, so
every computed column is aliased identically in the Spark builder and the
oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def _wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return _wrap


def load_all() -> dict[str, Query]:
    """Import every operator module so its ``@register`` calls run."""
    # Imports are here (not module top) to avoid circular imports.
    from azure_func_forem_data_etl_spark.operators import (  # noqa: F401
        clustering,
        curation,
        dedup,
        hygiene,
        multimodal,
        relational,
        scalars,
        similarity,
        sketch,
        skew,
        subqueries,
        temporal,
        text,
        udfs,
        windows,
    )
    from azure_func_forem_data_etl_spark.streaming import (  # noqa: F401
        rollup as streaming_rollup,
        sessionize,
        windows as streaming_windows,
    )

    return REGISTRY
