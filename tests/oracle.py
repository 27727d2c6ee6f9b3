"""DuckDB-oracle differential harness — mirrors the driver's compare
(row-count + column names + order-insensitive value compare), but stricter:
values are compared exactly (bit-exact floats), so anything passing here
passes a hash compare too."""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_oracle(sql: str, sf_dir: str):
    """Run oracle SQL with the test tables registered as views.  Planted
    fixture dirs may carry only the tables a test needs — skip absent
    files (the real sf dirs always have all ten)."""
    import os

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        if os.path.isdir(p):  # Spark-written datasets are directories
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def _canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if hasattr(v, "to_pydatetime"):  # pandas.Timestamp
        return _canon(v.to_pydatetime())
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    return str(v)


def canonical_rows(df_pandas) -> list[tuple[str, ...]]:
    """Column-name-sorted, row-sorted, stringified rows."""
    cols = sorted(df_pandas.columns)
    out = []
    for row in df_pandas[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon(v) for v in row))
    return sorted(out)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    got = spark_df.toPandas()
    want = run_oracle(oracle_sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    g, w = canonical_rows(got), canonical_rows(want)
    mism = [(a, b) for a, b in zip(g, w) if a != b]
    assert not mism, f"{len(mism)} mismatched rows; first 3: {mism[:3]}"
