"""Oracle-differential parity for every registered query (SURVEY.md §5.1).

Parametrized over the registry, so adding a query automatically adds its
parity test.  Queries without an oracle get a rows-only sanity check.
"""

from __future__ import annotations

import pytest

from azure_func_forem_data_etl_spark.plans.registry import load_all
from tests.oracle import assert_matches_oracle

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_parity(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    # Driver-canonicalizer contract: registry-facing outputs must be flat
    # scalar columns — pandas sort_values/hashing chokes on list/map/struct
    # cells (the exact failure behind the two r01 hard errors).
    from pyspark.sql import types as T

    for f in df.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), f"{name}.{f.name}: complex type {f.dataType} breaks driver canonicalization"
    if q.oracle is None:
        # Rows-only: must run and produce a stable schema.
        assert df.columns
        df.collect()
    else:
        assert_matches_oracle(df, q.oracle, sf_dir)


def _discovered_sf_dirs() -> list[str]:
    """Every sf* fixture dir that is a sibling of the configured test dir.

    Derived from ``SPARK_GRAFT_TEST_SF_DIR`` exactly like conftest's
    ``sf_dir`` (ADVICE r6: a hardcoded '/root/testdata/sf{sf}' made the
    ASCII guard depend on this machine's layout and hard-error elsewhere).
    """
    from pathlib import Path

    from tests.conftest import SF_SMOKE

    root = Path(SF_SMOKE).parent
    return sorted(
        str(p) for p in root.glob("sf*") if (p / "documents.parquet").exists()
    )


@pytest.mark.parametrize("sf_fixture_dir", _discovered_sf_dirs())
def test_documents_text_is_ascii(sf_fixture_dir):
    """Fixture guard for the ``multimodal_resize`` oracle (r5 VERDICT
    "What's wrong" #1): that oracle replays the raw-tier payload with
    ``ascii(substring(text, i+1, 1))``, which equals the i-th BYTE only
    while the corpus is pure ASCII (char position == byte position).
    This asserts byte-length == char-length for every document at every
    discovered fixture SF, so a future multi-byte UTF-8 fixture
    regeneration fails HERE with a pointer instead of silently diverging
    the oracle."""
    import duckdb

    n_bad = duckdb.connect().execute(
        f"""
        SELECT COUNT(*) FROM read_parquet(
            '{sf_fixture_dir}/documents.parquet')
        WHERE octet_length(encode(text)) <> length(text)
        """
    ).fetchone()[0]
    assert n_bad == 0, (
        f"{sf_fixture_dir}: {n_bad} documents contain multi-byte UTF-8 — "
        "the multimodal_resize oracle's ascii(substring(...)) byte replay "
        "no longer matches the Spark side's raw-byte pooling; rewrite "
        "that oracle byte-wise over the BLOB before trusting it."
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert qs, "registry must not be empty"
