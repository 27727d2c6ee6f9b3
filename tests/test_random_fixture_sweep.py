"""Registry-wide oracle sweep on a RANDOM fixture (round 10).

test_parity.py proves every query matches its DuckDB twin on the driver's
seed-42 fixtures; this sweep proves it on data the queries have never
seen (tests/randfix.py, same schemas/alphabets, different seed and
shapes).  The first run of this sweep found a real bug: duckdb 1.0's
``list_reduce`` mixes lanes across grouped rows when the lambda carries a
struct accumulator with a data-dependent branch — the streaming CUSUM
oracle leaked one event type's alarms into another's log on random data
(invisible on the fixtures, where alarms are rare).  Its oracle is now a
per-key recursive CTE; this sweep keeps the whole registry honest on
arbitrary shapes.

Runtime: one seed, ~5-6 min for ~365 oracle-backed queries (tiny tables,
Spark per-query overhead dominates).  Streaming queries execute a real
AvailableNow stream each, like everywhere else in the suite.
"""

from __future__ import annotations

import pytest

from azure_func_forem_data_etl_spark.plans.registry import load_all
from tests.oracle import assert_matches_oracle
from tests.randfix import write_random_fixture

REGISTRY = load_all()

#: Queries whose oracle encodes fixture-scale constants that a different
#: corpus shape legitimately changes are still swept — the oracle runs on
#: the SAME random tables, so any mismatch is a real engine divergence.
_ORACLE_BACKED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="session")
def random_sf(tmp_path_factory):
    return write_random_fixture(tmp_path_factory.mktemp("randfix") / "sf", seed=1)


@pytest.mark.parametrize("name", _ORACLE_BACKED)
def test_oracle_parity_on_random_fixture(spark, random_sf, name):
    q = REGISTRY[name]
    assert_matches_oracle(q.fn(spark, random_sf), q.oracle, random_sf)
