"""Regression tests for the round-9 VERDICT fixes.

1. ``peak_concurrent_sessions`` / ``pareto_8020_customers`` now run the
   two-phase parallel prefix sum (keyed phase-1 window + bounded-grain
   offset pass) instead of one unpartitioned global window — plant the
   shapes that stress the partition boundaries (sessions crossing
   midnight, a sweep tie exactly at a day boundary, revenue ties on a
   band edge) and assert the result still matches both a hand-computed
   expectation and the unchanged DuckDB oracle.
2. ``blocking_quality_audit`` / ``bloom_fpr_audit`` must release their
   eager localCheckpoint blocks before returning (VERDICT r8 "what's
   wrong" #3 — the ``graph_avg_clustering`` leak class): both results are
   assembled from driver scalars, so ZERO new persistent RDDs may
   survive the call.
"""

from __future__ import annotations

import datetime as dt

from tests.oracle import assert_matches_oracle

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _cached_ids(spark) -> set:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


def test_peak_concurrent_two_phase_crosses_midnight(spark, tmp_path):
    """Sessions spanning the day-partition boundary plus an end/start tie
    INSIDE day 2: the per-day phase-1 sums + day-offset phase-2 must
    reproduce the exact global sweep.  Hand-computed: u1 [23:40→00:05+1d],
    u2 [23:50→23:59], u4 [23:58→00:10+1d], u3 [00:05+1d→00:20+1d] (starts
    the instant u1 ends — the end decrements FIRST, so no overlap);
    peak 3 at 23:58, 4 sessions."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    d1 = dt.datetime(2024, 1, 1)
    d2 = dt.datetime(2024, 1, 2)
    rows = [
        (0, d1 + dt.timedelta(hours=23, minutes=40), 1, "view", 1.0, "{}"),
        (1, d2 + dt.timedelta(minutes=5), 1, "view", 1.0, "{}"),
        (2, d1 + dt.timedelta(hours=23, minutes=50), 2, "view", 1.0, "{}"),
        (3, d1 + dt.timedelta(hours=23, minutes=59), 2, "view", 1.0, "{}"),
        (4, d2 + dt.timedelta(minutes=5), 3, "view", 1.0, "{}"),
        (5, d2 + dt.timedelta(minutes=20), 3, "view", 1.0, "{}"),
        (6, d1 + dt.timedelta(hours=23, minutes=58), 4, "view", 1.0, "{}"),
        (7, d2 + dt.timedelta(minutes=10), 4, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    sf = str(tmp_path)
    q = load_all()["peak_concurrent_sessions"]
    df = q.fn(spark, sf)
    row = df.collect()[0]
    assert row["peak_concurrency"] == 3
    assert row["peak_at"].startswith("2024-01-01 23:58")
    assert row["n_sessions"] == 4
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


def test_pareto_two_phase_band_edge_and_ties(spark, tmp_path):
    """Revenue ties sitting EXACTLY on the 100k band edge (c2 == c3 ==
    100000.00 land in band 1 together; c4 at 99999.99 falls in band 0):
    phase-1 rank + phase-2 band offsets must reproduce the single-window
    ranking.  Hand-computed: total 599999.99, 80% threshold crossed at
    cumulative 549999.99 = rank 4 of 5 → share 800000 ppm."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    rows = [
        (1, 1, 250000.00),
        (2, 2, 100000.00),
        (3, 3, 100000.00),
        (4, 4, 99999.99),
        (5, 5, 50000.00),
    ]
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    sf = str(tmp_path)
    q = load_all()["pareto_8020_customers"]
    row = q.fn(spark, sf).collect()[0]
    assert row["n_top_customers"] == 4
    assert row["n_customers"] == 5
    assert row["customer_share_ppm"] == 800000
    assert_matches_oracle(q.fn(spark, sf), q.oracle, sf)


def test_blocking_quality_audit_releases_checkpoint(spark, sf_dir):
    """The audit's result is built from driver scalars; its one eager
    localCheckpoint is dead once the four counts return and must be
    released — zero new persistent RDDs may survive the call."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["blocking_quality_audit"]
    before = _cached_ids(spark)
    q.fn(spark, sf_dir).collect()
    assert _cached_ids(spark) - before == set()


def test_bloom_fpr_audit_releases_checkpoint(spark, sf_dir):
    """Same contract: the probe-set checkpoint is consumed by driver
    counts only (the FP count is now driven eagerly too), so the call
    must leave the persistent-RDD map untouched."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    q = load_all()["bloom_fpr_audit"]
    before = _cached_ids(spark)
    q.fn(spark, sf_dir).collect()
    assert _cached_ids(spark) - before == set()


def test_sized_state_partitions_floor_and_cap(spark, sf_dir):
    """Data-proportional state sizing: MB-scale fixtures get the floor (8),
    the session shuffle setting is the ceiling, and the conf is restored
    after a sized stream run."""
    from azure_func_forem_data_etl_spark.streaming.core import (
        _STATE_PARTITION_BYTES,
        sized_state_partitions,
    )

    n = sized_state_partitions(spark, sf_dir, "events")
    ceiling = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert 1 <= n <= max(8, ceiling)
    import os

    if os.stat(f"{sf_dir}/events.parquet").st_size <= 8 * _STATE_PARTITION_BYTES:
        assert n == min(ceiling, 8)


def test_stream_sizing_never_touches_shared_session(spark, sf_dir):
    """r11 (r10 VERDICT ask #7): stateful streams build on an isolated
    ``stream_session`` clone, so the caller's shuffle setting is not just
    restored afterwards — it is never mutated at all (no window in which
    a concurrent plan could observe stream sizing)."""
    from azure_func_forem_data_etl_spark.plans.registry import load_all
    from azure_func_forem_data_etl_spark.streaming.core import stream_session

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    clone = stream_session(spark, sf_dir, "events")
    assert clone is not spark
    # the clone carries input-sized state partitioning; the shared session
    # keeps its own value untouched
    assert int(clone.conf.get("spark.sql.shuffle.partitions")) >= 1
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev

    q = load_all()["streaming_interval_join"]
    q.fn(spark, sf_dir).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
