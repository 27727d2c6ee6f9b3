"""Round-13 optimization-round regression pins.

Each test pins an internal that an optimization changed:
- scale_out must treat checkpointed (LogicalRDD) frames as already-wide
  (the interleaved A/B measured the redundant re-exchange at ×1.57 on
  ann_lsh_topk);
- entity_table_pinned must materialize the canonical grain per
  invocation (no cross-query persisted memo — the r13 _ENTITY_CACHE was
  removed as a bench-contract violation);
- the streaming scratch dir must honor its env override;
- the vectorized sessionize group function must reproduce the loop
  semantics on the carry/merge/close edge cases (the cross-batch test in
  test_streaming.py covers the stream-level contract; this pins the
  function level, incl. the empty-batch re-emission path).
"""

from __future__ import annotations

import pandas as pd
import pytest


def test_scale_out_skips_checkpointed_frames(spark):
    from azure_func_forem_data_etl_spark.sources.tables import scale_out

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    # r14: the LogicalRDD fast path proves width with the RDD's actual
    # partition count (a coalesced checkpoint must NOT take the bypass),
    # so the pinned snapshot has to be wide to be skipped.
    width = spark.sparkContext.defaultParallelism
    pinned = df.repartition(width, "k").localCheckpoint(eager=True)
    out = scale_out(pinned, "k")
    assert out is pinned  # no extra exchange on an already-wide snapshot


def test_entity_table_pinned_recomputes_per_invocation(spark, tmp_path):
    import os

    from azure_func_forem_data_etl_spark.sources.tables import (
        entity_table_pinned,
    )

    p = tmp_path / "sf"
    (p).mkdir()
    spark.createDataFrame(
        [(1, "a", None, None, 1), (1, "a", None, None, 1), (2, "b", None, None, 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(p / "documents.parquet"))

    d1 = entity_table_pinned(spark, str(p), "documents")
    assert d1.count() == 2  # canonical grain: one row per id
    # fresh object per invocation — nothing memoized at module level
    d2 = entity_table_pinned(spark, str(p), "documents")
    assert d1 is not d2
    # and the module holds no path-keyed entity memo at all
    import azure_func_forem_data_etl_spark.sources.tables as tables

    assert not any("ENTITY" in n and "CACHE" in n for n in vars(tables))
    # rewriting the path is picked up immediately (no stale snapshot)
    spark.createDataFrame(
        [(7, "z", None, None, 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(p / "documents.parquet"))
    assert [r["doc_id"] for r in entity_table_pinned(
        spark, str(p), "documents"
    ).collect()] == [7]
    assert os.path.isdir(str(p))  # tmp fixture intact


def test_stream_scratch_dir_env_override(monkeypatch, tmp_path):
    from azure_func_forem_data_etl_spark.streaming import core

    monkeypatch.setenv("SPARK_GRAFT_STREAM_SCRATCH", str(tmp_path))
    assert core._stream_scratch_dir() == str(tmp_path)
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SCRATCH")
    import os

    expected = "/dev/shm" if os.path.isdir("/dev/shm") else None
    assert core._stream_scratch_dir() == expected


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    @property
    def hasTimedOut(self):
        return False


def _run_group(state, stamps):
    from azure_func_forem_data_etl_spark.streaming.sessionize import (
        _sessionize_group,
    )

    pdf = pd.DataFrame({"ts": pd.to_datetime(stamps)})
    (out,) = list(_sessionize_group((7,), iter([pdf]), state))
    return [
        (str(r.session_start), str(r.session_end), int(r.n_events))
        for r in out.itertuples()
    ]


def test_sessionize_vectorized_carry_merge_and_close():
    st = _FakeState()
    # batch 1: two sessions (gap > 10 min between 00:12 and 01:00)
    out = _run_group(st, ["2024-01-01 00:00", "2024-01-01 00:08", "2024-01-01 01:00"])
    assert out == [
        ("2024-01-01 00:00:00", "2024-01-01 00:18:00", 2),
        ("2024-01-01 01:00:00", "2024-01-01 01:10:00", 1),
    ]
    assert st.get == (1704070800000000, 1704070800000000, 1)
    # batch 2 CONTINUES the open session (01:05 within 10 min of 01:00)
    out = _run_group(st, ["2024-01-01 01:05"])
    assert out == [("2024-01-01 01:00:00", "2024-01-01 01:15:00", 2)]
    # batch 3 CLOSES it: carried session emitted first, then the new one
    out = _run_group(st, ["2024-01-01 03:00"])
    assert out == [
        ("2024-01-01 01:00:00", "2024-01-01 01:15:00", 2),
        ("2024-01-01 03:00:00", "2024-01-01 03:10:00", 1),
    ]


def test_sessionize_vectorized_empty_batch_reemits_open_session():
    from azure_func_forem_data_etl_spark.streaming.sessionize import (
        _sessionize_group,
    )

    st = _FakeState()
    _run_group(st, ["2024-01-01 00:00"])
    before = st.get
    pdf = pd.DataFrame({"ts": pd.to_datetime(pd.Series([], dtype="datetime64[ns]"))})
    (out,) = list(_sessionize_group((7,), iter([pdf]), st))
    assert len(out) == 1 and int(out["n_events"].iloc[0]) == 1
    assert st.get == before


def test_sessionize_vectorized_no_state_empty_batch_emits_nothing():
    from azure_func_forem_data_etl_spark.streaming.sessionize import (
        _sessionize_group,
    )

    st = _FakeState()
    pdf = pd.DataFrame({"ts": pd.to_datetime(pd.Series([], dtype="datetime64[ns]"))})
    (out,) = list(_sessionize_group((7,), iter([pdf]), st))
    assert len(out) == 0
    assert not st.exists
