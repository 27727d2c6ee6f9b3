"""Round-14 optimization pins.

Function-level contracts for internals the r14 optimization round changed:
the vectorized ``_sessionize_timeout_group`` (numpy port of the per-event
loop) and the input-sized streaming state routing.  Spark-level behavior is
covered by tests/test_streaming.py; these pins diff the changed internals
against a straight re-implementation of the original loop semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from azure_func_forem_data_etl_spark.streaming.sessionize import (
    GAP,
    _sessionize_timeout_group,
)

GAP_US = GAP.value // 1000


class FakeState:
    """Minimal GroupState stand-in for function-level tests."""

    def __init__(self, value=None):
        self._value = value
        self.hasTimedOut = False
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _loop_reference(ts_us, state_tuple):
    """The pre-r14 per-event loop, verbatim semantics: returns
    (closed list, new state tuple or None-means-unchanged, timeout ms)."""
    if state_tuple is not None:
        open_start, open_last, open_n = state_tuple
    else:
        open_start = open_last = open_n = None
    closed = []
    for t in ts_us:
        if open_last is not None and t - open_last <= GAP_US:
            open_last = int(t)
            open_n += 1
        else:
            if open_last is not None:
                closed.append((open_start, open_last, open_n))
            open_start, open_last, open_n = int(t), int(t), 1
    new_state = timeout = None
    if open_last is not None:
        new_state = (int(open_start), int(open_last), int(open_n))
        timeout = open_last // 1000 + GAP.value // 1_000_000
    return closed, new_state, timeout


def _run_vectorized(ts_us, state_tuple):
    state = FakeState(state_tuple)
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime(np.asarray(ts_us, dtype="int64"), unit="us")}
    )
    out = list(_sessionize_timeout_group((7,), iter([pdf]), state))
    assert len(out) == 1
    o = out[0]
    closed = [
        (
            int(o["session_start"].iloc[i].value // 1000),
            int(o["session_end"].iloc[i].value // 1000) - GAP_US,
            int(o["n_events"].iloc[i]),
        )
        for i in range(len(o))
    ]
    assert (o["user_id"] == 7).all()
    return closed, state._value, state.timeout_ms


CASES = [
    # fresh key, one group
    ([0, 1_000_000], None),
    # fresh key, two groups (gap break)
    ([0, 1_000_000, GAP_US * 3, GAP_US * 3 + 5], None),
    # carried-open extended by the batch's first group
    ([1_000_000, 2_000_000], (0, 500_000, 3)),
    # carried-open closes as its own emission (batch starts past the gap)
    ([GAP_US * 10, GAP_US * 10 + 1], (0, 500_000, 3)),
    # empty batch with carried state: re-pin, nothing emitted
    ([], (0, 500_000, 3)),
    # empty batch, no state
    ([], None),
    # many alternating groups
    (
        [i * (GAP_US + 1) for i in range(6)]
        + [6 * (GAP_US + 1) + j for j in range(4)],
        None,
    ),
    # boundary: delta exactly == gap extends (<=), gap+1 breaks
    ([0, GAP_US, GAP_US * 2 + 1], None),
]


@pytest.mark.parametrize("ts_us,st", CASES)
def test_timeout_group_matches_loop_reference(ts_us, st):
    got = _run_vectorized(ts_us, st)
    want = _loop_reference(ts_us, st)
    assert got == want


def test_timeout_group_timed_out_emits_and_clears():
    state = FakeState((0, 500_000, 3))
    state.hasTimedOut = True
    out = list(_sessionize_timeout_group((9,), iter([]), state))
    assert len(out) == 1
    o = out[0]
    assert len(o) == 1
    assert int(o["n_events"].iloc[0]) == 3
    assert int(o["session_start"].iloc[0].value // 1000) == 0
    assert int(o["session_end"].iloc[0].value // 1000) == 500_000 + GAP_US
    assert state.removed


class TestScaleOutTreeWalk:
    """scale_out decides from the logical plan TREE (r14): attribute or
    relation NAMES containing "Join"/"Aggregate" must not flip the
    decision, and a checkpointed frame proves its width by its actual
    partition count (the r13 ADVICE trap: a checkpointed join truncates
    to LogicalRDD and may carry AQE-coalesced 1-2 partitions)."""

    def test_agg_derived_is_fast_path(self, spark, sf_dir):
        from azure_func_forem_data_etl_spark.sources.tables import (
            entity_table,
            scale_out,
        )

        et = entity_table(spark, sf_dir, "documents")
        assert scale_out(et, "doc_id") is et

    def test_join_ish_column_names_do_not_flip(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from azure_func_forem_data_etl_spark.sources.tables import (
            entity_table,
            scale_out,
        )

        et = entity_table(spark, sf_dir, "documents")
        named = et.select(
            "doc_id",
            F.col("text").alias("JoinKey"),
            F.lit(1).alias("Aggregate [x]"),
        )
        # still aggregate-derived under the renames -> fast path
        assert scale_out(named, "doc_id") is named
        # a bare narrow scan stays widened even when a column is named
        # like a Join node
        raw = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", F.col("text").alias("JoinKey")
        )
        assert scale_out(raw, "doc_id") is not raw

    def test_coalesced_checkpoint_is_widened(self, spark, sf_dir):
        from azure_func_forem_data_etl_spark.sources.tables import (
            entity_table,
            entity_table_pinned,
            scale_out,
        )

        narrow = (
            entity_table(spark, sf_dir, "documents")
            .limit(50)
            .repartition(1)
            .localCheckpoint()
        )
        assert scale_out(narrow, "doc_id") is not narrow
        wide = entity_table_pinned(spark, sf_dir, "documents")
        assert scale_out(wide, "doc_id") is wide


def test_broadcast_derived_gates_on_source_bytes(monkeypatch):
    """The vocab-table broadcast hints are gated on SOURCE size (r14 #7):
    below the cap the hint applies, above it the frame passes through so
    AQE decides from runtime size."""
    from azure_func_forem_data_etl_spark.sources import tables as T

    class FakeDF:
        pass

    df = FakeDF()
    calls = []
    monkeypatch.setattr(
        T.F, "broadcast", lambda d: calls.append(d) or "hinted"
    )
    monkeypatch.setattr(T, "_source_bytes", lambda sf, *n: 1024)
    assert T.broadcast_derived(df, "/x", "documents") == "hinted"
    monkeypatch.setattr(
        T, "_source_bytes", lambda sf, *n: T.BROADCAST_HINT_SOURCE_CAP + 1
    )
    assert T.broadcast_derived(df, "/x", "documents") is df


def test_random_sequences_match_loop_reference():
    rng = np.random.default_rng(1234)
    for _ in range(200):
        n = int(rng.integers(0, 30))
        ts = np.cumsum(rng.integers(1, GAP_US * 2, size=n)).tolist()
        st = None
        if rng.integers(0, 2):
            last = int(rng.integers(0, GAP_US * 2))
            st = (0, last, int(rng.integers(1, 5)))
            ts = [t + last for t in ts]
        assert _run_vectorized(ts, st) == _loop_reference(ts, st)


def test_schema_memo_invalidates_on_rewrite(spark, tmp_path):
    """The parquet schema memo is catalog metadata keyed on
    (path, mtime, size): a rewrite at the same path re-infers, and the
    memoized-read frame still scans the current file contents."""
    import os
    import pandas as pd

    from azure_func_forem_data_etl_spark.sources import tables as T

    p = str(tmp_path / "t.parquet")
    pd.DataFrame({"id": [1, 2, 3]}).to_parquet(p)
    df1 = T._read_parquet(spark, p)
    assert [f.name for f in df1.schema.fields] == ["id"]
    # memo hit on the unchanged file: same schema, data still read live
    df1b = T._read_parquet(spark, p)
    assert df1b.count() == 3
    # rewrite with a different schema at the same path -> re-infer
    pd.DataFrame({"id": [9], "x": ["a"]}).to_parquet(p)
    os.utime(p, ns=(1, 1))  # force a distinct mtime even on coarse clocks
    df2 = T._read_parquet(spark, p)
    assert {f.name for f in df2.schema.fields} == {"id", "x"}
    assert df2.count() == 1


def test_events_ts_normalized_through_schema_memo(spark):
    """table('events') still normalizes ts to a session-TZ timestamp when
    the schema comes from the memo (second read of the same path)."""
    from azure_func_forem_data_etl_spark.sources import tables as T
    from tests.conftest import SF_SMOKE

    T.clear_schema_memo()
    first = T.table(spark, SF_SMOKE, "events")
    again = T.table(spark, SF_SMOKE, "events")  # memo-hit path
    assert dict(first.dtypes)["ts"] == "timestamp"
    assert dict(again.dtypes)["ts"] == "timestamp"
    assert again.count() == first.count()


def test_bpe_rewrite_expr_matches_python_scanner(spark):
    """_apply_merges_expr (JVM fold, r14) is byte-identical to the
    _apply_merges Python scanner — random symbol arrays plus adversarial
    triples: overlapping self-merge (a,a), chained merges whose outputs
    feed later triples, and multibyte symbols."""
    import random

    import pandas as pd
    from pyspark.sql import functions as F

    from azure_func_forem_data_etl_spark.operators.tokenize import (
        _apply_merges,
        _apply_merges_expr,
    )

    rng = random.Random(7)
    alpha = list("abc") + ["ab", "bc", "abc", "€", "好"]
    rows = [
        (i, [rng.choice(alpha) for _ in range(rng.randint(0, 12))])
        for i in range(400)
    ]
    triples = [
        ("a", "b", "ab"),
        ("ab", "c", "abc"),
        ("a", "a", "aa"),
        ("€", "好", "€好"),
        ("aa", "ab", "aaab"),
    ]
    df = spark.createDataFrame(rows, "n long, s array<string>")
    got = {
        r.n: list(r.s)
        for r in df.select(
            "n", _apply_merges_expr(F.col("s"), triples).alias("s")
        ).collect()
    }
    want_pdf = next(
        _apply_merges(triples)(
            iter([pd.DataFrame({"n": [r[0] for r in rows], "s": [r[1] for r in rows]})])
        )
    )
    want = dict(zip(want_pdf["n"], (list(s) for s in want_pdf["s"])))
    assert got == want


def test_stream_scratch_falls_back_when_shm_full(monkeypatch):
    """r13 ADVICE #4: a nearly-full /dev/shm must not take the tmpfs
    default — fall back to disk /tmp (None) instead of ENOSPC mid-stream.
    The env override still wins unconditionally."""
    import os

    from azure_func_forem_data_etl_spark.streaming import core as C

    class FakeStat:
        f_bavail = 10
        f_frsize = 4096  # ~40 KB free

    monkeypatch.setattr(C.os, "statvfs", lambda p: FakeStat())
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SCRATCH", raising=False)
    if os.path.isdir("/dev/shm"):
        assert C._stream_scratch_dir() is None
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SCRATCH", "/tmp/forced")
    assert C._stream_scratch_dir() == "/tmp/forced"

    class BigStat:
        f_bavail = 1 << 20
        f_frsize = 4096  # ~4 GB free

    monkeypatch.delenv("SPARK_GRAFT_STREAM_SCRATCH", raising=False)
    monkeypatch.setattr(C.os, "statvfs", lambda p: BigStat())
    if os.path.isdir("/dev/shm"):
        assert C._stream_scratch_dir() == "/dev/shm"
