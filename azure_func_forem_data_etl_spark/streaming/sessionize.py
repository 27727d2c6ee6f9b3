"""Custom stateful sessionization via ``applyInPandasWithState``.

The built-in ``session_window`` agg (operators/windows.py) covers the
common case; this operator is the escape hatch the SURVEY §2b streaming row
calls for — arbitrary per-key state logic (here: gap-based sessions that
also carry the per-session event count), the engine's analog of
flatMapGroupsWithState.

Protocol: per user, events arrive in micro-batches; the open (possibly
continuing) session lives in the state store between batches.  Each batch
emits every session it saw — closed sessions once, and the still-open
session in its current shape; a later batch that extends the open session
re-emits it with the same ``session_start`` and a larger count, so the
finalizing pass keeps MAX(session_end), MAX(n_events) per
(user_id, session_start).  Within one batch per-user events are sorted
in-memory; across batches we assume per-key event-time order (standard for
log ingest; the watermarked ``session_window`` agg handles disorder).

At 100 TB: state is partitioned by user_id across executors and holds one
fixed-width row per user — memory is O(active users), not O(events).
Arrow-batched pandas transfer keeps the Python hop vectorized.

Oracle: classic gaps-and-islands SQL — exact because with a single parquet
file the source is one micro-batch (multi-batch merge behavior is covered
by tests/test_streaming.py, which feeds files one batch at a time).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.streaming.core import (
    run_available_now,
    stream_table,
)

GAP = pd.Timedelta(minutes=10)

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
# Open-session carryover: (start, last) as epoch-µs longs + event count.
STATE_SCHEMA = "open_start long, open_last long, open_n long"

_US = "int64"


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    ts = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values().reset_index(drop=True)
    if state.exists:
        open_start, open_last, open_n = state.get
    else:
        open_start = open_last = open_n = None

    # Vectorized sessionization (r13, guide §4.2): gap boundaries via one
    # numpy diff instead of a per-event Python loop — emission order,
    # values, and the state transition are identical to the loop form
    # (carried-open session closes first; the final group stays open).
    us = (ts.astype(_US) // 1000).to_numpy()  # ns -> µs
    gap_us = GAP.value // 1000
    if len(us):
        continues = open_last is not None and us[0] - open_last <= gap_us
        bounds = np.empty(len(us), dtype=bool)
        bounds[0] = True  # position 0 always opens this batch's first group
        bounds[1:] = (us[1:] - us[:-1]) > gap_us
        idx = np.flatnonzero(bounds)
        ends = np.append(idx[1:], len(us))
        g_start = us[idx].astype("int64")
        g_last = us[ends - 1].astype("int64")
        g_n = (ends - idx).astype("int64")
        if open_last is not None:
            if continues:
                # batch's first group extends the carried-over session
                g_start[0] = open_start
                g_n[0] += open_n
            else:
                # the carried-over open session closes as its own emission
                g_start = np.concatenate([[open_start], g_start])
                g_last = np.concatenate([[open_last], g_last])
                g_n = np.concatenate([[open_n], g_n])
        state.update((int(g_start[-1]), int(g_last[-1]), int(g_n[-1])))
    elif open_last is not None:
        # no new events this batch: re-emit (and re-pin) the open session,
        # exactly as the loop form did
        g_start = np.array([open_start], dtype="int64")
        g_last = np.array([open_last], dtype="int64")
        g_n = np.array([open_n], dtype="int64")
        state.update((int(open_start), int(open_last), int(open_n)))
    else:
        g_start = g_last = g_n = np.array([], dtype="int64")

    yield pd.DataFrame(
        {
            "user_id": pd.Series(np.full(len(g_n), user_id), dtype="int64"),
            "session_start": pd.to_datetime(g_start, unit="us"),
            "session_end": pd.to_datetime(g_last + gap_us, unit="us"),
            "n_events": pd.Series(g_n, dtype="int64"),
        }
    )


def sessionize_stream(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Raw emitted sessions (pre-finalization) from a streaming events df."""
    assert gap == "10 minutes", "GAP constant is module-level for picklability"
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def finalize_sessions(emitted: DataFrame) -> DataFrame:
    """Collapse re-emissions of a continued session to its final shape."""
    return emitted.groupBy("user_id", "session_start").agg(
        F.max("session_end").alias("session_end"),
        F.max("n_events").alias("n_events"),
    )


@register(
    "streaming_sessionize_state",
    oracle="""
    WITH marked AS (
        -- identified users only (r11 null-FK sweep): sessions belong to
        -- a user; a NULL state key crashes applyInPandasWithState and
        -- pooling anonymous traffic into one "session" is meaningless
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         <= INTERVAL '10 minutes'
                    THEN 0 ELSE 1 END AS new_session
        FROM events WHERE user_id IS NOT NULL
    ), grp AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '10 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM grp
    GROUP BY user_id, session_id
    """,
    doc="Custom stateful sessionization (applyInPandasWithState), 10-min gap.",
)
def streaming_sessionize_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT routed through stream_session (r14): unlike the JVM-state window
    # aggs, each state partition here is a PYTHON WORKER slot — the
    # interleaved A/B measured input-sized 8-partition state ×1.13 SLOWER
    # than core-wide state (pandas per-group work wants the parallelism).
    # identified users only — see the oracle note (r11 null-FK sweep)
    events = stream_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    emitted = run_available_now(sessionize_stream(events), "append")
    return finalize_sessions(emitted)


# ---------------------------------------------------------------------------
# watermark-driven variant: sessions close by event-time TIMEOUT

def _sessionize_timeout_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit-on-close protocol: a session is emitted exactly once, when the
    event-time watermark passes ``last_event + gap`` (the state timeout) or
    when a later in-key event breaks the gap.  Open sessions live only in
    the state store — nothing is emitted optimistically, so downstream needs
    no finalization pass.  Sessions still open at end-of-stream stay
    unemitted (they are genuinely not closed yet); a later run resumes them
    from the checkpoint."""
    (user_id,) = key
    gap_us = GAP.value // 1000

    if state.hasTimedOut:
        open_start, open_last, open_n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": pd.Series([user_id], dtype="int64"),
                "session_start": pd.to_datetime([open_start], unit="us"),
                "session_end": pd.to_datetime([open_last + gap_us], unit="us"),
                "n_events": pd.Series([open_n], dtype="int64"),
            }
        )
        return

    ts = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values().reset_index(drop=True)
    if state.exists:
        open_start, open_last, open_n = state.get
    else:
        open_start = open_last = open_n = None

    # Vectorized like _sessionize_group (r14, guide §4.2): gap boundaries
    # via one numpy diff instead of a per-event Python loop.  Group split,
    # carried-open merge/close, the final-group state update, and the
    # timeout timestamp are identical to the loop form; only the groups
    # BEFORE the last are emitted (closed), exactly as before.
    us = (ts.astype(_US) // 1000).to_numpy()
    if len(us):
        continues = open_last is not None and us[0] - open_last <= gap_us
        bounds = np.empty(len(us), dtype=bool)
        bounds[0] = True  # position 0 always opens this batch's first group
        bounds[1:] = (us[1:] - us[:-1]) > gap_us
        idx = np.flatnonzero(bounds)
        ends = np.append(idx[1:], len(us))
        g_start = us[idx].astype("int64")
        g_last = us[ends - 1].astype("int64")
        g_n = (ends - idx).astype("int64")
        if open_last is not None:
            if continues:
                # batch's first group extends the carried-over session
                g_start[0] = open_start
                g_n[0] += open_n
            else:
                # the carried-over open session closes as its own emission
                g_start = np.concatenate([[open_start], g_start])
                g_last = np.concatenate([[open_last], g_last])
                g_n = np.concatenate([[open_n], g_n])
        # the last group stays open in state; everything before it closed
        c_start, c_last, c_n = g_start[:-1], g_last[:-1], g_n[:-1]
        state.update((int(g_start[-1]), int(g_last[-1]), int(g_n[-1])))
        # close when the watermark passes last event + gap (both in epoch ms)
        state.setTimeoutTimestamp(int(g_last[-1]) // 1000 + GAP.value // 1_000_000)
    else:
        # no new events: state untouched (the loop form updated it with its
        # own values and re-armed the same timeout — observably identical
        # only when state exists, so mirror the loop exactly)
        c_start = c_last = c_n = np.array([], dtype="int64")
        if open_last is not None:
            state.update((int(open_start), int(open_last), int(open_n)))
            state.setTimeoutTimestamp(
                int(open_last) // 1000 + GAP.value // 1_000_000
            )

    yield pd.DataFrame(
        {
            "user_id": pd.Series(np.full(len(c_n), user_id), dtype="int64"),
            "session_start": pd.to_datetime(c_start, unit="us"),
            "session_end": pd.to_datetime(c_last + gap_us, unit="us"),
            "n_events": pd.Series(c_n, dtype="int64"),
        }
    )


def sessionize_stream_timeout(events: DataFrame, lateness: str = "0 seconds") -> DataFrame:
    """Watermark-closed sessions: emit exactly once, state evicted on close."""
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", lateness)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_timeout_group,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
