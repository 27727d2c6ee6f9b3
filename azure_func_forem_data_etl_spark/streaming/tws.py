"""Arbitrary stateful processing via ``transformWithStateInPandas`` —
the Spark 4 state API v2 (SPARK-49564): typed composite state
(ValueState/ListState/MapState), timers, and TTL, superseding
``applyInPandasWithState``'s single-tuple GroupState.

The operator here is a per-user *velocity profile*: running event count,
first/last event time, and the maximum inter-event gap — the state shape a
rate-limit / bot-flagging pipeline keeps per principal.  State is one
fixed-width ValueState row per user (O(active users), partitioned across
executors); each micro-batch updates it from the batch's sorted rows and
emits the user's current summary.

RocksDB note: transformWithState requires the RocksDB state store
provider; the query function sets it for the session (it is a superset of
the HDFS-backed default — the other streaming queries run unchanged on
it) before starting the stream.

Oracle: exact per-user aggregate SQL — with a single parquet file the
source is one micro-batch and per-batch sorting gives full event-time
order (same single-batch contract as streaming/sessionize.py; cross-batch
monotone-merge behavior is covered by the batch-side MAX finalization).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.streaming.core import (
    run_available_now,
    stream_table,
)

OUT_SCHEMA = (
    "user_id bigint, n_events bigint, first_ts_us bigint, last_ts_us bigint, "
    "max_gap_us bigint"
)
STATE_SCHEMA = "n long, first_us long, last_us long, max_gap long"


class _VelocityProcessor(StatefulProcessor):
    """Per-user running (count, first, last, max-gap) in one ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("velocity", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, first_us, last_us, max_gap = 0, None, None, 0
        if self._state.exists():
            n, first_us, last_us, max_gap = self._state.get()
        for pdf in rows:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = (pdf["ts"].astype("int64")).tolist()  # ns -> handled below
            # pandas datetime64[ns] -> µs integers
            ts_us = [t // 1000 for t in ts_us]
            for t in ts_us:
                if first_us is None:
                    first_us = t
                if last_us is not None and t - last_us > max_gap:
                    max_gap = t - last_us
                last_us = t
                n += 1
        self._state.update((n, first_us, last_us, max_gap))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "first_ts_us": [first_us],
                "last_ts_us": [last_us],
                "max_gap_us": [max_gap],
            }
        )

    def close(self) -> None:
        pass


def _tws_runtime_available() -> bool:
    """transformWithStateInPandas drives a Python-side state server over
    protobuf; environments without a working ``google.protobuf`` cannot
    start the stream (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE), so
    the query registers only where the runtime can actually execute it."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


TWS_AVAILABLE = _tws_runtime_available()


def _velocity_group_state(key, pdfs, state):
    """GroupState fallback with identical semantics to _VelocityProcessor
    (applyInPandasWithState needs no protobuf runtime)."""
    (user_id,) = key
    n, first_us, last_us, max_gap = (
        state.get if state.exists else (0, None, None, 0)
    )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        for t in (int(v) // 1000 for v in pdf["ts"].astype("int64")):
            if first_us is None:
                first_us = t
            if last_us is not None and t - last_us > max_gap:
                max_gap = t - last_us
            last_us = t
            n += 1
    state.update((n, first_us, last_us, max_gap))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "first_ts_us": [first_us],
            "last_ts_us": [last_us],
            "max_gap_us": [max_gap],
        }
    )


@register(
    "streaming_velocity_profile",
    oracle="""
    WITH g AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           epoch_us(MIN(ts)) AS first_ts_us,
           epoch_us(MAX(ts)) AS last_ts_us,
           COALESCE(MAX(epoch_us(ts) - epoch_us(prev)), 0) AS max_gap_us
    FROM g GROUP BY user_id
    """,
    doc="Per-user velocity profile: transformWithStateInPandas (state API "
    "v2, typed ValueState, RocksDB) where the protobuf runtime exists, "
    "else the applyInPandasWithState GroupState fallback — identical "
    "state semantics either way.",
)
def streaming_velocity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT routed through stream_session: Python-stateful — state partitions
    # are Python worker slots (see streaming_sessionize_state, r14)
    events = stream_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    if TWS_AVAILABLE:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        out = events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_VelocityProcessor(),
            outputStructType=OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    else:
        from pyspark.sql.streaming.state import GroupStateTimeout

        out = events.groupBy("user_id").applyInPandasWithState(
            _velocity_group_state,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    tbl = run_available_now(out, "append")
    # Per-batch emissions are monotone in every field (count grows, last
    # advances, max-gap widens, first is constant), so the cross-batch
    # finalization is a plain MAX per user — exactly one row regardless of
    # how many micro-batches the source produced.
    return tbl.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.min("first_ts_us").alias("first_ts_us"),
        F.max("last_ts_us").alias("last_ts_us"),
        F.max("max_gap_us").alias("max_gap_us"),
    )
