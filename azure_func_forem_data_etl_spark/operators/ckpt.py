"""Eager local-checkpoint lifecycle helpers.

``DataFrame.localCheckpoint(eager=True)`` truncates lineage by persisting
the computed blocks, but ``DataFrame.unpersist()`` is a no-op on a
checkpointed frame — the blocks belong to an internal RDD that only
``ContextCleaner`` reclaims on a driver GC.  Queries that checkpoint a
frame consumed ONLY by driver-side counts (the frame is dead the moment
the counts return) must release those blocks explicitly or they pile up
across a long driver run — the leak class flagged by the r7/r8 reviews
on ``graph_avg_clustering`` / ``blocking_quality_audit`` /
``bloom_fpr_audit``.

:func:`scoped_checkpoint` wraps the snapshot-diff-release dance used in
``operators/graph.py``: snapshot ``getPersistentRDDs`` before the
checkpoint, diff after, and hand back a zero-argument ``release()`` that
unpersists exactly the ids the checkpoint created.  Only call it once
every consumer of the checkpointed frame has been driven to completion —
releasing while a lazy downstream plan still references the frame would
make that plan unrecoverable (lineage is gone).
"""

from __future__ import annotations

from typing import Callable, Tuple

from pyspark.sql import DataFrame


def persistent_rdd_ids(df: DataFrame) -> set[int]:
    """Ids of every currently persisted RDD in the session's context."""
    jsc = df.sparkSession.sparkContext._jsc
    return {int(i) for i in jsc.getPersistentRDDs().keySet().toArray()}


def release_rdd_ids(df: DataFrame, ids: set[int]) -> None:
    """Blocking-unpersist the given RDD ids (missing ids are ignored)."""
    jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for rid in jmap.keySet().toArray():
        if int(rid) in ids:
            jmap.get(rid).unpersist(True)


def checkpointed_rdd_ids(df: DataFrame) -> set[int]:
    """Persisted RDD id(s) OWNED by a checkpointed frame, read directly
    off its ``LogicalRDD`` plan node — never a context-wide diff.

    The snapshot-diff idiom (``persistent_rdd_ids`` before/after a
    checkpoint) is process-global: a concurrent query persisting or
    checkpointing anything inside the window gets ITS ids swept into the
    caller's release set, and its blocks dropped mid-use (r14 — surfaced
    by the thread-parallel oracle sweeps).  Reading the id off the plan is
    exact regardless of what other driver threads do.  Returns an empty
    set when the plan is not a LogicalRDD (caller then has nothing it can
    safely release)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            return {int(plan.rdd().id())}
    except Exception:  # pragma: no cover - py4j/Connect API drift
        pass
    return set()


def scoped_checkpoint(df: DataFrame) -> Tuple[DataFrame, Callable[[], None]]:
    """``localCheckpoint(eager=True)`` plus an explicit release handle.

    Returns ``(checkpointed_frame, release)``; ``release()`` drops the
    blocks the checkpoint created.  Safe to call ``release`` more than
    once.

    Contract (ADVICE r9, ckpt.py): the persisted id is read directly off
    the checkpointed plan's ``LogicalRDD``, so concurrent persists by
    other threads/sessions on the same SparkContext are never swept up.
    The snapshot-diff fallback (plan shape unavailable, e.g. a future
    Connect backend) IS context-wide and assumes a single-threaded
    driver — the registry/driver execution model.  Callers must drive
    every consumer of the checkpointed frame to completion before
    ``release()``: lineage is truncated, so a lazy plan still referencing
    the frame becomes unrecoverable once the blocks drop.
    """
    before = persistent_rdd_ids(df)
    ckpt = df.localCheckpoint(eager=True)
    created = checkpointed_rdd_ids(ckpt)
    if not created:  # pragma: no cover - exercised only on API drift
        created = persistent_rdd_ids(ckpt) - before

    def release() -> None:
        release_rdd_ids(ckpt, created)

    return ckpt, release
