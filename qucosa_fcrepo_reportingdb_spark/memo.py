"""Per-SparkSession memo for materialized intermediate tables.

Composed pipelines (keep-canonical, the clean-corpus manifest, pagerank,
the LSH recall audit) share expensive intermediates — the exploded
shingle index, the near-duplicate pair table, the connected-components
labels. Each is the DB-as-handoff seam the reference pipelines around
(ReportingManager.java:56-95: stage 1 persists, stage 2 consumes); here
the handoff is a localCheckpoint-materialized DataFrame memoized per
(SparkSession, dataset) so a registry sweep builds it once.

Keyed by a WeakKeyDictionary on the session object itself — NOT id():
id() values can be reused after a stopped session is garbage-collected
(which would hand a later session a DataFrame bound to a dead one), and
the weak key lets the ContextCleaner release the checkpoint blocks when
the session goes away instead of pinning them for the process lifetime.
"""

from __future__ import annotations

import threading
import weakref
from typing import Callable, Hashable

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.Lock()
_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = \
    weakref.WeakKeyDictionary()


def session_memo(spark: SparkSession, key: Hashable,
                 builder: Callable[[], DataFrame]) -> DataFrame:
    """Return the memoized DataFrame for (spark, key), building it with
    `builder` on first use. The builder runs OUTSIDE the lock (it may
    launch Spark jobs); a concurrent double-build is harmless — the first
    result wins and the loser's blocks are released on GC."""
    with _LOCK:
        per = _MEMO.setdefault(spark, {})
        cached = per.get(key)
    if cached is not None:
        return cached
    out = builder()
    with _LOCK:
        _evict_stopped_locked()
        return per.setdefault(key, out)


def _evict_stopped_locked() -> None:
    """Drop entries whose session has been STOPPED. The weak key alone
    cannot collect them: the cached DataFrames strongly reference their
    SparkSession, the per-session dict references the DataFrames, and
    the WeakKeyDictionary references the dict — the value keeps the key
    alive. Explicit liveness probing on each build breaks that cycle for
    dead sessions, bounding the leak to at most one stopped session
    between builds."""
    dead = []
    for sess in list(_MEMO.keys()):
        try:
            sc = sess.sparkContext
        except Exception:
            # Spark Connect sessions raise on sparkContext access —
            # liveness is UNKNOWABLE there, and evicting a live session
            # would silently disable memoization for it. Keep it; the
            # weak key still collects it if the caller drops it.
            continue
        try:
            stopped = sc._jsc is None
        except Exception:
            stopped = True
        if stopped:
            dead.append(sess)
    for sess in dead:
        _MEMO.pop(sess, None)


def clear_session_memo(spark: SparkSession | None = None) -> None:
    """Explicit eviction hook for session teardown (conftest fixtures,
    long-lived drivers rotating datasets)."""
    with _LOCK:
        if spark is None:
            _MEMO.clear()
        else:
            _MEMO.pop(spark, None)


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize a frame and truncate its lineage — the handoff-
    artifact primitive every composed pipeline and driver loop here uses
    (via ``df.transform(cut_lineage)``).

    On a plain session this is ``localCheckpoint`` — executor-local
    blocks, fast, but lost with an executor. When the SparkContext has a
    RELIABLE checkpoint directory configured (``sc.setCheckpointDir``,
    the signal a cluster deployment sets), it upgrades to
    ``checkpoint()``: blocks land in fault-tolerant storage and survive
    executor loss. This centralizes the "swap localCheckpoint for
    checkpoint on a real cluster" caveat the call sites used to carry as
    prose — the deployment flips ONE switch instead of editing 26 call
    sites."""
    try:
        has_dir = (df.sparkSession.sparkContext._jsc.sc()
                   .getCheckpointDir().isDefined())
    except Exception:
        has_dir = False   # Spark Connect: stay with localCheckpoint
    return df.checkpoint() if has_dir else df.localCheckpoint()
