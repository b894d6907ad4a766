"""Session-scoped cache registry — the library's persist() contract.

Several query functions persist an intermediate frame that the
RETURNED (lazy) DataFrame reads — e.g. the fused spike frame feeds
both the per-key filter and two bucket rollups, and the IVF
assignment feeds both the probe and candidate sides. Those persists
cannot be dropped inside the function: the caller has not run its
action yet, and an eager unpersist would silently turn the shared
scan back into N recomputations (the exact regression the persists
fix — see VERDICT r2/r3 history).

So the contract is explicit instead of leaky:

  * library code registers every caller-visible persist through
    `tracked_persist(df)` (internal persists that are fully consumed
    and unpersisted within one function don't register);
  * the session owner calls `release_tracked()` at its cycle
    boundary — after materializing results, between bench queries,
    at the end of a detector cycle — which unpersists every tracked
    frame and empties the registry.

`release_tracked()` is idempotent and safe to call while other
queries are being BUILT (building only creates plans); it must not
race a concurrently RUNNING action, same as any unpersist.

Assertable: after release_tracked(), `pinned_rdd_count(spark)` is 0
(tests/test_caching.py pins this for representative query shapes).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + register for session-scoped release.

    Returns the same DataFrame so call sites read
    `frame = tracked_persist(expr)` exactly like `.persist()` did.
    """
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    return track(df)


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted frame for session-scoped release
    (for call sites that persist with custom logic, e.g. the IVF
    final-round materialization)."""
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame; returns how many were released.

    blocking=False (the default): Spark drops the blocks
    asynchronously, callers don't wait on executor round-trips.
    """
    with _LOCK:
        frames, _TRACKED[:] = list(_TRACKED), []
    n = 0
    for f in frames:
        try:
            f.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — session already stopped etc.
            pass
    return n


def pinned_rdd_count(spark: SparkSession) -> int:
    """Number of RDDs currently pinned in the session's block manager."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()
