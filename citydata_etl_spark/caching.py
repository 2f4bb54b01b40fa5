"""Scoped cache lifecycle for operator-internal persists.

Several operators persist intermediates that feed multiple branches of one
query plan (dedup signature tables, similarity cluster assignments, ...).
Those caches are required while the query's action runs, but a long-lived
session executing many catalog queries would otherwise accumulate storage
memory: the operator returns a lazy DataFrame, so it can never know when
its caches are safe to drop.

The contract here: operators persist through `scoped_persist`, which tracks
the cached DataFrame in a session-wide registry; `release_caches` drops
everything tracked so far. The catalog runner releases the PREVIOUS query's
caches when a new query is built (plans/catalog.py:register), and bench /
tests release after each materialization — storage memory is bounded by one
query's working set, and re-running a query re-persists fresh instead of
tripping CacheManager's "already cached" warning.

Concurrency caveat: the registry is session-global. Two catalog queries
built CONCURRENTLY (multi-threaded driver) release each other's caches —
results stay correct (a dropped cache recomputes), but the concurrent
query loses its cache speedup. Serialize catalog query construction, or
persist manually outside this registry for concurrent workloads.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + track for a later release_caches()."""
    df = df.persist() if storage_level is None else df.persist(storage_level)
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every DataFrame tracked since the last release; returns the
    number released. Safe to call at any time: dropping a cache never
    changes results, only forces recomputation if the plan re-executes."""
    with _LOCK:
        dfs = list(_TRACKED)
        _TRACKED.clear()
    n = 0
    for df in dfs:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
