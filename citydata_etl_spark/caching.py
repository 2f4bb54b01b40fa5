"""Scoped cache lifecycle for operator-internal persists.

Several operators persist intermediates that feed multiple branches of one
query plan (dedup signature tables, similarity cluster assignments, ...).
Those caches are required while the query's action runs, but a long-lived
session executing many catalog queries would otherwise accumulate storage
memory: the operator returns a lazy DataFrame, so it can never know when
its caches are safe to drop.

The contract: operators persist through `scoped_persist`, which tracks the
cached DataFrame under the CREATING THREAD's registry; the catalog runner
(plans/catalog.py:register) releases the current thread's tracked caches
when a new query is built — the point where the prior query's working set
is provably no longer needed on that thread. `release_caches()` drops
every thread's tracked caches (bench / test teardown). Storage memory is
bounded by one query's working set per driver thread, and re-running a
query re-persists fresh instead of tripping CacheManager's "already
cached" warning.

Thread scoping is what makes CONCURRENT catalog builds safe: two queries
built from different driver threads no longer release each other's caches
(the round-3 session-global registry's documented caveat). The remaining
contract is per-thread: build a query, materialize it, then build the
next — interleaving build A / build B / materialize A on ONE thread drops
A's scoped persists (results stay correct; the cache speedup is lost).
"""

from __future__ import annotations

import logging
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: dict[int, list[DataFrame]] = {}  # owner thread id -> persisted dfs
_KEYED: dict[tuple, DataFrame] = {}  # cross-query persisted relations

log = logging.getLogger(__name__)


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """persist() + track under the calling thread for a later release."""
    df = df.persist() if storage_level is None else df.persist(storage_level)
    tid = threading.get_ident()
    with _LOCK:
        _TRACKED.setdefault(tid, []).append(df)
    return df


def _release(dfs: list[DataFrame]) -> int:
    n = 0
    for df in dfs:
        try:
            df.unpersist()
            n += 1
        except Exception as ex:
            # expected only in teardown races (session/JVM already
            # stopped); logged rather than silently swallowed so a real
            # JVM-side failure is visible at debug level
            log.debug("unpersist skipped: %s: %s", type(ex).__name__, ex)
    return n


def release_thread_caches() -> int:
    """Unpersist every DataFrame tracked by the CURRENT thread since its
    last release; returns the number released. Safe at any time: dropping
    a cache never changes results, only forces recomputation."""
    tid = threading.get_ident()
    with _LOCK:
        dfs = _TRACKED.pop(tid, [])
    return _release(dfs)


def keyed_get(key: tuple) -> DataFrame | None:
    """Peek the keyed registry without building: lets a derived-relation
    provider reuse an ALREADY-cached upstream (e.g. the shingle set
    derives from the bag iff some consumer pinned the bag) without
    forcing the upstream into storage memory when nobody else wants it."""
    with _LOCK:
        return _KEYED.get(key)


def keyed_persist(key: tuple, build: Callable[[], DataFrame]) -> DataFrame:
    """Session-lifetime persisted relation shared ACROSS queries.

    scoped_persist covers intermediates private to one query plan; this
    covers relations several catalog queries derive identically from the
    same source (the documents n-gram shingle bag feeds both the
    duplicated-passage and contamination queries) — deriving it per
    query re-runs the scan+explode each time. The registry is keyed by
    caller-supplied identity (include the source path and the Spark
    application id — a relation persisted under a stopped session must
    not be served to a new one) and survives release_thread_caches();
    only release_caches() (bench/test teardown) drops it. Bounded by the
    number of distinct keys, which is the number of distinct (source,
    n-gram order) combinations a sweep touches — single digits.

    Dropping or losing the cache never changes results: consumers get a
    lazy plan that recomputes from source if evicted.
    """
    with _LOCK:
        df = _KEYED.get(key)
    if df is not None:
        return df
    df = build().persist()
    with _LOCK:
        existing = _KEYED.setdefault(key, df)
    # On a lost build race, do NOT unpersist the loser: Spark's
    # CacheManager keys cache entries by LOGICAL PLAN, and the loser's
    # plan equals the winner's — unpersisting it would drop the single
    # shared cache entry out from under every future caller (results
    # stay correct, the sharing is silently lost). The loser's second
    # persist() was a no-op on the same entry; just return the winner.
    return existing


def release_caches() -> int:
    """Unpersist every tracked DataFrame across ALL threads plus the
    keyed cross-query relations (sweep/test teardown); returns the
    number released."""
    with _LOCK:
        dfs = [df for lst in _TRACKED.values() for df in lst]
        dfs += list(_KEYED.values())
        _TRACKED.clear()
        _KEYED.clear()
    return _release(dfs)
