"""Custom stateful streaming operator (SURVEY.md §2.7 T2 analog,
BASELINE.json north-star): exact dedup over an unbounded document stream.

applyInPandasWithState keeps, per key-group, the set of content hashes
already emitted; a document passes through only the first time its content
is seen across the whole stream — the streaming twin of exact_dedup's
first-occurrence semantics.

Scale posture (all three state dimensions are bounded):
  - SHARDING: the grouping key is a PREFIX of the content hash, so state
    shards across 16**prefix_len groups independent of corpus size;
  - ENTRY WIDTH: state stores TRUNCATED hashes (state_hash_chars hex chars,
    default 16 = 64 bits — collision odds ~n^2/2^65, negligible against
    real duplicate rates), not the full 64-char digest: 4x less state I/O,
    while the OUTPUT still carries the full sha256;
  - LIFETIME: with ttl_ms set, every state entry carries its last-seen
    processing-time stamp and is PRUNED on every invocation once idle past
    the TTL — so an ACTIVE shard's state is bounded by the distinct
    content seen in any ttl_ms window, not the whole stream (a group-level
    ProcessingTimeTimeout would only ever fire for a shard receiving NO
    data at all, which on a continuous stream is no bound). The group
    timeout stays armed as wholesale cleanup for fully idle shards. A
    sighting of suppressed duplicate content REFRESHES its stamp: an
    entry expires only after ttl_ms with no sighting (sliding window).
    ttl_ms=None keeps exact whole-stream dedup (state follows distinct
    content).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def make_dedup_group(state_hash_chars: int, ttl_ms: int | None):
    """Build the per-group dedup function (module-level factory so tests
    can drive it directly with a fake GroupState)."""

    def dedup_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # fully idle shard past TTL: drop its seen-set wholesale
            state.remove()
            return
        # seen: truncated hash -> last-seen processing-time ms
        if state.exists:
            hashes, stamps = state.get
            seen: dict = dict(zip(hashes, stamps))
        else:
            seen = {}
        now = 0
        if ttl_ms is not None:
            now = state.getCurrentProcessingTimeMs()
            # per-entry expiry runs on EVERY invocation, so an active
            # shard prunes too — the group timeout alone only ever fires
            # for a shard receiving no data at all
            cutoff = now - ttl_ms
            seen = {h: t for h, t in seen.items() if t > cutoff}
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            short = pdf["content_sha"].str.slice(0, state_hash_chars)
            fresh = pdf[~short.isin(seen.keys())]
            first = fresh.drop_duplicates(subset=["content_sha"], keep="first")
            # every sighting — emitted or suppressed — refreshes the
            # stamp: an entry expires only after ttl_ms with NO sighting
            seen.update(dict.fromkeys(short, now))
            if len(first):
                yield first[["doc_id", "text", "content_sha"]]
        ordered = sorted(seen)
        state.update((ordered, [seen[h] for h in ordered]))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return dedup_group


def streaming_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 2,
    state_hash_chars: int = 16,
    ttl_ms: int | None = None,
) -> DataFrame:
    """First-occurrence pass-through over a streaming DataFrame of
    (id, text): emits (id, text, content_sha) once per distinct text.

    Within a micro-batch the minimum id wins (deterministic); across
    batches, arrival order wins (stream semantics). With ttl_ms set, each
    seen-hash expires individually once unseen for ttl_ms (sliding-window
    dedup — active shards prune on every batch, and a fully idle shard is
    dropped wholesale by the group timeout); without it, dedup is exact
    over the whole stream.
    """
    hashed = docs_stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.sha2(F.encode(F.col(text_col), "UTF-8"), 256).alias("content_sha"),
    ).withColumn("shard", F.substring("content_sha", 1, prefix_len))

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return hashed.groupBy("shard").applyInPandasWithState(
        make_dedup_group(state_hash_chars, ttl_ms),
        outputStructType="doc_id LONG, text STRING, content_sha STRING",
        stateStructType="hashes ARRAY<STRING>, stamps ARRAY<BIGINT>",
        outputMode="append",
        timeoutConf=timeout,
    )
