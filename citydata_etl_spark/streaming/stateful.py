"""Custom stateful streaming operator (SURVEY.md §2.7 T2 analog,
BASELINE.json north-star): exact dedup over an unbounded document stream.

applyInPandasWithState keeps, per key-group, the set of content hashes
already emitted; a document passes through only the first time its content
is seen across the whole stream — the streaming twin of exact_dedup's
first-occurrence semantics.

Scale posture: the grouping key is a PREFIX of the content hash (not the
full hash), so state shards across `16**prefix_len` groups independent of
corpus size, and each group's state is a bounded dict of full hashes. At
100 TB the same topology holds — state store size follows distinct
content, shard count follows the prefix — and an eviction TTL
(GroupStateTimeout) bounds it further when dedup only needs a window.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 2,
) -> DataFrame:
    """First-occurrence pass-through over a streaming DataFrame of
    (id, text): emits (id, text, content_sha) once per distinct text.

    Within a micro-batch the minimum id wins (deterministic); across
    batches, arrival order wins (stream semantics).
    """
    hashed = docs_stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.sha2(F.encode(F.col(text_col), "UTF-8"), 256).alias("content_sha"),
    ).withColumn("shard", F.substring("content_sha", 1, prefix_len))

    def dedup_group(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seen: set = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            fresh = pdf[~pdf["content_sha"].isin(seen)]
            first = fresh.drop_duplicates(subset=["content_sha"], keep="first")
            if len(first):
                seen.update(first["content_sha"])
                yield first[["doc_id", "text", "content_sha"]]
        state.update((list(seen),))

    return hashed.groupBy("shard").applyInPandasWithState(
        dedup_group,
        outputStructType="doc_id LONG, text STRING, content_sha STRING",
        stateStructType="hashes ARRAY<STRING>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
