"""Incremental pipeline patterns (SURVEY.md §2.7 T1-T4).

  - incremental_pending_run: Trigger.AvailableNow micro-batch over newly
    arrived control rows — the streaming form of the periodic re-scrape
    (T1/T2): state lives in the control table itself, each micro-batch is
    the P1 pending filter, exactly the reference's incremental contract
    (reference lambda/collect-data.py:166) without its lost-update race.
  - foreach_batch_promote: the curated-zone promotion (S9/T3) as a
    foreachBatch sink — per-batch exactly-once via the write-commit
    protocol plus checkpointed offsets.
  - with_retry: bounded retries with fixed interval — the Step Functions
    retry policy (reference stepfunction/definition.json:13-23: 10
    attempts, 30 s, backoff rate 1) as driver-side logic.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def incremental_pending_run(
    spark: SparkSession,
    control_path: str,
    schema: T.StructType,
    process_batch: Callable[[DataFrame, int], None],
    checkpoint: str,
    query_name: str = "pending_scan",
) -> None:
    """Process pending control rows incrementally: stream the control CSV
    directory, filter P1 per micro-batch, hand each batch to
    process_batch(df, epoch). AvailableNow drains what exists and stops —
    rerunning later picks up only new files (checkpointed offsets)."""
    from citydata_etl_spark.operators.relational import pending_work

    stream = (
        spark.readStream.schema(schema)
        .option("header", True)
        .csv(control_path)
    )

    def handle(df: DataFrame, epoch: int) -> None:
        process_batch(pending_work(df), epoch)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()


def foreach_batch_promote(
    spark: SparkSession,
    staging_path: str,
    staging_schema: T.StructType,
    curated_path: str,
    checkpoint: str,
    now=None,
) -> None:
    """T3: stream staging arrivals into the curated partitioned layout.
    Each micro-batch runs the batch promotion (etl/staging.py:promote) —
    partition values are processing-time, matching the reference's
    wall-clock-at-move semantics (process-staging.py:14-18). Pass `now`
    (a timestamp Column) to inject the clock for deterministic tests and
    oracle-checked runs."""
    from citydata_etl_spark.etl.staging import promote

    stream = (
        spark.readStream.schema(staging_schema)
        .option("header", True)
        .csv(staging_path)
    )

    def handle(df: DataFrame, epoch: int) -> None:
        promote(df, curated_path, now=now)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def with_retry(
    fn: Callable[[], None],
    attempts: int = 10,
    interval_seconds: float = 30.0,
    backoff_rate: float = 1.0,
) -> None:
    """T4: the Step Functions retry policy as driver-side control flow."""
    delay = interval_seconds
    for attempt in range(1, attempts + 1):
        try:
            fn()
            return
        except Exception:
            if attempt == attempts:
                raise
            time.sleep(delay)
            delay *= backoff_rate
