"""Collection pipeline (SURVEY.md §3.1): the collect-data lambda re-expressed
as ONE DataFrame pipeline:

    control.filter(P1).select(P2) -> fetch UDF (D1/D2) -> route (U3)
    -> raw payload rows (S7) + batched control status updates (U1)

Reference: lambda/collect-data.py:140-210. Differences by design:
  - fetch is mapInPandas with ONE transport per partition (the reference
    spawns a headless browser per row — collect-data.py:76-78);
  - status updates are batched into one columnar pass per run (the
    reference rewrites the full 28k-row CSV per scraped row —
    collect-data.py:111-135,179,187 — SURVEY.md §2.10 bugs 5-6);
  - the API branch's intent bugs (§2.10 bugs 1-3) are resolved: pending
    filter by status, source_name used for keys, parameters passed per
    exploded zip.

The transport is injectable: tests use a deterministic fake; production
wires an HTTP/browser client. The transport factory is created once per
partition — connection reuse without driver-side loops.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from citydata_etl_spark.caching import scoped_persist
from citydata_etl_spark.functions.scalar import utc_now_compact
from citydata_etl_spark.operators.relational import pending_work, route_status

# transport: url -> payload text (None on failure). The factory runs once
# per partition (the idiomatic fix for the reference's browser-per-row).
TransportFactory = Callable[[], Callable[[str], str | None]]

FETCH_SCHEMA = "id BIGINT, state STRING, city STRING, url STRING, payload STRING"


def fetch_pending(
    control: DataFrame,
    transport_factory: TransportFactory,
) -> DataFrame:
    """P1 + P2 + D1: filter pending rows, fetch each URL through a
    per-partition transport. Returns (id, state, city, url, payload)."""
    todo = pending_work(control).select("id", "state", "city", "url")

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()  # one client per partition
        for pdf in batches:
            payloads = []
            for url in pdf["url"]:
                try:
                    payloads.append(transport(url))
                except Exception:
                    payloads.append(None)  # -> routed to 'error' (U3)
            yield pdf.assign(payload=pd.array(payloads, dtype=object))

    return todo.mapInPandas(fetch_partition, schema=FETCH_SCHEMA)


def collect_run(
    control: DataFrame,
    transport_factory: TransportFactory,
    data_source: str,
    source_name: str,
) -> tuple[DataFrame, DataFrame]:
    """One collection run. Returns (raw_payloads, updated_control).

    raw_payloads: rows for the partitioned raw sink (S7) —
      (data_source, source_name, state, city, fetched_at, payload),
      successes only (the reference writes staging objects only on
      success, collect-data.py:181-186).
    updated_control: the control table with ALL of this run's status
      transitions applied in one columnar pass (U1/U3 batched).
    """
    # scoped persist: `fetched` feeds both the raw-payload branch and the
    # status-update branch — and the fetch UDF must run exactly once (a
    # recompute would re-hit every URL). Tracked in the session cache
    # registry so catalog sweeps release it like any other intermediate.
    fetched = scoped_persist(fetch_pending(control, transport_factory))
    routed = route_status(fetched, payload_col="payload")

    raw = (
        routed.filter(F.col("status") == "completed")
        .select(
            F.lit(data_source).alias("data_source"),
            F.lit(source_name).alias("source_name"),
            "state",
            "city",
            F.current_timestamp().alias("fetched_at"),
            "payload",
        )
    )

    updates = routed.select(
        "id", F.col("status").alias("new_status")
    )
    # plain equi-join on id — NO broadcast hint: the update set is sized
    # by the run's pending batch, which is data-derived (a full-backlog
    # run at scale could be the whole control table). AQE broadcasts it
    # at runtime exactly when it actually is small.
    updated = (
        control.join(updates, "id", "left")
        .withColumn(
            "status",
            F.coalesce(F.col("new_status"), F.col("status")),
        )
        .withColumn(
            "date_completed",
            F.when(F.col("new_status").isNotNull(), utc_now_compact())
            .otherwise(F.col("date_completed")),
        )
        .drop("new_status")
    )
    return raw, updated
