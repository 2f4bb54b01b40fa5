"""Shard-count scaling rehearsal for the r18 shard-keyed stateful
streaming operators (OPTIMIZATION_r18.md).

The r18 change keys applyInPandasWithState state by pmod(key, n_shards)
and claims: (a) 64 shards is right for the bench's 1.5k-user load, and
(b) a deployment grows SHARD COUNT with key cardinality so per-shard
blobs stay bounded and the per-shard Python kernels keep amortizing.
This script measures claim (b) instead of asserting it: the buffered
late-data sessionizer (t12's operator, streaming_late_sessions) runs
over a t12-shaped out-of-order feed at 1x (1.5k) and 10x (15k) user
cardinality, swept over n_shards {16, 64, 256} at the t12 call site's
8 state partitions, wall best-of-2 per cell, and the emitted session
count cross-checked against the batch twin (sessionize_dynamic) at
every cell — a shard-keying bug would change the count, not just the
wall.

Feed: the _events_dir_late_blocks shape, parameterized by user count —
N_BLOCKS time blocks (one file each, ascending names + mtimes), every
5th event deferred one block (bounded lateness), a far-future sentinel
arriving last so the final watermark flushes every buffer.

Usage: python scale_rehearsal_shards.py (solo-host job).
Writes SCALE_REHEARSAL_r18_SHARDS.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

N_BLOCKS = 5
STRAGGLER_MOD = 5
SPAN_S = 30 * 86400  # the sf0.1 events table's ~30-day span
SHARD_SWEEP = (16, 64, 256)
N_PARTITIONS = 8  # the t12 call site's measured knee


def build_late_feed(spark, root: str, n_events: int, n_users: int) -> tuple:
    """t12-shaped feed with controlled USER cardinality: event k has
    tsec = epoch0 + (k * 2654435761) mod SPAN_S (full-period walk, so
    blocks are uniformly filled), user = k mod n_users, every
    STRAGGLER_MOD-th event deferred one block. Returns (dir,
    block_span_s)."""
    import glob

    from pyspark.sql import functions as F

    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    block_span_s = SPAN_S // N_BLOCKS + 1
    epoch0 = 1_600_000_000
    base = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(epoch0) + (F.col("id") * 2654435761) % SPAN_S
        ).alias("ts"),
        (F.col("id") % n_users).alias("user_id"),
        F.when(F.col("id") % 7 == 0, "error").otherwise("view")
        .alias("event_type"),
        (F.col("id") % 100).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    blk = ((F.unix_timestamp("ts") - epoch0) / block_span_s).cast("int")
    arrival = F.when(
        F.col("event_id") % STRAGGLER_MOD == 0,
        F.least(blk + 1, F.lit(N_BLOCKS - 1)),
    ).otherwise(blk)
    base = base.withColumn("arr", arrival)
    now = 1_700_000_000
    for b in range(N_BLOCKS):
        part = base.filter(F.col("arr") == b).drop("arr")
        tmp = os.path.join(root, f"_tmp_{b}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(root, f"part-{b:03d}.parquet")
        shutil.move(src, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now + b, now + b))
    sent = base.filter(F.col("event_id") == 0).drop("arr").select(
        F.lit(-1).cast("bigint").alias("event_id"),
        F.timestamp_seconds(
            F.lit(epoch0 + SPAN_S + 3650 * 86400)
        ).alias("ts"),
        F.lit(-1).cast("bigint").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    tmp = os.path.join(root, "_tmp_s")
    sent.coalesce(1).write.mode("overwrite").parquet(tmp)
    import glob as g

    src = g.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dst = os.path.join(root, f"part-{N_BLOCKS:03d}-sentinel.parquet")
    shutil.move(src, dst)
    shutil.rmtree(tmp)
    os.utime(dst, (now + N_BLOCKS, now + N_BLOCKS))
    return root, block_span_s


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.aggregates import sessionize_dynamic
    from citydata_etl_spark.plans.queries_time import (
        _await_with_state_partitions,
    )
    from citydata_etl_spark.session import get_spark
    from citydata_etl_spark.streaming.stateful import (
        streaming_late_sessions,
    )

    spark = get_spark(app_name="shard-rehearsal")
    out: dict = {
        "what": (
            "streaming_late_sessions (t12's buffered operator) over a "
            "t12-shaped out-of-order feed: n_shards sweep at 1x/10x "
            "USER cardinality, 8 state partitions, wall best-of-2, "
            "session count cross-checked against the batch twin"
        ),
        "n_partitions": N_PARTITIONS,
        "load_avg_before": list(os.getloadavg()),
        "cells": [],
    }
    seq = 0
    for mult, n_users, n_events in ((1, 1500, 100_000), (10, 15_000, 200_000)):
        root = f"/tmp/shard_rehearsal_{mult}x"
        d, block_span_s = build_late_feed(spark, root, n_events, n_users)
        batch = spark.read.parquet(d + "/part-*.parquet")
        prepared = batch.filter(F.col("user_id") >= 0).select(
            "user_id",
            "event_id",
            F.floor(F.col("ts").cast("double")).cast("long").alias("tsec"),
            F.when(F.col("event_type") == "error", 300)
            .otherwise(1800)
            .alias("thr"),
        )
        expected = (
            sessionize_dynamic(
                prepared, "user_id", "tsec", F.col("thr"), "event_id"
            )
            .select("user_id", "session_id")
            .distinct()
            .count()
        )
        for n_shards in SHARD_SWEEP:
            walls = []
            n_rows = None
            for _rep in range(2):
                stream = (
                    spark.readStream.schema(batch.schema)
                    .option("maxFilesPerTrigger", 2)
                    .parquet(d)
                )
                sess = streaming_late_sessions(
                    stream.select(
                        "event_id", "ts", "user_id", "event_type"
                    ),
                    watermark_delay=f"{block_span_s + 60} seconds",
                    n_shards=n_shards,
                )
                seq += 1
                name = f"shard_rehearsal_{seq}"
                t0 = time.perf_counter()
                _await_with_state_partitions(
                    spark,
                    sess.writeStream.outputMode("append")
                    .format("memory")
                    .queryName(name),
                    n_partitions=N_PARTITIONS,
                )
                n_rows = spark.sql(
                    f"SELECT * FROM {name} WHERE user_id >= 0"
                ).count()
                walls.append(round(time.perf_counter() - t0, 3))
                spark.catalog.dropTempView(name)
            out["cells"].append(
                {
                    "mult": mult,
                    "n_users": n_users,
                    "n_events": n_events,
                    "n_shards": n_shards,
                    "users_per_shard": n_users // n_shards,
                    "walls": walls,
                    "wall_best": min(walls),
                    "sessions": n_rows,
                    "batch_twin_sessions": expected,
                    "match": n_rows == expected,
                }
            )
            print(json.dumps(out["cells"][-1]))
    out["load_avg_after"] = list(os.getloadavg())
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "SCALE_REHEARSAL_r18_SHARDS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALE_REHEARSAL_r18_SHARDS.json")


if __name__ == "__main__":
    main()
