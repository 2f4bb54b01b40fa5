"""Stateful-streaming scale rehearsal (r15 VERDICT task 6): measure the
two applyInPandasWithState sessionizers — t10's zero-delay operator
(state = one open session, 5 ints per user) and t12's buffered
late-data operator (state = the event buffer inside the delay + gap
horizon) — along BOTH scaling axes, so the 100 TB posture of the
sweep's two most expensive entries is evidence:

  axis A: event volume 1x / 10x / 100x at FIXED key cardinality
          (per-user history grows; t10 state must NOT grow, t12's
          buffer grows only with the in-horizon slice)
  axis B: fixed volume, key cardinality x1 / x10 / x100
          (state ROWS grow with keys; per-key work shrinks)

Per run and operator: wall seconds, peak state-store rows and bytes
(stateOperators from the streaming progress), and emitted sessions.
At the 10x points of both axes, t12 re-runs at state-partition counts
{8, 16, 32} to locate the knee (r12 measured 16 on local[32] at sf0.1
load; the knee is where per-group Python work saturates cores vs
store-commit overhead — queries_time.py:t12 call-site comment).

The feed is synthetic with CONTROLLED cardinality (sessions of ~6
events: 120 s intra-session steps, hourly session starts, every 11th
event 'error' so the dynamic gap rides the lag), written as B=8
sequential time-block files; for t12 every 5th event defers one block
(bounded lateness, the t12 fixture's shape) and the watermark delay
sits just past the block span. A far-future sentinel row flushes every
horizon so the bounded run emits all sessions. Correctness of both
operators is pinned elsewhere (t10/t12 driver oracles + unit tests);
this script measures COST.

Usage: python scale_rehearsal_streaming.py   (writes
SCALE_REHEARSAL_r15.json next to itself; ~solo-host job, respect the
one-measured-job-at-a-time rule)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

E0 = 100_000   # axis baseline: the sf0.1 events row count
U0 = 1_500     # the sf0.1 events user cardinality
N_BLOCKS = 8   # time-block files per feed (fixed batch count)


def build_feed(spark, root: str, n_events: int, n_users: int,
               late: bool) -> tuple[str, int]:
    """Write N_BLOCKS sequential time-block parquet files; returns
    (dir, block_span_s). Sessions: 6 events at 120 s steps, new
    session hourly; every 11th event 'error'. late=True defers every
    5th event one block (arrival block = time block + 1)."""
    from pyspark.sql import functions as F

    d = os.path.join(root, f"feed_{n_events}_{n_users}_{int(late)}")
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d)
    epoch0 = 1_600_000_000
    per_user = (n_events + n_users - 1) // n_users
    span_s = ((per_user + 5) // 6) * 3600 + 3600
    block_span = (span_s + N_BLOCKS - 1) // N_BLOCKS
    base = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_users).alias("user_id"),
        (F.col("id") / n_users).cast("long").alias("seq"),
    ).select(
        "event_id", "user_id",
        (F.lit(epoch0) + (F.col("seq") / 6).cast("long") * 3600
         + (F.col("seq") % 6) * 120).alias("tsec"),
        F.when(F.col("event_id") % 11 == 0, F.lit("error"))
        .otherwise(F.lit("view")).alias("event_type"),
    ).select(
        "event_id", "user_id", "event_type", "tsec",
        ((F.col("tsec") - epoch0) / block_span).cast("int").alias("tblk"),
    )
    if late:
        base = base.withColumn(
            "ablk",
            F.least(
                F.lit(N_BLOCKS - 1),
                F.col("tblk")
                + F.when(F.col("event_id") % 5 == 0, 1).otherwise(0),
            ),
        )
    else:
        base = base.withColumn("ablk", F.col("tblk"))
    rows = base.select(
        "event_id",
        F.timestamp_seconds("tsec").alias("ts"),
        "user_id", "event_type",
        F.lit(1.0).alias("value"), F.lit("{}").alias("props"),
        "ablk",
    ).persist()
    rows.count()
    import glob

    now = 1_700_000_000
    for b in range(N_BLOCKS):
        blk = rows.filter(F.col("ablk") == b).drop("ablk")
        if b == N_BLOCKS - 1:
            sentinel = spark.createDataFrame(
                [(-1, -1, "view", 1.0, "{}")],
                "event_id LONG, user_id LONG, event_type STRING, "
                "value DOUBLE, props STRING",
            ).select(
                "event_id",
                F.timestamp_seconds(
                    F.lit(epoch0 + span_s + 10 * 365 * 86400)
                ).alias("ts"),
                "user_id", "event_type", "value", "props",
            )
            blk = blk.unionByName(sentinel)
        # one file per block (ordered by ts inside the block so the
        # zero-delay operator sees an in-order feed), hoisted out of
        # the Spark output dir into the flat feed layout the file
        # source expects, mtimes ascending (the fixture convention)
        tmp_out = os.path.join(d, f"_blk_{b:02d}")
        blk.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(
            tmp_out
        )
        part = glob.glob(os.path.join(tmp_out, "part-*.parquet"))[0]
        dst = os.path.join(d, f"part-{b:03d}.parquet")
        os.replace(part, dst)
        shutil.rmtree(tmp_out)
        os.utime(dst, (now + b, now + b))
    rows.unpersist()
    return d, block_span


def run_query(spark, out, n_partitions: int) -> dict:
    """Start + await the bounded stream on a memory sink with
    n_partitions state stores; return wall + peak state metrics."""
    name = f"rehearsal_{int(time.time() * 1000)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
    try:
        t0 = time.time()
        q = (
            out.writeStream.outputMode("append").format("memory")
            .queryName(name).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        wall = round(time.time() - t0, 2)
        rows_peak = mem_peak = 0
        for p in q.recentProgress:
            for so in p.get("stateOperators", []):
                rows_peak = max(rows_peak, so.get("numRowsTotal", 0))
                mem_peak = max(mem_peak, so.get("memoryUsedBytes", 0))
        n_sessions = spark.sql(
            f"SELECT count(*) c FROM {name} WHERE user_id >= 0"
        ).collect()[0]["c"]
        return {
            "wall_sec": wall,
            "state_rows_peak": int(rows_peak),
            "state_mb_peak": round(mem_peak / 1e6, 2),
            "sessions": int(n_sessions),
            "n_state_partitions": n_partitions,
        }
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.dropTempView(name)


def rehearse(spark, root: str, n_events: int, n_users: int,
             knee_sweep: bool) -> dict:
    from citydata_etl_spark.streaming.stateful import (
        streaming_dynamic_gap_sessions,
        streaming_late_sessions,
    )
    from citydata_etl_spark.streaming.windows import read_events_stream

    out = {"n_events": n_events, "n_users": n_users,
           "load_1min": round(os.getloadavg()[0], 2)}

    # t10 shape: zero-delay, one-open-session state, 4 partitions
    # (the catalog default for this operator's negligible group work)
    d, _ = build_feed(spark, root, n_events, n_users, late=False)
    stream = read_events_stream(spark, d, max_files_per_trigger=2)
    out["t10"] = run_query(
        spark, streaming_dynamic_gap_sessions(
            stream.select("event_id", "ts", "user_id", "event_type")),
        n_partitions=4,
    )
    shutil.rmtree(d)

    # t12 shape: buffered late-data operator at the catalog's derived
    # partition count (defaultParallelism/2 = 16 on local[32])
    d, block_span = build_feed(spark, root, n_events, n_users, late=True)
    base_parts = max(4, spark.sparkContext.defaultParallelism // 2)
    counts = (base_parts,) if not knee_sweep else (8, 16, 32)
    out["t12"] = []
    for nparts in counts:
        stream = read_events_stream(spark, d, max_files_per_trigger=2)
        out["t12"].append(run_query(
            spark, streaming_late_sessions(
                stream.select("event_id", "ts", "user_id", "event_type"),
                watermark_delay=f"{block_span + 60} seconds"),
            n_partitions=nparts,
        ))
    shutil.rmtree(d)
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import tempfile

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-rehearsal-streaming")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stream_rehearsal_")
    # warmup (JVM + state store + Python worker pool)
    rehearse(spark, root, 10_000, 200, knee_sweep=False)
    results = {
        "cpus": cpus,
        "baseline": {"events": E0, "users": U0},
        "load_avg_before": list(os.getloadavg()),
        "axis_volume": [],   # 1x/10x/100x events at U0 users
        "axis_keys": [],     # E0*10 events at 1x/10x/100x users
    }
    for mult in (1, 10, 100):
        r = rehearse(spark, root, E0 * mult, U0,
                     knee_sweep=(mult == 10))
        r["mult"] = mult
        results["axis_volume"].append(r)
        print(json.dumps(r))
    for kmult in (1, 10, 100):
        r = rehearse(spark, root, E0 * 10, U0 * kmult,
                     knee_sweep=(kmult == 10))
        r["key_mult"] = kmult
        results["axis_keys"].append(r)
        print(json.dumps(r))
    results["load_avg_after"] = list(os.getloadavg())
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "SCALE_REHEARSAL_r15.json",
    )
    # merge-append: other rehearsal probes (semantic_auto_10x) write
    # sections into the same artifact — a re-run of this script must
    # not wipe them
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
