"""t19 slot-keyed state-partition knee rehearsal (r17, VERDICT task 6).

t19_stream_sliding_kmv hand-pins 16 state partitions; its call site
discloses that state_partitions_for would derive 64 for its ~6-9k
TIME-SLOT keys — "a value no measurement backs for that cheap-per-
group load". This script produces that measurement: the t19 operator
shape (streaming_slot_kmv — thousands of slot groups, each a tiny
Python kernel over <= k int64s) swept over state-partition counts
{4, 16, 64} at 1x (~8k slots) and 10x (~80k slots) slot cardinality,
per-group work held constant (~13 events/slot at both scales, SL
fixed while the feed span grows — how slot keys actually scale with
data volume).

Outcome encodes into queries_time.py's t19 call site: either the
hand-pin is confirmed (16 within noise of the best at both scales)
or the formula gains a measured cheap-per-group regime.

Feed: a dedicated builder with CONTROLLED slot cardinality (events
spread uniformly over n_slots * SL seconds by a deterministic
multiplicative walk — the r15 session-shaped feed collapses to ~68
distinct timestamps per user-seq because sessions share start times,
two decades short of t19's regime), written in the r15 harness's flat
part-NNN.parquet / ascending-mtime / schemas.EVENTS layout; the kmv
input is the t19 preparation (slot floor + lcg_pick) applied to it.
Usage: python scale_rehearsal_t19_knee.py (solo-host job). Writes
SCALE_REHEARSAL_r17_T19.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

SL = 300      # t19's slot length; the feed span sets cardinality
K = 64
PART_SWEEP = (4, 16, 64)
N_BLOCKS = 8


def build_slot_feed(spark, root: str, n_events: int,
                    n_slots: int) -> str:
    """Write N_BLOCKS flat part-NNN.parquet files (ascending mtimes,
    schemas.EVENTS layout) whose timestamps spread uniformly over
    n_slots * SL seconds: tsec = epoch0 + (id * 2654435761 mod
    span_s) — a full-period multiplicative walk, so every SL-second
    slot receives ~n_events/n_slots events and the kmv state holds
    n_slots groups."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    d = os.path.join(root, f"slotfeed_{n_events}_{n_slots}")
    if os.path.exists(d):
        shutil.rmtree(d)
    os.makedirs(d)
    epoch0 = 1_600_000_000
    span_s = n_slots * SL
    block_span = (span_s + N_BLOCKS - 1) // N_BLOCKS
    rows = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(epoch0) + (F.col("id") * 2654435761) % span_s
        ).alias("ts"),
        (F.col("id") % 1500).alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
        (((F.col("id") * 2654435761) % span_s) / block_span)
        .cast("int").alias("ablk"),
    ).persist()
    rows.count()
    now = 1_700_000_000
    for b in range(N_BLOCKS):
        blk = rows.filter(F.col("ablk") == b).drop("ablk")
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
    return d


def run_kmv(spark, feed_dir: str, n_partitions: int) -> dict:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.similarity import lcg_pick
    from citydata_etl_spark.streaming.stateful import streaming_slot_kmv
    from citydata_etl_spark.streaming.windows import read_events_stream

    stream = read_events_stream(spark, feed_dir, max_files_per_trigger=2)
    prepared = stream.filter(F.col("user_id").isNotNull()).select(
        (F.floor(F.unix_timestamp("ts") / SL) * SL)
        .cast("bigint").alias("slot"),
        lcg_pick(F.col("user_id")).alias("hv"),
    )
    out = streaming_slot_kmv(prepared, k=K)
    name = f"t19_knee_{int(time.time() * 1000)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions", None)
    spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
    try:
        t0 = time.time()
        q = (
            out.writeStream.outputMode("update").format("memory")
            .queryName(name).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        wall = round(time.time() - t0, 2)
        rows_peak = 0
        for p in q.recentProgress:
            for so in p.get("stateOperators", []):
                rows_peak = max(rows_peak, so.get("numRowsTotal", 0))
        n_slots = spark.sql(
            f"SELECT count(DISTINCT slot) c FROM {name}"
        ).collect()[0]["c"]
        return {
            "n_state_partitions": n_partitions,
            "wall_sec": wall,
            "state_rows_peak": int(rows_peak),
            "distinct_slots": int(n_slots),
            "load_1min": round(os.getloadavg()[0], 2),
        }
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.dropTempView(name)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import tempfile

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-rehearsal-t19-knee")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="t19_knee_")
    gate = {"threshold": 1.5, "waited_sec": 0}
    t0 = time.time()
    while os.getloadavg()[0] > gate["threshold"] and time.time() - t0 < 600:
        time.sleep(10)
    gate["waited_sec"] = round(time.time() - t0, 1)
    gate["load_at_start"] = round(os.getloadavg()[0], 2)
    # warmup: JVM + state store + Python worker pool
    d = build_slot_feed(spark, root, 10_000, 800)
    run_kmv(spark, d, 4)
    shutil.rmtree(d)
    art = {
        "cpus": cpus,
        "slot_len_s": SL,
        "k": K,
        "idle_gate": gate,
        "question": (
            "t19's hand-pinned 16 state partitions vs the formula's 64 "
            "for slot-keyed cheap-per-group state, 1x and 10x slots"),
        "runs": [],
    }
    for mult, n_events, n_slots in (
        (1, 100_000, 8_000), (10, 1_000_000, 80_000),
    ):
        d = build_slot_feed(spark, root, n_events, n_slots)
        row = {"slot_mult": mult, "n_events": n_events,
               "n_slots_target": n_slots, "sweep": []}
        for nparts in PART_SWEEP:
            row["sweep"].append(run_kmv(spark, d, nparts))
            print(json.dumps(row["sweep"][-1]))
        shutil.rmtree(d)
        art["runs"].append(row)
    art["load_avg_after"] = [round(x, 2) for x in os.getloadavg()]
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "SCALE_REHEARSAL_r17_T19.json"), "w") as f:
        json.dump(art, f, indent=1)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
