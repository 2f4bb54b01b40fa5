"""Dedup-flagship scale rehearsal (r12 verdict item 3): run the
minhash_lsh_pairs -> dedup_groups chain at 1x and 10x the sf0.1
documents corpus (10x ~= sf1) and MEASURE — wall time per phase,
shuffle read/write bytes (Spark REST API stage totals), LSH
band-bucket occupancy (max/mean), pair and group counts — so the
100 TB posture is evidence, not plan-shape argument.

The 10x corpus replicates sf0.1 documents with disjoint doc_id ranges
and per-copy token suffixes: every token (hence every shingle) differs
across copies, so cross-copy similarity is ZERO and each copy carries
the original corpus's near-dup structure — the duplicate DENSITY stays
realistic while rows scale 10x. Construction is a projection + union
(no shuffle of its own). Note the suffix changes every shingle's
xxhash64, so each copy RE-DRAWS the LSH coin flips (equivalent to
fresh hash seeds over the same jaccard structure): candidate-pair and
bucket-occupancy counts are a fresh sample per copy, not 10x the 1x
numbers — which is the point, since the skewed-bucket hazard only
shows up under re-drawn hashes.

The chain runs in the at-scale configuration the entry docs promise:
id_mode='hash' (xxhash64 shingle ids — no global dense-rank sort; the
oracle-exact rank mode exists for driver parity, not for scale).

Usage: python scale_rehearsal.py [mult ...]   (default: 1 10)
Writes SCALE_REHEARSAL_r13.json next to itself and prints one JSON
line per mult.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def _shuffle_totals(spark) -> tuple[int, int]:
    """Sum shuffle read/write bytes over THIS app's completed stages —
    the UI base and app id come from the live session (Spark silently
    binds 4050+ when 4049 is taken, and applications[0] on a foreign
    port would be someone else's app — r13 review finding)."""
    ui_base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui_base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def _replicated_docs(spark, sf_dir: str, mult: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    off = 10_000_000
    parts = []
    for k in range(mult):
        suffixed = F.array_join(
            F.transform(
                F.filter(F.split("text", " "), lambda x: x != ""),
                lambda t: F.concat(t, F.lit(str(k))),
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * off)).alias("doc_id"),
                suffixed.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def rehearse(spark, sf_dir: str, mult: int) -> dict:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators import dedup as D

    docs = _replicated_docs(spark, sf_dir, mult)
    n_docs = docs.count()

    rd0, wr0 = _shuffle_totals(spark)
    t0 = time.time()
    pairs = D.minhash_lsh_pairs(
        docs, num_hashes=16, band_size=4, shingle_n=2, id_mode="hash"
    ).persist()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0
    rd1, wr1 = _shuffle_totals(spark)

    t0 = time.time()
    groups = D.dedup_groups(pairs)
    stats = groups.agg(
        F.count("*").alias("n"),
        F.countDistinct("group_id").alias("g"),
    ).collect()[0]
    t_groups = time.time() - t0
    rd2, wr2 = _shuffle_totals(spark)
    pairs.unpersist()

    # band-bucket occupancy: the skew hazard the chain's cost follows
    arr = D.minhash_signature_arrays(
        docs, num_hashes=16, shingle_n=2, id_mode="hash"
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.array_join(
                    F.transform(
                        F.slice("sigs", bi * 4 + 1, 4),
                        lambda h: h.cast("string"),
                    ),
                    ",",
                ).alias("sig"),
            )
            for bi in range(4)
        ]
    )
    occ = (
        arr.select(F.explode(bands).alias("bs"))
        .groupBy("bs.band", "bs.sig")
        .count()
        .agg(
            F.max("count").alias("max_occ"),
            F.avg("count").alias("mean_occ"),
            F.count("*").alias("n_buckets"),
        )
        .collect()[0]
    )

    return {
        "mult": mult,
        "n_docs": n_docs,
        "n_candidate_pairs": n_pairs,
        "n_grouped_docs": stats["n"],
        "n_groups": stats["g"],
        "pairs_sec": round(t_pairs, 2),
        "groups_sec": round(t_groups, 2),
        "shuffle_read_mb": {
            "pairs": round((rd1 - rd0) / 1e6, 1),
            "groups": round((rd2 - rd1) / 1e6, 1),
        },
        "shuffle_write_mb": {
            "pairs": round((wr1 - wr0) / 1e6, 1),
            "groups": round((wr2 - wr1) / 1e6, 1),
        },
        "bucket_max_occupancy": occ["max_occ"],
        "bucket_mean_occupancy": round(float(occ["mean_occ"]), 3),
        "n_buckets": occ["n_buckets"],
    }


def main() -> None:
    from pyspark.sql import SparkSession

    mults = [int(a) for a in sys.argv[1:]] or [1, 10]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-rehearsal")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # throwaway warmup (JVM codegen + Python worker pool), so the first
    # timed mult doesn't carry session startup and the 1x-vs-10x ratio
    # reads clean
    rehearse(spark, sf_dir, 1)
    results = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "load_avg_before": os.getloadavg(),
        "runs": [],
    }
    for m in mults:
        r = rehearse(spark, sf_dir, m)
        results["runs"].append(r)
        print(json.dumps(r))
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "SCALE_REHEARSAL_r13.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
