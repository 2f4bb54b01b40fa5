"""ANN/semantic scale rehearsal (r13 VERDICT item 5): run the
SemDeDup-style semantic dedup and the IVF probe path at 1x/10x/100x
the sf0.1 embeddings corpus and MEASURE — wall time per phase, shuffle
read/write bytes (Spark REST API stage totals), cluster-occupancy skew
(the quadratic-in-cluster hazard SemDeDup documents), and whether the
documented k ~ sqrt(n) sizing holds — so the 100 TB posture is
evidence, not plan-shape argument. The r14 sibling of r13's dedup
rehearsal (scale_rehearsal.py).

The Nx corpus replicates sf0.1 embeddings with disjoint vec_id ranges
and a per-copy deterministic SIGN-FLIP of each dimension (an LCG of
(copy, dim)). A per-dimension sign flip is an ISOMETRY, so every
within-copy cosine — hence the whole cluster/near-dup structure — is
preserved exactly per copy, while cross-copy cosines collapse toward 0
(the mixed-sign dot of dense vectors), mirroring the dedup rehearsal's
zero-cross-copy-similarity construction: duplicate DENSITY stays
realistic while rows scale Nx. Construction is a projection + union
(no shuffle of its own). Copy 0 is the untouched original corpus.

Per mult this measures:
  - semantic_dedup at k = round(sqrt(n)) (the documented sizing):
    wall, shuffle delta, keep/drop counts, cluster occupancy max/mean
    (seed-medoid quantizer).
  - at 10x ONLY: semantic_dedup again at the 1x-sized k, so the
    quadratic-in-cluster hazard is a measured contrast, not a claim.
  - ivf_topk (train_mode='sample', n_probe=4, k=5) at n_centroids =
    round(sqrt(n)): wall, shuffle delta, result rows, and the trained
    quantizer's ACTUAL assignment occupancy max/mean (diagnostic
    re-assignment in this script, not engine code).
  - at 1x ONLY: recall@5 of the IVF result against brute_force_topk
    (at 10x/100x brute force is the quadratic non-option — that being
    unaffordable is WHY the IVF path exists).

Usage: python scale_rehearsal_ann.py [mult ...]   (default: 1 10 100)
Writes SCALE_REHEARSAL_r14.json next to itself and prints one JSON
line per mult.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request


def _shuffle_totals(spark) -> tuple[int, int]:
    """Sum shuffle read/write bytes over THIS app's completed stages
    (UI base + app id from the live session — see scale_rehearsal.py)."""
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


def _replicated_emb(spark, sf_dir: str, mult: int):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")
    off = 10_000_000
    parts = []
    for k in range(mult):
        if k == 0:
            flipped = F.col("embedding")
        else:
            # per-(copy, dim) LCG sign: an isometry per copy, ~0 cosine
            # across copies for dense vectors
            flipped = F.transform(
                "embedding",
                lambda v, i: v * (
                    1 - 2 * ((i * 2654435761 + F.lit(k) * 40503 + 11)
                             % 2147483647 % 2)
                ).cast("float"),
            )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * off)).alias("vec_id"),
                flipped.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _occupancy(df, cluster_col: str):
    from pyspark.sql import functions as F

    row = (
        df.groupBy(cluster_col).count()
        .agg(
            F.max("count").alias("max_occ"),
            F.avg("count").alias("mean_occ"),
            F.count("*").alias("n_clusters"),
        )
        .collect()[0]
    )
    return {
        "max": int(row["max_occ"]),
        "mean": round(float(row["mean_occ"]), 1),
        "n_clusters": int(row["n_clusters"]),
    }


def _ivf_assignment_occupancy(emb, n_centroids, train_sample):
    """Diagnostic: re-run the IVF trainer and measure the ACTUAL
    nearest-centroid assignment occupancy (the engine's ivf_topk does
    this inside one mapInPandas; re-deriving it here keeps the probe
    out of the production operator)."""
    import numpy as np

    from citydata_etl_spark.operators import similarity as S

    C = S._coarse_centroids(
        emb, n_centroids, 5, "vec_id", "embedding", train_sample,
        "sample",
    )
    bc = emb.sparkSession.sparkContext.broadcast(C)

    def assign(batches):
        import pandas as pd

        cm = bc.value
        for pdf in batches:
            Q = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            n = np.sqrt((Q * Q).sum(axis=1, keepdims=True))
            n[n == 0] = 1.0
            sims = (Q / n) @ cm.T
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster": sims.argmax(axis=1).astype("int32"),
                }
            )

    tagged = emb.mapInPandas(assign, schema="vec_id BIGINT, cluster INT")
    return _occupancy(tagged, "cluster")


def rehearse(spark, sf_dir: str, mult: int) -> dict:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators import similarity as S

    emb = _replicated_emb(spark, sf_dir, mult).persist()
    n = emb.count()
    k_sqrt = max(8, round(math.sqrt(n)))
    out = {"mult": mult, "n_vectors": n, "k_sqrt": k_sqrt}

    # --- semantic dedup at the documented k ~ sqrt(n) sizing ---
    rd0, wr0 = _shuffle_totals(spark)
    t0 = time.time()
    sd = S.semantic_dedup(emb, n_clusters=k_sqrt, epsilon=0.3).persist()
    agg = sd.agg(
        F.count("*").alias("n"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
    ).collect()[0]
    out["semantic_sec"] = round(time.time() - t0, 2)
    rd1, wr1 = _shuffle_totals(spark)
    out["semantic_kept"] = int(agg["kept"])
    out["semantic_dropped"] = int(agg["n"] - agg["kept"])
    out["semantic_cluster_occupancy"] = _occupancy(sd, "cluster")
    out["semantic_shuffle_mb"] = {
        "read": round((rd1 - rd0) / 1e6, 1),
        "write": round((wr1 - wr0) / 1e6, 1),
    }
    sd.unpersist()

    # the broadcast-quantizer mode added in response to this
    # rehearsal's first finding (the literal-seed plan cost grows
    # with k): same semantics (equality-pinned in the test suite),
    # O(1)-in-k plan
    t0 = time.time()
    S.semantic_dedup(
        emb, n_clusters=k_sqrt, epsilon=0.3, quantizer="broadcast"
    ).agg(F.count("*")).collect()
    out["semantic_broadcast_sec"] = round(time.time() - t0, 2)

    # --- the quadratic-in-cluster hazard, measured: 10x data at the
    # 1x-sized k (cluster occupancy ~10x -> pairwise work ~100x/cluster)
    if mult == 10:
        k_small = max(8, round(math.sqrt(n // mult)))
        t0 = time.time()
        S.semantic_dedup(emb, n_clusters=k_small, epsilon=0.3).agg(
            F.count("*")
        ).collect()
        out["semantic_sec_at_1x_k"] = round(time.time() - t0, 2)
        out["k_at_1x"] = k_small

    # --- IVF probe path at n_centroids ~ sqrt(n) ---
    rd0, wr0 = _shuffle_totals(spark)
    t0 = time.time()
    ivf = S.ivf_topk(
        emb, k=5, n_centroids=k_sqrt, n_probe=4,
        train_mode="sample",
    )
    out["ivf_result_rows"] = ivf.count()
    out["ivf_sec"] = round(time.time() - t0, 2)
    rd1, wr1 = _shuffle_totals(spark)
    out["ivf_shuffle_mb"] = {
        "read": round((rd1 - rd0) / 1e6, 1),
        "write": round((wr1 - wr0) / 1e6, 1),
    }
    out["ivf_assignment_occupancy"] = _ivf_assignment_occupancy(
        emb, k_sqrt, 4096
    )

    # --- recall vs brute force: affordable at 1x only (that the
    # quadratic brute force stops being an option IS the IVF case)
    if mult == 1:
        bf = S.brute_force_topk(emb, k=5).select(
            "query_id", "neighbor_id"
        )
        hit = ivf.select("query_id", "neighbor_id").intersect(bf).count()
        out["ivf_recall_at_5"] = round(hit / bf.count(), 3)

    emb.unpersist()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-rehearsal-ann")
        .config("spark.ui.enabled", "true")  # REST API = shuffle meter
        .config("spark.ui.port", "4049")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # throwaway warmup (JVM codegen + Python worker pool), so the first
    # timed mult doesn't carry session startup
    rehearse(spark, sf_dir, 1)
    results = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "load_avg_before": list(os.getloadavg()),
        "runs": [],
    }
    for m in mults:
        r = rehearse(spark, sf_dir, m)
        results["runs"].append(r)
        print(json.dumps(r))
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "SCALE_REHEARSAL_r14.json",
    )
    with open(path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
