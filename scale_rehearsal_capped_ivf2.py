"""Capped-IVF recall-compensation rehearsal (r17, VERDICT task 1).

The r16 rehearsal (SCALE_REHEARSAL_r16.json) measured the cap's price:
at 100x (200k vectors, sqrt-sized 447 lists, occupancy ~447 > cap 256)
the capped arm pays pair agreement 0.557 vs uncapped — the uniform
trim drops ~43% of EVERY list and a vector trimmed from its single
home list is unreachable at any n_probe. This rehearsal measures the
two candidate levers at that occupancy point and derives the
production posture from the result (similarity.ivf_posture_for):

  - probe escalation UNDER the coarse cap (447 lists, cap 256,
    n_probe 4 -> 8): predicted flat — trimmed vectors are gone from
    the candidate side entirely;
  - centroid growth TO the cap (n_centroids = ceil(n/256) = 782,
    mean occupancy == cap, so the trim demotes to an imbalance guard)
    with n_probe escalation 4 -> 8 to restore the coverage the finer
    partition dilutes. Per-query candidates stay bounded at
    n_probe * 256 — CONSTANT in n, total probe shuffle O(n).

Every arm is scored two ways: pair agreement with the uncapped
sqrt-posture reference (the r16 metric, conflates both arms' errors)
AND recall@5 against EXACT brute-force ground truth on a deterministic
~1/97 query sample (asymmetric blocked matmul, distributed) — the
number a deployment actually cares about.

Usage: python scale_rehearsal_capped_ivf2.py [mult ...] (default 100)
Writes SCALE_REHEARSAL_r17.json.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

from scale_rehearsal_ann import _replicated_emb, _shuffle_totals

SAMPLE_MOD = 97  # ~1/97 of queries get exact ground truth
K = 5
CAP = 256


def _exact_sample_topk(emb, k: int = K, q_blocks: int = 2,
                       c_blocks: int = 16):
    """Exact cosine top-k for the hash-sampled query subset against the
    FULL corpus: brute_force_topk's blocked-cogroup matmul with an
    asymmetric grid (queries filtered, candidates complete)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators.similarity import _tile_sims

    scale = 1e4
    q = (
        emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(SAMPLE_MOD)) == 0)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        .withColumn("qb", F.pmod(F.xxhash64("qid"), F.lit(q_blocks)).cast("int"))
        .withColumn("cb", F.explode(
            F.sequence(F.lit(0), F.lit(c_blocks - 1)).cast("array<int>")))
    )
    c = (
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        .withColumn("cb", F.pmod(F.xxhash64("cid"), F.lit(c_blocks)).cast("int"))
        .withColumn("qb", F.explode(
            F.sequence(F.lit(0), F.lit(q_blocks - 1)).cast("array<int>")))
    )
    empty = pd.DataFrame({
        "query_id": np.array([], dtype=np.int64),
        "neighbor_id": np.array([], dtype=np.int64),
        "cos_sim": np.array([], dtype=np.float64),
    })

    def tile_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return empty
        sims, qids, cids = _tile_sims(left, right, scale)
        out_q, out_n, out_s = [], [], []
        for row in range(len(qids)):
            mask = cids != qids[row]
            s, n = sims[row][mask], cids[mask]
            order = np.lexsort((n, -s))[:k]
            out_q.extend([qids[row]] * len(order))
            out_n.extend(n[order])
            out_s.extend(s[order])
        return pd.DataFrame({
            "query_id": np.array(out_q, dtype=np.int64),
            "neighbor_id": np.array(out_n, dtype=np.int64),
            "cos_sim": np.array(out_s, dtype=np.float64),
        })

    partials = q.groupBy("qb", "cb").cogroup(c.groupBy("qb", "cb")).applyInPandas(
        tile_topk, schema="query_id BIGINT, neighbor_id BIGINT, cos_sim DOUBLE",
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        partials.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id")
    )


def rehearse(spark, sf_dir: str, mult: int, arms=None) -> dict:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators import similarity as S

    emb = _replicated_emb(spark, sf_dir, mult).persist()
    n = emb.count()
    k_sqrt = max(8, round(math.sqrt(n)))
    nc_post, np_post = S.ivf_posture_for(n, max_list_len=CAP)
    out = {
        "mult": mult, "n_vectors": n, "k_sqrt": k_sqrt,
        "derived_posture": {"n_centroids": nc_post, "n_probe": np_post,
                    "max_list_len": CAP},
    }

    gt = _exact_sample_topk(emb).persist()
    n_gt = gt.count()
    out["gt_sample_pairs"] = int(n_gt)

    if arms is None:
        arms = [
            # (name, n_centroids, n_probe, cap)
            ("uncapped_sqrt_p4", k_sqrt, 4, None),     # reference
            ("capped_sqrt_p4", k_sqrt, 4, CAP),        # r16 repro
            ("capped_sqrt_p8", k_sqrt, 8, CAP),        # probe-only lever
            ("capped_posture", nc_post, np_post, CAP),  # derived posture
            ("capped_posture_p12", nc_post, 12, CAP),  # probe headroom
        ]
    arms = [("uncapped_sqrt_p4", k_sqrt, 4, None)] + [
        a for a in arms if a[0] != "uncapped_sqrt_p4"
    ]
    results = {}
    for name, nc, npr, cap in arms:
        rd0, wr0 = _shuffle_totals(spark)
        t0 = time.time()
        res = S.ivf_topk(
            emb, k=K, n_centroids=nc, n_probe=npr, max_list_len=cap,
            train_sample=max(4096, 8 * nc),
        ).persist()
        n_rows = res.count()
        arm = {
            "n_centroids": nc, "n_probe": npr, "max_list_len": cap,
            "sec": round(time.time() - t0, 2), "rows": int(n_rows),
        }
        rd1, wr1 = _shuffle_totals(spark)
        arm["shuffle_mb"] = {
            "read": round((rd1 - rd0) / 1e6, 1),
            "write": round((wr1 - wr0) / 1e6, 1),
        }
        hits = gt.join(res.select("query_id", "neighbor_id"),
                       ["query_id", "neighbor_id"]).count()
        arm["recall_at_5_exact_sample"] = round(hits / max(1, n_gt), 4)
        results[name] = res
        out[name] = arm

    ref = results["uncapped_sqrt_p4"].select("query_id", "neighbor_id")
    n_ref = out["uncapped_sqrt_p4"]["rows"]
    for name in results:
        if name == "uncapped_sqrt_p4":
            continue
        kept = ref.join(
            results[name].select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        ).count()
        out[name]["pair_agreement_vs_uncapped"] = round(
            kept / max(1, n_ref), 4)

    for r in results.values():
        r.unpersist()
    gt.unpersist()
    emb.unpersist()
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-rehearsal-capped-ivf2")
        .config("spark.ui.enabled", "true")  # REST API = shuffle meter
        .config("spark.ui.port", "4048")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # --phase2 (r17): the phase-1 sweep measured the posture plateau at
    # recall 0.824 with p8 == p12 — the residual loss is LIST IMBALANCE
    # (mean occupancy AT the cap means skewed lists overflow and their
    # overflow is trimmed). Phase 2 measures occupancy HEADROOM:
    # n_centroids = ceil(n / (cap/2)) halves mean occupancy so only
    # >2x-mean outlier lists clip, probes swept 8/16.
    phase2 = "--phase2" in sys.argv
    mults = [int(a) for a in sys.argv[1:] if a.isdigit()] or [100]
    # idle gate (measurement hygiene): walls here back posture claims
    gate = {"threshold": 1.5, "waited_sec": 0}
    t0 = time.time()
    while os.getloadavg()[0] > gate["threshold"] and time.time() - t0 < 600:
        time.sleep(10)
    gate["waited_sec"] = round(time.time() - t0, 1)
    gate["load_at_start"] = round(os.getloadavg()[0], 2)
    # throwaway warmup (JVM codegen + Python worker pool)
    rehearse(spark, sf_dir, 1)
    art = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "idle_gate": gate,
        "load_avg_before": [round(x, 2) for x in os.getloadavg()],
        "question": (
            "can the capped-IVF posture recover the r16 recall price "
            "(pair agreement 0.557 at 100x occupancy) at a per-query "
            "candidate bound constant in n?"),
        "runs": [],
    }
    import math as _math
    for m in mults:
        if phase2:
            n_est = 2000 * m  # sf0.1 embeddings x mult
            nc_hr = int(_math.ceil(n_est / (CAP / 2)))
            arms = [
                ("capped_headroom_p8", nc_hr, 8, CAP),
                ("capped_headroom_p16", nc_hr, 16, CAP),
            ]
            row = rehearse(spark, sf_dir, m, arms=arms)
        else:
            row = rehearse(spark, sf_dir, m)
        art["runs"].append(row)
        print(json.dumps(row))
    art["load_avg_after"] = [round(x, 2) for x in os.getloadavg()]
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "SCALE_REHEARSAL_r17.json")
    if phase2 and os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
        merged["runs_phase2"] = art["runs"]
        merged["phase2_idle_gate"] = art["idle_gate"]
        merged["phase2_load_avg_after"] = art["load_avg_after"]
        art = merged
    with open(path, "w") as f:
        json.dump(art, f, indent=1)


if __name__ == "__main__":
    main()
