"""Capped-IVF scale rehearsal (r16): MEASURE what the max_list_len cap
buys at scale. The r14 rehearsal (SCALE_REHEARSAL_r14.json) measured
the UNCAPPED hazard — sqrt(n)-sized lists at fixed n_probe ramp the
probe shuffle ~n^1.5 (7.4 -> 212 -> 5394 MB across 1x/10x/100x) — and
the cap was adopted as the lever (d4_ann_ivf runs max_list_len=256
since r15), but the capped path's own scaling was never measured.
This rehearsal runs BOTH arms side by side at 1x/10x/100x the sf0.1
embeddings (same isometric sign-flip replication as the r14 script,
imported from it) and records per arm: wall, probe-phase shuffle
delta, result rows. With the cap, per-query candidates are bounded at
n_probe * max_list_len, so total probe traffic should scale ~O(n)
(queries) instead of ~O(n^1.5) (queries x sqrt(n) list size) — that
linear-vs-superlinear contrast is the 100 TB evidence.

Also records, at every mult, the capped arm's top-5 agreement with
the uncapped arm (fraction of uncapped (query, neighbor) pairs the
capped run keeps) — the recall price of the bound, measured where it
matters instead of asserted from the 1x test fixture.

Usage: python scale_rehearsal_capped_ivf.py [mult ...] (default 1 10 100)
Appends one JSON line per mult and writes SCALE_REHEARSAL_r16.json.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

from scale_rehearsal_ann import _replicated_emb, _shuffle_totals


def rehearse(spark, sf_dir: str, mult: int) -> dict:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators import similarity as S

    emb = _replicated_emb(spark, sf_dir, mult).persist()
    n = emb.count()
    k_sqrt = max(8, round(math.sqrt(n)))
    out = {"mult": mult, "n_vectors": n, "n_centroids": k_sqrt}

    results = {}
    for arm, cap in (("uncapped", None), ("capped", 256)):
        rd0, wr0 = _shuffle_totals(spark)
        t0 = time.time()
        res = S.ivf_topk(
            emb, k=5, n_centroids=k_sqrt, n_probe=4, max_list_len=cap
        ).persist()
        n_rows = res.count()
        out[f"ivf_{arm}_sec"] = round(time.time() - t0, 2)
        rd1, wr1 = _shuffle_totals(spark)
        out[f"ivf_{arm}_rows"] = int(n_rows)
        out[f"ivf_{arm}_shuffle_mb"] = {
            "read": round((rd1 - rd0) / 1e6, 1),
            "write": round((wr1 - wr0) / 1e6, 1),
        }
        results[arm] = res

    # agreement: fraction of the uncapped top-5 pairs the capped run
    # keeps (the measured recall price of the bound)
    pairs_u = results["uncapped"].select("query_id", "neighbor_id")
    pairs_c = results["capped"].select("query_id", "neighbor_id")
    kept = pairs_u.join(pairs_c, ["query_id", "neighbor_id"]).count()
    out["capped_vs_uncapped_pair_agreement"] = round(
        kept / max(1, out["ivf_uncapped_rows"]), 4
    )
    for r in results.values():
        r.unpersist()
    emb.unpersist()
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-rehearsal-capped-ivf")
        .config("spark.ui.enabled", "true")  # REST API = shuffle meter
        .config("spark.ui.port", "4049")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    # throwaway warmup (JVM codegen + Python worker pool) so the first
    # timed mult doesn't carry session startup
    rehearse(spark, sf_dir, 1)
    art = {
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
        "load_avg_before": list(os.getloadavg()),
        "max_list_len": 256,
        "n_probe": 4,
        "runs": [],
    }
    for m in mults:
        row = rehearse(spark, sf_dir, m)
        art["runs"].append(row)
        print(json.dumps(row))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "SCALE_REHEARSAL_r16.json"), "w") as f:
        json.dump(art, f, indent=1)


if __name__ == "__main__":
    main()
