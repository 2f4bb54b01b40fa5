"""DSIR feature-mode scale rehearsal (r16, VERDICT task 5 follow-
through): MEASURE what feature_mode='hash' buys as the corpus — and
with it the bigram VOCABULARY — grows. The oracle-exact rank mode
pays a vocabulary-wide distinct + dense rank (ranked_tokens' global
exchange) before it can bucket a single gram; the hash mode buckets
straight off the gram bytes (pmod(xxhash64(gram), prime)) and pays
nothing vocabulary-shaped. This script runs BOTH arms at 1x/10x/100x
the sf0.1 documents, replicated with per-copy token suffixes
(imported from scale_rehearsal.py) so the vocabulary genuinely grows
~Nx rather than repeating, with a FIXED-size target corpus (the
realistic DSIR shape: a small clean reference against a growing raw
pool). Records per arm: wall, shuffle read/write delta, selected
count (must equal k in both), and the two arms' selected-set overlap.

Usage: python scale_rehearsal_dsir.py [mult ...]  (default 1 10 100)
Appends one JSON line per mult and writes SCALE_REHEARSAL_r17_DSIR.json.
(The r16 artifact of this script started at load_avg 17.4 — its
shuffle-byte claims are load-insensitive but the wall ratios carried
noise; the r17 re-run sits behind the standard idle gate and stamps
per-run load, VERDICT r16 task 7.)
"""
from __future__ import annotations

import json
import os
import sys
import time

from scale_rehearsal import _replicated_docs, _shuffle_totals


def rehearse(spark, sf_dir: str, mult: int) -> dict:
    from pyspark.sql import functions as F

    from citydata_etl_spark.operators import pipeline as P

    docs = _replicated_docs(spark, sf_dir, mult).persist()
    n = docs.count()
    # fixed-size clean target: 500 copy-0 docs; candidates = the rest
    tgt = docs.filter(F.col("doc_id") < 500)
    cand = docs.filter(F.col("doc_id") >= 500)
    out = {"mult": mult, "n_docs": n,
           "load_1min_at_start": round(os.getloadavg()[0], 2)}

    selected = {}
    for arm in ("rank", "hash"):
        rd0, wr0 = _shuffle_totals(spark)
        t0 = time.time()
        res = P.dsir_importance(
            tgt, cand, n_buckets=256, k=200, seed=7, feature_mode=arm
        ).persist()
        sel = res.filter(F.col("selected") == 1)
        n_sel = sel.count()
        out[f"dsir_{arm}_sec"] = round(time.time() - t0, 2)
        rd1, wr1 = _shuffle_totals(spark)
        out[f"dsir_{arm}_selected"] = int(n_sel)
        out[f"dsir_{arm}_shuffle_mb"] = {
            "read": round((rd1 - rd0) / 1e6, 1),
            "write": round((wr1 - wr0) / 1e6, 1),
        }
        selected[arm] = {r["doc_id"] for r in sel.select("doc_id").collect()}
        res.unpersist()
    out["selected_overlap"] = len(selected["rank"] & selected["hash"])
    docs.unpersist()
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-rehearsal-dsir")
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
    # idle gate (r17): the r16 run started at load 17.4; walls quoted
    # from this artifact must come from a quiet window
    gate = {"threshold": 1.5, "waited_sec": 0}
    t0 = time.time()
    while os.getloadavg()[0] > gate["threshold"] and time.time() - t0 < 600:
        time.sleep(10)
    gate["waited_sec"] = round(time.time() - t0, 1)
    gate["load_at_start"] = round(os.getloadavg()[0], 2)
    # throwaway warmup (JVM codegen + Python worker pool) so the first
    # timed mult doesn't carry session startup
    rehearse(spark, sf_dir, 1)
    art = {
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
        "load_avg_before": list(os.getloadavg()),
        "idle_gate": gate,
        "n_buckets": 256,
        "k": 200,
        "runs": [],
    }
    for m in mults:
        row = rehearse(spark, sf_dir, m)
        art["runs"].append(row)
        print(json.dumps(row))
    here = os.path.dirname(os.path.abspath(__file__))
    art["load_avg_after"] = [round(x, 2) for x in os.getloadavg()]
    with open(os.path.join(here, "SCALE_REHEARSAL_r17_DSIR.json"), "w") as f:
        json.dump(art, f, indent=1)


if __name__ == "__main__":
    main()
