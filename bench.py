#!/usr/bin/env python
"""Benchmark harness (driver contract: one JSON line on stdout).

Runs the headline queries from the catalog at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.
The line is kept under the driver artifact's 2000-char tail window:
`queries` holds the slowest-25 warm times, families_warm/families_cold
carry per-family subtotals covering EVERY query, totals come last, and
the full per-query warm+cold dicts are written to bench_detail.json.

Since r15 the sweep runs TWICE back-to-back inside one idle-gate window
with calibration probes before AND after and a per-query 1-minute load
series (bench_detail.json) — mid-run host load is attributable from the
artifact itself (rep disagreement / load spike / calibration drift)
instead of masquerading as a code regression (the r14 finding). Since
r17 any query whose 1-minute load exceeded $SPARK_GRAFT_RERUN_LOAD
(default 2.0) in BOTH sweeps gets one targeted third rep — sustained
load that best-of-2 cannot absorb (the r16 finding) — and the graded
totals are per-query best-of-N with the rerun set stamped on the line
(`bench_method_version: 3`).

Each query is forced with a full-result action (count after cache-free
execution) — no collect of wide payloads, mirroring how a reporting layer
would consume them.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# Headline set: one per operator family — scan+agg, broadcast join, semi
# join, full-outer combine, as-of, rollup, window rank, analytic window,
# tumbling window, sessionization, JSON, dedup, text stats, similarity,
# corpus prep (contamination screen, TF-IDF, LM scoring, repetition).
HEADLINE = [
    "a1_pricing_summary",
    "j1_broadcast_lookup",
    "j2_semi_join",
    "j4_multi_source_join",
    "j6_asof_join",
    "a3_rollup",
    "a4_topk_per_group",
    "a5_window_lag",
    "t5_tumbling_window",
    "t5_session_window",
    "f7_json_extract",
    "d4_exact_dedup",
    "d4_minhash_lsh",
    "d4_minhash_hash",
    "d4_token_stats",
    "d4_cosine_topk",
    "d4_embed_neardup",
    "t1_streaming_tumbling",
    "s9_staging_rekey",
    "d6_contamination",
    "d4_tfidf_topk",
    "d4_lm_logprob",
    "d4_repetition_stats",
    "d4_dup_passage",
    "d4_semantic_dedup",
    "d4_pii_scrub",
    "j7_salted_skew_join",
    "d4_simhash_pairs",
    "t7_stream_stream_join",
    "t7_stream_left_outer_join",
    "t5_watermarked_append",
    "d6_domain_cap",
    "d4_bigram_logprob",
    "f13_variant_json",
    # round-4 second wave: one per new operator family. The first (cold)
    # rep of j8/s14 includes the one-time table write; warm reps read only.
    "j8_bucketed_join",
    "s14_partition_pruned_read",
    "a11_heavy_hitters",
    "a12_event_funnel",
    "d4_embed_quantize",
    "d6_chunk_documents",
    # round-5 additions: one per new family (URL canonicalization dedup,
    # Arrow-batched JPEG marker walk, length histogram, the incremental
    # near-dup oracle twin's production-shape hash path is d4_minhash_hash)
    "d4_url_dedup",
    "d5_jpeg_meta",
    "d6_length_histogram",
    "d4_embed_project",
    "s17_zorder_layout",
    "d4_dedup_index_ingest",
    "d4_bpe_pair_counts",
    "t10_stream_dynamic_sessions",
    # round-5 second wave: composed multi-join workload (the 6-table Q5
    # star join), the bloom runtime-filter semi-join, corpus line dedup
    "q5_regional_volume",
    "j10_bloom_prefilter_join",
    "d4_line_dedup",
    "d5_audio_energy",
    "g1_host_pagerank",
    "d4_containment",
    "j11_geo_radius_join",
    "f15_geo_cell",
    "a15_outlier_flags",
    "a16_cohort_retention",
    "d4_collocations",
    "a4_distribution",
    "t11_stream_geofence",
    "f16_number_normalize",
    "g2_triangle_count",
    "u7_evolving_merge",
    "d6_global_shuffle",
    "f17_useragent_parse",
    "t12_stream_late_sessions",
    # round-5 third wave: gap-filled LOCF resample, hashed linear quality
    # classifier (zero-exchange scorer), MP4 box-walk metadata, snapshot
    # time travel (cold rep includes the three-version table build)
    "t13_gap_fill",
    "d6_quality_classifier",
    "d5_mp4_meta",
    "u8_time_travel",
    # round-6 additions: the change data feed over u8's shared table,
    # snapshot RESTORE (cold rep includes its own table build), and the
    # point-in-time SCD2 dimension join (as-of shaped, oracle-exact)
    "u9_change_feed",
    "u10_restore",
    "j12_temporal_join",
    "d4_ann_lsh_rank",
    # round-6 second wave: composed Q7/Q18 joins, multi-source BFS,
    # time-weighted avg + OHLC downsampling, IP/CIDR enrichment,
    # fixed-width feed roundtrip (cold rep includes the one-time text
    # write), tar shard member walk
    "q18_large_orders",
    "q7_nation_volume",
    "g3_bfs_hops",
    "a17_time_weighted_avg",
    "a18_ohlc_bars",
    "f18_ip_cidr",
    "s18_fixed_width_scan",
    "d5_tar_meta",
    "u11_incremental_view",
    "j13_dpp_join",
    "t14_stream_ohlc",
    "d5_gif_meta",
    "a19_event_transitions",
    "t15_stream_snapshot_enrich",
    "d4_winnowing",
    "j6_asof_tolerance",
    # round-8 additions: oracle-exact IVF twin (integer-seed assignment),
    # real BMP pixel decode, chained BPE merge learning, checkpointed
    # exactly-once restart (cold rep includes the source staging +
    # first checkpoint build; warm reps resume as incremental no-ops)
    "d4_ann_ivf_rank",
    "d5_bmp_pixels",
    "d4_bpe_merge_steps",
    "t16_stream_restart",
    # round-8 second wave: fully-integer IVF-PQ twin, KMV distinct
    # sketch, nearest-neighbor raster resize
    "d4_ann_pq_rank",
    "a2_kmv_distinct",
    "d5_bmp_resize",
    # round-8 third wave: the distributed IVF trainer's oracle-exact
    # twin (two chained integer Lloyd iterations, zero driver collects)
    "d4_ann_ivf_dist_rank",
    "d4_ann_ivf_capped_rank",
    # round-9 additions: BPE encode (train+apply over the vocab), MMR
    # retrieval diversification (unrolled greedy picks), parquet bloom
    # point lookup (cold rep includes the one-time bloom write),
    # Count-Min heavy hitters, streaming contract quarantine (cold rep
    # stages the source + first checkpoint), merge-on-read deletion
    # vectors (cold rep writes base + both waves), two-phase global
    # quantiles, per-source dataset card
    "d4_bpe_encode",
    "d4_mmr_diversify",
    "s19_bloom_filter_layout",
    "a20_countmin_topk",
    "t17_stream_quarantine",
    "u12_deletion_vectors",
    "a21_histogram_quantiles",
    "d6_dataset_card",
    # round-9 second wave: batch MMR — the applyInPandas group kernel,
    # driver-oracled because the kernel is pure integer arithmetic
    "d4_mmr_batch",
    # round-9 third wave: SymSpell deletion-neighborhood fuzzy key join
    "d4_fuzzy_key_pairs",
    # round-9 fourth wave: TPC-H Q14/Q15 composed shapes, per-image
    # channel histograms over real decoded pixels
    "q14_promo_revenue",
    "q15_top_supplier",
    "d5_bmp_histogram",
    # round-10 additions: driver-checkable ANN recall@5 (exact blocked
    # matmul + exactsign LSH topology, joined per query); MMR composed
    # over the IVF probe (candidates from 4 of 16 lists, same kernel)
    "d4_ann_recall",
    "d4_mmr_ann",
    # GDPR erasure cascade across three merge-on-read tables (cold rep
    # includes the three base writes + tombstone appends); scene-cut
    # detection over tar-of-BMP-frame video shards
    "u13_cascade_delete",
    "d5_scene_cuts",
    # partition-spec evolution read (cold rep writes both spec roots);
    # IVF recall vs exact (the second ANN family's recall row)
    "s20_partition_evolution",
    "d4_ann_ivf_recall",
    # last-touch revenue attribution (RANGE-frame running max per user)
    # and its streaming twin (two-int64 per-user state)
    "a22_attribution",
    "t18_stream_attribution",
    # kNN label propagation (exact top-5 vote over the label table);
    # integer-exact ray-casting containment join
    "d4_knn_label",
    "j14_point_in_polygon",
    # sliding-window distinct users (non-algebraic agg over Expand);
    # cross-table atomic txn (cold rep writes both versions of the pair)
    "a23_sliding_distinct",
    "u14_multi_table_txn",
    # perceptual image fingerprints over real decoded pixels, and the
    # chunk-blocked image near-dup pairing over planted duplicates
    "d5_image_ahash",
    "d5_image_neardup",
    # LSH S-curve: pair recall vs exact Jaccard per similarity decile
    "d4_lsh_pair_recall",
    # second wave: per-language tokenizer fertility over the encoder;
    # CSV dialect sniffing with the European-decimal trap
    "d6_tokenizer_fertility",
    "s21_csv_dialect_sniff",
    # governed read: row policy + deterministic column masks
    "u15_governed_view",
    # round-11 additions: the multi-table LSH recall lever (L=8 x P=4
    # hyperplane tables, recall@5 0.04 -> 0.56 on the uniform fixture);
    # real PNG pixel decode (stdlib zlib + filter reversal)
    "d4_ann_multitable_recall",
    "d5_png_pixels",
    # sliding-window distinct via mergeable per-slot KMV sketches;
    # ExactSubstr removal form (cut duplicated passages, keep rest)
    "a23_sliding_kmv",
    "d4_dup_passage_cut",
    # policy-versioned governed read (mask rules as a snapshot table;
    # cold rep includes the two policy commits); the PNG half of the
    # cross-format perceptual-hash invariant
    "u16_policy_versioned_read",
    "d5_png_ahash",
    # BM25 lexical retrieval over the documents corpus
    "d4_bm25_topk",
    # streaming sliding-window distinct via bounded per-slot KMV state;
    # the hamming-1 multi-probe recall row (the cheap LSH lever)
    "t19_stream_sliding_kmv",
    "d4_ann_multiprobe_recall",
    # linear multi-touch attribution (integer credit split, RANGE frames);
    # TPC-H Q11 shape (threshold against a broadcast global total)
    "a24_linear_attribution",
    "q11_important_parts",
    # write-audit-publish (cold rep includes base commit + both stagings);
    # real GIF pixel decode (pure-Python LZW; stub boundary now JPEG only)
    "u17_wap_publish",
    "d5_gif_pixels",
    # round-12 additions: real baseline JPEG pixel decode (Huffman +
    # dequant + IDCT — the last codec boundary, closed with DC-exact
    # fixtures); TPC-H Q21 shape (semi+anti on the same fact table)
    "d5_jpeg_pixels",
    "q21_waiting_suppliers",
    # round-13 additions: chroma-subsampled JPEG decode (4:2:0/4:2:2,
    # the dominant wild profiles, over the O(stream) bit reader +
    # 16-bit-peek Huffman LUTs); Adam7-interlaced PNG decode (per-pass
    # unfilter + scatter)
    "d5_jpeg_pixels_420",
    "d5_png_adam7",
    # round-14 addition: Adobe CMYK/YCCK decode + EXIF-orientation
    # pixel normalization (SA scan scripts + restarts composed)
    "d5_jpeg_cmyk",
    # round-15 addition: DSIR importance resampling (hashed-bigram
    # log-ratio weights + Gumbel-top-k selection)
    "d6_dsir_select",
    "d6_dsir_select_hash",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from citydata_etl_spark.plans.catalog import load_all
    from citydata_etl_spark.session import get_spark

    spark = get_spark(app_name="citydata-bench")
    catalog = load_all()

    # Warm up the JVM (codegen, shuffle machinery, Python worker pool +
    # numpy import) so the first timed query doesn't pay session startup.
    from pyspark.sql import functions as _F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(10000).groupBy((_F.col("id") % 7).alias("k")).count().count()
    spark.range(256).select(_F.col("id")).mapInPandas(
        lambda it: (pdf.assign(id=__import__("numpy").asarray(pdf["id"]))
                    for pdf in it),
        schema="id LONG",
    ).count()

    # Per query: one COLD rep (the catalog wrapper releases the previous
    # query's scoped caches, so nothing is inherited) then two WARM reps
    # through the unwrapped fn (reusing the cold rep's scoped persists —
    # the steady state a session re-running the query sees). Both are
    # reported: `queries` (best warm) is method-comparable to the r1/r2
    # best-of-2 numbers, `queries_cold` is the honest single-shot cost
    # the warm method flattered.
    from citydata_etl_spark.caching import (
        release_caches,
        release_thread_caches,
    )

    # Idle GATE (r12 VERDICT task 4): the r12 sweep ran at load_avg~5 and
    # every sub-1.2x A/B was unreadable. Before timing anything, wait for
    # the 1-minute load average to drop below 1.0 (bounded at 10 minutes so
    # an unattended driver run can never hang here); the artifact discloses
    # both the gate outcome and the final pre-run load, so a number taken
    # on a busy host is visibly labeled instead of silently noisy.
    idle_gate = {"threshold": 1.0, "waited_sec": 0, "satisfied": True}
    _gate_t0 = time.perf_counter()
    while os.getloadavg()[0] > idle_gate["threshold"]:
        if time.perf_counter() - _gate_t0 > 600:
            idle_gate["satisfied"] = False
            break
        time.sleep(10)
    idle_gate["waited_sec"] = round(time.perf_counter() - _gate_t0, 1)

    # Idle probe: record the host's load average around the sweep so the
    # artifact is self-describing — a run taken under background load
    # (everything drifting up 10-20% together) is distinguishable from a
    # real regression without re-running.
    load_before = os.getloadavg()

    # CALIBRATION probe (r13 VERDICT task 6): r13 proved absolute
    # cross-round numbers unreadable across containers (three same-code
    # sweeps spread +-10%; median cross-container drift 1.15-1.21x).
    # Three fixed CPU-bound workloads — a pure-Python int/hash loop
    # (interpreter speed), one 1024^3 float64 GEMM (BLAS/vector core
    # speed), and one all-core Spark aggregate over a generated range
    # (JVM + scheduler + parallel throughput) — give future rounds a
    # per-container denominator: read per-query deltas AGAINST these
    # before calling anything a regression. Best-of-3 each; ~5 s total.
    def _calibration() -> dict:
        import hashlib

        import numpy as np

        def best_of(f, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                f()
                best = min(best, time.perf_counter() - t0)
            return round(best, 4)

        def py_loop():
            acc = 0
            h = hashlib.sha256()
            for i in range(2_000_000):
                acc += i * i & 0xFFFF
            h.update(acc.to_bytes(8, "big") * 1000)
            return h.digest()

        rng = np.random.default_rng(7)
        A = rng.random((1024, 1024))
        B = rng.random((1024, 1024))

        def gemm():
            return A @ B

        from pyspark.sql import functions as _F

        def spark_cpu():
            # shiftright keeps the 50M-row sum inside int64 under the
            # session's ANSI mode (summing raw xxhash64 overflows)
            spark.range(0, 50_000_000, 1, 32).select(
                _F.sum(_F.shiftright(_F.xxhash64("id"), 32))
            ).collect()

        return {
            "python_sec": best_of(py_loop),
            "gemm1024_sec": best_of(gemm),
            "spark_range_xxhash_sec": best_of(spark_cpu),
        }

    calibration = _calibration()

    # The sweep body, reusable: r14's driver-stamped bench ran 1.35x the
    # builder's clean same-code run with EQUAL-or-faster calibration
    # probes, so a single start-of-run calibration cannot attribute load
    # that arrives mid-sweep. r15 (VERDICT task 1): run the whole
    # headline sweep TWICE back-to-back inside one gate window, stamp
    # the 1-minute load average after every query, and calibrate again
    # AFTER the second pass — mid-run load then shows up as (a) rep2 vs
    # rep1 per-query disagreement, (b) a load-series spike at the
    # affected queries, or (c) calibration_after drift, instead of being
    # indistinguishable from a code regression.
    def run_sweep(names=None) -> tuple[
        dict[str, float], dict[str, float], dict[str, str],
        dict[str, float],
    ]:
        timings: dict[str, float] = {}
        timings_cold: dict[str, float] = {}
        errors: dict[str, str] = {}
        loads: dict[str, float] = {}
        for name in (names if names is not None else HEADLINE):
            fn = catalog[name].spark_fn
            inner = getattr(fn, "__wrapped__", fn)
            try:
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                timings_cold[name] = round(time.perf_counter() - t0, 3)
                warm = []
                for _rep in range(2):
                    t0 = time.perf_counter()
                    inner(spark, sf_dir).count()
                    warm.append(time.perf_counter() - t0)
                timings[name] = round(min(warm), 3)
            except Exception as ex:  # keep the JSON line intact on failure
                errors[name] = f"{type(ex).__name__}: {ex}"[:200]
            loads[name] = round(os.getloadavg()[0], 2)
            # release this query's persisted intermediates so storage
            # memory does not accumulate across the headline queries in
            # this session. THREAD caches only: keyed cross-query
            # relations (the shared shingle bag) are sweep-lifetime by
            # design and bounded (handful of keys); they drop in the
            # final release below.
            release_thread_caches()
        release_caches()
        return timings, timings_cold, errors, loads

    timings, timings_cold, errors, loads1 = run_sweep()
    # second full pass: the catalog wrapper released every scoped cache,
    # so rep2's "cold" rewrites the same one-time tables — method-equal
    # to rep1 except for OS page cache, which rep1's warm reps shared too
    timings2, timings2_cold, errors2, loads2 = run_sweep()

    # Targeted THIRD rep (r17 VERDICT task 4): best-of-2 only absorbs
    # one-rep load spikes — the r16 driver-stamped run was contaminated
    # through BOTH sweeps (per-query 1-min load 4–9, start GEMM 4x
    # slower than end) and graded 4 false >1.3x regressions. Any query
    # whose rep1 AND rep2 post-query 1-minute loads both exceeded the
    # threshold re-runs ONCE more; the graded total is per-query
    # best-of-N. Only flagged queries re-run, so the gate window stays
    # bounded; the rerun set and threshold are stamped on the line.
    #
    # Threshold recalibrated in the r17 OPTIMIZATION round: the sweep's
    # OWN load sits at median 3–4.5 / p90 ~6.5–7.5 on an otherwise-idle
    # host (measured across the r15/r16/r17 bench_detail load series —
    # a local[32] sweep IS sustained load), so the original 2.0 default
    # flagged 124–131 of 151 queries on a clean host, unbounding the
    # gate window the mechanism exists to keep bounded. 6.0 sits above
    # the self-load median with margin while still catching the r16
    # contamination signature this was built for (t12 loads 7.51/9.29
    # in BOTH reps of the r16 driver run).
    rerun_load = float(os.environ.get("SPARK_GRAFT_RERUN_LOAD", "6.0"))
    flagged = sorted(
        n for n in set(timings) | set(timings2)
        if loads1.get(n, 0.0) > rerun_load
        and loads2.get(n, 0.0) > rerun_load
    )
    timings3: dict[str, float] = {}
    timings3_cold: dict[str, float] = {}
    errors3: dict[str, str] = {}
    loads3: dict[str, float] = {}
    if flagged:
        timings3, timings3_cold, errors3, loads3 = run_sweep(flagged)
    calibration_after = _calibration()
    load_after = os.getloadavg()

    # per-query rep2/rep1 warm ratio median: ~1.0 on a quiet host; a
    # skewed median or a fat tail localizes mid-run load to one pass
    ratios = sorted(
        timings2[n] / timings[n]
        for n in timings
        if n in timings2 and timings[n] > 0
    )
    rep2_ratio_median = (
        round(ratios[len(ratios) // 2], 3) if ratios else None
    )

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    # The driver's artifact keeps the TAIL 2000 chars of this line, so
    # the whole line must stay under that for the artifact to parse
    # (BENCH_r05's 4.2 KB line lost its entire warm dict). Budgeting:
    # per-query dicts cover only the slowest 25 warm entries (2 dp);
    # every query rolls into a per-family subtotal; totals go LAST so
    # even a truncated tail still carries them; the FULL per-query
    # warm+cold dicts land in bench_detail.json next to this script.
    def family(name: str) -> str:
        mm = re.match(r"([a-z]+)(\d*)", name)
        return mm.group(1) + (mm.group(2) if mm.group(1) == "d" else "")

    # Headline timings are per-query BEST-OF-2 across the two sweeps
    # (r16 ADVICE fix): summing only rep1 despite the double-sweep
    # method meant (a) a query erroring in exactly one rep made
    # `value` and `value2` totals over DIFFERENT query sets, and
    # (b) mid-run load hitting rep1 still inflated the graded number
    # the double sweep exists to de-noise. min() over the reps a
    # query completed in keeps the totals comparable; the per-rep
    # sums and query counts stay on the line for attribution.
    def best_of_reps(*reps: dict) -> dict[str, float]:
        names: set = set().union(*reps)
        return {
            n: round(min(vals), 3)
            for n in names
            if (vals := [v for r in reps if (v := r.get(n)) is not None])
        }

    best_warm = best_of_reps(timings, timings2, timings3)
    best_cold = best_of_reps(timings_cold, timings2_cold, timings3_cold)

    fam_warm: dict[str, float] = {}
    fam_cold: dict[str, float] = {}
    for n, t in best_warm.items():
        fam_warm[family(n)] = round(fam_warm.get(family(n), 0) + t, 2)
    for n, t in best_cold.items():
        fam_cold[family(n)] = round(fam_cold.get(family(n), 0) + t, 2)
    slowest = dict(sorted(
        ((n, round(t, 2)) for n, t in best_warm.items()),
        key=lambda kv: -kv[1],
    )[:25])

    detail = {
        "queries_warm": timings,
        "queries_cold": timings_cold,
        "queries_warm_rep2": timings2,
        "queries_cold_rep2": timings2_cold,
        "queries_warm_rep3": timings3,
        "queries_cold_rep3": timings3_cold,
        "load_1min_after_query_rep1": loads1,
        "load_1min_after_query_rep2": loads2,
        "load_1min_after_query_rep3": loads3,
        "rerun_load_threshold": rerun_load,
        "rerun_queries": flagged,
        "errors": errors,
        "errors_rep2": errors2,
        "errors_rep3": errors3,
        "sf": sf,
        "calibration": calibration,
        "calibration_after": calibration_after,
        "rep2_vs_rep1_warm_median": rep2_ratio_median,
        "idle_gate": idle_gate,
        "load_avg_before": [round(x, 2) for x in load_before],
        "load_avg_after": [round(x, 2) for x in load_after],
    }
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "bench_detail.json"), "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
        # per-round stamp so history stops being overwritten: the driver
        # writes BENCH_r{N}.json AFTER this run, so the current round is
        # (highest existing N) + 1. Only the driver-scale run (sf 0.1)
        # stamps — a quick local check at another SF must not clobber
        # the round's history file with incomparable numbers.
        if abs(sf - 0.1) < 1e-9:
            rounds = [
                int(m.group(1))
                for fn in os.listdir(here)
                if (m := re.match(r"BENCH_r(\d+)\.json$", fn))
            ]
            rnd = (max(rounds) + 1) if rounds else 0
            stamped = os.path.join(here, f"bench_detail_r{rnd:02d}.json")
            with open(stamped, "w") as f:
                json.dump(detail, f, indent=1, sort_keys=True)
    except OSError:
        pass  # detail file is best-effort; the stdout line is the contract

    out = {
        "metric": "headline_queries_total_runtime",
        "unit": "sec",
        "sf": sf,
        "queries": slowest,  # slowest 25 warm; full dicts in bench_detail.json
        "families_warm": dict(sorted(fam_warm.items())),
        "families_cold": dict(sorted(fam_cold.items())),
        # bench_method_version (r17 ADVICE fix): lets cross-round
        # consumers detect grading-semantics changes from the artifact
        # alone. v1 = single sweep (≤r14, value = rep1 sum); v2 =
        # double sweep, value = per-query best-of-2 (r16); v3 = v2 +
        # targeted rep3 for queries load-contaminated in BOTH reps.
        "bench_method_version": 3,
        "method": "double_sweep_best_of_n_warm_plus_cold",
        "rerun": {
            "load_threshold": rerun_load,
            "n": len(flagged),
            "queries": flagged[:8],  # full list in bench_detail.json
        },
        "calibration": calibration,
        "calibration_after": calibration_after,
        "rep2_vs_rep1_warm_median": rep2_ratio_median,
        "idle_gate": idle_gate,
        "load_avg_before": [round(x, 2) for x in load_before],
        "load_avg_after": [round(x, 2) for x in load_after],
        "n_cpus": os.cpu_count(),
        "n_queries": len(best_warm),
        "n_queries_rep1": len(timings),
        "n_queries_rep2": len(timings2),
        "n_queries_rep3": len(timings3),
    }
    if errors or errors2 or errors3:
        out["n_errors"] = len(errors) + len(errors2) + len(errors3)
        # sample from EVERY rep (repN-suffixed) so a failure unique to
        # any one rep — including the targeted third — is named on the
        # graded line, not only in the detail file
        both = dict(list(errors.items())[:3])
        both.update({
            f"{k}@rep2": v for k, v in list(errors2.items())[:2]
        })
        both.update({
            f"{k}@rep3": v for k, v in list(errors3.items())[:2]
        })
        out["errors"] = {k: v[:60] for k, v in list(both.items())[:3]}
    # `value`/`value_cold` are the graded totals: per-query best-of-2
    # (r16). The per-rep sums keep their r15 names so cross-round
    # artifacts stay comparable: value_rep1 == r15's `value`,
    # value2 == r15's `value2`.
    out["value2_cold"] = round(sum(timings2_cold.values()), 3)
    out["value2"] = round(sum(timings2.values()), 3)
    out["value_rep1_cold"] = round(sum(timings_cold.values()), 3)
    out["value_rep1"] = round(sum(timings.values()), 3)
    out["value_cold"] = round(sum(best_cold.values()), 3)
    out["value"] = round(sum(best_warm.values()), 3)
    line = json.dumps(out)
    if len(line) > 1900:  # hard guard: drop per-query detail before totals
        out["queries"] = dict(list(slowest.items())[:10])
        line = json.dumps(out)
    print(line)


if __name__ == "__main__":
    main()
