"""Quiet-machine re-baseline of the two entries the r12 VERDICT flagged
as possible noise regressions (task 4): t19_stream_sliding_kmv (+17%
warm r11->r12) and t12_stream_late_sessions (+9%).

Runs each entry 7 times INTERLEAVED (t19, t12, t19, t12, ...) after
THREE untimed warm-ups apiece (a single warm-up measurably leaves the
session still warming — see the comment at the warm-up loop), on a host
gated to load_avg < 1, and reports the median + spread per entry.
Interleaving means a transient background blip hits both entries rather
than biasing one. One JSON line to stdout; the round notes cite it. Not
part of bench.py — this is a one-off diagnostic, method
`median_of_7_interleaved_warm_after_3_warmups` (NOT comparable to the
bench's best-of-2 numbers; compare medians to medians next time).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ENTRIES = ["t19_stream_sliding_kmv", "t12_stream_late_sessions"]
REPS = 7


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from citydata_etl_spark.plans.catalog import load_all
    from citydata_etl_spark.session import get_spark
    from citydata_etl_spark.caching import release_thread_caches

    # Idle gate, BOUNDED like bench.py's (r13 ADVICE: an unbounded
    # wait hangs forever on a busy host); outcome recorded in the
    # output JSON so a not-idle run is disclosed, not hidden.
    gate_deadline = time.monotonic() + 600
    while os.getloadavg()[0] > 1.0 and time.monotonic() < gate_deadline:
        time.sleep(10)
    idle_gate_satisfied = os.getloadavg()[0] <= 1.0

    spark = get_spark(app_name="rebaseline-t19-t12")
    catalog = load_all()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    load_start = [round(x, 2) for x in os.getloadavg()]

    # THREE untimed warm-ups per entry: the first builds state dirs and
    # the Python worker pool, and the measured rep-trend of the first
    # attempt (4.0 -> 2.5 s monotonically over 5 reps) showed a single
    # warm-up still leaves the session warming — medians over a warming
    # series read high.
    for _w in range(3):
        for name in ENTRIES:
            fn = catalog[name].spark_fn
            (getattr(fn, "__wrapped__", fn) if _w else fn)(
                spark, sf_dir).count()
            release_thread_caches()

    times: dict[str, list[float]] = {n: [] for n in ENTRIES}
    for _rep in range(REPS):
        for name in ENTRIES:
            fn = catalog[name].spark_fn
            inner = getattr(fn, "__wrapped__", fn)
            t0 = time.perf_counter()
            inner(spark, sf_dir).count()
            times[name].append(round(time.perf_counter() - t0, 3))
            release_thread_caches()

    out = {
        "metric": "rebaseline_t19_t12",
        "method": "median_of_7_interleaved_warm_after_3_warmups",
        "sf_dir": sf_dir,
        "idle_gate_satisfied": idle_gate_satisfied,
        "load_avg_start": load_start,
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
        "reps": {n: ts for n, ts in times.items()},
        "median": {n: statistics.median(ts) for n, ts in times.items()},
        "spread": {
            n: round(max(ts) - min(ts), 3) for n, ts in times.items()
        },
        "prior": {
            "t19_stream_sliding_kmv": {"r11_warm": 2.137, "r12_warm": 2.496},
            "t12_stream_late_sessions": {"r11_warm": 3.963, "r12_warm": 4.308},
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
