"""One-off per-blob throughput probe for the pure-Python JPEG decoder
(r12 ADVICE item 3 follow-through): after the 16-bit-peek Huffman LUTs
and the O(stream) bit reader, measure what a REALISTIC in-scope blob
actually costs inside a worker, so the disclosed practical ceiling is a
number, not the 512 MiB allocation gate's implication.

Blobs are genuine baseline 4:2:0 JFIF streams from the fixture encoder
with DENSE random AC content (every block carries ~14 non-zero AC
coefficients drawn from the DC/AC category mix a natural photo
produces), i.e. the entropy stream is sized like a real photo
(~1.5-2 bits/pixel), not like the sparse DC-only driver fixtures.
Single-threaded wall time; inside mapInPandas this cost parallelizes by
partition. One JSON line to stdout; ROUND_NOTES cites it.
"""

from __future__ import annotations

import json
import random
import sys
import time


def make_blocks(nbx: int, nby: int, rng: random.Random):
    out = []
    for _ in range(nbx * nby):
        blk = [[0] * 8 for _ in range(8)]
        blk[0][0] = rng.randrange(-96, 97)
        # ~14 non-zero ACs per block, small magnitudes (post-quant scale)
        for _k in range(14):
            i, j = rng.randrange(8), rng.randrange(8)
            if (i, j) != (0, 0):
                blk[i][j] = rng.choice([-3, -2, -1, 1, 2, 3])
        out.append(blk)
    return out


def _host_noise_probe() -> dict:
    """Self-attribution stamps (r16): the probe runs on a shared
    virtualized host where run-to-run spread measured hostage to
    ambient contention, not code — CPU-steal ticks (co-tenant VMs
    preempting this vCPU) and a 1024^3 float64 GEMM (memory-bandwidth
    drift, the bench calibration convention). Read per-query deltas
    AGAINST these before calling anything a regression."""
    import os
    import time as _t

    import numpy as np

    def steal_ticks() -> int:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if len(parts) > 8 else 0

    rng = np.random.default_rng(7)
    A = rng.random((1024, 1024))
    B = rng.random((1024, 1024))
    gemm = min(
        (lambda t0: ((A @ B), _t.perf_counter() - t0)[1])(_t.perf_counter())
        for _ in range(3)
    )
    return {
        "gemm1024_sec": round(gemm, 4),
        "steal_ticks": steal_ticks(),
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }


def main() -> None:
    sys.path.insert(0, ".")
    from citydata_etl_spark.plans.queries_llm import encode_jpeg
    from citydata_etl_spark.operators.multimodal import _decode_jpeg_rgb

    noise_before = _host_noise_probe()
    rng = random.Random(13)
    results = []
    # 2560x1920 (4.9 MP) is just inside the 512 MiB allocation gate
    # (which admits ~5.5 MP); the gate itself is probed separately below.
    for w, h in ((640, 480), (1024, 768), (2048, 1536), (2560, 1920)):
        mcux, mcuy = (w + 15) // 16, (h + 15) // 16
        ys = make_blocks(mcux * 2, mcuy * 2, rng)
        cbs = make_blocks(mcux, mcuy, rng)
        crs = make_blocks(mcux, mcuy, rng)
        blob = encode_jpeg([ys, cbs, crs], w, h, restart_interval=0,
                           sampling=[(2, 2), (1, 1), (1, 1)])
        t0 = time.perf_counter()
        out = _decode_jpeg_rgb(blob)
        dt = time.perf_counter() - t0
        # best-of-3: a single shot is hostage to background load on a
        # shared host (r14 observed single-shot spread of 3x at an
        # unchanged decoder); best-of approximates the code's cost
        # best-of-5 at the largest size (r16): steal bursts are long
        # relative to a ~1.5 s decode, so 3 shots can ALL land inside
        # one burst; 5 shots make the best-of a code number. The rep
        # count is stamped PER RESULT ROW (r16 review finding: the
        # old single method label silently mislabeled the 2560x1920
        # rows, corrupting cross-round min-bias attribution).
        reps = 5 if w >= 2560 else 3
        for _ in range(reps - 1):
            t0 = time.perf_counter()
            out = _decode_jpeg_rgb(blob)
            dt = min(dt, time.perf_counter() - t0)
        assert out is not None and out[0] == w and out[1] == h
        mp = w * h / 1e6
        results.append({
            "dims": f"{w}x{h}", "mp": round(mp, 2),
            "blob_kb": round(len(blob) / 1024, 1),
            "decode_sec": round(dt, 3),
            "mp_per_sec": round(mp / dt, 3),
            "best_of": reps,
        })
    # Gate probe: a 7.1 MP frame's decode footprint exceeds the 512 MiB
    # ceiling and must be refused in O(header) time, not decoded.
    mcux, mcuy = (3072 + 15) // 16, (2304 + 15) // 16
    blob = encode_jpeg(
        [make_blocks(mcux * 2, mcuy * 2, rng),
         make_blocks(mcux, mcuy, rng), make_blocks(mcux, mcuy, rng)],
        3072, 2304, sampling=[(2, 2), (1, 1), (1, 1)])
    t0 = time.perf_counter()
    refused = _decode_jpeg_rgb(blob) is None
    gate = {"dims": "3072x2304", "mp": 7.08, "refused": refused,
            "refuse_sec": round(time.perf_counter() - t0, 4)}
    import os

    noise_after = _host_noise_probe()
    print(json.dumps({"metric": "jpeg_decode_throughput_420_dense_ac",
                      "method": "best_of_n_single_thread_per_row",
                      "load_avg": [round(x, 2) for x in os.getloadavg()],
                      "noise_before": noise_before,
                      "noise_after": noise_after,
                      "steal_ticks_delta": (noise_after["steal_ticks"]
                                            - noise_before["steal_ticks"]),
                      "results": results, "alloc_gate": gate}))


if __name__ == "__main__":
    main()
