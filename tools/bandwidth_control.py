"""Raw-python scaling controls for the ceiling analysis (no Spark).

Two controls, each run at 8 and 32 pinned processes over the same per-worker
workload, reporting aggregate throughput and the 8→32 scaling ratio:

  compute  — FMA-heavy numpy loop over an L2-resident array: bound by core
             count only. Its 8→32 ratio is the box's best case (a perfectly
             parallel job); anything a Spark stage loses below this is
             scheduling/GC/shuffle, not hardware.
  stream   — STREAM-triad-like pass over a buffer far larger than L3: bound
             by the single socket's memory bandwidth, which does NOT grow
             with processes. Its 8→32 ratio is the box's floor for
             data-movement-heavy stages (shuffle write/read, Arrow IPC,
             cache-missing hash aggregation).

A real N→4N *cluster* comparison multiplies memory channels, LLC, and disks
by 4 along with the cores; this box multiplies ONLY cores. Any pipeline
stage that is data-movement-bound therefore caps at the stream ratio here
while scaling linearly on a real cluster — which is why a sub-0.8 local
ratio on shuffle-heavy stages is a single-box artifact, not an engine
property. Usage: python tools/bandwidth_control.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

PASSES_COMPUTE = 600
PASSES_STREAM = 40
L2_FLOATS = 32_768          # 256 KiB — L2-resident
BIG_FLOATS = 50_000_000     # 400 MB per worker — far beyond L3


def _pin(worker_id: int, n_workers: int) -> None:
    os.sched_setaffinity(0, {worker_id % n_workers})


def w_compute(args) -> float:
    wid, n = args
    _pin(wid, n)
    a = np.arange(L2_FLOATS, dtype=np.float64)
    b = a * 0.5
    c = np.empty_like(a)
    t0 = time.time()
    for _ in range(PASSES_COMPUTE):
        np.multiply(a, 1.000001, out=c)
        c += b
        np.sqrt(np.abs(c), out=c)
    return L2_FLOATS * PASSES_COMPUTE * 3 / (time.time() - t0)  # ops/s


def w_stream(args) -> float:
    wid, n = args
    _pin(wid, n)
    a = np.ones(BIG_FLOATS, dtype=np.float64)
    b = np.ones(BIG_FLOATS, dtype=np.float64)
    c = np.empty(BIG_FLOATS, dtype=np.float64)
    t0 = time.time()
    for _ in range(PASSES_STREAM):
        np.multiply(b, 3.0, out=c)
        c += a                       # triad: c = a + 3*b (3 streams)
    dt = time.time() - t0
    return BIG_FLOATS * 8 * 3 * PASSES_STREAM / dt  # bytes/s moved


def run(fn, n_workers: int) -> float:
    with mp.get_context("spawn").Pool(n_workers) as pool:
        rates = pool.map(fn, [(i, n_workers) for i in range(n_workers)])
    return float(sum(rates))


def main() -> None:
    out: dict = {}
    for name, fn in (("compute", w_compute), ("stream", w_stream)):
        r8 = run(fn, 8)
        r32 = run(fn, 32)
        out[name] = {
            "agg_rate_8": round(r8 / 1e9, 2),
            "agg_rate_32": round(r32 / 1e9, 2),
            "unit": "Gops/s" if name == "compute" else "GB/s",
            "ratio_8_to_32": round(r32 / r8, 2),
            "efficiency": round(r32 / r8 / 4.0, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
