"""N→4N scaling-efficiency protocol (BASELINE.md): same job, same input, two
parallelism levels standing in for N and 4N executors (driver instruction —
no real cluster in this sandbox).

Runs bench.py (tile_pipeline + pip_join, the BASELINE.json:2 metrics) as one
pinned subprocess per config (SPARK_GRAFT_CPUS=8 and 32); each process runs
BENCH_REPS timed in-process repetitions after a discarded full-size warm pass
(C2 JIT) and reports its median. Then
  scaling_efficiency = (throughput@32 / throughput@8) / 4
into BENCH/BASELINE.md. Target ≥ 0.8 (BASELINE.json:2,14).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPS = int(os.environ.get("SCALING_REPS", "3"))
PAGES = os.environ.get("BENCH_PAGES", "400000")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(cpus: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=SF_DIR,
               BENCH_PAGES=PAGES,
               BENCH_REPS=str(REPS),
               BENCH_ONLY="pip_join")
    # taskset pins the WHOLE process tree (JVM + forked Python workers) to
    # `cpus` physical cores — without it, local[8]'s Python workers spill onto
    # the other 24 cores and inflate the N baseline (unpinned local[8]
    # measured ~11% faster than a true 8-core run), which is not how an
    # 8-core executor behaves on a real cluster
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.join(ROOT, "bench.py")]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    # Reps run IN-PROCESS (BENCH_REPS): one JVM per config executes
    # (REPS + 1) full-size passes, discards the first (C2 JIT needs a full
    # pass), and reports its own median — steadier and ~2x cheaper than
    # process-level reps, whose every rep re-paid JIT warm-in.
    results: dict[int, list[dict]] = {8: [], 32: []}
    t_start = time.time()
    results[8].append(run_once(8))
    results[32].append(run_once(32))

    def med(cpus: int, key, default=0.0):
        vals = []
        for r in results[cpus]:
            v = r
            for k in key.split("."):
                v = v.get(k, default) if isinstance(v, dict) else default
            vals.append(float(v))
        return statistics.median(vals)

    tput8 = med(8, "value")
    tput32 = med(32, "value")
    eff = (tput32 / tput8) / 4.0
    pj8 = med(8, "queries.pip_join")
    pj32 = med(32, "queries.pip_join")
    jr8 = med(8, "joined_rows_per_sec")
    jr32 = med(32, "joined_rows_per_sec")
    eff_join = (jr32 / jr8) / 4.0 if jr8 else 0.0

    report = f"""# BENCH — measured results (latest protocol run)

Machine: 32 cores, Spark 4.1.2 local mode, Python 3.11.7, Arrow enabled.
Input: deterministic synthetic corpus, {PAGES} pages (seed 42), zoom 0–12;
points/zones derived from {SF_DIR}. Protocol: BASELINE.md (same input, two
parallelism levels standing in for N and 4N executors; {REPS} timed in-process
reps, median; full-size warm-up pass discarded per config — see BASELINE.md
"Local-mode artifacts controlled for").

## Tile pipeline (pages → extract → parse → assign z0–12 → clip → per-tile lists)

| config | tiles/sec (median) | pipeline sec | reps |
|---|---|---|---|
| local[8]  (N)  | {tput8:.1f} | {med(8, 'queries.tile_pipeline'):.1f} | {REPS} in-process |
| local[32] (4N) | {tput32:.1f} | {med(32, 'queries.tile_pipeline'):.1f} | {REPS} in-process |

**Scaling efficiency (tiles/sec): {eff:.3f}** (target ≥ 0.8)

## PIP join (quadkey-bucketed point-in-polygon)

| config | joined rows/sec (median) | join sec |
|---|---|---|
| local[8]  (N)  | {jr8:.1f} | {pj8:.1f} |
| local[32] (4N) | {jr32:.1f} | {pj32:.1f} |

**Scaling efficiency (joined rows/sec): {eff_join:.3f}**

## Raw runs

```json
{json.dumps({str(k): v for k, v in results.items()}, indent=1)}
```

Wall time for protocol: {time.time() - t_start:.0f}s.
"""
    out_path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(report)
    print(json.dumps({"tput8": tput8, "tput32": tput32, "efficiency": round(eff, 3),
                      "join_efficiency": round(eff_join, 3), "report": out_path}))


if __name__ == "__main__":
    main()
