"""N→4N scaling-efficiency protocol (BASELINE.md): same job, same input, two
parallelism levels standing in for N and 4N executors (driver instruction —
no real cluster in this sandbox).

Variance-aware (VERDICT r2: a protocol whose pip efficiency swings
0.615↔0.873 between runs cannot support any pass/fail claim):
  - PROC_RUNS (default 3) process-level runs PER CONFIG, interleaved
    ABBA-style (8,32,32,8,8,32) so slow drift (page cache, thermal) hits
    both configs equally;
  - each process runs bench.py with BENCH_REPS in-process timed reps after
    TWO discarded full-size passes (C2 JIT) and reports its own median;
  - the report carries median + min/max per config AND the per-pairing
    efficiency spread, so the headline number owns its variance.

Sections are isolated subprocesses inside bench.py itself (fresh JVM per
section), and taskset pins the WHOLE process tree (JVM + forked Python
workers) to `cpus` physical cores — without it, local[8]'s Python workers
spill onto the other 24 cores and inflate the N baseline (unpinned local[8]
measured ~11% faster than a true 8-core run).

  scaling_efficiency = (throughput@32 / throughput@8) / 4
Target ≥ 0.8 (BASELINE.json:2,14).
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
PROC_RUNS = int(os.environ.get("SCALING_PROC_RUNS", "5"))
PAGES = os.environ.get("BENCH_PAGES", "400000")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SECTIONS = os.environ.get("SCALING_SECTIONS", "tile_pipeline,pip_join")
# PRE-REGISTERED steal rule (VERDICT r4 #2): a run whose measured
# hypervisor steal exceeds STEAL_MAX % of the box is RE-RUN immediately
# (up to STEAL_RETRIES times); the last attempt is kept either way and
# every discarded attempt is recorded in the raw artifact. The rule is
# fixed here, in code, before the protocol runs — not applied post-hoc.
STEAL_MAX = float(os.environ.get("SCALING_STEAL_MAX", "2.0"))
STEAL_RETRIES = int(os.environ.get("SCALING_STEAL_RETRIES", "2"))


def _steal_snap() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat — hypervisor CPU-steal
    accounting. Recorded per run because this VM shows episodic steal bursts
    (measured 4-5% of all cores for ~30 s) that inflate long pinned runs,
    the 8-core config worst; annotating each run lets the report separate
    engine behavior from host noise."""
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:9]))
    return v[7], sum(v)


def run_once(cpus: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=SF_DIR,
               BENCH_PAGES=PAGES,
               BENCH_REPS=str(REPS),
               BENCH_ONLY=SECTIONS)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.join(ROOT, "bench.py")]
    # a failed/hung child records an error row instead of crashing the
    # whole multi-hour protocol (ADVICE r3)
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=7200)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout cpus={cpus}"}
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        return {"error": f"no JSON from child cpus={cpus}",
                "stderr_tail": out.stderr[-2000:]}
    return json.loads(lines[-1])


def run_once_with_steal(cpus: int) -> dict:
    s0, t0 = _steal_snap()
    r = run_once(cpus)
    s1, t1 = _steal_snap()
    dt = max(t1 - t0, 1)
    r["steal_pct_of_box"] = round(100.0 * (s1 - s0) / dt, 2)
    return r


def run_with_steal_rule(cpus: int, discarded: list[dict]) -> dict:
    """Apply the pre-registered steal rule: re-run (≤ STEAL_RETRIES) while
    the run's steal_pct_of_box exceeds STEAL_MAX; keep the last attempt
    regardless, annotate it, and log every discarded attempt."""
    r = run_once_with_steal(cpus)
    attempts = 1
    while ("error" not in r and r["steal_pct_of_box"] > STEAL_MAX
           and attempts <= STEAL_RETRIES):
        discarded.append({"cpus": cpus, **r})
        print(json.dumps({"steal_rerun": attempts, "cpus": cpus,
                          "steal_pct_of_box": r["steal_pct_of_box"],
                          "rule_max": STEAL_MAX}), flush=True)
        r = run_once_with_steal(cpus)
        attempts += 1
    r["steal_attempts"] = attempts
    return r


def main() -> None:
    # ABBA interleave: 8,32,32,8,8,32,... — each adjacent pair is a
    # (N, 4N) comparison under near-identical machine state
    order: list[int] = []
    for i in range(PROC_RUNS):
        order += [8, 32] if i % 2 == 0 else [32, 8]
    results: dict[int, list[dict]] = {8: [], 32: []}
    discarded: list[dict] = []
    t_start = time.time()
    for cpus in order:
        r = run_with_steal_rule(cpus, discarded)
        # bench.py's orchestrator reports tile throughput as the headline
        # "value"; normalize it back for the series math
        r.setdefault("tiles_per_sec", r.get("value", 0.0))
        results[cpus].append(r)
        print(json.dumps({"run": len(results[cpus]), "cpus": cpus,
                          "tiles_per_sec": r.get("tiles_per_sec"),
                          "joined_rows_per_sec": r.get("joined_rows_per_sec"),
                          "steal_pct_of_box": r.get("steal_pct_of_box"),
                          "queries": r.get("queries")}), flush=True)

    # error/timeout rows are EXCLUDED from the medians (ADVICE r4 #2 — a
    # zero from a failed child must not drag the published efficiency);
    # the exclusion count is reported alongside the stats
    n_err = {c: sum(1 for r in results[c] if "error" in r) for c in (8, 32)}

    def series(cpus: int, key: str) -> list[float | None]:
        """Per-run values, run-aligned across configs; None for error rows
        (kept as placeholders so ABBA pairings stay aligned)."""
        vals: list[float | None] = []
        for r in results[cpus]:
            if "error" in r:
                vals.append(None)
                continue
            v = r
            for k in key.split("."):
                v = v.get(k, 0.0) if isinstance(v, dict) else 0.0
            vals.append(float(v))
        return vals

    def ok(vals: list[float | None]) -> list[float]:
        return [v for v in vals if v is not None]

    def stats(vals: list[float | None]) -> tuple[float, float, float]:
        g = ok(vals)
        return statistics.median(g), min(g), max(g)

    tput8 = series(8, "tiles_per_sec")
    tput32 = series(32, "tiles_per_sec")
    jr8 = series(8, "joined_rows_per_sec")
    jr32 = series(32, "joined_rows_per_sec")

    def effs(a: list[float | None], b: list[float | None]) -> list[float]:
        return [round((y / x) / 4.0, 3) for x, y in zip(a, b)
                if x is not None and y is not None and x > 0]

    eff_tile = effs(tput8, tput32)
    eff_join = effs(jr8, jr32)

    def med_eff(a: list[float | None], b: list[float | None]) -> float:
        if not ok(a) or not ok(b) or not stats(a)[0]:
            return 0.0
        return round((stats(b)[0] / stats(a)[0]) / 4.0, 3)

    eff = med_eff(tput8, tput32)
    effj = med_eff(jr8, jr32)

    def row(vals: list[float | None]) -> str:
        if not ok(vals):
            return "n/a"
        m, lo, hi = stats(vals)
        return f"{m:.1f} (min {lo:.1f}, max {hi:.1f})"

    report = f"""# BENCH — measured results (latest protocol run)

Machine: 32 cores, Spark 4.1.2 local mode, Python 3.11.7, Arrow enabled.
Input: deterministic synthetic corpus, {PAGES} pages (seed 42), zoom 0–12;
points/zones derived from {SF_DIR}. Protocol: {PROC_RUNS} process-level runs
per config, ABBA-interleaved (8,32,32,8,8,32); each process runs {REPS} timed
in-process reps after TWO discarded full-size passes (C2 JIT) and reports its
median; sections run in isolated JVMs; taskset-pinned cores; tmpfs shuffle
(see BASELINE.md "Local-mode artifacts controlled for").

Pre-registered steal rule (fixed in tools/bench_scaling.py BEFORE the run,
not applied post-hoc): a run whose measured hypervisor steal exceeds
{STEAL_MAX}% of the box is re-run immediately, up to {STEAL_RETRIES} times;
the last attempt counts either way, and every discarded attempt is kept in
BENCH/scaling_runs.json. Error/timeout child runs are excluded from the
medians and counted here: excluded 8c={n_err[8]}, 32c={n_err[32]};
steal-rule re-runs this protocol: {len(discarded)}.

## Tile pipeline (pages → extract → parse → assign z0–12 → clip → per-tile lists)

| config | tiles/sec median (min, max) | runs |
|---|---|---|
| local[8]  (N)  | {row(tput8)} | {PROC_RUNS} × {REPS} reps |
| local[32] (4N) | {row(tput32)} | {PROC_RUNS} × {REPS} reps |

**Scaling efficiency (tiles/sec, median-of-runs): {eff:.3f}** (target ≥ 0.8)
Per-pairing efficiencies: {eff_tile} (spread {(max(eff_tile) - min(eff_tile)) if eff_tile else 0:.3f})

## PIP join (quadkey-bucketed point-in-polygon)

| config | joined rows/sec median (min, max) |
|---|---|
| local[8]  (N)  | {row(jr8)} |
| local[32] (4N) | {row(jr32)} |

**Scaling efficiency (joined rows/sec, median-of-runs): {effj:.3f}**
Per-pairing efficiencies: {eff_join} (spread {(max(eff_join) - min(eff_join)) if eff_join else 0:.3f})

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
    # raw per-run artifact so the medians are re-derivable (VERDICT r3 #8)
    raw_path = os.path.join(ROOT, "BENCH", "scaling_runs.json")
    with open(raw_path, "w") as f:
        json.dump({"order": order, "reps": REPS, "proc_runs": PROC_RUNS,
                   "pages": PAGES, "sections": SECTIONS,
                   "steal_rule": {"max_pct": STEAL_MAX,
                                  "retries": STEAL_RETRIES},
                   "discarded_steal_attempts": discarded,
                   "excluded_error_runs": n_err,
                   "results": {str(k): v for k, v in results.items()}}, f, indent=1)
    print(json.dumps({
        "tput8": stats(tput8) if tput8 else None,
        "tput32": stats(tput32) if tput32 else None,
        "efficiency": eff, "eff_runs": eff_tile,
        "join_efficiency": effj, "join_eff_runs": eff_join,
        "report": out_path}))


if __name__ == "__main__":
    main()
