"""Phase-level profiler for the tile pipeline: names the 32-thread limiter.

Times each pipeline stage in isolation (persist boundaries + noop writes) at
a pinned core count, and pulls per-stage executor metrics (run time, GC time,
shuffle bytes) from the local REST API, so N→4N scaling loss can be
attributed to a SPECIFIC phase (shuffle/window vs Arrow extract vs clip vs
salted agg) instead of guessed (VERDICT r2: "name the 32-thread limiter").

Run one pinned subprocess per config:
  taskset -c 0-7  python tools/profile_phases.py 8
  taskset -c 0-31 python tools/profile_phases.py 32
Prints one JSON line per run: {"cpus": N, "phases": {name: sec}, "metrics":
{name: {run_ms, gc_ms, shuf_read_mb, shuf_write_mb}}}.
Two passes per phase sequence; pass 2 reported (C2 JIT warm).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("BENCH_PAGES", "400000"))
ZOOMS = list(range(0, 13))


def _stage_metrics(ui: str) -> dict[int, dict]:
    try:
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete", timeout=10))
    except Exception:
        return {}
    out = {}
    for s in stages:
        out[s["stageId"]] = {
            "run_ms": s.get("executorRunTime", 0),
            "gc_ms": s.get("jvmGcTime", 0),
            "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
            "shuf_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuf_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
        }
    return out


def main() -> None:
    cpus = int(sys.argv[1])
    from pyspark.sql import functions as F
    from pyspark import StorageLevel

    from tile_gen_spark.plans.session import get_spark
    from tile_gen_spark.sources.synth import gen_pages
    from tile_gen_spark.operators.extract import (extract_and_parse,
                                                  latest_per_url, validity_filter)
    from tile_gen_spark.operators.tiles import (clip_points_flat,
                                                clip_shapes_flat,
                                                tile_feature_lists_dim)

    spark = get_spark("profile", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    ui = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}" \
        if spark.sparkContext.uiWebUrl else "http://localhost:4040"

    pages_path = f"/tmp/tilegen_bench_pages_n{N_PAGES}"
    if not os.path.exists(pages_path):
        gen_pages(spark, N_PAGES, seed=42, parallelism=64).write.mode(
            "overwrite").parquet(pages_path)
    spark.read.parquet(pages_path).count()  # page cache warm

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_pass() -> tuple[dict, dict]:
        phases: dict[str, float] = {}
        pmetrics: dict[str, dict] = {}
        seen: set[int] = set(_stage_metrics(ui))

        def timed(name, fn):
            nonlocal seen
            t0 = time.time()
            fn()
            phases[name] = round(time.time() - t0, 2)
            allm = _stage_metrics(ui)
            new = {k: v for k, v in allm.items() if k not in seen}
            seen = set(allm)
            pmetrics[name] = {
                "run_ms": sum(m["run_ms"] for m in new.values()),
                "gc_ms": sum(m["gc_ms"] for m in new.values()),
                "cpu_ms": sum(m["cpu_ms"] for m in new.values()),
                "shuf_read_mb": round(sum(m["shuf_read_mb"] for m in new.values()), 1),
                "shuf_write_mb": round(sum(m["shuf_write_mb"] for m in new.values()), 1),
            }

        pages = spark.read.parquet(pages_path)
        timed("scan", lambda: noop(pages))

        latest = latest_per_url(pages).persist(StorageLevel.MEMORY_AND_DISK)
        timed("latest_window", lambda: noop(latest))

        feats = validity_filter(extract_and_parse(latest)).persist(
            StorageLevel.MEMORY_AND_DISK)
        timed("extract_parse", lambda: noop(feats))

        pts = clip_points_flat(
            feats.filter(F.col("kind") == "point"), ZOOMS)
        timed("clip_points", lambda: noop(pts))

        shp = clip_shapes_flat(
            feats.filter(F.col("kind") != "point"), ZOOMS)
        clipped = pts.unionByName(shp).persist(StorageLevel.MEMORY_AND_DISK)
        # clip_shapes includes its repartition shuffle + the python clip;
        # clipped persists so the agg phase doesn't re-run it
        timed("clip_shapes", lambda: noop(clipped))

        tiles = tile_feature_lists_dim(
            clipped, feats.select("feature_id", "kind", "props"), salt=8)
        timed("salted_agg", lambda: tiles.select(
            F.count("*"), F.sum("n_features")).first())

        latest.unpersist()
        feats.unpersist()
        clipped.unpersist()
        return phases, pmetrics

    run_pass()  # JIT warm pass, discarded
    phases, pmetrics = run_pass()
    phases["total"] = round(sum(phases.values()), 2)
    print(json.dumps({"cpus": cpus, "n_pages": N_PAGES, "phases": phases,
                      "metrics": pmetrics}))
    spark.stop()


if __name__ == "__main__":
    main()
