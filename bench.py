"""Benchmark harness (driver contract): headline queries at SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "tiles_per_sec_z0_12", "value": N, "unit": "tiles/sec",
   "queries": {name: sec, ...}, "sf": 0.1, ...extras}

Headline queries:
  tile_pipeline   — synthetic pages corpus → extract → parse geo → assign
                    z0..12 → clip → per-tile MVT-equivalent lists (the
                    ``BASELINE.json:2`` metric: tiles/sec)
  pip_join        — quadkey-bucketed point-in-polygon join (joined rows/sec)
  tile_assign     — pure-relational multizoom assignment over lineitem points
  knn_embeddings  — exact cosine top-k over the embeddings table
  dedup_minhash   — MinHash-LSH candidate pairs over documents

The synthetic corpus is generated once (deterministic, seed=42) into /tmp and
reused; the bench times the engine, not the generator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENCH_PAGES", "400000"))
ZOOMS = list(range(0, 13))


def _sf() -> float:
    import re
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    return float(m.group(1)) if m else -1.0


def _pages_path() -> str:
    return f"/tmp/tilegen_bench_pages_n{N_PAGES}"


def main() -> None:
    from pyspark.sql import functions as F

    from tile_gen_spark.plans.session import get_spark
    from tile_gen_spark.sources.synth import gen_pages, gen_zones
    from tile_gen_spark.sources.testdata import register_views
    from tile_gen_spark.operators.extract import (extract_and_parse,
                                                  latest_per_url, validity_filter)
    from tile_gen_spark.operators.tiles import build_tile_features
    from tile_gen_spark.operators.spatial_join import pip_join
    from tile_gen_spark.operators.knn import knn_embeddings
    from tile_gen_spark.operators.textops import minhash_lsh_pairs
    import __spark_entry__ as E
    from tile_gen_spark.plans import sqlgen as S

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2)
    register_views(spark, SF_DIR)

    pages_path = _pages_path()
    if not os.path.exists(pages_path):
        gen_pages(spark, N_PAGES, seed=42, parallelism=CPUS * 2).write.mode(
            "overwrite").parquet(pages_path)

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    only = set(os.environ.get("BENCH_ONLY", "").split(",")) - {""}

    def want(name: str) -> bool:
        return not only or name in only

    # warm-up, untimed (protocol: BASELINE.md "warm-up run discarded"): run
    # the full pipeline DAG on a tiny slice — forks the Python worker pool
    # (~5s cold start at 32 workers, measured), compiles the codegen'd stages,
    # and initializes the shuffle machinery
    spark.sql("SELECT count(*) FROM lineitem").collect()
    # full input scan: puts the corpus parquet in page cache so the timed
    # section measures compute, not cold-disk order effects between runs
    spark.read.parquet(pages_path).count()
    warm = spark.read.parquet(pages_path).limit(2000)
    build_tile_features(
        validity_filter(extract_and_parse(latest_per_url(warm))),
        ZOOMS, salt=8).count()

    # --- tile_pipeline: the headline tiles/sec metric ---
    # BENCH_REPS > 1: run (reps + 1) full-size passes in-process, discard the
    # first (C2 JIT fully compiles the big codegen stages only after a full
    # pass — measured 1.3-2x on the first), report the median. Default 1
    # (single timed run, driver contract).
    reps = max(1, int(os.environ.get("BENCH_REPS", "1")))
    import statistics

    def run_pipeline():
        t0 = time.time()
        pages = spark.read.parquet(pages_path)
        latest = latest_per_url(pages)
        # persist: the point and shape paths both branch from `feats`, and
        # union branches re-execute shared subtrees (no cross-branch CSE)
        feats = validity_filter(extract_and_parse(latest)).persist()
        tiles = build_tile_features(feats, ZOOMS, salt=8)
        nt, nf = tiles.select(F.count("*"), F.sum("n_features")).first()
        dt = time.time() - t0
        feats.unpersist()  # free executor memory before the next section
        return dt, int(nt), int(nf)

    runs = [run_pipeline() for _ in range(reps + 1 if reps > 1 else 1)]
    timed = runs[1:] if reps > 1 else runs
    dt = statistics.median(r[0] for r in timed)
    n_tiles, n_feat_rows = timed[-1][1], timed[-1][2]
    timings["tile_pipeline"] = round(dt, 2)
    tiles_per_sec = n_tiles / dt
    extras["n_tiles"] = n_tiles
    extras["n_tile_feature_rows"] = n_feat_rows
    if reps > 1:
        extras["tile_pipeline_reps"] = [round(r[0], 2) for r in runs]

    # --- pip_join: joined rows/sec ---
    # Synthetic relational point set + many small zones: every stage of the
    # join (zone gen/covering python, point trig+probe, edge-agg refine)
    # parallelizes, so the N→4N criterion measures the JOIN, not fixed
    # setup. Round 1 used the 457k-point lineitem CTE — the whole join was
    # latency-bound at ~31 s regardless of cores (VERDICT r1).
    if want("pip_join"):
        n_pip_pts = int(os.environ.get("BENCH_PIP_POINTS", "256000000"))
        pts = spark.range(n_pip_pts).select(
            F.col("id").alias("point_id"),
            F.expr(S.pt_lon("id")).alias("lon"),
            F.expr(S.pt_lat("id")).alias("lat"))
        # zones are INPUT data: materialized before the timed section
        zones = gen_zones(spark, 20000, seed=1, radius_scale=0.1,
                          nv_extra=40).cache()
        zones.count()
        q = pip_join(pts, zones, res=10)
        q.count()
        q.count()  # two discarded warm runs: C2 fully compiles the probe +
        # refine codegen only after ~2 full-size passes (measured 19s → 7s)
        pip_runs = []
        for _ in range(reps):
            t0 = time.time()
            n_pairs = q.count()
            pip_runs.append(time.time() - t0)
        dt = statistics.median(pip_runs)
        zones.unpersist()
        timings["pip_join"] = round(dt, 2)
        extras["n_pip_points"] = n_pip_pts
        extras["n_pip_pairs"] = int(n_pairs)
        extras["joined_rows_per_sec"] = round(n_pairs / dt, 1)
        if reps > 1:
            extras["pip_join_reps"] = [round(t, 2) for t in pip_runs]

    # --- tile_assign: relational multizoom ---
    if want("tile_assign"):
        t0 = time.time()
        spark.sql(E.q_tile_assign_multizoom(S.SPARK)).collect()
        timings["tile_assign"] = round(time.time() - t0, 2)

    # --- knn_embeddings ---
    if want("knn_embeddings"):
        t0 = time.time()
        emb = spark.table("embeddings")
        knn_embeddings(emb, emb, k=5).count()
        timings["knn_embeddings"] = round(time.time() - t0, 2)

    # --- dedup_minhash ---
    if want("dedup_minhash"):
        t0 = time.time()
        docs = spark.table("documents")
        minhash_lsh_pairs(docs, num_hashes=16, bands=4).count()
        timings["dedup_minhash"] = round(time.time() - t0, 2)

    total = round(sum(timings.values()), 2)
    print(json.dumps({
        "metric": "tiles_per_sec_z0_12",
        "value": round(tiles_per_sec, 1),
        "unit": "tiles/sec",
        "queries": timings,
        "sf": _sf(),
        "total_sec": total,
        "cpus": CPUS,
        "n_pages": N_PAGES,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
