"""Generate the golden fixtures (SURVEY.md §5.3, FIXTURES.md §3) ONCE,
single-threaded, and freeze them under tests/fixtures/.

These stand in for the reference's tile-output fixtures (``BASELINE.json:6``;
reference artifacts absent — SURVEY.md §0): text_sha (byte-identity),
assignments (exact tile assignment), pip_pairs (exact join rows),
tile_digest (order-insensitive per-tile content hash).

Rerunning this script must be a no-op diff; tests/test_fixtures.py enforces
that every future engine run reproduces these exactly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")

N_PAGES = 600
ZOOMS = [0, 4, 8, 12]


def main() -> None:
    from pyspark.sql import functions as F
    from tile_gen_spark.plans.session import get_spark
    from tile_gen_spark.sources.synth import gen_pages, gen_zones
    from tile_gen_spark.operators.extract import (extract_text, latest_per_url,
                                                  parse_geo_features, validity_filter)
    from tile_gen_spark.operators.tiles import assign_features, build_tile_features, with_lonlat
    from tile_gen_spark.operators.spatial_join import pip_join
    from tile_gen_spark.operators.knn import knn_geo

    spark = get_spark("pin-fixtures", master="local[1]", shuffle_partitions=1)
    pages = gen_pages(spark, N_PAGES, seed=42).cache()

    latest = latest_per_url(pages)
    ex = latest.withColumn("etext", extract_text("html"))
    (ex.select("url", F.sha2("etext", 256).alias("sha"))
     .orderBy("url")
     .coalesce(1).write.mode("overwrite").parquet(f"{FIX}/text_sha"))

    feats = validity_filter(parse_geo_features(ex, "etext")).cache()
    asg = assign_features(feats, ZOOMS)
    (asg.orderBy("z", "x", "y", "feature_id")
     .coalesce(1).write.mode("overwrite").parquet(f"{FIX}/assignments"))

    tiles = build_tile_features(feats, ZOOMS)
    digest = tiles.select(
        "z", "x", "y", "n_features",
        F.sha2(F.to_json(F.struct("features")), 256).alias("digest"))
    (digest.orderBy("z", "x", "y")
     .coalesce(1).write.mode("overwrite").parquet(f"{FIX}/tile_digest"))

    zones = gen_zones(spark, 60, seed=42).cache()
    pts = (with_lonlat(feats.filter("kind = 'point'"))
           .select(F.col("feature_id").alias("point_id"), "lon", "lat").cache())
    pip = pip_join(pts, zones, res=5)
    (pip.select("point_id", "zone_id").orderBy("point_id", "zone_id")
     .coalesce(1).write.mode("overwrite").parquet(f"{FIX}/pip_pairs"))

    q = (pts.filter(F.col("point_id") % 16 == 0)
         .select(F.col("point_id").alias("query_id"), "lon", "lat"))
    c = pts.select(F.col("point_id").alias("cand_id"), "lon", "lat")
    knn = knn_geo(q, c, k=5, res=3, kring=1)
    (knn.select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")
     .coalesce(1).write.mode("overwrite").parquet(f"{FIX}/knn"))

    print("pinned:", {p: spark.read.parquet(f"{FIX}/{p}").count()
                      for p in ("text_sha", "assignments", "tile_digest", "pip_pairs", "knn")})
    spark.stop()


if __name__ == "__main__":
    main()
