"""Golden-fixture regression (SURVEY.md §5.3): every run must reproduce the
pinned artifacts EXACTLY (``BASELINE.json:2,6,15``), at any parallelism —
the conftest session runs local[8] while the fixtures were pinned single-
threaded on local[1], so passing here is also the determinism-under-
parallelism proof."""

import os

import pytest
from pyspark.sql import functions as F

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{FIX}/assignments"), reason="fixtures not pinned yet")


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_text_sha_fixture(spark, pages):
    from tile_gen_spark.operators.extract import extract_text, latest_per_url
    ex = latest_per_url(pages).withColumn("etext", extract_text("html"))
    got = ex.select("url", F.sha2("etext", 256).alias("sha"))
    assert _same(got, spark.read.parquet(f"{FIX}/text_sha"))


def test_assignments_fixture(spark, features):
    from tile_gen_spark.operators.tiles import assign_features
    got = assign_features(features, [0, 4, 8, 12])
    assert _same(got, spark.read.parquet(f"{FIX}/assignments"))


def test_tile_digest_fixture(spark, features):
    from tile_gen_spark.operators.tiles import build_tile_features
    tiles = build_tile_features(features, [0, 4, 8, 12])
    got = tiles.select(
        "z", "x", "y", "n_features",
        F.sha2(F.to_json(F.struct("features")), 256).alias("digest"))
    assert _same(got, spark.read.parquet(f"{FIX}/tile_digest"))


def test_pip_pairs_fixture(spark, features):
    from tile_gen_spark.sources.synth import gen_zones
    from tile_gen_spark.operators.spatial_join import pip_join
    from tile_gen_spark.operators.tiles import with_lonlat
    zones = gen_zones(spark, 60, seed=42)
    pts = (with_lonlat(features.filter("kind = 'point'"))
           .select(F.col("feature_id").alias("point_id"), "lon", "lat"))
    got = pip_join(pts, zones, res=5).select("point_id", "zone_id")
    assert _same(got, spark.read.parquet(f"{FIX}/pip_pairs"))


def test_knn_fixture(spark, features):
    from tile_gen_spark.operators.knn import knn_geo
    from tile_gen_spark.operators.tiles import with_lonlat
    pts = (with_lonlat(features.filter("kind = 'point'"))
           .select(F.col("feature_id").alias("point_id"), "lon", "lat").cache())
    q = (pts.filter(F.col("point_id") % 16 == 0)
         .select(F.col("point_id").alias("query_id"), "lon", "lat"))
    c = pts.select(F.col("point_id").alias("cand_id"), "lon", "lat")
    got = knn_geo(q, c, k=5, res=3, kring=1).select("query_id", "neighbor_id", "rank")
    assert _same(got, spark.read.parquet(f"{FIX}/knn"))
