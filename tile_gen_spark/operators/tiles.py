"""Tile assignment, clipping, and per-tile grouping (SURVEY.md §2 G2/G8/G9/G11, A1/A2).

The heart of the engine (``BASELINE.json:6``): every feature is assigned to the
slippy tiles it intersects for each requested zoom, clipped to the tile bbox
(Sutherland–Hodgman for rings, Liang–Barsky for lines), quantized to MVT
tile-local integer coordinates, and grouped per (z, x, y) into a
deterministic, sorted MVT-equivalent feature list.

Scale design:
 - POINT assignment is pure relational Spark SQL (floor/trig from
   plans/sqlgen.py — no Python crossing at all), so Catalyst pushes filters
   and prunes columns around it, and it whole-stage-codegens.
 - Polygon/line covering + clipping are Arrow-batched ``mapInPandas`` over
   numpy kernels — the only Python crossings, placed AFTER relational filters
   (UDF-barrier management, SURVEY.md §4.2).
 - The per-tile ``collect_list`` agg is non-algebraic, so hot tiles are salted
   two-phase when requested (A2/J9): agg by (z,x,y,salt) then flatten — AQE
   alone cannot fix aggregation skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import kernels as K
from ..plans import sqlgen as S

ASSIGN_SCHEMA = "feature_id bigint, z int, x bigint, y bigint"
CLIP_SCHEMA = ("z int, x bigint, y bigint, feature_id bigint, kind string, "
               "geom array<array<int>>, props map<string,string>")


def with_lonlat(features: DataFrame) -> DataFrame:
    """First vertex of the first ring as the representative point (for points
    this IS the geometry)."""
    return (features
            .withColumn("lon", F.col("coords")[0][0])
            .withColumn("lat", F.col("coords")[0][1]))


def assign_points(points: DataFrame, zooms: list[int]) -> DataFrame:
    """G2 relationally: tile ids via Spark SQL floor/trig — zero Python.

    One select per zoom, unioned; Catalyst folds the shared scan. Output
    matches kernels.point_to_tile bit-for-bit (same formula, float64).
    """
    pts = with_lonlat(points).select("feature_id", "lon", "lat")
    parts = []
    for z in zooms:
        parts.append(pts.select(
            "feature_id",
            F.lit(z).cast("int").alias("z"),
            F.expr(S.tile_x("lon", z)).alias("x"),
            F.expr(S.tile_y("lat", z)).alias("y"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def assign_shapes(shapes: DataFrame, zooms: list[int]) -> DataFrame:
    """G8: polygons/lines → covering tiles per zoom (Arrow-batched numpy)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            fid_o, z_o, x_o, y_o = [], [], [], []
            for fid, kind, coords in zip(b["feature_id"], b["kind"], b["coords"]):
                ring = np.asarray(coords[0], dtype=np.float64)
                for z in zooms:
                    if kind == "polygon":
                        tiles = K.polygon_covering_tiles(ring, z)
                    else:
                        tiles = _line_covering_tiles(ring, z)
                    for xx, yy in tiles:
                        fid_o.append(fid)
                        z_o.append(z)
                        x_o.append(xx)
                        y_o.append(yy)
            yield pd.DataFrame({
                "feature_id": pd.Series(fid_o, dtype="int64"),
                "z": pd.Series(z_o, dtype="int32"),
                "x": pd.Series(x_o, dtype="int64"),
                "y": pd.Series(y_o, dtype="int64"),
            })

    return shapes.select("feature_id", "kind", "coords").mapInPandas(fn, ASSIGN_SCHEMA)


def _line_covering_tiles(ring: np.ndarray, z: int) -> np.ndarray:
    """Tiles whose bbox a polyline touches (vertex-in-box or segment crossing)."""
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    lons, lats = r[:, 0], np.clip(r[:, 1], -K.MAX_LAT, K.MAX_LAT)
    tx, ty = K.point_to_tile(lons, lats, z)
    out = []
    for yy in range(int(ty.min()), int(ty.max()) + 1):
        for xx in range(int(tx.min()), int(tx.max()) + 1):
            w, s, e, n = (v.item() for v in K.tile_bounds(np.array([z]), np.array([xx]), np.array([yy])))
            if np.any((lons >= w) & (lons <= e) & (lats >= s) & (lats <= n)):
                out.append((xx, yy))
            elif K._segments_intersect_bbox(r, w, s, e, n):
                out.append((xx, yy))
    return np.asarray(out, dtype=np.int64).reshape(-1, 2)


def assign_features(features: DataFrame, zooms: list[int]) -> DataFrame:
    """All kinds → (feature_id, z, x, y). THE correctness artifact
    (``BASELINE.json:6`` "tile assignments ... exactly")."""
    pts = features.filter(F.col("kind") == "point")
    shp = features.filter(F.col("kind") != "point")
    return assign_points(pts, zooms).unionByName(assign_shapes(shp, zooms))


def clip_features(features: DataFrame, assignments: DataFrame,
                  extent: int = K.MVT_EXTENT) -> DataFrame:
    """G9+G11: join features to their tiles, clip to tile bbox, quantize.

    The join is a plain equi-join on feature_id (sort-merge / shuffled-hash,
    AQE-managed); clipping is Arrow-batched per partition.
    """
    joined = assignments.join(
        features.select("feature_id", "kind", "coords", "props"), "feature_id")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: dict[str, list] = {k: [] for k in ("z", "x", "y", "feature_id", "kind", "geom", "props")}
            for fid, z, x, y, kind, coords, props in zip(
                    b["feature_id"], b["z"], b["x"], b["y"], b["kind"], b["coords"], b["props"]):
                ring = np.asarray(coords[0], dtype=np.float64)
                w, s, e, n = (v.item() for v in K.tile_bounds(
                    np.array([z]), np.array([x]), np.array([y])))
                pieces: list[np.ndarray] = []
                if kind == "point":
                    pieces = [ring.reshape(-1, 2)]
                elif kind == "line":
                    pieces = K.clip_segments_bbox(ring, w, s, e, n)
                else:
                    clipped = K.clip_ring_bbox(ring, w, s, e, n)
                    if clipped.shape[0] >= 3:
                        pieces = [K.normalize_winding(clipped, ccw=True)]
                geom = []
                for p in pieces:
                    qx, qy = K.quantize_to_tile(p[:, 0], p[:, 1], int(z), int(x), int(y), extent)
                    if kind != "point":
                        qx, qy = K.dedupe_consecutive(qx, qy)
                    if kind == "line" and qx.size < 2:
                        continue
                    if kind == "polygon" and qx.size < 3:
                        continue
                    geom.append(np.column_stack([qx, qy]).ravel().astype(np.int32).tolist())
                if not geom:
                    continue
                rows["z"].append(z)
                rows["x"].append(x)
                rows["y"].append(y)
                rows["feature_id"].append(fid)
                rows["kind"].append(kind)
                rows["geom"].append(geom)
                rows["props"].append(props)
            yield pd.DataFrame({
                "z": pd.Series(rows["z"], dtype="int32"),
                "x": pd.Series(rows["x"], dtype="int64"),
                "y": pd.Series(rows["y"], dtype="int64"),
                "feature_id": pd.Series(rows["feature_id"], dtype="int64"),
                "kind": pd.Series(rows["kind"], dtype="string"),
                "geom": pd.Series(rows["geom"], dtype=object),
                "props": pd.Series(rows["props"], dtype=object),
            })

    return joined.mapInPandas(fn, CLIP_SCHEMA)


def tile_feature_lists(clipped: DataFrame, salt: int = 0) -> DataFrame:
    """A1/A2: per-tile deterministic sorted feature list (MVT-equivalent).

    salt > 0 → two-phase: agg by (z,x,y,salt buckets) first, then flatten and
    re-sort — bounds any single reducer's list size on hot city tiles
    (``BASELINE.json:6,14``; collect_list has no partial-merge, SURVEY §4.2).
    """
    feat = F.struct(
        F.col("feature_id"), F.col("kind"), F.col("geom"), F.col("props"))

    def by_fid(arr):  # maps aren't orderable → explicit comparator on the id
        return F.array_sort(arr, lambda l, r: F.when(l.feature_id < r.feature_id, -1)
                            .when(l.feature_id > r.feature_id, 1).otherwise(0))

    if salt <= 1:
        return (clipped
                .groupBy("z", "x", "y")
                .agg(by_fid(F.collect_list(feat)).alias("features"))
                .withColumn("n_features", F.size("features")))
    two = (clipped
           .withColumn("_salt", F.pmod(F.hash("feature_id"), F.lit(salt)))
           .groupBy("z", "x", "y", "_salt")
           .agg(F.collect_list(feat).alias("_part")))
    return (two.groupBy("z", "x", "y")
            .agg(by_fid(F.flatten(F.collect_list("_part"))).alias("features"))
            .withColumn("n_features", F.size("features")))
