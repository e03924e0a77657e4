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

import os
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


def _quantize_polygon_rings(rings: list[np.ndarray], z: int, x: int, y: int,
                            extent: int) -> list[list[int]]:
    """Clipped lon/lat rings (ring 0 exterior, 1+ holes) → MVT-wound quantized
    pieces.

    Winding is normalized in QUANTIZED tile space, where y points down: MVT
    2.1 §4.3.3.3 requires the exterior ring to have POSITIVE shoelace area on
    the stored (qx, qy) ints (screen-clockwise) and interior rings negative.
    Normalizing CCW in lon/lat (y-up) and letting quantization flip the axis
    — the round-1 behavior — inverts every ring's class for spec-conformant
    decoders. Zero-area rings are dropped (spec: rings MUST have area > 0);
    a degenerate exterior drops the whole feature-in-tile ([]).
    """
    geom: list[list[int]] = []
    for ridx, p in enumerate(rings):
        if p.shape[0] < 3:
            if ridx == 0:
                return []
            continue
        gx, gy = K.quantize_to_tile(p[:, 0], p[:, 1], z, x, y, extent)
        gx, gy = K.dedupe_consecutive(gx, gy)
        if gx.size >= 2 and gx[0] == gx[-1] and gy[0] == gy[-1]:
            gx, gy = gx[:-1], gy[:-1]
        if gx.size < 3:
            if ridx == 0:
                return []
            continue
        q = np.column_stack([gx, gy]).astype(np.float64)
        a = K.ring_signed_area(q)
        if a == 0.0:
            if ridx == 0:
                return []
            continue
        if (a > 0) != (ridx == 0):
            q = q[::-1]
        geom.append(q.ravel().astype(np.int32).tolist())
    return geom


def _coord_rings(coords) -> list[np.ndarray]:
    return [np.asarray(c, dtype=np.float64).reshape(-1, 2) for c in coords]


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
    # single explode over a per-zoom struct array — NOT a 13-way union: union
    # branches each re-execute the shared upstream subtree (Catalyst performs
    # no cross-branch CSE), which re-ran the Arrow parse stage once per zoom
    entries = [F.struct(
        F.lit(z).cast("int").alias("z"),
        F.expr(S.tile_x("lon", z)).alias("x"),
        F.expr(S.tile_y("lat", z)).alias("y")) for z in zooms]
    return (pts.select("feature_id", F.explode(F.array(*entries)).alias("t"))
            .select("feature_id", "t.z", "t.x", "t.y"))


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
    """Tiles whose bbox a polyline touches — vectorized over the candidate
    grid (vertex-tile marking + per-edge Liang–Barsky accept)."""
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    lons, lats = r[:, 0], np.clip(r[:, 1], -K.MAX_LAT, K.MAX_LAT)
    tx, ty = K.point_to_tile(lons, lats, z)
    x0, x1 = int(tx.min()), int(tx.max())
    y0, y1 = int(ty.min()), int(ty.max())
    xx, yy, w, s, e, n = K._tile_bounds_grid(z, x0, x1, y0, y1)
    nx = x1 - x0 + 1
    covered = np.zeros(xx.shape[0], dtype=bool)
    covered[(ty - y0) * nx + (tx - x0)] = True
    rem = ~covered
    if np.any(rem):
        hit = K._edges_cross_bboxes(r, w[rem], s[rem], e[rem], n[rem])
        covered[np.nonzero(rem)[0][hit]] = True
    return np.column_stack([xx[covered], yy[covered]])


def assign_features(features: DataFrame, zooms: list[int]) -> DataFrame:
    """All kinds → (feature_id, z, x, y). THE correctness artifact
    (``BASELINE.json:6`` "tile assignments ... exactly")."""
    pts = features.filter(F.col("kind") == "point")
    shp = features.filter(F.col("kind") != "point")
    return assign_points(pts, zooms).unionByName(assign_shapes(shp, zooms))


def clip_features(features: DataFrame, assignments: DataFrame,
                  extent: int = K.MVT_EXTENT) -> DataFrame:
    """G9+G11: join features to their tiles, clip to tile bbox, quantize.

    Scale split:
     - POINTS (the bulk of assignments) never touch Python: quantization is
       the pure-SQL expression (tile_fraction − tile_index)·extent
       (plans/sqlgen.quantize_*), whole-stage-codegen'd.
     - LINES/POLYGONS go through one Arrow batch pass; tile bounds and
       mercator constants are computed vectorized per batch, the per-feature
       loop only runs the O(vertices) clip kernels.
    The join is a plain equi-join on feature_id (AQE picks broadcast/SMJ/SHJ
    and splits skewed tiles).
    """
    joined = assignments.join(
        features.select("feature_id", "kind", "coords", "props"), "feature_id")

    pts = joined.filter(F.col("kind") == "point")
    qx = S.quantize_x("coords[0][0]", "CAST(z AS DOUBLE)", "CAST(x AS DOUBLE)", extent)
    qy = S.quantize_y("coords[0][1]", "CAST(z AS DOUBLE)", "CAST(y AS DOUBLE)", extent)
    pts_out = pts.select(
        "z", "x", "y", "feature_id", "kind",
        F.array(F.array(F.expr(qx), F.expr(qy))).alias("geom"),
        "props")

    shp = joined.filter(F.col("kind") != "point")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            zs = b["z"].to_numpy(np.int64)
            xs = b["x"].to_numpy(np.float64)
            ys = b["y"].to_numpy(np.float64)
            # vectorized tile bounds for the whole batch (lon/lat bbox)
            nn = np.power(2.0, zs.astype(np.float64))
            west = xs / nn * 360.0 - 180.0
            east = (xs + 1.0) / nn * 360.0 - 180.0
            north = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * ys / nn))))
            south = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (ys + 1.0) / nn))))
            rows: dict[str, list] = {k: [] for k in ("z", "x", "y", "feature_id", "kind", "geom", "props")}
            for i, (fid, kind, coords, props) in enumerate(zip(
                    b["feature_id"], b["kind"], b["coords"], b["props"])):
                z, x, y = int(zs[i]), int(xs[i]), int(ys[i])
                if kind == "line":
                    ring = np.asarray(coords[0], dtype=np.float64)
                    pieces = K.clip_segments_bbox(ring, west[i], south[i], east[i], north[i])
                    geom = []
                    for p in pieces:
                        gx, gy = K.quantize_to_tile(p[:, 0], p[:, 1], z, x, y, extent)
                        gx, gy = K.dedupe_consecutive(gx, gy)
                        if gx.size < 2:
                            continue
                        geom.append(np.column_stack([gx, gy]).ravel().astype(np.int32).tolist())
                else:
                    clipped = [K.clip_ring_bbox(r, west[i], south[i], east[i], north[i])
                               for r in _coord_rings(coords)]
                    geom = _quantize_polygon_rings(clipped, z, x, y, extent)
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

    return pts_out.unionByName(shp.mapInPandas(fn, CLIP_SCHEMA))


def clip_points_relational(points: DataFrame, zooms: list[int],
                           extent: int = K.MVT_EXTENT) -> DataFrame:
    """Fused assign+quantize for points — pure Spark SQL, no join, no Python.

    One select per zoom over the same scan (Catalyst collapses them); each row
    emits its tile id (G2) and tile-local quantized geometry (G11) from the
    same tile-fraction expression."""
    pts = with_lonlat(points).select("feature_id", "kind", "lon", "lat", "props")
    # one explode, one scan (see assign_points: unions re-execute the subtree)
    entries = []
    for z in zooms:
        qx = S.quantize_x("lon", f"{z}.0", S.tile_x("lon", z), extent)
        qy = S.quantize_y("lat", f"{z}.0", S.tile_y("lat", z), extent)
        entries.append(F.struct(
            F.lit(z).cast("int").alias("z"),
            F.expr(S.tile_x("lon", z)).alias("x"),
            F.expr(S.tile_y("lat", z)).alias("y"),
            F.expr(qx).alias("qx"),
            F.expr(qy).alias("qy")))
    return (pts.select("feature_id", "kind", "props",
                       F.explode(F.array(*entries)).alias("t"))
            .select("t.z", "t.x", "t.y", "feature_id", "kind",
                    F.array(F.array("t.qx", "t.qy")).alias("geom"), "props"))


def clip_shapes_direct(shapes: DataFrame, zooms: list[int],
                       extent: int = K.MVT_EXTENT) -> DataFrame:
    """Fused covering+clip+quantize for lines/polygons — ONE Arrow crossing,
    no assignments join (each feature's coords cross the boundary once instead
    of once per covering tile; at z≤12 a large polygon covers 10³ tiles, so
    this is a ~650× reduction in shuffled bytes for the synthetic corpus)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: dict[str, list] = {k: [] for k in ("z", "x", "y", "feature_id", "kind", "geom", "props")}
            for fid, kind, coords, props, z in zip(
                    b["feature_id"], b["kind"], b["coords"], b["props"], b["_z"]):
                rings_ll = _coord_rings(coords)
                ring = rings_ll[0].ravel()
                z = int(z)
                allv = rings_ll[0] if len(rings_ll) == 1 else np.concatenate(rings_ll)
                vtx, vty = K.point_to_tile(allv[:, 0], allv[:, 1], z)
                if vtx.min() == vtx.max() and vty.min() == vty.max():
                    # fast path (the majority at z ≤ ~9 for city-scale
                    # features): every vertex (all rings) in one tile ⇒
                    # covering = that tile and the clip is the identity
                    x, y = int(vtx[0]), int(vty[0])
                    if kind == "line":
                        gx, gy = K.quantize_to_tile(allv[:, 0], allv[:, 1], z, x, y, extent)
                        gx, gy = K.dedupe_consecutive(gx, gy)
                        if gx.size < 2:
                            continue
                        geom = [np.column_stack([gx, gy]).ravel().astype(np.int32).tolist()]
                    else:
                        geom = _quantize_polygon_rings(rings_ll, z, x, y, extent)
                    if not geom:
                        continue
                    rows["z"].append(z)
                    rows["x"].append(x)
                    rows["y"].append(y)
                    rows["feature_id"].append(fid)
                    rows["kind"].append(kind)
                    rows["geom"].append(geom)
                    rows["props"].append(props)
                    continue
                if kind == "polygon":
                    tiles = K.polygon_covering_tiles(ring, z)
                else:
                    tiles = _line_covering_tiles(ring, z)
                if tiles.shape[0] == 0:
                    continue
                n_t = float(1 << z)
                west = tiles[:, 0] / n_t * 360.0 - 180.0
                east = (tiles[:, 0] + 1.0) / n_t * 360.0 - 180.0
                north = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * tiles[:, 1] / n_t))))
                south = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (tiles[:, 1] + 1.0) / n_t))))
                rings_t = [[tuple(v) for v in r] for r in rings_ll]
                for i in range(tiles.shape[0]):
                    x, y = int(tiles[i, 0]), int(tiles[i, 1])
                    if kind == "line":
                        pieces = K.clip_segments_bbox(ring, west[i], south[i], east[i], north[i])
                        geom = []
                        for p in pieces:
                            gx, gy = K.quantize_to_tile(p[:, 0], p[:, 1], z, x, y, extent)
                            gx, gy = K.dedupe_consecutive(gx, gy)
                            if gx.size < 2:
                                continue
                            geom.append(np.column_stack([gx, gy]).ravel().astype(np.int32).tolist())
                    else:
                        clipped = []
                        for rt in rings_t:
                            c = K.clip_ring_bbox_fast(rt, west[i], south[i], east[i], north[i])
                            clipped.append(np.asarray(c, dtype=np.float64).reshape(-1, 2))
                        geom = _quantize_polygon_rings(clipped, z, x, y, extent)
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

    # Explode per (feature, zoom) BEFORE the Python stage and hash-spread on
    # (feature_id, z): clip CPU varies ~1000× per feature and grows with z, so
    # fine-grained rows pack the task waves evenly (the 64-partition version
    # ran local[32] in 2 straggler-dominated waves — measured 0.5 efficiency);
    # 8× overpartitioning keeps the max wave skew ~1/8 of a wave.
    try:
        base = int(shapes.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # "auto" on AQE-managed clusters
        base = shapes.sparkSession.sparkContext.defaultParallelism
    n_parts = base * int(os.environ.get("TILEGEN_CLIP_OVERPART", "4"))
    sel = (shapes.select("feature_id", "kind", "coords", "props")
           .withColumn("_z", F.explode(F.array(*[F.lit(z) for z in zooms])))
           .repartition(n_parts, "feature_id", "_z"))
    return sel.mapInPandas(fn, CLIP_SCHEMA)


def build_tile_features(features: DataFrame, zooms: list[int],
                        salt: int = 0, extent: int = K.MVT_EXTENT) -> DataFrame:
    """EP2 pipeline: features → clipped per-tile rows → MVT-equivalent lists.

    Points take the zero-Python relational path; shapes take the single-pass
    Arrow path. Repartitioning by shape feature_id spreads big polygons."""
    pts = clip_points_relational(features.filter(F.col("kind") == "point"), zooms, extent)
    shp = clip_shapes_direct(features.filter(F.col("kind") != "point"), zooms, extent)
    return tile_feature_lists(pts.unionByName(shp), salt=salt)


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
    # Explicit repartition on the salted agg keys BEFORE grouping: without
    # it Spark fuses the partial collect_list into the upstream Python clip
    # stage, and the JVM's list buffering/GC contends with the full-core
    # Arrow workers (measured: decoupling cut the fused pipeline ~15% at
    # local[32] and removes nothing — partial collect_list doesn't shrink
    # the shuffle anyway, it only concatenates).
    two = (clipped
           .withColumn("_salt", F.pmod(F.hash("feature_id"), F.lit(salt)))
           .repartition("z", "x", "y", "_salt")
           .groupBy("z", "x", "y", "_salt")
           .agg(F.collect_list(feat).alias("_part")))
    return (two.groupBy("z", "x", "y")
            .agg(by_fid(F.flatten(F.collect_list("_part"))).alias("features"))
            .withColumn("n_features", F.size("features")))
