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
# r4 FLAT transport (VERDICT r3 "What's wrong #1"): the per-(tile, zoom) row
# that crosses Arrow and both agg exchanges carries a single flat int array
# plus ring prefix offsets — no nested array-of-arrays headers, no kind, and
# crucially no per-row copy of the feature's props map. kind/props ship ONCE
# per feature (dim join post-agg, enrich_tile_features); the nested
# array<array<int>> public view is rebuilt relationally (nest_geom).
CLIP_FLAT_SCHEMA = ("z int, x bigint, y bigint, feature_id bigint, "
                    "geom array<int>, off array<int>")

#: flat (geom, off) → the public nested array<array<int>> ring list —
#: pure Catalyst expression, no Python. r7b: off is NULL for single-piece
#: rows in BOTH transports (~90% of rows at the bench shape) — those nest
#: via ONE array(geom) wrap instead of sequence/transform/slice, and the
#: off array leaves the exchange entirely.
NEST_GEOM_EXPR = ("if(off IS NULL, array(geom), "
                  "transform(sequence(1, size(off) - 1), "
                  "i -> slice(geom, off[i-1] + 1, off[i] - off[i-1])))")

#: r5 PACKED transport decode: geom carries ONE int per VERTEX
#: ((qx << 16) | qy — lossless for extent ≤ 32767), off counts vertices and
#: is NULL for single-piece rows ([0, size] implied). Halves the geom
#: payload and drops the off array from ~85% of rows in both salted agg
#: exchanges and the Arrow crossing; the unpack back to interleaved
#: [x, y, …] ring lists is pure shift/mask inside whole-stage codegen.
PACKED_NEST_GEOM_EXPR = (
    "if(off IS NULL, "
    "array(flatten(transform(geom, v -> array(shiftright(v, 16), v & 65535)))), "
    "transform(sequence(1, size(off) - 1), "
    "i -> flatten(transform(slice(geom, off[i-1] + 1, off[i] - off[i-1]), "
    "v -> array(shiftright(v, 16), v & 65535)))))")


def geom_pack() -> bool:
    """Transport mode (TILEGEN_GEOM_PACK): resolved at PLAN BUILD time in
    the driver — producers capture it in their task closures and consumers
    pick the matching decode, so one plan is always consistent.

    r7: default flipped to UNPACKED (0). The packed decode
    (PACKED_NEST_GEOM_EXPR) pays an interpreted lambda + 2-int array alloc
    PER VERTEX (~5/row), where the unpacked decode slices PER RING
    (~1.04/row): measured on the bench agg (12.75M rows, local[32]) the
    packed tail costs 7.8-8.3 s vs 5.4-5.6 s unpacked — a 2.3 s fused
    pipeline win (16.75 → 14.5 s). The byte cost of unpacking is small
    because fixed per-row columns dominate exchange bytes (r6 byte probe:
    rows average 5 vertices; the whole r5 geom pack was worth −5%
    compressed), and the r5/r6 scaling analysis attributes the agg ceiling
    to memory bandwidth/CPU, not network — so trading ~5% exchange bytes
    for ~30% less decode CPU is the right default at cluster scale too.
    TILEGEN_GEOM_PACK=1 restores the packed transport for byte-constrained
    deployments (parity pytest pins both modes identical)."""
    return os.environ.get("TILEGEN_GEOM_PACK", "0") == "1"


def _pack_for(extent: int) -> bool:
    """Packing needs qx ≤ 32767 (int32 stays positive) and qy < 65536."""
    return geom_pack() and extent <= 32767


def nest_geom(df: DataFrame, packed: bool | None = None) -> DataFrame:
    """Replace flat (geom, off) columns with the nested CLIP_SCHEMA geom."""
    if packed is None:
        packed = geom_pack()
    expr = PACKED_NEST_GEOM_EXPR if packed else NEST_GEOM_EXPR
    return df.withColumn("geom", F.expr(expr)).drop("off")


def _by_fid(arr):
    """Deterministic per-tile order: maps aren't orderable → explicit
    comparator on the (unique-per-tile, non-null) feature id.

    r7: ``signum(l - r)`` instead of a two-branch ``when`` chain — one
    arithmetic expression per comparison instead of two interpreted
    predicates (comparators run inside the interpreted HOF evaluator,
    ~n·log n times per tile). Same ordering: ids are < 2^60 so the long
    subtraction cannot overflow. Measured on the bench agg: 11.1 → 10.0 s
    for the full agg phase (guide §1.2 per-task work)."""
    return F.array_sort(
        arr, lambda l, r: F.signum(l.feature_id - r.feature_id).cast("int"))


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
        F.expr(S.tile_x("lon", z, S.SPARK)).alias("x"),
        F.expr(S.tile_y("lat", z, S.SPARK)).alias("y")) for z in zooms]
    return (pts.select("feature_id", F.explode(F.array(*entries)).alias("t"))
            .select("feature_id", "t.z", "t.x", "t.y"))


def assign_shapes(shapes: DataFrame, zooms: list[int]) -> DataFrame:
    """G8: polygons/lines → covering tiles per zoom (Arrow-batched numpy)."""
    gcap = K.grid_cap()   # driver-resolved, shipped in the task closure

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            fid_o, z_o, x_o, y_o = [], [], [], []
            for fid, kind, coords in zip(b["feature_id"], b["kind"], b["coords"]):
                ring = np.asarray(coords[0], dtype=np.float64)
                for z in zooms:
                    if kind == "polygon":
                        tiles = K.polygon_covering_tiles(ring, z, cap=gcap)
                    else:
                        tiles = _line_covering_tiles(ring, z, cap=gcap)
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


def _line_covering_tiles(ring: np.ndarray, z: int,
                         cap: int | None = None) -> np.ndarray:
    """Tiles whose bbox a polyline touches (kernels.line_covering_tiles:
    dense grid under ``cap`` cells, O(covered) segment walk above)."""
    return K.line_covering_tiles(ring, z, cap=cap)


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
        qx = S.quantize_x("lon", f"{z}.0", S.tile_x("lon", z, S.SPARK), extent)
        qy = S.quantize_y("lat", f"{z}.0", S.tile_y("lat", z, S.SPARK), extent)
        entries.append(F.struct(
            F.lit(z).cast("int").alias("z"),
            F.expr(S.tile_x("lon", z, S.SPARK)).alias("x"),
            F.expr(S.tile_y("lat", z, S.SPARK)).alias("y"),
            F.expr(qx).alias("qx"),
            F.expr(qy).alias("qy")))
    return (pts.select("feature_id", "kind", "props",
                       F.explode(F.array(*entries)).alias("t"))
            .select("t.z", "t.x", "t.y", "feature_id", "kind",
                    F.array(F.array("t.qx", "t.qy")).alias("geom"), "props"))


def _fast_batch(b: pd.DataFrame, extent: int, pack: bool = False) -> pd.DataFrame:
    """Vectorized single-tile clip: every (feature, z) unit in this batch is
    guaranteed (by the relational corner-tile split in clip_shapes_direct) to
    fit in ONE tile at z, so the clip is the identity and the whole batch
    reduces to quantize + dedupe + winding — computed with numpy over ONE
    flat vertex array instead of per-row kernel calls (the r2 profile showed
    ~0.38 ms/row of per-call overhead; this path amortizes it to ~µs/row).

    Input columns: feature_id, kind, coords, _zs (array<int> of the
    feature's single-tile zooms). Semantics identical to the per-row loop
    (quantize_to_tile → dedupe_consecutive → closing-vertex strip →
    degenerate-ring drop → MVT winding), verified by the parity pytest.
    Output is the r4 FLAT transport (CLIP_FLAT_SCHEMA): one concatenated int
    array + ring prefix offsets, no kind/props (those rejoin post-agg).
    """
    from .clip_vec import _parts_to_pandas
    n_feat = len(b)
    empty = pd.DataFrame({
        "z": pd.Series([], dtype="int32"), "x": pd.Series([], dtype="int64"),
        "y": pd.Series([], dtype="int64"),
        "feature_id": pd.Series([], dtype="int64"),
        "geom": pd.Series([], dtype=object),
        "off": pd.Series([], dtype=object)})
    if n_feat == 0:
        return empty

    # --- flatten: rings → one (V, 2) vertex array + offset tables ---------
    ring_list: list[np.ndarray] = []
    ring_len_l: list[int] = []
    feat_ring_count = np.empty(n_feat, np.int64)
    for i, coords in enumerate(b["coords"]):
        feat_ring_count[i] = len(coords)
        for c in coords:
            a = np.asarray(c, dtype=np.float64)
            ring_list.append(a)
            ring_len_l.append(a.size // 2)
    ring_len = np.asarray(ring_len_l, np.int64)
    verts = np.concatenate(ring_list).reshape(-1, 2) if ring_list else np.zeros((0, 2))
    ring_start = np.cumsum(ring_len) - ring_len

    # --- units (feature × zoom) ---------------------------------------------
    zs_list = [np.asarray(z, np.int64) for z in b["_zs"]]
    m = np.asarray([z.size for z in zs_list], np.int64)
    unit_feat = np.repeat(np.arange(n_feat), m)
    if unit_feat.size == 0:
        return empty
    unit_z = np.concatenate(zs_list)
    parts = _fast_core(
        b["kind"].to_numpy() == "line", b["feature_id"].to_numpy(),
        feat_ring_count, ring_len, ring_start, verts, unit_feat, unit_z,
        extent, pack)
    out = _parts_to_pandas(parts, pack)
    return out if len(out) else empty


def _fast_core(is_line: np.ndarray, fids: np.ndarray,
               feat_ring_count: np.ndarray, ring_len: np.ndarray,
               ring_start: np.ndarray, verts: np.ndarray,
               unit_feat: np.ndarray, unit_z: np.ndarray, extent: int,
               pack: bool) -> list:
    """_fast_batch's array core (r7): flattened ring structures in,
    assemble_arrays part tuples out — shared by the pandas front-end above
    and the Arrow front-end (_fast_batch_arrow)."""
    from .clip_vec import assemble_arrays
    n_unit = unit_feat.size
    feat_first_ring = np.concatenate([[0], np.cumsum(feat_ring_count)])
    inst_per_unit = feat_ring_count[unit_feat]
    inst_unit = np.repeat(np.arange(n_unit), inst_per_unit)
    tot_inst = inst_unit.size
    ring_ord = np.arange(tot_inst) - np.repeat(
        np.cumsum(inst_per_unit) - inst_per_unit, inst_per_unit)
    inst_ring = feat_first_ring[unit_feat[inst_unit]] + ring_ord

    # --- tile id per unit: vertex 0 of ring 0 (single-tile ⇒ any vertex) --
    nz = np.power(2.0, unit_z.astype(np.float64))
    v0 = ring_start[feat_first_ring[unit_feat]]
    lon0 = verts[v0, 0]
    lat0 = np.clip(verts[v0, 1], -K.MAX_LAT, K.MAX_LAT)
    tx = np.clip(np.floor((lon0 + 180.0) / 360.0 * nz), 0, nz - 1).astype(np.int64)
    l0r = np.radians(lat0)
    ty = np.clip(np.floor(
        (1.0 - np.log(np.tan(l0r) + 1.0 / np.cos(l0r)) / np.pi) / 2.0 * nz),
        0, nz - 1).astype(np.int64)

    # --- quantize every vertex of every instance (kernels.quantize_to_tile
    # formula, elementwise z/x/y) -------------------------------------------
    L = ring_len[inst_ring]
    V = int(L.sum())
    starts = ring_start[inst_ring]
    off = np.arange(V) - np.repeat(np.cumsum(L) - L, L)
    vidx = np.repeat(starts, L) + off
    vlon = verts[vidx, 0]
    vlat = np.clip(verts[vidx, 1], -K.MAX_LAT, K.MAX_LAT)
    n_v = np.repeat(nz[inst_unit], L)
    fx = (vlon + 180.0) / 360.0 * n_v - np.repeat(tx[inst_unit].astype(np.float64), L)
    vlr = np.radians(vlat)
    fy = ((1.0 - np.log(np.tan(vlr) + 1.0 / np.cos(vlr)) / np.pi) / 2.0 * n_v
          - np.repeat(ty[inst_unit].astype(np.float64), L))
    qx = np.clip(np.floor(fx * extent + 0.5).astype(np.int64), 0, extent)
    qy = np.clip(np.floor(fy * extent + 0.5).astype(np.int64), 0, extent)

    # --- dedupe consecutive (per instance) ---------------------------------
    inst_vstart = np.cumsum(L) - L
    v_inst = np.repeat(np.arange(tot_inst), L)
    keep = np.zeros(V, dtype=bool)
    keep[inst_vstart[L > 0]] = True
    keep[1:] |= (qx[1:] != qx[:-1]) | (qy[1:] != qy[:-1])
    qx2, qy2 = qx[keep], qy[keep]
    # bincount (not reduceat): stays correct for zero-length instances
    L2 = np.bincount(v_inst, weights=keep, minlength=tot_inst).astype(np.int64)
    S2 = np.cumsum(L2) - L2

    # --- closing-vertex strip (polygons only) ------------------------------
    inst_is_poly = ~is_line[unit_feat[inst_unit]]
    last2 = S2 + L2 - 1
    if qx2.size:
        hi = qx2.size - 1
        sS, sE = np.minimum(S2, hi), np.clip(last2, 0, hi)
        closed = (inst_is_poly & (L2 >= 2)
                  & (qx2[sS] == qx2[sE]) & (qy2[sS] == qy2[sE]))
    else:
        closed = np.zeros(tot_inst, dtype=bool)
    keep2 = np.ones(qx2.size, dtype=bool)
    keep2[last2[closed]] = False
    qx3, qy3 = qx2[keep2], qy2[keep2]
    L3 = L2 - closed
    S3 = np.cumsum(L3) - L3

    # --- shoelace area per instance (exact in float64: |terms| < 2^26) -----
    nxt = np.arange(qx3.size) + 1
    last3 = S3 + L3 - 1
    nz3 = L3 > 0
    nxt[last3[nz3]] = S3[nz3]
    x3f = qx3.astype(np.float64)
    y3f = qy3.astype(np.float64)
    cross = x3f * y3f[nxt] - x3f[nxt] * y3f
    inst3 = np.repeat(np.arange(tot_inst), L3)
    area2 = np.bincount(inst3, weights=cross, minlength=tot_inst)
    area2[L3 < 3] = 0.0

    # --- validity + winding (MVT 2.1 §4.3.3.3) ------------------------------
    poly_ok = inst_is_poly & (L3 >= 3) & (area2 != 0.0)
    line_ok = ~inst_is_poly & (L3 >= 2)
    ext_dead = inst_is_poly & (ring_ord == 0) & ~poly_ok
    unit_dead = np.zeros(n_unit, dtype=bool)
    unit_dead[inst_unit[ext_dead]] = True
    inst_keep = (poly_ok | line_ok) & ~unit_dead[inst_unit]
    flip = poly_ok & ((area2 > 0.0) != (ring_ord == 0))

    # --- assemble (flat geom + prefix offsets; packed mode: one (qx<<16|qy)
    # int per vertex, off NULL when single-piece) — array buffers out
    return [assemble_arrays(qx3, qy3, S3, L3, inst_keep, flip, inst_unit,
                            unit_z, tx, ty, fids[unit_feat], pack=pack)]


def _fast_batch_arrow(rb, extent: int, pack: bool = False):
    """Arrow twin of _fast_batch (guide §4.2): ring structures straight from
    the ListArray buffers (no per-row Python lists, no closing strip, lines
    keep all rings — exactly the pandas flatten), output RecordBatches from
    the assemble buffers."""
    from .clip_vec import decode_clip_rings, parts_to_batches
    if rb.num_rows == 0:
        return []
    import pyarrow.compute as pc
    (is_line, ring_len, ring_start, verts, feat_ring_count, _ffr,
     _raw) = decode_clip_rings(rb, strip=False)
    fids = np.asarray(rb.column(rb.schema.names.index("feature_id"))).astype(np.int64)
    zs_col = rb.column(rb.schema.names.index("_zs"))
    m = np.asarray(pc.list_value_length(zs_col)).astype(np.int64)
    unit_z = np.asarray(pc.list_flatten(zs_col)).astype(np.int64)
    unit_feat = np.repeat(np.arange(rb.num_rows), m)
    if unit_feat.size == 0:
        return []
    parts = _fast_core(is_line, fids, feat_ring_count, ring_len, ring_start,
                       verts, unit_feat, unit_z, extent, pack)
    return parts_to_batches(parts, pack)


def _n_clip_parts(df: DataFrame) -> int:
    try:
        base = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # "auto" on AQE-managed clusters
        base = df.sparkSession.sparkContext.defaultParallelism
    return base * int(os.environ.get("TILEGEN_CLIP_OVERPART", "4"))


def clip_shapes_direct(shapes: DataFrame, zooms: list[int],
                       extent: int = K.MVT_EXTENT) -> DataFrame:
    """Fused covering+clip+quantize for lines/polygons — ONE Arrow crossing,
    no assignments join (each feature's coords cross the boundary once instead
    of once per covering tile; at z≤12 a large polygon covers 10³ tiles, so
    this is a ~650× reduction in shuffled bytes for the synthetic corpus).

    Zoom split (r3): a relational corner-tile test (same G2 SQL text as the
    point path) partitions each feature's zooms into SINGLE-TILE zooms
    (bbox corners share a tile ⇒ the clip is the identity — the vectorized
    _fast_batch handles thousands of rows per numpy call and ships coords
    ONCE per feature instead of once per zoom) and MULTI-TILE zooms (the
    per-(feature,z) covering+clip loop below). Monotonicity makes the split
    exact: if the bbox fits one tile at z it fits at every z' < z."""
    gcap = K.grid_cap()   # driver-resolved, shipped in the task closure

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
                    tiles = K.polygon_covering_tiles(ring, z, cap=gcap)
                else:
                    tiles = _line_covering_tiles(ring, z, cap=gcap)
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

    if os.environ.get("TILEGEN_FASTPATH", "1") == "0":
        # escape hatch + parity-test reference: the pre-r3 single path
        # (per-row kernel loop, nested CLIP_SCHEMA built directly in Python)
        sel = (shapes.select("feature_id", "kind", "coords", "props")
               .withColumn("_z", F.explode(F.array(*[F.lit(z) for z in zooms])))
               .repartition(_n_clip_parts(shapes), "feature_id", "_z"))
        return sel.mapInPandas(fn, CLIP_SCHEMA)

    # production path: flat core + relational nested view + per-FEATURE
    # kind/props rejoin (parity pytest compares this whole composition —
    # flat kernels AND reconstruction — against the per-row loop above).
    # The dim join follows the TILEGEN_BROADCAST_DIM policy (default
    # broadcast: without the hint Catalyst planned a wide shuffle join AND
    # re-ran the shapes lineage scan on the dim side — ADVICE r4 #3)
    pack = _pack_for(extent)
    flat = clip_shapes_flat(shapes, zooms, extent, pack=pack)
    dim = _dim_join_side(shapes.select("feature_id", "kind", "props"), None)
    return (nest_geom(flat, packed=pack).join(dim, "feature_id")
            .select("z", "x", "y", "feature_id", "kind", "geom", "props"))


def clip_shapes_flat(shapes: DataFrame, zooms: list[int],
                     extent: int = K.MVT_EXTENT,
                     pack: bool | None = None) -> DataFrame:
    """clip_shapes_direct's flat core (CLIP_FLAT_SCHEMA): what actually
    crosses Arrow and the downstream agg exchanges. No kind/props columns,
    geom as ONE flat int array + ring prefix offsets (``pack``: one
    (qx<<16|qy) int per vertex, NULL off for single-piece rows)."""
    if pack is None:
        pack = _pack_for(extent)
    # Explode per (feature, zoom) BEFORE the Python stage and hash-spread on
    # (feature_id, z): clip CPU varies ~1000× per feature and grows with z, so
    # fine-grained rows pack the task waves evenly (the 64-partition version
    # ran local[32] in 2 straggler-dominated waves — measured 0.5 efficiency);
    # 8× overpartitioning keeps the max wave skew ~1/8 of a wave.
    n_parts = _n_clip_parts(shapes)

    # relational zoom split: bbox corner tiles (same G2 SQL text as the point
    # path, so the split can never disagree with the kernels) — zero Python.
    #
    # r7 (the round's biggest pipeline find): the bbox min/max are
    # interpreted higher-order functions (CodegenFallback, no subexpression
    # elimination), and CollapseProject used to INLINE their aliases into
    # every one of the 13 corner-tile conds × 4 references × both branches —
    # re-walking each feature's coord arrays ~50-100× per row. Measured:
    # noop of the fast branch alone cost 68 s at local[32] with the inlined
    # form. The fix is a materialization BARRIER: evaluate the four HOFs
    # once per feature, then repartition — the exchange materializes them as
    # plain double columns CollapseProject cannot reach through, and it
    # doubles as the fast branch's wave-balancing spread (hash(feature_id),
    # same n_parts as before) while both branches now REUSE one exchange
    # (guide §2.4 "two operations keyed the same way share one exchange").
    # The per-z conds downstream are scalar floor/trig — cheap even where
    # the _zs/_st HOF lambdas re-evaluate them per element. (The pre-r7
    # "head repartition measured slower" note referred to a repartition IN
    # ADDITION to per-branch exchanges, not this replacement of them.)
    conds = [F.expr(
        f"({S.tile_x('_minlon', z, S.SPARK)}) = ({S.tile_x('_maxlon', z, S.SPARK)}) AND "
        f"({S.tile_y('_maxlat', z, S.SPARK)}) = ({S.tile_y('_minlat', z, S.SPARK)})")
        for z in zooms]
    bbox_cols = ("_minlon", "_maxlon", "_minlat", "_maxlat")
    if set(bbox_cols).issubset(shapes.columns):
        # r7: the extract stage already computed the all-rings bbox in
        # Python (extract.FEATURES_BBOX_SCHEMA) — the 4 interpreted HOF
        # walks below cost 91 CPU-s / 208 µs-per-feature at the bench shape
        # (the hottest JVM stage of the clip, UI stage metrics); here they
        # collapse to plain column reads. Exact same float64 values on
        # NaN-free input (validity_filter runs upstream in every pipeline).
        sel = shapes.select("feature_id", "kind", "coords", *bbox_cols)
    else:
        # fallback for bare FEATURES_SCHEMA inputs (parse_geo_features,
        # tests): relational bbox via higher-order functions
        flat = F.flatten(F.col("coords"))
        xs = F.filter(F.transform(flat, lambda v, i: F.when(i % 2 == 0, v)),
                      lambda v: v.isNotNull())
        ys = F.filter(F.transform(flat, lambda v, i: F.when(i % 2 == 1, v)),
                      lambda v: v.isNotNull())
        sel = shapes.select("feature_id", "kind", "coords",
                            F.array_min(xs).alias("_minlon"),
                            F.array_max(xs).alias("_maxlon"),
                            F.array_min(ys).alias("_minlat"),
                            F.array_max(ys).alias("_maxlat"))
    base_df = (sel
               .repartition(n_parts, "feature_id")   # ← HOF barrier + spread
               .withColumn("_zarr", F.array(*[F.lit(z).cast("int") for z in zooms]))
               .withColumn("_st", F.array(*conds)))

    # coords ship ONCE per feature (not once per zoom); per-feature fast
    # work is O(verts × |_zs|) with low variance, and the barrier exchange
    # above already hash-spread by feature_id — no further exchange needed.
    #
    # r7: the zoom lists are selected with zip_with(_zarr, _st, …) rather
    # than filter(_zarr, (z, i) -> _st[i]) — a lambda that REFERENCES _st
    # gets the whole 13-cond array inlined into the lambda body and
    # re-evaluated per element (13 × 13 = 169 interpreted trig-cond evals
    # per row, measured ~63 s on the fast branch alone); as a zip_with
    # ARGUMENT the cond array is evaluated once per row. Zooms are ≥ 0 so
    # -1 is a safe sentinel.
    fast = (base_df
            .select("feature_id", "kind", "coords",
                    F.expr("filter(zip_with(_zarr, _st, (z, s) -> if(s, z, -1)), "
                           "v -> v >= 0)").alias("_zs"))
            .filter(F.size("_zs") > 0))
    # r7: Arrow-native crossing (guide §4.2) — ring buffers decoded and
    # rebuilt as ListArray (values, offsets) pairs with zero per-row Python;
    # TILEGEN_CLIP_ARROW=0 restores the pandas front-ends for A/B.
    use_arrow = os.environ.get("TILEGEN_CLIP_ARROW", "1") == "1"
    if use_arrow:
        fast_out = fast.mapInArrow(
            lambda batches: (out for rb in batches
                             for out in _fast_batch_arrow(rb, extent, pack)),
            CLIP_FLAT_SCHEMA)
    else:
        fast_out = fast.mapInPandas(
            lambda batches: (_fast_batch(bt, extent, pack) for bt in batches),
            CLIP_FLAT_SCHEMA)

    from .clip_vec import slow_batch
    # The (feature_id, _z) re-spread ships coords once per multi-tile zoom
    # (~3.4× the barrier's bytes — 143 vs 42 MB). An r7 ABBA A/B of dropping
    # it (inheriting the barrier's hash(feature_id) spread) measured −0.5 s
    # on the isolated slow branch but parity within noise (17.7 vs 18.0 s)
    # on the fused pipeline — kept for its per-(feature, zoom) granularity,
    # which bounds the straggler a single covering-heavy feature can create
    # at corpus scales where one polygon's zoom set is a whole task's work.
    slow = (base_df
            .select("feature_id", "kind", "coords",
                    F.explode(F.expr(
                        "filter(zip_with(_zarr, _st, (z, s) -> if(s, -1, z)), "
                        "v -> v >= 0)")).alias("_z"))
            .repartition(n_parts, "feature_id", "_z"))
    gcap = K.grid_cap()   # driver-resolved, shipped in the task closure
    if use_arrow:
        from .clip_vec import slow_batch_arrow
        slow_out = slow.mapInArrow(
            lambda batches: (out for rb in batches
                             for out in slow_batch_arrow(
                                 rb, extent, pack=pack, gcap=gcap)),
            CLIP_FLAT_SCHEMA)
    else:
        slow_out = slow.mapInPandas(
            lambda batches: (slow_batch(bt, extent, pack=pack, gcap=gcap)
                             for bt in batches),
            CLIP_FLAT_SCHEMA)
    return fast_out.unionByName(slow_out)


def clip_points_flat(points: DataFrame, zooms: list[int],
                     extent: int = K.MVT_EXTENT,
                     pack: bool | None = None) -> DataFrame:
    """clip_points_relational's flat twin (CLIP_FLAT_SCHEMA) — still pure
    Spark SQL, zero Python; geom = [qx, qy] (packed: [(qx<<16)|qy], off
    NULL), off = [0, 2].

    r7 (guide §1.2 per-task work, same restructure as the r7
    q_tile_assign_multizoom): the per-row tile FRACTIONS
    fx = (lon+180)/360 and fy = (1 − merc/π)/2 are zoom-independent, so the
    ln/tan/cos mercator trig runs ONCE per point instead of once per zoom
    (the 13-entry struct array evaluated tile_y's transcendentals 13× and
    quantize_y's another 13×). Per zoom, x = clamp(floor(fx·n)) and
    qx = clamp(floor((fx·n − x)·extent + 0.5)) are pure arithmetic on the
    fractions. Bit-identical by construction: sqlgen.tile_x/quantize_x parse
    as ((lon+180)/360)·n, so fx·n (and fy·pow(2,z), a power of two, exact)
    is the same float64 sequence — pinned by the fixture byte-identity and
    fastpath parity pytests. The fractions are computed in a projection
    BELOW the explode, so they are attributes (not inlined copies) inside
    the generator's 13 structs."""
    if pack is None:
        pack = _pack_for(extent)
    pts = with_lonlat(points).select("feature_id", "lon", "lat")
    la = S.clamped_lat("lat")
    merc = f"ln(tan(radians({la})) + 1.0 / cos(radians({la})))"
    frac = pts.select(
        "feature_id",
        F.expr("((lon) + 180.0) / 360.0").alias("_fx"),
        F.expr(f"(1.0 - {merc} / pi()) / 2.0").alias("_fy"))
    entries = []
    for z in zooms:
        # r7b: BIGINT clamp bounds (floor is BIGINT in Spark; the 0.0 /
        # {n-1}.0 decimal literals ran the clamp in DECIMAL(21,1)) —
        # identical values, see sqlgen.tile_x(SPARK).
        n = 1 << z
        tx = (f"least(greatest(floor(_fx * {n}.0), CAST(0 AS BIGINT)), "
              f"CAST({n - 1} AS BIGINT))")
        ty = (f"least(greatest(floor(_fy * {n}.0), CAST(0 AS BIGINT)), "
              f"CAST({n - 1} AS BIGINT))")
        qx = (f"CAST(least(greatest(floor((_fx * pow(2.0, {z}.0) - ({tx})) "
              f"* {extent}.0 + 0.5), CAST(0 AS BIGINT)), CAST({extent} AS BIGINT)) AS INT)")
        qy = (f"CAST(least(greatest(floor((_fy * pow(2.0, {z}.0) - ({ty})) "
              f"* {extent}.0 + 0.5), CAST(0 AS BIGINT)), CAST({extent} AS BIGINT)) AS INT)")
        entries.append(F.struct(
            F.lit(z).cast("int").alias("z"),
            F.expr(tx).alias("x"),
            F.expr(ty).alias("y"),
            F.expr(qx).alias("qx"),
            F.expr(qy).alias("qy")))
    ex = frac.select("feature_id", F.explode(F.array(*entries)).alias("t"))
    if pack:
        return ex.select(
            "t.z", "t.x", "t.y", "feature_id",
            F.expr("array(shiftleft(CAST(t.qx AS INT), 16) | CAST(t.qy AS INT))")
            .alias("geom"),
            F.lit(None).cast("array<int>").alias("off"))
    return ex.select("t.z", "t.x", "t.y", "feature_id",
                     F.array("t.qx", "t.qy").cast("array<int>").alias("geom"),
                     F.lit(None).cast("array<int>").alias("off"))


#: inline-mode finisher: rebuild the public nested struct from the flat agg
#: output in ONE Catalyst projection (no explode, no join, no re-agg).
INLINE_NEST_EXPR = (
    "transform(features, f -> named_struct("
    "'feature_id', f.feature_id, 'kind', f.kind, "
    "'geom', if(f.off IS NULL, array(f.geom), "
    "transform(sequence(1, size(f.off) - 1), "
    "i -> slice(f.geom, f.off[i-1] + 1, f.off[i] - f.off[i-1]))), "
    "'props', f.props))")

PACKED_INLINE_NEST_EXPR = (
    "transform(features, f -> named_struct("
    "'feature_id', f.feature_id, 'kind', f.kind, "
    "'geom', if(f.off IS NULL, "
    "array(flatten(transform(f.geom, v -> array(shiftright(v, 16), v & 65535)))), "
    "transform(sequence(1, size(f.off) - 1), "
    "i -> flatten(transform(slice(f.geom, f.off[i-1] + 1, f.off[i] - f.off[i-1]), "
    "v -> array(shiftright(v, 16), v & 65535))))), "
    "'props', f.props))")


def _dim_join_side(dim: DataFrame, broadcast_dim: bool | None) -> DataFrame:
    """Resolve how the per-feature kind/props dim enters a join:
    True → force broadcast (bypasses autoBroadcastJoinThreshold — right when
    the dim is known to fit executor memory, the measured local default);
    False → unhinted, so Catalyst/AQE picks broadcast vs shuffle from the
    dim's actual size — the non-code escape hatch for O(total features) dims
    with wide props at cluster scale (ADVICE r4 #1). When None, the
    TILEGEN_BROADCAST_DIM env (1|0|auto; unset → 1) decides."""
    if broadcast_dim is None:
        v = os.environ.get("TILEGEN_BROADCAST_DIM", "1").strip().lower()
        broadcast_dim = v in ("1", "true", "yes")
    return F.broadcast(dim) if broadcast_dim else dim


def build_tile_features(features: DataFrame, zooms: list[int],
                        salt: int = 0, extent: int = K.MVT_EXTENT,
                        props_mode: str | None = None,
                        broadcast_dim: bool | None = None) -> DataFrame:
    """EP2 pipeline: features → clipped per-tile rows → MVT-equivalent lists.

    Points take the zero-Python relational path; shapes take the single-pass
    Arrow path. r4: the whole clip→agg pipeline runs on the FLAT transport
    (geom as one flat int array + ring offsets — no nested-array headers in
    Arrow or the shuffles); the public nested schema is rebuilt relationally
    at the end. ``props_mode`` picks how kind/props travel (both measured,
    both exact — see BENCH/BASELINE.md):

    - ``"inline"``: a map-side broadcast dim join attaches kind/props to
      the flat rows AFTER the Arrow clip (they never cross Python) but
      BEFORE the agg, so they ride both salted exchanges; the nested view is
      then ONE projection (INLINE_NEST_EXPR) — no second aggregation. Best
      when props are small relative to geometry.
    - ``"dim"`` (default): kind/props never enter any exchange — the salted
      partial collect runs on (feature_id, geom, off) only and the dim joins
      BETWEEN the last exchange and the single full-width collect
      (tile_feature_lists_dim; partitioning-preserving, zero added
      shuffles). Minimum shuffle bytes AND one full collect — wins when
      props are WIDE (real-world tags) or the agg is shuffle-bound.
    - ``"dim2"`` (measured alternative, kept selectable): lean agg
      end-to-end, then enrich_tile_features re-collects post-agg (explode →
      dim join → re-agg) — a second full-width collect, measured slower.
    ``broadcast_dim``: True forces the kind/props dim broadcast, False
    leaves the join unhinted (AQE sizes it), None reads
    TILEGEN_BROADCAST_DIM (the huge-dim escape hatch, no code change).
    TILEGEN_FASTPATH=0 falls back to the fully nested reference pipeline."""
    if os.environ.get("TILEGEN_FASTPATH", "1") == "0":
        pts = clip_points_relational(features.filter(F.col("kind") == "point"), zooms, extent)
        shp = clip_shapes_direct(features.filter(F.col("kind") != "point"), zooms, extent)
        return tile_feature_lists(pts.unionByName(shp), salt=salt)
    props_mode = props_mode or os.environ.get("TILEGEN_PROPS_MODE", "dim")
    pack = _pack_for(extent)
    pts = clip_points_flat(features.filter(F.col("kind") == "point"), zooms,
                           extent, pack=pack)
    shp = clip_shapes_flat(features.filter(F.col("kind") != "point"), zooms,
                           extent, pack=pack)
    flat = pts.unionByName(shp)
    dim = features.select("feature_id", "kind", "props")
    if props_mode == "inline":
        enriched = flat.join(_dim_join_side(dim, broadcast_dim), "feature_id")
        tiled = tile_feature_lists_flat(enriched, salt=salt,
                                        extra=("kind", "props"))
        return tiled.withColumn("features", F.expr(
            PACKED_INLINE_NEST_EXPR if pack else INLINE_NEST_EXPR))
    if props_mode == "dim2":
        # measured alternative kept for reference: lean agg end-to-end, then
        # a full post-agg re-collect (enrich_tile_features)
        tiled = tile_feature_lists_flat(flat, salt=salt)
        return enrich_tile_features(tiled, dim, broadcast_dim=broadcast_dim,
                                    packed=pack)
    return tile_feature_lists_dim(flat, dim, salt=salt,
                                  broadcast_dim=broadcast_dim, packed=pack,
                                  pack_key=key_pack() and max(zooms) <= 29)


#: r6 packed tile key: (z,x,y) as ONE bigint through the agg exchanges.
#: The r6 byte probe (BENCH/BASELINE.md) showed exchange rows average only
#: ~5 vertices, so the FIXED per-row columns dominate the shuffled bytes:
#: in UnsafeRow terms z+x+y cost 24 bytes/row where one long costs 8.
#: Valid for z ≤ 29 (6-bit z, 29-bit x/y — beyond any web-tile zoom);
#: build_tile_features guards on max(zooms).
_TXY_PACK = "(CAST(z AS BIGINT) << 58) | (x << 29) | y"
_TXY_MASK = (1 << 29) - 1


def key_pack() -> bool:
    """Tile-key transport mode (TILEGEN_KEY_PACK, default 1) — resolved at
    plan-build time in the driver, like geom_pack()."""
    return os.environ.get("TILEGEN_KEY_PACK", "1") == "1"


#: public per-tile schema produced by the Arrow tile builder (identical to
#: the JVM finish() path's schema, column-for-column and field-for-field)
TILE_LISTS_SCHEMA = (
    "z int, x bigint, y bigint, "
    "features array<struct<feature_id:bigint,kind:string,"
    "geom:array<array<int>>,props:map<string,string>>>, n_features int")


def _tile_rows_arrow():
    """r7 (guide §4.2): the post-exchange tail of the dim-mode aggregation —
    packed-geom unpack/nest, per-tile collect, feature_id sort — as ONE
    vectorized Arrow pass instead of JVM interpreted expressions.

    The JVM tail was measured (noop-isolated, bench shape, 12.75M rows):
    PACKED_NEST_GEOM_EXPR ≈ 2.9 s (transform/flatten are CodegenFallback —
    interpreted lambda eval + a 2-int array alloc per vertex), collect_list
    + interpreted-comparator array_sort ≈ 2.5 s. Here the same work is one
    np.lexsort over the partition, one take per column, and ListArray
    re-assembly over the flat int buffer (shift/mask on the whole vertex
    array at once). Correct by the exchange's contract: the input is
    hash-partitioned on _txy, so every row of a tile is in exactly one
    partition, and batches are accumulated per partition before grouping.
    Feature order inside a tile is ascending feature_id — exactly _by_fid
    (ids are unique per tile, so the sort is total either way).
    """
    import pyarrow as pa
    mask = _TXY_MASK

    def _one(col):
        c = col.combine_chunks()
        return c.chunk(0) if isinstance(c, pa.ChunkedArray) else c

    def fn(batches):
        bl = list(batches)
        if not bl:
            return
        tb = pa.Table.from_batches(bl)
        n = tb.num_rows
        if n == 0:
            return
        txy = tb.column("_txy").to_numpy(zero_copy_only=False)
        fid = tb.column("feature_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((fid, txy))
        ts = tb.take(pa.array(order, type=pa.int64()))
        txy_s = txy[order]
        fid_s = np.ascontiguousarray(fid[order])
        geom = _one(ts.column("geom"))
        offc = _one(ts.column("off"))
        kind_a = _one(ts.column("kind"))
        props_a = _one(ts.column("props"))
        # --- ring structure from the (geom, off) flat transport -----------
        gl = np.diff(geom.offsets.to_numpy(zero_copy_only=False))
        vals = geom.flatten().to_numpy(zero_copy_only=False).astype(
            np.int32, copy=False)
        off_null = pa.compute.is_null(offc).to_numpy(zero_copy_only=False)
        off_len = np.diff(offc.offsets.to_numpy(zero_copy_only=False))
        ofv = offc.flatten().to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        # rings per row: NULL off ⇒ single piece; else len(off)-1 slices
        rc = np.where(off_null, 1, np.maximum(off_len - 1, 0)).astype(np.int64)
        n_rings = int(rc.sum())
        ring_start = np.cumsum(rc) - rc
        rv = np.zeros(n_rings, dtype=np.int64)      # vertices per ring
        if off_null.any():
            rv[ring_start[off_null]] = gl[off_null]
        nn = ~off_null
        if nn.any() and ofv.size > 1:
            d = np.diff(ofv)
            keep = np.ones(ofv.size - 1, dtype=bool)
            ends = np.cumsum(off_len[nn])
            keep[ends[:-1] - 1] = False             # drop cross-row diffs
            from .clip_vec import _gather
            rv[_gather(ring_start[nn], rc[nn])] = d[keep]
        # --- unpack (qx<<16)|qy → interleaved [x, y, …] ints --------------
        qx = vals >> 16
        qy = np.bitwise_and(vals, np.int32(0xFFFF))
        inter = np.empty(vals.size * 2, dtype=np.int32)
        inter[0::2] = qx
        inter[1::2] = qy
        inner_off = np.zeros(n_rings + 1, dtype=np.int32)
        np.cumsum(2 * rv, out=inner_off[1:])
        outer_off = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(rc, out=outer_off[1:])
        ring_arr = pa.ListArray.from_arrays(
            pa.array(inner_off, type=pa.int32()),
            pa.array(inter, type=pa.int32()))
        geom_nested = pa.ListArray.from_arrays(
            pa.array(outer_off, type=pa.int32()), ring_arr)
        feat_struct = pa.StructArray.from_arrays(
            [pa.array(fid_s, type=pa.int64()), kind_a, geom_nested, props_a],
            names=["feature_id", "kind", "geom", "props"])
        # --- tile boundaries over the sorted keys -------------------------
        brk = np.nonzero(np.diff(txy_s))[0]
        tstart = np.concatenate(([0], brk + 1))
        counts = np.diff(np.concatenate((tstart, [n])))
        toff = np.zeros(tstart.size + 1, dtype=np.int32)
        np.cumsum(counts, out=toff[1:])
        features = pa.ListArray.from_arrays(
            pa.array(toff, type=pa.int32()), feat_struct)
        txy_t = txy_s[tstart]
        yield pa.RecordBatch.from_arrays(
            [pa.array((txy_t >> 58).astype(np.int32), type=pa.int32()),
             pa.array((txy_t >> 29) & mask, type=pa.int64()),
             pa.array(txy_t & mask, type=pa.int64()),
             features,
             pa.array(counts.astype(np.int32), type=pa.int32())],
            names=["z", "x", "y", "features", "n_features"])

    return fn


def tile_feature_lists_dim(clipped: DataFrame, dim: DataFrame, salt: int = 0,
                           broadcast_dim: bool | None = None,
                           packed: bool | None = None,
                           pack_key: bool | None = None) -> DataFrame:
    """A1/A2 with the props dim joined AFTER the last exchange (default
    props_mode="dim"): kind/props never enter ANY shuffle, and — unlike the
    post-agg enrich variant — there is exactly ONE full-width collect.

    Shape (r7): ONE exchange — repartition(n, key) → broadcast kind/props
    join + relational geom re-nesting (both preserve the hash(key)
    partitioning, so the final groupBy adds NO exchange) → single sorted
    full collect.

    r7 (guide §2.4 "remove shuffles outright"): the previous salted
    two-phase shape [partial collect per (key,salt) → second exchange →
    EXPLODE partials back to rows] was measured pure overhead in THIS
    variant: because the nest/join/sort must run per ROW, phase 2 exploded
    the partials right back, so every stage downstream of the second
    exchange — including all of a hot tile's per-row work — ran in one
    task EXACTLY as it does with a single hash(key) exchange. The salt
    spread nothing that stayed spread; it only bought a second full-geometry
    shuffle (+ phase-1 list building). Measured: 15.2 → 10.0 s for the agg
    phase at the bench shape, identical rows (the salted-vs-unsalted parity
    pytest covers this by construction). ``salt`` is kept in the signature
    (callers pass it for the flat/nested variants, where phase 2 merges
    LISTS without exploding) and ignored here; TILEGEN_DIM_TWOPHASE=1
    restores the pre-r7 shape for A/B.

    ``pack_key`` (None → TILEGEN_KEY_PACK, default on; requires z ≤ 29):
    the tile key through the exchange is ONE packed bigint instead of
    (z int, x, y bigint) — −16 UnsafeRow bytes on every exchange row, with
    the unpack a post-agg projection on one row per TILE (so partitioning
    propagation never sees the unpacked columns and no exchange is added).
    ``broadcast_dim=False`` leaves the join unhinted — AQE picks a shuffle
    join for dims too big to broadcast (adds that join's exchange only);
    None reads TILEGEN_BROADCAST_DIM (default: force broadcast).
    """
    # r7 (ADVICE r6): a direct caller with z > 29 used to get silently
    # corrupted packed keys (x bits overflow into the z field). When the
    # caller did NOT certify the zoom range by passing pack_key explicitly
    # (build_tile_features passes key_pack() and max(zooms) <= 29), the
    # pack expression carries an in-plan guard — one int compare per row —
    # that raises instead of corrupting.
    guarded = pack_key is None
    if pack_key is None:
        pack_key = key_pack()
    d = _dim_join_side(dim.select("feature_id", "kind", "props"), broadcast_dim)
    spark = clipped.sparkSession
    try:
        n_agg = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_agg = spark.sparkContext.defaultParallelism
    # r7: overpartition the agg exchange like the clip (TILEGEN_AGG_OVERPART,
    # default 4× shuffle.partitions — scale-proportional, AQE-exempt):
    # smaller per-task collect state packs the waves evenly around the hot
    # low-z mega-tiles and cuts GC pressure. In-session A/B at the bench
    # shape: ×1 = 8.7 s, ×4 = 6.5 s, ×8 = 6.5 s for the agg phase (×2 = 11.7
    # — a reproducible hash-collision pathology at 128, avoided).
    n_agg *= int(os.environ.get("TILEGEN_AGG_OVERPART", "4"))

    keys = ["_txy"] if pack_key else ["z", "x", "y"]
    pack_expr = (_TXY_PACK if not guarded else
                 "(CAST(IF(z <= 29, z, CAST(raise_error("
                 "'tile_feature_lists_dim: packed tile key requires z <= 29; "
                 "pass pack_key=False for deeper zooms') AS INT)) AS BIGINT) "
                 "<< 58) | (x << 29) | y")
    src = (clipped.select(F.expr(pack_expr).alias("_txy"),
                          "feature_id", "geom", "off")
           if pack_key else clipped)

    # r7 Arrow tail (TILEGEN_AGG_ARROW, default OFF — a committed NEGATIVE
    # result): the post-exchange tail (unpack/nest, per-tile collect, sort)
    # as one vectorized Arrow pass. Bit-identical to the JVM tail (parity
    # pytest) but measured SLOWER fused (17.9 s pipeline vs 16.75 packed-JVM
    # vs 14.5 unpacked-JVM): the win inside the pass (~1 s of numpy vs
    # ~5.4 s of interpreted nest + collect/sort) is more than repaid by
    # moving 12.75M rows of kind/props maps across Arrow and converting the
    # deep nested output back to UnsafeRows. Kept selectable for profiling,
    # and as the reference that the JVM tail's remaining cost is boundary-
    # bound, not compute-bound. Requires the packed geom transport.
    if (pack_key and (packed if packed is not None else geom_pack())
            and os.environ.get("TILEGEN_AGG_ARROW", "0") == "1"
            and os.environ.get("TILEGEN_DIM_TWOPHASE", "0") != "1"):
        joined = (src.repartition(n_agg, "_txy")
                  .join(d, "feature_id", "left")
                  .select("_txy", "feature_id", "geom", "off", "kind",
                          "props"))
        return joined.mapInArrow(_tile_rows_arrow(), TILE_LISTS_SCHEMA)

    def finish(rows: DataFrame) -> DataFrame:
        full = (nest_geom(rows, packed=packed).join(d, "feature_id", "left")
                .select(*keys,
                        F.struct("feature_id", "kind", "geom", "props").alias("f")))
        agged = (full.groupBy(*keys)
                 .agg(_by_fid(F.collect_list("f")).alias("features"))
                 .withColumn("n_features", F.size("features")))
        if not pack_key:
            return agged
        # unpack on one row per TILE, after the last exchange and agg
        return agged.select(
            F.expr("CAST(shiftright(_txy, 58) AS INT)").alias("z"),
            F.expr(f"shiftright(_txy, 29) & {_TXY_MASK}").alias("x"),
            F.expr(f"_txy & {_TXY_MASK}").alias("y"),
            "features", "n_features")

    if salt <= 1 or os.environ.get("TILEGEN_DIM_TWOPHASE", "0") != "1":
        return finish(src.repartition(n_agg, *keys))
    # pre-r7 reference shape (A/B escape hatch): salted two-phase partial
    # collect + second exchange + explode — measured strictly slower here
    lean = F.struct(F.col("feature_id"), F.col("geom"), F.col("off"))
    two = (src
           .withColumn("_salt", F.pmod(F.hash("feature_id"), F.lit(salt)))
           .repartition(n_agg * 2, *keys, "_salt")
           .groupBy(*keys, "_salt")
           .agg(F.collect_list(lean).alias("_part")))
    rows = (two.repartition(n_agg, *keys)
            .select(*keys, F.explode("_part").alias("f"))
            .select(*keys, F.col("f.feature_id").alias("feature_id"),
                    F.col("f.geom").alias("geom"), F.col("f.off").alias("off")))
    return finish(rows)


def tile_feature_lists_flat(clipped: DataFrame, salt: int = 0,
                            extra: tuple = ()) -> DataFrame:
    """A1/A2 over the FLAT transport: per-tile list of (feature_id, geom,
    off[, *extra]) structs, sorted by feature_id. Same two-phase salted
    shape as tile_feature_lists; the rows carry no nested arrays (and in
    "dim" mode no kind/props), shrinking both exchanges (VERDICT r3 #1)."""
    feat = F.struct(F.col("feature_id"),
                    *[F.col(c) for c in ("geom", "off", *extra)])
    if salt <= 1:
        return (clipped
                .groupBy("z", "x", "y")
                .agg(_by_fid(F.collect_list(feat)).alias("features"))
                .withColumn("n_features", F.size("features")))
    spark = clipped.sparkSession
    try:
        n_agg = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_agg = spark.sparkContext.defaultParallelism
    # same rationale as tile_feature_lists: explicit AQE-exempt partition
    # counts on BOTH exchanges so the agg scales with cores
    two = (clipped
           .withColumn("_salt", F.pmod(F.hash("feature_id"), F.lit(salt)))
           .repartition(n_agg * 2, "z", "x", "y", "_salt")
           .groupBy("z", "x", "y", "_salt")
           .agg(F.collect_list(feat).alias("_part")))
    return (two.repartition(n_agg, "z", "x", "y")
            .groupBy("z", "x", "y")
            .agg(_by_fid(F.flatten(F.collect_list("_part"))).alias("features"))
            .withColumn("n_features", F.size("features")))


def enrich_tile_features(tiled: DataFrame, dim: DataFrame,
                         broadcast_dim: bool | None = None,
                         packed: bool | None = None) -> DataFrame:
    """Rebuild the public per-tile schema from the flat agg output: nested
    geom via the pure-Catalyst NEST_GEOM_EXPR, kind/props joined back ONCE
    per feature from the dim.

    Exchange-free by construction on the default path: the flat agg's output
    is hash-partitioned on (z,x,y); explode (Generate) and a broadcast hash
    join both preserve that partitioning, so the re-agg's ClusteredDistribution
    is already satisfied and Catalyst inserts NO new shuffle — the only added
    exchange is the dim broadcast (asserted by tests/test_plans.py).
    ``broadcast_dim=False`` is the huge-dim fallback (unhinted join — AQE
    picks shuffle hash on feature_id + one re-agg exchange — for feature
    dims too big to broadcast); None reads TILEGEN_BROADCAST_DIM.
    """
    d = _dim_join_side(dim.select("feature_id", "kind", "props"), broadcast_dim)
    ex = (tiled.select("z", "x", "y", F.explode("features").alias("f"))
          .select("z", "x", "y", F.col("f.feature_id").alias("feature_id"),
                  F.col("f.geom").alias("geom"), F.col("f.off").alias("off")))
    j = nest_geom(ex, packed=packed).join(d, "feature_id", "left")
    feat = F.struct(
        F.col("feature_id"), F.col("kind"), F.col("geom"), F.col("props"))
    return (j.groupBy("z", "x", "y")
            .agg(_by_fid(F.collect_list(feat)).alias("features"))
            .withColumn("n_features", F.size("features")))


def tile_feature_lists(clipped: DataFrame, salt: int = 0) -> DataFrame:
    """A1/A2: per-tile deterministic sorted feature list (MVT-equivalent).

    salt > 0 → two-phase: agg by (z,x,y,salt buckets) first, then flatten and
    re-sort — bounds any single reducer's list size on hot city tiles
    (``BASELINE.json:6,14``; collect_list has no partial-merge, SURVEY §4.2).
    (Nested-schema variant, kept for CLIP_SCHEMA inputs; build_tile_features
    uses tile_feature_lists_flat + enrich_tile_features.)
    """
    feat = F.struct(
        F.col("feature_id"), F.col("kind"), F.col("geom"), F.col("props"))

    by_fid = _by_fid

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
    #
    # EXPLICIT partition counts on BOTH exchanges: a bare repartition(keys)
    # (and the final agg's exchange) is AQE-coalescible to a SIZE-based
    # count — the same count at any core count, so the agg stops scaling
    # entirely (r3 phase profile: 45.5 s @ local[8] vs 48.3 s @ local[32]).
    # A user-specified numPartitions is exempt from AQE coalescing; deriving
    # it from shuffle_partitions keeps parallelism ∝ cores.
    spark = clipped.sparkSession
    try:
        n_agg = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_agg = spark.sparkContext.defaultParallelism
    two = (clipped
           .withColumn("_salt", F.pmod(F.hash("feature_id"), F.lit(salt)))
           .repartition(n_agg * 2, "z", "x", "y", "_salt")
           .groupBy("z", "x", "y", "_salt")
           .agg(F.collect_list(feat).alias("_part")))
    return (two.repartition(n_agg, "z", "x", "y")
            .groupBy("z", "x", "y")
            .agg(by_fid(F.flatten(F.collect_list("_part"))).alias("features"))
            .withColumn("n_features", F.size("features")))
