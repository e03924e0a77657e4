"""J1 (SURVEY.md §2.3): quadkey-bucketed point-in-polygon spatial join.

``BASELINE.json:6,14`` mandates a "quadkey-bucketed point-in-polygon spatial
join". Shape:

 1. **Bucket** both sides at a quadkey resolution ``res``:
    - points relationally (G2 tile math as Spark SQL expressions + G4 quadkey
      digits — zero Python, whole-stage-codegen'd);
    - polygons via G8 covering tiles, Arrow-batched (one row per covering
      quadkey, exploded).
 2. **Equi-join** the buckets. A point lives in exactly ONE bucket, so the
    join emits each candidate (point, zone) pair at most once — no
    dropDuplicates shuffle needed (cheaper than generic bucket joins that
    duplicate both sides). The zone side is typically the small dim →
    broadcast when under the threshold; AQE skew-split handles hot city
    buckets on the shuffle path.
 3. **Refine** with the exact even-odd PIP kernel (G7), Arrow-batched.

At 100 TB the only shuffle is the bucket equi-join (or none if the zone side
broadcasts); the refine is a narrow map.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import kernels as K
from ..plans import sqlgen as S

ZONE_QK_SCHEMA = ("zone_id bigint, qb bigint, bminx double, bmaxx double, "
                  "bminy double, bmaxy double")

# bbox prefilter margin: the kernel's on-edge rule accepts points within
# 1e-12·max(1,len) of an edge, which can sit just OUTSIDE the ring's bbox —
# the margin keeps the prefilter a strict superset of the exact test
_BBOX_EPS = 1e-9


def bbox_filter(df: DataFrame, west: float, south: float, east: float,
                north: float, lon_col: str = "lon",
                lat_col: str = "lat") -> DataFrame:
    """P3 (SURVEY.md §2.2): standalone bbox predicate over lon/lat columns.

    Plain column comparisons so Catalyst pushes them into the source scan
    (``PushedFilters: GreaterThanOrEqual(lon,…), LessThanOrEqual(lat,…)`` on
    parquet — asserted by tests/test_plans.py) and prunes min/max row groups:
    at 100 TB a region query reads only the row groups whose stats intersect
    the box. Used as the pip/knn prelude to restrict the corpus to a region.
    """
    return df.filter(
        (F.col(lon_col) >= float(west)) & (F.col(lon_col) <= float(east))
        & (F.col(lat_col) >= float(south)) & (F.col(lat_col) <= float(north)))


def zoom_filter(df: DataFrame, min_z: int, max_z: int,
                z_col: str = "z") -> DataFrame:
    """P3 companion: zoom-range predicate over a tile/z column (pushdown-able
    same as bbox_filter; prunes partitionBy(z) sink directories entirely)."""
    return df.filter((F.col(z_col) >= int(min_z)) & (F.col(z_col) <= int(max_z)))


def points_with_quadkey(points: DataFrame, res: int,
                        lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Relational quadkey at resolution ``res`` (G2 + G4, pure Spark SQL)."""
    x = S.tile_x(lon_col, res, S.SPARK)
    y = S.tile_y(lat_col, res, S.SPARK)
    return points.withColumn("qk", F.expr(S.quadkey(x, y, res, S.SPARK)))


def points_with_bucket(points: DataFrame, res: int,
                       lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Integer quadkey bucket x·2^res + y (bijective with the G4 string at
    fixed res): two floor expressions instead of ``res`` string casts +
    concat — the round-1 string build was a measured fixed cost on the point
    side (VERDICT r1 perf note). String quadkeys (points_with_quadkey) remain
    for the prefix-rollup queries where the prefix property matters."""
    x = S.tile_x(lon_col, res, S.SPARK)
    y = S.tile_y(lat_col, res, S.SPARK)
    # r7b: coalesce makes qb provably non-nullable, so the IsNotNull(qb)
    # constraint the bucket equi-join infers FOLDS AWAY instead of being
    # pushed to the scan as a filter that re-evaluates the whole qb
    # expression — LCG + mercator trig + both clamps — once more per point
    # (the pip before-plan's Filter(2) node). Value-identical: qb is null
    # only when lon/lat is null, and such rows could never match (zone qbs
    # are ≥ 0, the -1 sentinel joins nothing) nor pass the bbox refine.
    return points.withColumn(
        "qb", F.expr(f"coalesce(({x}) * {1 << res} + ({y}), -1)"))


def zones_covering_quadkeys(zones: DataFrame, res: int) -> DataFrame:
    """G8 per zone → exploded (zone_id, qb) covering rows, Arrow-batched."""
    gcap = K.grid_cap()   # driver-resolved, shipped in the task closure

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            cols: dict[str, list] = {k: [] for k in (
                "zone_id", "qb", "bminx", "bmaxx", "bminy", "bmaxy")}
            for zid, ring in zip(b["zone_id"], b["ring"]):
                r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
                tiles = K.polygon_covering_tiles(r.ravel(), res, cap=gcap)
                if tiles.size == 0:
                    continue
                qbs = tiles[:, 0] * (1 << res) + tiles[:, 1]
                cols["zone_id"].extend([zid] * len(qbs))
                cols["qb"].extend(qbs.tolist())
                cols["bminx"].extend([float(r[:, 0].min()) - _BBOX_EPS] * len(qbs))
                cols["bmaxx"].extend([float(r[:, 0].max()) + _BBOX_EPS] * len(qbs))
                cols["bminy"].extend([float(r[:, 1].min()) - _BBOX_EPS] * len(qbs))
                cols["bmaxy"].extend([float(r[:, 1].max()) + _BBOX_EPS] * len(qbs))
            yield pd.DataFrame({
                "zone_id": pd.Series(cols["zone_id"], dtype="int64"),
                "qb": pd.Series(cols["qb"], dtype="int64"),
                "bminx": pd.Series(cols["bminx"], dtype="float64"),
                "bmaxx": pd.Series(cols["bmaxx"], dtype="float64"),
                "bminy": pd.Series(cols["bminy"], dtype="float64"),
                "bmaxy": pd.Series(cols["bmaxy"], dtype="float64"),
            })

    return zones.select("zone_id", "ring").mapInPandas(fn, ZONE_QK_SCHEMA)


def pip_refine(candidates: DataFrame) -> DataFrame:
    """Exact G7 refine over candidate pairs; input needs lon, lat, ring cols.

    Rows are grouped by ring vertex count inside each Arrow batch and run
    through ONE vectorized ray-cast per group (points_in_rings_vec) — the
    per-zone grouping of round 1 made ~2000 numpy calls of ~6 candidates
    each per batch, and call overhead dominated the whole join."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
        if f.name != "ring")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                yield b.drop(columns=["ring"])
                continue
            keep = np.zeros(len(b), dtype=bool)
            px = b["lon"].to_numpy(dtype=np.float64)
            py = b["lat"].to_numpy(dtype=np.float64)
            lens = b["ring"].map(len).to_numpy(dtype=np.int64)
            for L in np.unique(lens):
                idx = np.nonzero(lens == L)[0]
                rings = np.stack(
                    [np.asarray(r, dtype=np.float64) for r in b["ring"].iloc[idx]]
                ).reshape(len(idx), -1, 2)
                keep[idx] = K.points_in_rings_vec(px[idx], py[idx], rings)
            yield b.loc[keep].drop(columns=["ring"])

    return candidates.mapInPandas(fn, out_schema)


def zone_edges(zones: DataFrame) -> DataFrame:
    """zones(zone_id, ring) → one row per edge with flat double columns
    (x1, y1, x2, y2). Evaluated once per zone (dim-table scale)."""
    nv = "(size(ring) div 2)"
    j = f"pmod(i + 1, {nv})"
    edge = (f"inline(transform(sequence(0, CAST({nv} AS INT) - 1), i -> named_struct("
            f"'x1', element_at(ring, CAST(2 * i + 1 AS INT)), "
            f"'y1', element_at(ring, CAST(2 * i + 2 AS INT)), "
            f"'x2', element_at(ring, CAST(2 * ({j}) + 1 AS INT)), "
            f"'y2', element_at(ring, CAST(2 * ({j}) + 2 AS INT)))))")
    return zones.select("zone_id", F.expr(edge))


def pip_refine_relational(candidates: DataFrame, zones: DataFrame,
                          broadcast: bool = True) -> DataFrame:
    """Exact G7 refine with ZERO Python in the hot path: candidates join the
    broadcast per-edge table, per-edge crossing/on-edge flags are flat-column
    double arithmetic (whole-stage codegen, no arrays, no boxing), and the
    per-candidate even-odd parity is a hash aggregate whose partial collapses
    map-side (broadcast join preserves the probe partitioning, so every
    candidate's edges sit in one partition). Same formulas and boundary rule
    as kernels.points_in_ring — and structurally identical to the DuckDB
    oracle (q_pip_join), so all three agree bit-for-bit.

    Why not pandas here: the per-candidate Arrow crossing was the measured
    bottleneck (identity mapInPandas over the candidate set cost more than
    the entire relational refine), and interpreted array HOFs allocate per
    element access and go GC-bound at high thread counts.

    ``broadcast=False`` (r4): zone set too big for a broadcast — the same
    per-edge join runs as a shuffle join on zone_id. The parity agg still
    adds NO exchange: HashPartitioning(zone_id) is a subset of the group
    keys (point_id, zone_id, lon, lat), so its ClusteredDistribution is
    already satisfied and the per-edge rows collapse partition-locally.
    Candidates shuffle once (on zone_id — replacing the broadcast), edges
    shuffle once (dim-scale); zero Python either way. Hot zones are the
    skew risk — AQE's skew-join split handles the join side, and the
    parity agg's partial aggregation bounds the reduce side."""
    x1, y1, x2, y2 = F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
    lon, lat = F.col("lon"), F.col("lat")
    # r7b (guide §1.2 per-task work): dx/dy/seg2 and the on-edge tolerance
    # are PER-EDGE constants — computed once per edge row on the dim side
    # below instead of once per (candidate × edge) pair, which removes the
    # sqrt/greatest and four mult/sub ops from the ~46-rows-per-candidate
    # hot loop. Same float64 op ORDER everywhere a value is compared (the
    # precomputed columns hold bit-identical values to the inline exprs they
    # replace), so pair results are unchanged.
    dx, dy = F.col("_dx"), F.col("_dy")
    seg2, eps = F.col("_seg2"), F.col("_eps")
    crossing = (((y1 > lat) != (y2 > lat))
                & (lon < dx * (lat - y1) / dy + x1))
    cross = (lon - x1) * dy - (lat - y1) * dx
    dot = (lon - x1) * dx + (lat - y1) * dy
    on_edge = ((F.abs(cross) <= eps)
               & (dot >= 0) & (dot <= seg2) & (seg2 > 0))
    _dx, _dy = F.col("x2") - F.col("x1"), F.col("y2") - F.col("y1")
    edges = (zone_edges(zones)
             .withColumn("_dx", _dx).withColumn("_dy", _dy)
             .withColumn("_seg2", F.col("_dx") * F.col("_dx")
                         + F.col("_dy") * F.col("_dy"))
             .withColumn("_eps", F.lit(1e-12)
                         * F.greatest(F.lit(1.0), F.sqrt(F.col("_seg2")))))
    j = candidates.join(F.broadcast(edges) if broadcast else edges, "zone_id")
    # r7b: group on the two key columns only — lon/lat are functionally
    # dependent on point_id (every row of a group carries identical values),
    # so they ride as first() aggregates instead of widening the hash key
    # probed once per candidate×edge row (395M probes at the bench shape:
    # 4.37 → 4.08 s section median, identical pairs). zone_id stays in the
    # group keys, so the broadcast=False path still adds no exchange
    # (HashPartitioning(zone_id) satisfies the agg's distribution).
    return (j.groupBy("point_id", "zone_id")
            .agg(F.first("lon").alias("lon"), F.first("lat").alias("lat"),
                 F.sum(F.when(crossing, 1).otherwise(0)).alias("_nc"),
                 F.max(F.when(on_edge, 1).otherwise(0)).alias("_oe"))
            .filter((F.pmod(F.col("_nc"), F.lit(2)) == 1) | (F.col("_oe") == 1))
            .select("point_id", "zone_id", "lon", "lat"))


def pip_refine_indexed(candidates: DataFrame, zones: DataFrame) -> DataFrame:
    """Exact G7 refine with the zone rings held in the task closure.

    candidates carry only (…, zone_id, lon, lat) — no per-candidate ring
    payload crosses Arrow or the repartition shuffle (the round-1 version
    shipped a 12-double ring per candidate row and spent most of the join
    re-materializing it in pandas: 29 µs/candidate, measured). Rings are
    length-grouped and pre-stacked once on the driver (the same
    broadcast-a-small-dim assumption the bucket join already makes); each
    Arrow batch runs one vectorized ray-cast per length group."""
    zp = zones.select("zone_id", "ring").toPandas()
    ids = zp["zone_id"].to_numpy(np.int64)
    rings = [np.asarray(r, dtype=np.float64) for r in zp["ring"]]
    order = np.argsort(ids)
    ids_s = ids[order]
    lens_s = np.array([rings[i].size for i in order], dtype=np.int64)
    stacked: list[np.ndarray] = []
    grp = np.empty(ids_s.size, dtype=np.int64)
    row = np.empty(ids_s.size, dtype=np.int64)
    for gi, L in enumerate(np.unique(lens_s)):
        sel = np.nonzero(lens_s == L)[0]
        stacked.append(np.stack([rings[order[i]] for i in sel]).reshape(sel.size, -1, 2))
        grp[sel] = gi
        row[sel] = np.arange(sel.size)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                yield b
                continue
            pos = np.searchsorted(ids_s, b["zone_id"].to_numpy(np.int64))
            px = b["lon"].to_numpy(dtype=np.float64)
            py = b["lat"].to_numpy(dtype=np.float64)
            keep = np.zeros(len(b), dtype=bool)
            bg = grp[pos]
            br = row[pos]
            for gi in np.unique(bg):
                m = bg == gi
                keep[m] = K.points_in_rings_vec(px[m], py[m], stacked[gi][br[m]])
            yield b.loc[keep]

    return candidates.mapInPandas(fn, candidates.schema)


def pip_join(points: DataFrame, zones: DataFrame, res: int = 6,
             broadcast_zones: bool = True,
             refine: str = "relational",
             bbox: tuple[float, float, float, float] | None = None) -> DataFrame:
    """points(point_id, lon, lat) ⨝ zones(zone_id, ring) → exact PIP pairs.

    Returns (point_id, zone_id, lon, lat). THE join-output correctness
    artifact (``BASELINE.json:6`` "join output rows ... exactly").

    ``refine`` (broadcast path only): ``"relational"`` (default — zero-Python
    per-edge codegen + map-side parity agg) or ``"indexed"`` (rings held in
    the task closure, one vectorized ray-cast per ring-length group per Arrow
    batch — wins when zones have MANY vertices, where the exploded per-edge
    join row count becomes the cost driver).

    ``bbox=(west, south, east, north)``: region prelude — bbox_filter the
    point side BEFORE bucketing, so the predicate reaches the parquet scan.
    """
    if bbox is not None:
        points = bbox_filter(points, *bbox)
    pts = points_with_bucket(points.select("point_id", "lon", "lat"), res)
    zqk = zones_covering_quadkeys(zones, res)
    # zone-bbox prefilter folded into the join condition: whole-stage-codegen
    # column comparisons, zero allocation, removes ~3/4 of candidates before
    # anything Python sees. (The interpreted-HOF full ray cast was tried
    # here and is a trap: per-access boxing in lambda eval allocated ~60
    # objects/candidate·edge and went GC-bound at 32 threads.)
    bbox = ((F.col("lon") >= F.col("bminx")) & (F.col("lon") <= F.col("bmaxx"))
            & (F.col("lat") >= F.col("bminy")) & (F.col("lat") <= F.col("bmaxy")))
    try:
        n_parts = int(points.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_parts = points.sparkSession.sparkContext.defaultParallelism
    if broadcast_zones:
        cand = (pts.join(F.broadcast(zqk), "qb", "inner").filter(bbox)
                .select("point_id", "zone_id", "lon", "lat"))
        if refine == "indexed":
            return pip_refine_indexed(cand, zones)
        return pip_refine_relational(cand, zones)
    # zone set too big to broadcast: shuffle equi-join on the bucket, then
    # the SAME relational per-edge parity refine as the broadcast path, run
    # as a shuffle join on zone_id (r4 — replaces the ring-per-candidate
    # Arrow crossing; tests assert no Python node in this plan either).
    cand = (pts.join(zqk, "qb", "inner").filter(bbox)
            .select("point_id", "zone_id", "lon", "lat"))
    if refine == "indexed":
        # explicit opt-in retains the pandas kernel path (rings shipped per
        # surviving candidate) for engines/zones where the per-edge
        # explosion is worse than the Arrow crossing
        cand = (cand.join(zones.select("zone_id", "ring"), "zone_id")
                .select("point_id", "zone_id", "lon", "lat", "ring"))
        return pip_refine(cand.repartition(n_parts, "point_id"))
    return pip_refine_relational(cand, zones, broadcast=False)
