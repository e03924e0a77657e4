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

ZONE_QK_SCHEMA = "zone_id bigint, qk string"


def points_with_quadkey(points: DataFrame, res: int,
                        lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Relational quadkey at resolution ``res`` (G2 + G4, pure Spark SQL)."""
    x = S.tile_x(lon_col, res)
    y = S.tile_y(lat_col, res)
    return points.withColumn("qk", F.expr(S.quadkey(x, y, res, S.SPARK)))


def zones_covering_quadkeys(zones: DataFrame, res: int) -> DataFrame:
    """G8 per zone → exploded (zone_id, qk) covering rows, Arrow-batched."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            zid_o, qk_o = [], []
            for zid, ring in zip(b["zone_id"], b["ring"]):
                tiles = K.polygon_covering_tiles(np.asarray(ring, dtype=np.float64), res)
                if tiles.size == 0:
                    continue
                qks = K.quadkey_encode(tiles[:, 0], tiles[:, 1], res)
                zid_o.extend([zid] * len(qks))
                qk_o.extend(qks.tolist())
            yield pd.DataFrame({"zone_id": pd.Series(zid_o, dtype="int64"),
                                "qk": pd.Series(qk_o, dtype="string")})

    return zones.select("zone_id", "ring").mapInPandas(fn, ZONE_QK_SCHEMA)


def pip_refine(candidates: DataFrame) -> DataFrame:
    """Exact G7 refine over candidate pairs; input needs lon, lat, ring cols."""
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
            # group candidate rows by zone inside the Arrow batch → one
            # vectorized ray-cast per zone over all its candidate points
            for zid, idx in b.groupby("zone_id").indices.items():
                ring = np.asarray(b["ring"].iloc[idx[0]], dtype=np.float64)
                keep[idx] = K.points_in_ring(px[idx], py[idx], ring)
            yield b.loc[keep].drop(columns=["ring"])

    return candidates.mapInPandas(fn, out_schema)


def pip_join(points: DataFrame, zones: DataFrame, res: int = 6,
             broadcast_zones: bool = True) -> DataFrame:
    """points(point_id, lon, lat) ⨝ zones(zone_id, ring) → exact PIP pairs.

    Returns (point_id, zone_id, lon, lat). THE join-output correctness
    artifact (``BASELINE.json:6`` "join output rows ... exactly").
    """
    pts = points_with_quadkey(points.select("point_id", "lon", "lat"), res)
    zqk = zones_covering_quadkeys(zones, res).join(
        zones.select("zone_id", "ring"), "zone_id")
    if broadcast_zones:
        zqk = F.broadcast(zqk)
    cand = pts.join(zqk, "qk", "inner").select(
        "point_id", "zone_id", "lon", "lat", "ring")
    return pip_refine(cand)
