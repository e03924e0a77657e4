"""Pure-numpy geometry kernels (SURVEY.md §2.8, G1–G14).

These are the from-scratch computational core of the engine: every function is
a pure, deterministic, numpy-vectorized kernel with zero Spark dependencies, so
it can be unit-tested standalone and wrapped in Arrow ``pandas_udf``s
(``BASELINE.json:15`` — "vectorized pandas/Arrow UDFs, no per-row Python").

Formulas are the published public definitions:
 - slippy-map z/x/y tiles  [OSM "Slippy map tilenames"]
 - Web Mercator EPSG:3857
 - Bing Maps quadkeys (base-4 interleave)
 - even-odd ray-casting point-in-polygon  [Shimrat 1962]
 - Sutherland–Hodgman polygon clipping  [CACM 1974]
 - Liang–Barsky segment clipping
 - haversine great-circle distance
 - shoelace signed area
 - scanline polygon rasterization / marching-squares vectorization

The reference checkout at /root/reference is empty (SURVEY.md §0); the
authoritative spec for which kernels must exist is ``BASELINE.json:6,14``.
"""

from __future__ import annotations

import numpy as np

# Web-Mercator latitude clamp: tile math is undefined beyond this.
MAX_LAT = 85.05112878
EARTH_RADIUS_M = 6371008.8
MERCATOR_R = 6378137.0


# ---------------------------------------------------------------------------
# splitmix64 — counter-based deterministic hashing (FIXTURES.md: "splitmix64-
# style"); partition-count invariant because value = f(seed, index) only.
# ---------------------------------------------------------------------------

def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 input. Vectorized, stateless."""
    z = (np.asarray(x, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def h64(index: np.ndarray, seed: int, stream: int = 0) -> np.ndarray:
    """Deterministic per-row uint64: f(seed, stream, row-index)."""
    base = np.asarray(index, dtype=np.uint64)
    mix = np.uint64((seed * 0x9E3779B97F4A7C15 + stream * 0xD1B54A32D192ED03) % (1 << 64))
    return splitmix64(base ^ mix)


def hu(index: np.ndarray, seed: int, stream: int = 0) -> np.ndarray:
    """Uniform float64 in [0,1) from h64."""
    return (h64(index, seed, stream) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# ---------------------------------------------------------------------------
# G1 — lon/lat → Web Mercator (EPSG:3857)
# ---------------------------------------------------------------------------

def lonlat_to_mercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = lon * (np.pi / 180.0) * MERCATOR_R
    y = MERCATOR_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(x, dtype=np.float64) / MERCATOR_R * (180.0 / np.pi)
    lat = np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / MERCATOR_R)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------------------
# G2 — point → slippy tile (z, x, y)   [OSM slippy-map tilenames]
# The exact same formula is emitted as SQL by functions/sqlgen.py so the
# Spark relational path, this numpy path, and the DuckDB oracle all agree.
# ---------------------------------------------------------------------------

def point_to_tile(lon: np.ndarray, lat: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    n = float(1 << z)
    # NaN/Inf are filtered upstream by the validity predicate (SURVEY.md P4);
    # defensively map them to 0.0 here so output stays in-range/deterministic.
    lon = np.nan_to_num(np.asarray(lon, dtype=np.float64), nan=0.0, posinf=180.0, neginf=-180.0)
    lat = np.nan_to_num(np.asarray(lat, dtype=np.float64), nan=0.0, posinf=MAX_LAT, neginf=-MAX_LAT)
    lat = np.clip(lat, -MAX_LAT, MAX_LAT)
    xt = np.floor((lon + 180.0) / 360.0 * n)
    lat_r = np.radians(lat)
    yt = np.floor((1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n)
    xt = np.clip(xt, 0, n - 1).astype(np.int64)
    yt = np.clip(yt, 0, n - 1).astype(np.int64)
    return xt, yt


# G3 — tile → lon/lat bounds (west, south, east, north)

def tile_bounds(z: np.ndarray, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = np.power(2.0, z.astype(np.float64))
    west = x / n * 360.0 - 180.0
    east = (x + 1.0) / n * 360.0 - 180.0
    north = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / n))))
    south = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (y + 1.0) / n))))
    return west, south, east, north


# ---------------------------------------------------------------------------
# G4 — quadkey encode/decode   [Bing Maps tile system]
# ---------------------------------------------------------------------------

def quadkey_encode(x: np.ndarray, y: np.ndarray, z: int) -> np.ndarray:
    """Vectorized quadkey: base-4 string of length z (MSB-first interleave)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    if z == 0:
        return np.full(x.shape, "", dtype=object)
    digits = np.empty((z, x.size), dtype=np.int64)
    for i in range(1, z + 1):
        shift = z - i
        digits[i - 1] = ((x >> shift) & 1) + 2 * ((y >> shift) & 1)
    chars = digits.astype("U1")
    out = np.empty(x.size, dtype=object)
    for j in range(x.size):  # join per row; z<=12 so cheap vs string vectorize
        out[j] = "".join(chars[:, j])
    return out


def quadkey_decode(qk: str) -> tuple[int, int, int]:
    x = y = 0
    for c in qk:
        d = int(c)
        x = (x << 1) | (d & 1)
        y = (y << 1) | (d >> 1)
    return len(qk), x, y


# ---------------------------------------------------------------------------
# G7 — point-in-polygon, even-odd ray casting [Shimrat 1962]
# Boundary rule (documented, fixed): a point exactly on an edge or vertex is
# INSIDE. Vectorized across the point batch; loop over polygon edges only.
# ---------------------------------------------------------------------------

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """px, py: (N,) point coords. ring: flat [x0,y0,x1,y1,...] closed or open.

    Returns boolean (N,) — even-odd rule, boundary counts as inside.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if r.shape[0] >= 2 and np.allclose(r[0], r[-1]):
        r = r[:-1]
    nv = r.shape[0]
    inside = np.zeros(px.shape, dtype=bool)
    on_edge = np.zeros(px.shape, dtype=bool)
    for i in range(nv):
        x1, y1 = r[i]
        x2, y2 = r[(i + 1) % nv]
        # crossing test (half-open rule avoids double-count at vertices)
        cond = (y1 > py) != (y2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        crosses = cond & (px < xint)
        inside ^= crosses
        # boundary check: point on segment [p1,p2]
        dx, dy = x2 - x1, y2 - y1
        cross = (px - x1) * dy - (py - y1) * dx
        dot = (px - x1) * dx + (py - y1) * dy
        seg_len2 = dx * dx + dy * dy
        on_edge |= (np.abs(cross) <= 1e-12 * max(1.0, np.sqrt(seg_len2))) & (dot >= 0) & (dot <= seg_len2)
    return inside | on_edge


def points_in_rings_vec(px: np.ndarray, py: np.ndarray,
                        rings: np.ndarray) -> np.ndarray:
    """Batched G7: point i vs ring i, fully vectorized over candidates.

    px, py: (N,); rings: (N, V, 2) — all rings the same vertex count (callers
    group by ring length). Open or closed rings both work: a duplicated
    closing vertex contributes a zero-length edge, masked by seg2 > 0.
    Arithmetic and boundary rule are identical to points_in_ring (one edge
    per roll position, same 1e-12·max(1,len) on-edge tolerance), so results
    match the scalar kernel bit-for-bit; this exists because the refine hot
    loop sees ~2000 tiny per-zone groups per Arrow batch, where per-call
    numpy overhead dominated (~170 µs/candidate → ~6 µs/candidate)."""
    x1 = rings[:, :, 0]
    y1 = rings[:, :, 1]
    x2 = np.roll(x1, -1, axis=1)
    y2 = np.roll(y1, -1, axis=1)
    pxc = px[:, None]
    pyc = py[:, None]
    cond = (y1 > pyc) != (y2 > pyc)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (pyc - y1) / (y2 - y1) + x1
    inside = (cond & (pxc < xint)).sum(axis=1) % 2 == 1
    dx = x2 - x1
    dy = y2 - y1
    cross = (pxc - x1) * dy - (pyc - y1) * dx
    dot = (pxc - x1) * dx + (pyc - y1) * dy
    seg2 = dx * dx + dy * dy
    tol = 1e-12 * np.maximum(1.0, np.sqrt(seg2))
    on_edge = ((np.abs(cross) <= tol) & (dot >= 0) & (dot <= seg2)
               & (seg2 > 0)).any(axis=1)
    return inside | on_edge


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Polygon with holes: ring 0 exterior, rings 1+ holes (even-odd overall)."""
    acc = np.zeros(np.asarray(px).shape, dtype=bool)
    for ring in rings:
        acc ^= points_in_ring(px, py, ring)
    return acc


# ---------------------------------------------------------------------------
# G8 — polygon → covering tiles at zoom z
# bbox tile range; keep tiles whose bbox intersects the polygon:
#   tile bbox corner inside polygon OR polygon vertex inside tile bbox OR
#   any edge pair intersects. For the candidate grids at z<=12 a cheaper
#   sufficient test: tile-bbox vs polygon via (a) vertex-in-bbox, (b) bbox
#   corner-in-polygon, (c) edge/bbox-edge intersection.
# ---------------------------------------------------------------------------

def _segments_intersect_bbox(r: np.ndarray, w: float, s: float, e: float, n: float) -> bool:
    """Any polygon edge intersects the bbox boundary (Liang–Barsky per edge)."""
    return bool(np.any(_edges_cross_bboxes(
        r, np.array([w]), np.array([s]), np.array([e]), np.array([n]))))


def _edges_cross_bboxes(r: np.ndarray, w: np.ndarray, s: np.ndarray,
                        e: np.ndarray, n: np.ndarray) -> np.ndarray:
    """For each of K bboxes, does ANY edge of polyline r intersect it?
    Liang–Barsky accept test, vectorized over the K bboxes per edge."""
    k = w.shape[0]
    hit = np.zeros(k, dtype=bool)
    for i in range(r.shape[0] - 1):
        x1, y1 = r[i]
        x2, y2 = r[i + 1]
        dx, dy = x2 - x1, y2 - y1
        t0 = np.zeros(k)
        t1 = np.ones(k)
        ok = np.ones(k, dtype=bool)
        for p, q in ((-dx, x1 - w), (dx, e - x1), (-dy, y1 - s), (dy, n - y1)):
            if p == 0:
                ok &= q >= 0
            else:
                t = q / p
                if p < 0:
                    t0 = np.maximum(t0, t)
                else:
                    t1 = np.minimum(t1, t)
        hit |= ok & (t0 <= t1)
        if hit.all():
            break
    return hit


def _tile_bounds_for(z: int, xx: np.ndarray, yy: np.ndarray):
    """Lon/lat bounds (w, s, e, n) for tile-index arrays at zoom z — the
    single expression set every covering path shares, so dense grid and
    sparse candidates see bit-identical bbox floats."""
    n_t = float(1 << z)
    w = xx / n_t * 360.0 - 180.0
    e = (xx + 1.0) / n_t * 360.0 - 180.0
    north = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * yy / n_t))))
    south = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (yy + 1.0) / n_t))))
    return w, south, e, north


def _tile_bounds_grid(z: int, x0: int, x1: int, y0: int, y1: int):
    """Vectorized bounds for the candidate grid [x0..x1]×[y0..y1] at zoom z.
    Returns (xx, yy, w, s, e, n) flat arrays of length K."""
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    XX, YY = np.meshgrid(xs, ys)
    xx, yy = XX.ravel(), YY.ravel()
    w, south, e, north = _tile_bounds_for(z, xx, yy)
    return xx, yy, w, south, e, north


def grid_cap() -> int:
    """Candidate-grid cell cap above which covering kernels switch from the
    dense bbox grid to the O(covered) sparse walk (TILEGEN_GRID_CAP)."""
    import os
    return int(os.environ.get("TILEGEN_GRID_CAP", "65536"))


def _merc_fy(lat: np.ndarray, n_t: float) -> np.ndarray:
    """Float (unfloored) tile-y at zoom with 2^z = n_t."""
    lr = np.radians(np.clip(lat, -MAX_LAT, MAX_LAT))
    return (1.0 - np.log(np.tan(lr) + 1.0 / np.cos(lr)) / np.pi) / 2.0 * n_t


def segment_candidate_tiles(r: np.ndarray, z: int, x0: int, x1: int,
                            y0: int, y1: int) -> tuple[np.ndarray, np.ndarray]:
    """O(covered)-size candidate tiles near the edges of polyline ``r``.

    Per-segment column walk in float tile space: tile-x is linear in lon
    (hence linear along a segment), and tile-y is a monotone Mercator
    transform of lat with lat linear along the segment — so within one tile
    column the segment's y-extent is exactly spanned by its values at the
    column's entry/exit parameters. Candidates are widened ±1 tile on both
    axes (covers boundary touches and float slop, which is ~1e-9 tiles — far
    inside a whole-tile margin) and clamped to the vertex-tile bbox grid.
    Callers re-apply the EXACT covering tests to these candidates, so the
    only contract here is superset-of-edge-touched-tiles within the grid.
    Returns unique (cx, cy), sorted by (cy, cx) = the dense grid's raster
    order."""
    n_t = float(1 << z)
    lon = np.nan_to_num(r[:, 0], nan=0.0, posinf=180.0, neginf=-180.0)
    lat = np.clip(np.nan_to_num(r[:, 1], nan=0.0, posinf=MAX_LAT,
                                neginf=-MAX_LAT), -MAX_LAT, MAX_LAT)
    fx = (lon + 180.0) / 360.0 * n_t
    if fx.size < 2:
        e = np.zeros(0, dtype=np.int64)
        return e, e
    ax, bx = fx[:-1], fx[1:]
    ay, by = lat[:-1], lat[1:]
    lo = np.maximum(np.floor(np.minimum(ax, bx)).astype(np.int64) - 1, x0)
    hi = np.minimum(np.floor(np.maximum(ax, bx)).astype(np.int64) + 1, x1)
    ncol = np.maximum(hi - lo + 1, 0)
    seg = np.repeat(np.arange(ax.size), ncol)
    off = np.arange(int(ncol.sum())) - np.repeat(np.cumsum(ncol) - ncol, ncol)
    col = lo[seg] + off
    dxs = bx[seg] - ax[seg]
    with np.errstate(divide="ignore", invalid="ignore"):
        t_l = np.clip((col - ax[seg]) / dxs, 0.0, 1.0)
        t_r = np.clip((col + 1.0 - ax[seg]) / dxs, 0.0, 1.0)
    vert = dxs == 0.0
    t_l = np.where(vert, 0.0, t_l)
    t_r = np.where(vert, 1.0, t_r)
    lat_l = ay[seg] + (by[seg] - ay[seg]) * t_l
    lat_r = ay[seg] + (by[seg] - ay[seg]) * t_r
    fy_l = _merc_fy(lat_l, n_t)
    fy_r = _merc_fy(lat_r, n_t)
    ylo = np.maximum(np.floor(np.minimum(fy_l, fy_r)).astype(np.int64) - 1, y0)
    yhi = np.minimum(np.floor(np.maximum(fy_l, fy_r)).astype(np.int64) + 1, y1)
    ny = np.maximum(yhi - ylo + 1, 0)
    cx = np.repeat(col, ny)
    cy = np.repeat(ylo, ny) + (np.arange(int(ny.sum()))
                               - np.repeat(np.cumsum(ny) - ny, ny))
    key = np.unique((cy << np.int64(32)) | cx)
    return (key & np.int64(0xFFFFFFFF)), (key >> np.int64(32))


def _covering_runs(cx: np.ndarray, cy: np.ndarray, x0: int, x1: int,
                   y0: int, y1: int):
    """Maximal horizontal runs of NON-candidate tiles per grid row.
    Returns (ry, rxa, rxb) int64 arrays. Candidates must be unique and
    sorted by (cy, cx).

    Fully vectorized (VERDICT r5 #3 — this was the last Python-level row
    loop on the sparse hot path): every grid row gets two sentinel columns
    at x0-1 and x1+1 (outside the clamped candidate range, so they can't
    collide); after one lexicographic sort by (y, x), each same-row adjacent
    pair with a gap > 1 IS a maximal non-candidate run — including the
    before-first and after-last runs, courtesy of the sentinels. Work is
    O((K + 2·rows)·log), all in numpy."""
    rows = np.arange(y0, y1 + 1, dtype=np.int64)
    ys = np.concatenate([cy, rows, rows])
    xs = np.concatenate([cx,
                         np.full(rows.size, x0 - 1, np.int64),
                         np.full(rows.size, x1 + 1, np.int64)])
    # single-key lexsort: x spans [x0-1, x1+1] ⇒ (x - (x0-1)) fits well
    # under 2^32 for any tile zoom, so (y<<32 | xoff) orders by (y, x)
    order = np.argsort((ys << np.int64(32)) | (xs - np.int64(x0 - 1)))
    ys, xs = ys[order], xs[order]
    gap = (ys[1:] == ys[:-1]) & (xs[1:] > xs[:-1] + 1)
    return ys[1:][gap], xs[:-1][gap] + 1, xs[1:][gap] - 1


def polygon_covering_tiles(ring: np.ndarray, z: int,
                           cap: int | None = None) -> np.ndarray:
    """Tiles at zoom z whose bbox intersects the polygon. Returns (K,2) int64
    array of (x, y). Exact per the documented boundary rule (touch = cover).

    Two physical strategies, same logical result:
    ``cap`` is the dense/sparse routing threshold in grid cells; executor-side
    callers MUST pass the driver-resolved value (ADVICE r5: env vars do not
    propagate to executors on a real cluster, so reading TILEGEN_GRID_CAP
    here would silently pin the default); None = read the env (driver-side /
    standalone use).
     - grid ≤ cap cells: dense — vertex-tile marking (O(V)),
       corner-in-polygon ray cast and per-edge Liang–Barsky over all K tiles.
     - grid > cap (bbox-sparse features — the r4 VERDICT worker-OOM risk): a
       per-segment column walk enumerates O(covered) edge candidates, the
       SAME three exact tests run on just those, and interior tiles come from
       a scanline fill — any non-candidate run is uniformly in/out (an
       in/out flip inside a run would put a polygon edge through a run
       tile's closed bbox, making it a candidate), so one representative
       corner ray-cast per run decides the whole run. Work and memory are
       O(covered + V), not O(bbox area)."""
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if not np.allclose(r[0], r[-1]):
        r = np.vstack([r, r[0]])
    lons, lats = r[:, 0], np.clip(r[:, 1], -MAX_LAT, MAX_LAT)
    tx, ty = point_to_tile(lons, lats, z)
    x0, x1 = int(tx.min()), int(tx.max())
    y0, y1 = int(ty.min()), int(ty.max())
    if cap is None:
        cap = grid_cap()   # driver-side / standalone fallback
    if (x1 - x0 + 1) * (y1 - y0 + 1) <= cap:
        xx, yy, w, s, e, n = _tile_bounds_grid(z, x0, x1, y0, y1)
        nx = x1 - x0 + 1
        covered = np.zeros(xx.shape[0], dtype=bool)
        # (a) vertex inside tile ⇔ the vertex's own tile
        covered[(ty - y0) * nx + (tx - x0)] = True
        # (b) tile corner inside polygon: 4K corner ray-casts in one pass
        rem = ~covered
        if np.any(rem):
            cx = np.concatenate([w[rem], e[rem], e[rem], w[rem]])
            cy = np.concatenate([s[rem], s[rem], n[rem], n[rem]])
            hit4 = points_in_ring(cx, cy, r.ravel()).reshape(4, -1).any(axis=0)
            covered[np.nonzero(rem)[0][hit4]] = True
        # (c) polygon edge crosses the tile bbox
        rem = ~covered
        if np.any(rem):
            hit = _edges_cross_bboxes(r, w[rem], s[rem], e[rem], n[rem])
            covered[np.nonzero(rem)[0][hit]] = True
        return np.column_stack([xx[covered], yy[covered]])

    # sparse path: candidates = edge walk ∪ vertex tiles
    ex, ey = segment_candidate_tiles(r, z, x0, x1, y0, y1)
    key = np.unique(np.concatenate([(ey << np.int64(32)) | ex,
                                    (ty << np.int64(32)) | tx]))
    xx = key & np.int64(0xFFFFFFFF)
    yy = key >> np.int64(32)
    w, s, e, n = _tile_bounds_for(z, xx, yy)
    covered = np.zeros(xx.shape[0], dtype=bool)
    covered[np.searchsorted(key, (ty << np.int64(32)) | tx)] = True
    rem = ~covered
    if np.any(rem):
        cx = np.concatenate([w[rem], e[rem], e[rem], w[rem]])
        cy = np.concatenate([s[rem], s[rem], n[rem], n[rem]])
        hit4 = points_in_ring(cx, cy, r.ravel()).reshape(4, -1).any(axis=0)
        covered[np.nonzero(rem)[0][hit4]] = True
    rem = ~covered
    if np.any(rem):
        hit = _edges_cross_bboxes(r, w[rem], s[rem], e[rem], n[rem])
        covered[np.nonzero(rem)[0][hit]] = True
    # scanline fill of non-candidate runs (uniform in/out per run)
    ry, rxa, rxb = _covering_runs(xx, yy, x0, x1, y0, y1)
    if ry.size:
        rw, rs, _, _ = _tile_bounds_for(z, rxa, ry)
        fill = points_in_ring(rw, rs, r.ravel())
        ry, rxa, rxb = ry[fill], rxa[fill], rxb[fill]
        rl = rxb - rxa + 1
        fx_ = np.repeat(rxa, rl) + (np.arange(int(rl.sum()))
                                    - np.repeat(np.cumsum(rl) - rl, rl))
        fy_ = np.repeat(ry, rl)
        allk = np.concatenate([key[covered], (fy_ << np.int64(32)) | fx_])
    else:
        allk = key[covered]
    allk = np.sort(allk)
    return np.column_stack([allk & np.int64(0xFFFFFFFF),
                            allk >> np.int64(32)])


def line_covering_tiles(ring: np.ndarray, z: int,
                        cap: int | None = None) -> np.ndarray:
    """Tiles whose bbox a polyline touches — vertex-tile marking + per-edge
    Liang–Barsky accept. Dense grid under ``cap`` cells (None ⇒ read
    TILEGEN_GRID_CAP — driver-side only; executors get the resolved value
    in the task closure); above it,
    the segment column walk bounds candidates to O(covered) (same exact
    accept test either way)."""
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    lons, lats = r[:, 0], np.clip(r[:, 1], -MAX_LAT, MAX_LAT)
    tx, ty = point_to_tile(lons, lats, z)
    x0, x1 = int(tx.min()), int(tx.max())
    y0, y1 = int(ty.min()), int(ty.max())
    if cap is None:
        cap = grid_cap()   # driver-side / standalone fallback
    if (x1 - x0 + 1) * (y1 - y0 + 1) <= cap:
        xx, yy, w, s, e, n = _tile_bounds_grid(z, x0, x1, y0, y1)
        nx = x1 - x0 + 1
        covered = np.zeros(xx.shape[0], dtype=bool)
        covered[(ty - y0) * nx + (tx - x0)] = True
        rem = ~covered
        if np.any(rem):
            hit = _edges_cross_bboxes(r, w[rem], s[rem], e[rem], n[rem])
            covered[np.nonzero(rem)[0][hit]] = True
        return np.column_stack([xx[covered], yy[covered]])
    ex, ey = segment_candidate_tiles(r, z, x0, x1, y0, y1)
    key = np.unique(np.concatenate([(ey << np.int64(32)) | ex,
                                    (ty << np.int64(32)) | tx]))
    xx = key & np.int64(0xFFFFFFFF)
    yy = key >> np.int64(32)
    w, s, e, n = _tile_bounds_for(z, xx, yy)
    covered = np.zeros(xx.shape[0], dtype=bool)
    covered[np.searchsorted(key, (ty << np.int64(32)) | tx)] = True
    rem = ~covered
    if np.any(rem):
        hit = _edges_cross_bboxes(r, w[rem], s[rem], e[rem], n[rem])
        covered[np.nonzero(rem)[0][hit]] = True
    return np.column_stack([xx[covered], yy[covered]])


# ---------------------------------------------------------------------------
# G9 — Sutherland–Hodgman polygon clip against an axis-aligned bbox
# [Sutherland & Hodgman, CACM 1974]. Lines: Liang–Barsky per segment.
# ---------------------------------------------------------------------------

def clip_ring_bbox(ring: np.ndarray, w: float, s: float, e: float, n: float) -> np.ndarray:
    """Clip a ring (flat or (V,2)) to bbox; returns (V',2) array (may be empty).

    Four half-plane passes; vertices exactly on the boundary are kept.
    """
    pts = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if pts.shape[0] >= 2 and np.allclose(pts[0], pts[-1]):
        pts = pts[:-1]

    def clip_half(poly: np.ndarray, axis: int, bound: float, keep_ge: bool) -> np.ndarray:
        if poly.shape[0] == 0:
            return poly
        cur = poly
        prv = np.roll(poly, 1, axis=0)
        cv = cur[:, axis]
        pv = prv[:, axis]
        cin = (cv >= bound) if keep_ge else (cv <= bound)
        pin = (pv >= bound) if keep_ge else (pv <= bound)
        out_pts: list[np.ndarray] = []
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            t = (bound - pv) / (cv - pv)
            # t is only consumed on crossing edges (cv != pv → finite); zero
            # out inf/nan so the unused lanes don't overflow
            inter = prv + (cur - prv) * np.nan_to_num(t, nan=0.0, posinf=0.0, neginf=0.0)[:, None]
        for i in range(cur.shape[0]):
            if cin[i]:
                if not pin[i]:
                    out_pts.append(inter[i])
                out_pts.append(cur[i])
            elif pin[i]:
                out_pts.append(inter[i])
        return np.asarray(out_pts, dtype=np.float64).reshape(-1, 2)

    p = clip_half(pts, 0, w, True)
    p = clip_half(p, 0, e, False)
    p = clip_half(p, 1, s, True)
    p = clip_half(p, 1, n, False)
    return p


def clip_segments_bbox(coords: np.ndarray, w: float, s: float, e: float, n: float) -> list[np.ndarray]:
    """Liang–Barsky clip of a polyline to bbox → list of clipped sub-polylines."""
    pts = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
    pieces: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(pts.shape[0] - 1):
        x1, y1 = pts[i]
        x2, y2 = pts[i + 1]
        t0, t1 = 0.0, 1.0
        dx, dy = x2 - x1, y2 - y1
        ok = True
        for p, q in ((-dx, x1 - w), (dx, e - x1), (-dy, y1 - s), (dy, n - y1)):
            if p == 0:
                if q < 0:
                    ok = False
                    break
            else:
                t = q / p
                if p < 0:
                    t0 = max(t0, t)
                else:
                    t1 = min(t1, t)
        if not ok or t0 > t1:
            if cur:
                pieces.append(cur)
                cur = []
            continue
        a = np.array([x1 + t0 * dx, y1 + t0 * dy])
        b = np.array([x1 + t1 * dx, y1 + t1 * dy])
        if cur and np.allclose(cur[-1], a):
            cur.append(b)
        else:
            if cur:
                pieces.append(cur)
            cur = [a, b]
        if t1 < 1.0:
            pieces.append(cur)
            cur = []
    if cur:
        pieces.append(cur)
    return [np.asarray(p) for p in pieces if len(p) >= 2]


def clip_ring_bbox_fast(pts: list[tuple[float, float]], w: float, s: float,
                        e: float, n: float) -> list[tuple[float, float]]:
    """Pure-Python Sutherland–Hodgman for small rings (the tile-clip hot loop
    runs millions of clips on ≤~32-vertex rings, where numpy's per-array
    overhead dominates; this is ~8× faster there). Semantics identical to
    clip_ring_bbox (see test_kernels equivalence test)."""
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]

    def half(poly, axis, bound, keep_ge):
        if not poly:
            return poly
        out = []
        px, py = poly[-1]
        pv = px if axis == 0 else py
        pin = (pv >= bound) if keep_ge else (pv <= bound)
        for cx, cy in poly:
            cv = cx if axis == 0 else cy
            cin = (cv >= bound) if keep_ge else (cv <= bound)
            if cin != pin:
                t = (bound - pv) / (cv - pv)
                out.append((px + (cx - px) * t, py + (cy - py) * t))
            if cin:
                out.append((cx, cy))
            px, py, pv, pin = cx, cy, cv, cin
        return out

    p = half(list(pts), 0, w, True)
    p = half(p, 0, e, False)
    p = half(p, 1, s, True)
    p = half(p, 1, n, False)
    return p


# ---------------------------------------------------------------------------
# G10 — haversine distance (meters)
# ---------------------------------------------------------------------------

def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


# ---------------------------------------------------------------------------
# G11 — quantize lon/lat to tile-local integer coords [MVT 2.1 extent 4096]
# ---------------------------------------------------------------------------

MVT_EXTENT = 4096


def quantize_to_tile(lon: np.ndarray, lat: np.ndarray, z: int, x: int, y: int,
                     extent: int = MVT_EXTENT) -> tuple[np.ndarray, np.ndarray]:
    """Tile-local ints = (G2 tile fraction − tile index) · extent — exactly the
    point→tile formula, so quantization and assignment can never disagree,
    and the identical expression is emitted as SQL for the relational point
    path (plans/sqlgen.quantize_*)."""
    n = float(1 << z)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    fx = (lon + 180.0) / 360.0 * n - x
    lat_r = np.radians(lat)
    fy = (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n - y
    qx = np.floor(fx * extent + 0.5).astype(np.int64)
    qy = np.floor(fy * extent + 0.5).astype(np.int64)
    return np.clip(qx, 0, extent), np.clip(qy, 0, extent)


def dedupe_consecutive(qx: np.ndarray, qy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Drop repeated consecutive vertices after quantization [MVT 2.1]."""
    if qx.size == 0:
        return qx, qy
    keep = np.ones(qx.size, dtype=bool)
    keep[1:] = (qx[1:] != qx[:-1]) | (qy[1:] != qy[:-1])
    return qx[keep], qy[keep]


# ---------------------------------------------------------------------------
# G12 — shoelace signed area / winding normalization [MVT 2.1 §4.3.3.3]
# ---------------------------------------------------------------------------

def ring_signed_area(ring: np.ndarray) -> float:
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    if r.shape[0] >= 2 and np.allclose(r[0], r[-1]):
        r = r[:-1]
    if r.shape[0] < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def normalize_winding(ring: np.ndarray, ccw: bool = True) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    a = ring_signed_area(r)
    if (a < 0 and ccw) or (a > 0 and not ccw):
        return r[::-1].copy()
    return r


# ---------------------------------------------------------------------------
# G13 — rasterize polygon(s) onto a W×H tile grid (scanline fill)
# Grid cell (i, j) covered iff its center is inside a polygon (even-odd).
# ---------------------------------------------------------------------------

def rasterize_rings(rings: list[np.ndarray], w: float, s: float, e: float, n: float,
                    width: int = 256, height: int = 256) -> np.ndarray:
    """Binary coverage grid, row-major (row 0 = north edge), float32."""
    grid = np.zeros((height, width), dtype=np.float32)
    if not rings:
        return grid
    xs = w + (np.arange(width) + 0.5) * (e - w) / width
    ys = n - (np.arange(height) + 0.5) * (n - s) / height  # row 0 at north
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        if r.shape[0] >= 2 and np.allclose(r[0], r[-1]):
            r = r[:-1]
        if r.shape[0] < 3:
            continue
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        for row in range(height):
            py = ys[row]
            cond = (y1 > py) != (y2 > py)
            if not np.any(cond):
                continue
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            crossings = np.sort(xint[cond])
            # even-odd fill between crossing pairs
            for k in range(0, crossings.size - 1, 2):
                lo, hi = crossings[k], crossings[k + 1]
                grid[row] += ((xs > lo) & (xs < hi)).astype(np.float32)
    return (grid % 2 >= 1).astype(np.float32)


# ---------------------------------------------------------------------------
# G14 — vectorize a binary grid back to boundary rings (exact boundary trace)
# Pixel-boundary contour extraction: emits directed unit edges between filled
# and empty pixels, chains them into closed rings. Stronger than midpoint
# marching squares for our contract: re-rasterizing the rings (pixel-center
# even-odd test) reproduces the input grid EXACTLY — a pinnable round-trip.
# ---------------------------------------------------------------------------

def vectorize_grid(grid: np.ndarray) -> list[np.ndarray]:
    """Binary grid → list of closed boundary rings, coordinates matching the
    ``rasterize_rings`` frame with bounds (0, 0, W, H): x = column, y = H - row
    (y up, row 0 at the north/top edge). Deterministic (row-major scan,
    lexicographic tie-break when chaining)."""
    g = (np.asarray(grid) >= 0.5)
    h, w = g.shape
    up = np.zeros_like(g)
    up[1:, :] = g[:-1, :]
    down = np.zeros_like(g)
    down[:-1, :] = g[1:, :]
    left = np.zeros_like(g)
    left[:, 1:] = g[:, :-1]
    right = np.zeros_like(g)
    right[:, :-1] = g[:, 1:]

    segs: list[tuple[tuple[int, int], tuple[int, int]]] = []
    # clockwise around each filled pixel in row/col space (= CCW with y up)
    for i, j in zip(*np.nonzero(g & ~up)):
        segs.append(((j, i), (j + 1, i)))           # top edge, +x
    for i, j in zip(*np.nonzero(g & ~right)):
        segs.append(((j + 1, i), (j + 1, i + 1)))   # right edge, +y(down)
    for i, j in zip(*np.nonzero(g & ~down)):
        segs.append(((j + 1, i + 1), (j, i + 1)))   # bottom edge, -x
    for i, j in zip(*np.nonzero(g & ~left)):
        segs.append(((j, i + 1), (j, i)))           # left edge, -y(down)

    from collections import defaultdict
    start: dict[tuple[int, int], list[int]] = defaultdict(list)
    for idx, (a, _b) in enumerate(segs):
        start[a].append(idx)
    for lst in start.values():
        lst.sort(key=lambda k: segs[k][1])
    used = [False] * len(segs)
    rings: list[np.ndarray] = []
    for idx in range(len(segs)):
        if used[idx]:
            continue
        used[idx] = True
        a, b = segs[idx]
        ring = [a, b]
        while ring[-1] != ring[0]:
            nxts = [k for k in start.get(ring[-1], []) if not used[k]]
            if not nxts:
                break
            k = nxts[0]
            used[k] = True
            ring.append(segs[k][1])
        if ring[-1] == ring[0] and len(ring) >= 4:
            arr = np.asarray(ring[:-1], dtype=np.float64)
            arr[:, 1] = h - arr[:, 1]  # row/col → y-up frame
            rings.append(arr)
    return rings
