"""Discrete spatial cell indexes: H3-lite hex grid and S2-lite Hilbert quadtree.

SURVEY.md §2.8 G5/G6. The spec (``BASELINE.json:6,14``) mandates "H3/S2 cell
encoding" and "kNN via indexed broadcast of cell neighbors"; the *consumed*
properties are (a) a deterministic hierarchical cell id per point, (b) a kRing
neighborhood function, (c) parent/child navigation. We implement those
properties from scratch on the Web-Mercator plane — planar axial hex grid
(H3-lite) and Hilbert-ordered Mercator quadtree (S2-lite). These are NOT
byte-compatible with the real H3/S2 libraries (neither is installed here);
compatibility is not the contract — determinism and hierarchy are (SURVEY.md
§7 "hard parts").

All functions are numpy-vectorized, stateless, suitable for Arrow pandas_udfs.
"""

from __future__ import annotations

import numpy as np

from .kernels import MERCATOR_R, lonlat_to_mercator, mercator_to_lonlat

_WORLD = MERCATOR_R * np.pi  # half-extent of the mercator square
_HEX_OFF = np.int64(1) << np.int64(26)  # axial coordinate offset (always >0)

# Hex cell size (circumradius, meters) per resolution 0..15: res 0 ≈ 1000 km,
# each next resolution shrinks by ~2.6 (matching H3's ~2.65 aperture-7 feel).
HEX_RES_M = np.array([1.0e6 / (2.6 ** r) for r in range(16)])


# ---------------------------------------------------------------------------
# G5 — H3-lite: pointy-top axial hex grid on the mercator plane
# ---------------------------------------------------------------------------

def _axial_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cube-rounding of fractional axial coords (standard hex-grid algorithm)."""
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.rint(xf)
    ry = np.rint(yf)
    rz = np.rint(zf)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_cell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """int64 hex cell id at resolution res (0..15): packs (res, q, r)."""
    mx, my = lonlat_to_mercator(lon, lat)
    size = HEX_RES_M[res]
    # pointy-top axial: q = (sqrt(3)/3 x - 1/3 y)/s ; r = (2/3 y)/s
    qf = (np.sqrt(3.0) / 3.0 * mx - my / 3.0) / size
    rf = (2.0 / 3.0 * my) / size
    q, r = _axial_round(qf, rf)
    return pack_hex(np.full(q.shape, res, dtype=np.int64), q, r)


def pack_hex(res: np.ndarray, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (np.asarray(res, np.int64) << np.int64(56)) | ((q + _HEX_OFF) << np.int64(28)) | (r + _HEX_OFF)


def unpack_hex(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> np.int64(56)
    q = ((cell >> np.int64(28)) & np.int64((1 << 28) - 1)) - _HEX_OFF
    r = (cell & np.int64((1 << 28) - 1)) - _HEX_OFF
    return res, q, r


def hex_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell id → (lon, lat) of hex center."""
    res, q, r = unpack_hex(cell)
    size = HEX_RES_M[res.astype(np.int64)] if np.ndim(res) else HEX_RES_M[int(res)]
    mx = size * np.sqrt(3.0) * (q.astype(np.float64) + r.astype(np.float64) / 2.0)
    my = size * 1.5 * r.astype(np.float64)
    return mercator_to_lonlat(mx, my)


def hex_kring_offsets(k: int) -> np.ndarray:
    """Axial (dq, dr) offsets of the radius-k hex disk; size 1+3k(k+1)."""
    out = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            out.append((dq, dr))
    return np.asarray(out, dtype=np.int64)


def hex_kring(cell: np.ndarray, k: int) -> np.ndarray:
    """(N,) cell ids → (N, 1+3k(k+1)) neighbor ids (disk incl. center)."""
    res, q, r = unpack_hex(cell)
    offs = hex_kring_offsets(k)
    qq = q[:, None] + offs[None, :, 0]
    rr = r[:, None] + offs[None, :, 1]
    return pack_hex(np.broadcast_to(res[:, None], qq.shape), qq, rr)


# ---------------------------------------------------------------------------
# G6 — S2-lite: Hilbert-curve position in the level-30 mercator quadtree
# ---------------------------------------------------------------------------

S2_MAX_LEVEL = 30


def _hilbert_d(ix: np.ndarray, iy: np.ndarray, order: int) -> np.ndarray:
    """xy → Hilbert curve distance, vectorized (standard bit-twiddle loop)."""
    rx = np.zeros_like(ix)
    d = np.zeros(ix.shape, dtype=np.int64)
    x = ix.astype(np.int64).copy()
    y = iy.astype(np.int64).copy()
    s = np.int64(1) << np.int64(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x2 = np.where(swap, y_f, x_f)
        y2 = np.where(swap, x_f, y_f)
        x, y = x2, y2
        s >>= np.int64(1)
    return d


def s2_quad_ixiy(lon: np.ndarray, lat: np.ndarray,
                 level: int = S2_MAX_LEVEL) -> tuple[np.ndarray, np.ndarray]:
    """Pre-Hilbert quadtree coordinates (ix, iy) at `level` on the mercator
    square — pure floor arithmetic, so it HAS a cross-engine SQL twin
    (plans/sqlgen.s2_quad_*), unlike the Hilbert position."""
    mx, my = lonlat_to_mercator(lon, lat)
    n = np.int64(1) << np.int64(level)
    fx = (mx + _WORLD) / (2.0 * _WORLD)
    fy = (my + _WORLD) / (2.0 * _WORLD)
    ix = np.clip((fx * float(n)).astype(np.int64), 0, n - 1)
    iy = np.clip((fy * float(n)).astype(np.int64), 0, n - 1)
    return ix, iy


def s2_quad_pack(ix: np.ndarray, iy: np.ndarray, level: int) -> np.ndarray:
    """(ix, iy) → packed int64 ix*2^level + iy (fits: 2*level ≤ 60)."""
    return (np.asarray(ix, np.int64) << np.int64(level)) + np.asarray(iy, np.int64)


def s2_cell(lon: np.ndarray, lat: np.ndarray, level: int = S2_MAX_LEVEL) -> np.ndarray:
    """int64 Hilbert position of the level-`level` quadtree cell (0..4^level)."""
    ix, iy = s2_quad_ixiy(lon, lat, level)
    return _hilbert_d(ix, iy, level)


def s2_parent(cell: np.ndarray, level: int, parent_level: int) -> np.ndarray:
    """Hilbert position at `level` → position of containing cell at coarser
    `parent_level` (prefix property of the Hilbert curve)."""
    shift = np.int64(2 * (level - parent_level))
    return np.asarray(cell, dtype=np.int64) >> shift


def s2_children_range(cell: np.ndarray, level: int, child_level: int) -> tuple[np.ndarray, np.ndarray]:
    """Contiguous child-position range [lo, hi) at finer child_level — Hilbert
    locality makes children a contiguous range, enabling range-join pruning."""
    shift = np.int64(2 * (child_level - level))
    c = np.asarray(cell, dtype=np.int64)
    return c << shift, (c + np.int64(1)) << shift
