"""Batched multi-tile clipping (the r3 "slow path" of clip_shapes_direct).

The r2 pipeline spent 74% of its local[32] wall time in per-(feature, zoom)
Python: a covering-tiles kernel call per row plus a pure-Python
Sutherland–Hodgman / Liang–Barsky clip per covering tile (~0.38 ms/row of
call overhead at 13.9M output rows). This module replaces that loop with
ragged-array numpy over the WHOLE Arrow batch:

 - candidate tiles = the feature's vertex-tile bbox grid (exactly the grid
   the covering kernel enumerated);
 - every (tile, ring) instance is clipped by FOUR vectorized half-plane
   passes (Sutherland–Hodgman, same interpolation expression as
   kernels.clip_ring_bbox_fast, so outputs are bit-identical);
 - lines run a vectorized Liang–Barsky over (tile, segment) instances with
   the same piece-joining rule as kernels.clip_segments_bbox;
 - quantize → dedupe → closing-strip → degenerate-drop → MVT winding runs
   once over the flat instance arrays (shared finalize with the single-tile
   fast path).

Dropping the explicit covering test is sound: a candidate tile disjoint
from the geometry clips to a zero-area boundary chain (Sutherland–Hodgman
output ⊆ tile ∩ polygon = ∅ up to boundary slivers) or to no line pieces,
which the degenerate-drop removes — so emitted rows equal the covering
loop's rows exactly (pinned by the fastpath parity pytest).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import kernels as K

CLIP_COLUMNS = ("z", "x", "y", "feature_id", "geom", "off")


def _empty_frame() -> pd.DataFrame:
    return pd.DataFrame({
        "z": pd.Series([], dtype="int32"), "x": pd.Series([], dtype="int64"),
        "y": pd.Series([], dtype="int64"),
        "feature_id": pd.Series([], dtype="int64"),
        "geom": pd.Series([], dtype=object),
        "off": pd.Series([], dtype=object)})


def _ragged_arange(lens: np.ndarray) -> np.ndarray:
    total = int(lens.sum())
    return np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)


def _gather(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat index array selecting lens[i] items from starts[i] for each i."""
    return np.repeat(starts, lens) + _ragged_arange(lens)


def quantize_instances(vx: np.ndarray, vy: np.ndarray, L: np.ndarray,
                       inst_unit: np.ndarray, unit_z: np.ndarray,
                       unit_x: np.ndarray, unit_y: np.ndarray,
                       extent: int) -> tuple[np.ndarray, np.ndarray]:
    """kernels.quantize_to_tile, elementwise over ragged instances."""
    nz = np.power(2.0, unit_z.astype(np.float64))
    n_v = np.repeat(nz[inst_unit], L)
    x_v = np.repeat(unit_x[inst_unit].astype(np.float64), L)
    y_v = np.repeat(unit_y[inst_unit].astype(np.float64), L)
    lat = np.clip(vy, -K.MAX_LAT, K.MAX_LAT)
    fx = (vx + 180.0) / 360.0 * n_v - x_v
    lr = np.radians(lat)
    fy = (1.0 - np.log(np.tan(lr) + 1.0 / np.cos(lr)) / np.pi) / 2.0 * n_v - y_v
    qx = np.clip(np.floor(fx * extent + 0.5).astype(np.int64), 0, extent)
    qy = np.clip(np.floor(fy * extent + 0.5).astype(np.int64), 0, extent)
    return qx, qy


def finalize_instances(qx: np.ndarray, qy: np.ndarray, L: np.ndarray,
                       inst_unit: np.ndarray, inst_is_poly: np.ndarray,
                       ring_ord: np.ndarray, n_unit: int):
    """Quantized instances → (qx3, qy3, S3, L3, inst_keep, flip).

    Implements _quantize_polygon_rings / the line path semantics batched:
    dedupe consecutive, strip exact closing vertex (polygons), drop rings
    with < 3 verts or zero shoelace area (a dead exterior kills its whole
    unit), keep line pieces with >= 2 verts, flip winding per MVT 2.1
    §4.3.3.3 (exterior positive in y-down ints, holes negative).
    """
    tot_inst = L.size
    V = int(L.sum())
    inst_vstart = np.cumsum(L) - L
    v_inst = np.repeat(np.arange(tot_inst), L)
    keep = np.zeros(V, dtype=bool)
    keep[inst_vstart[L > 0]] = True
    if V:
        keep[1:] |= (qx[1:] != qx[:-1]) | (qy[1:] != qy[:-1])
    qx2, qy2 = qx[keep], qy[keep]
    L2 = np.bincount(v_inst, weights=keep, minlength=tot_inst).astype(np.int64)
    S2 = np.cumsum(L2) - L2

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

    # shoelace per instance (exact in float64: |terms| < 2^26)
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

    poly_ok = inst_is_poly & (L3 >= 3) & (area2 != 0.0)
    line_ok = ~inst_is_poly & (L3 >= 2)
    ext_dead = inst_is_poly & (ring_ord == 0) & ~poly_ok
    unit_dead = np.zeros(n_unit, dtype=bool)
    unit_dead[inst_unit[ext_dead]] = True
    inst_keep = (poly_ok | line_ok) & ~unit_dead[inst_unit]
    flip = poly_ok & ((area2 > 0.0) != (ring_ord == 0))
    return qx3, qy3, S3, L3, inst_keep, flip


def assemble_arrays(qx3, qy3, S3, L3, inst_keep, flip, inst_unit,
                    unit_z, unit_x, unit_y, unit_fid, pack: bool = False):
    """assemble_rows' array-native core (r7): one output row per unit with
    >= 1 kept instance, as FLAT COLUMNS + LIST BUFFERS instead of Python
    lists — ``(z, x, y, fid, geom_vals, geom_offsets, off_vals,
    off_offsets, off_single)`` where row i's geom is
    ``geom_vals[geom_offsets[i]:geom_offsets[i+1]]`` and its off list is
    ``off_vals[off_offsets[i]:off_offsets[i+1]]`` (``off_single[i]`` marks
    single-piece rows, the ones the packed transport nulls out). These are
    EXACTLY Arrow ListArray (values, offsets) buffers, so the Arrow path
    emits them with zero per-row Python (guide §4.2: a list column is one
    data buffer plus an offsets array — compute the offsets, never split).
    """
    empty = (np.zeros(0, np.int32), np.zeros(0, np.int64),
             np.zeros(0, np.int64), np.zeros(0, np.int64),
             np.zeros(0, np.int32), np.zeros(1, np.int64),
             np.zeros(0, np.int32), np.zeros(1, np.int64),
             np.zeros(0, bool))
    kept = np.nonzero(inst_keep)[0]
    if kept.size == 0:
        return empty
    if pack:
        vals_src = (qx3.astype(np.int32) << np.int32(16)) | qy3.astype(np.int32)
        width = 1
    else:
        vals_src = np.empty((qx3.size, 2), dtype=np.int32)
        vals_src[:, 0] = qx3
        vals_src[:, 1] = qy3
        width = 2
    Lk = L3[kept].astype(np.int64)
    fk = flip[kept]
    start = np.where(fk, S3[kept] + Lk - 1, S3[kept])
    step = np.where(fk, np.int64(-1), np.int64(1))
    vidx = np.repeat(start, Lk) + _ragged_arange(Lk) * np.repeat(step, Lk)
    geom_vals = vals_src[vidx].ravel()
    units = inst_unit[kept]
    ub = np.nonzero(np.diff(units))[0] + 1
    u_starts = np.concatenate([[0], ub]).astype(np.int64)
    u_end = np.concatenate([ub, [kept.size]]).astype(np.int64)
    u_ids = units[u_starts]
    ints_per_inst = Lk * width
    csum = np.cumsum(ints_per_inst)
    row_ints = np.add.reduceat(ints_per_inst, u_starts)
    geom_offsets = np.concatenate([[0], np.cumsum(row_ints)])
    pre = np.concatenate([[0], csum[:-1]])
    rel = (csum - np.repeat(pre[u_starts], u_end - u_starts)).astype(np.int32)
    insts_per_row = u_end - u_starts
    off_single = insts_per_row == 1
    off_len = insts_per_row + 1          # leading 0 + one end per piece
    off_offsets = np.concatenate([[0], np.cumsum(off_len)])
    off_vals = np.zeros(int(off_len.sum()), np.int32)
    tpos = (np.repeat(off_offsets[:-1] + 1, insts_per_row)
            + _ragged_arange(insts_per_row))
    off_vals[tpos] = rel
    return (np.asarray(unit_z)[u_ids].astype(np.int32),
            np.asarray(unit_x)[u_ids].astype(np.int64),
            np.asarray(unit_y)[u_ids].astype(np.int64),
            np.asarray(unit_fid)[u_ids].astype(np.int64),
            geom_vals, geom_offsets, off_vals, off_offsets, off_single)


def assemble_rows(rows: dict[str, list], qx3, qy3, S3, L3, inst_keep, flip,
                  inst_unit, unit_z, unit_x, unit_y, unit_fid,
                  pack: bool = False) -> None:
    """Append one output row per unit with >= 1 kept instance (geom pieces
    in instance order) into the `rows` dict-of-lists.

    FLAT transport (r4): each row carries one concatenated int list `geom`
    plus prefix offsets `off` ([0, l1, l1+l2, ...]) instead of the nested
    array<array<int>> — and no kind/props. The per-(tile, zoom) row payload
    through the two agg exchanges was ~2x what it needed to be (VERDICT r3
    "What's wrong #1"); kind/props rejoin once per FEATURE post-agg and the
    nested view is rebuilt relationally (tiles.nest_geom).

    r7: vectorized — one gather with per-instance optional reversal over all
    kept instances, np.split at per-unit boundaries (kept instances of a
    unit are contiguous: inst_unit is non-decreasing by construction in
    every caller), so per-row Python shrinks from slice/flip/ravel/tolist
    per instance (~6.6 µs/output row, cProfile) to one split+tolist.
    Output rows and values are byte-identical to the loop form."""
    kept = np.nonzero(inst_keep)[0]
    if kept.size == 0:
        return
    if pack:
        # r5 packed transport: one (qx<<16|qy) int per vertex
        out = (qx3.astype(np.int32) << np.int32(16)) | qy3.astype(np.int32)
        width = 1
    else:
        out = np.empty((qx3.size, 2), dtype=np.int32)
        out[:, 0] = qx3
        out[:, 1] = qy3
        width = 2
    Lk = L3[kept].astype(np.int64)
    fk = flip[kept]
    start = np.where(fk, S3[kept] + Lk - 1, S3[kept])
    step = np.where(fk, np.int64(-1), np.int64(1))
    vidx = np.repeat(start, Lk) + _ragged_arange(Lk) * np.repeat(step, Lk)
    vals = out[vidx].ravel()
    units = inst_unit[kept]
    ub = np.nonzero(np.diff(units))[0] + 1
    u_starts = np.concatenate([[0], ub]).astype(np.int64)
    u_end = np.concatenate([ub, [kept.size]]).astype(np.int64)
    u_ids = units[u_starts]
    ints_per_inst = Lk * width
    csum = np.cumsum(ints_per_inst)
    row_ints = np.add.reduceat(ints_per_inst, u_starts)
    splits = np.cumsum(row_ints)[:-1]
    rows["z"].extend(np.asarray(unit_z)[u_ids].tolist())
    rows["x"].extend(np.asarray(unit_x)[u_ids].tolist())
    rows["y"].extend(np.asarray(unit_y)[u_ids].tolist())
    rows["feature_id"].extend(np.asarray(unit_fid)[u_ids].tolist())
    rows["geom"].extend(a.tolist() for a in np.split(vals, splits))
    pre = np.concatenate([[0], csum[:-1]])
    rel = csum - np.repeat(pre[u_starts], u_end - u_starts)
    off_all = rel.tolist()
    rows["off"].extend([0] + off_all[s:e]
                       for s, e in zip(u_starts.tolist(), u_end.tolist()))


def _sh_pass(vx: np.ndarray, vy: np.ndarray, L: np.ndarray,
             bound: np.ndarray, axis: int, keep_ge: bool):
    """One Sutherland–Hodgman half-plane pass over all ragged instances.

    Same emission order and interpolation expression as
    kernels.clip_ring_bbox_fast.half (t = (bound-pv)/(cv-pv); point =
    prev + (cur-prev)·t on BOTH axes), so outputs are bit-identical.
    """
    V = vx.size
    if V == 0:
        return vx, vy, L
    S = np.cumsum(L) - L
    prev = np.arange(V) - 1
    nz = L > 0
    prev[S[nz]] = (S + L - 1)[nz]
    b_v = np.repeat(bound, L)
    px, py = vx[prev], vy[prev]
    cv = vx if axis == 0 else vy
    pv = px if axis == 0 else py
    cin = (cv >= b_v) if keep_ge else (cv <= b_v)
    pin = (pv >= b_v) if keep_ge else (pv <= b_v)
    crossing = cin != pin
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        t = (b_v - pv) / (cv - pv)
        ix = px + (vx - px) * t
        iy = py + (vy - py) * t
    count = crossing.astype(np.int64) + cin
    v_inst = np.repeat(np.arange(L.size), L)
    newL = np.bincount(v_inst, weights=count, minlength=L.size).astype(np.int64)
    pos = np.cumsum(count) - count
    total = int(count.sum())
    ox = np.empty(total)
    oy = np.empty(total)
    ox[pos[crossing]] = ix[crossing]
    oy[pos[crossing]] = iy[crossing]
    cpos = (pos + crossing)[cin]
    ox[cpos] = vx[cin]
    oy[cpos] = vy[cin]
    return ox, oy, newL


def clip_polys_batched(vx, vy, L, inst_unit, west, south, east, north):
    """S–H clip every (tile, ring) instance against its tile bbox: four
    half-plane passes, all instances at once."""
    w_i, s_i = west[inst_unit], south[inst_unit]
    e_i, n_i = east[inst_unit], north[inst_unit]
    vx, vy, L = _sh_pass(vx, vy, L, w_i, 0, True)
    vx, vy, L = _sh_pass(vx, vy, L, e_i, 0, False)
    vx, vy, L = _sh_pass(vx, vy, L, s_i, 1, True)
    vx, vy, L = _sh_pass(vx, vy, L, n_i, 1, False)
    return vx, vy, L


def clip_lines_batched(x1, y1, x2, y2, seg_unit, seg_first, west, south,
                       east, north):
    """Liang–Barsky over all (tile, segment) instances + piece assembly.

    Returns (pvx, pvy, pieceL, piece_unit): ragged piece polylines per unit,
    joined exactly like kernels.clip_segments_bbox (continuation iff the
    previous segment was accepted, un-truncated at t1 == 1, and its exit
    point allcloses the next entry point).
    """
    w_s, s_s = west[seg_unit], south[seg_unit]
    e_s, n_s = east[seg_unit], north[seg_unit]
    dx, dy = x2 - x1, y2 - y1
    t0 = np.zeros(x1.size)
    t1 = np.ones(x1.size)
    reject = np.zeros(x1.size, dtype=bool)
    for p_a, q_a in ((-dx, x1 - w_s), (dx, e_s - x1),
                     (-dy, y1 - s_s), (dy, n_s - y1)):
        zero = p_a == 0
        reject |= zero & (q_a < 0)
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            t = q_a / p_a
        neg = p_a < 0
        t0 = np.where(neg, np.maximum(t0, t), t0)
        t1 = np.where(~neg & ~zero, np.minimum(t1, t), t1)
    accept = ~reject & (t0 <= t1)
    ax = x1 + t0 * dx
    ay = y1 + t0 * dy
    bx = x1 + t1 * dx
    by = y1 + t1 * dy

    # continuation rule (np.allclose defaults: atol 1e-8, rtol 1e-5 vs a)
    prev_ok = np.zeros(accept.size, dtype=bool)
    prev_ok[1:] = accept[:-1] & (t1[:-1] == 1.0) & ~seg_first[1:]
    join = np.zeros(accept.size, dtype=bool)
    if accept.size > 1:
        close_x = np.abs(bx[:-1] - ax[1:]) <= 1e-8 + 1e-5 * np.abs(ax[1:])
        close_y = np.abs(by[:-1] - ay[1:]) <= 1e-8 + 1e-5 * np.abs(ay[1:])
        join[1:] = close_x & close_y
    cont = accept & prev_ok & join
    new_piece = accept & ~cont

    n_pieces = int(new_piece.sum())
    if n_pieces == 0:
        z = np.zeros(0)
        return z, z, np.zeros(0, np.int64), np.zeros(0, np.int64)
    piece_id = np.cumsum(new_piece) - 1          # valid where accept
    count = np.where(accept, 1 + new_piece.astype(np.int64), 0)
    pieceL = np.bincount(piece_id[accept], weights=count[accept],
                         minlength=n_pieces).astype(np.int64)
    piece_unit = seg_unit[new_piece]
    pos = np.cumsum(count) - count
    total = int(count.sum())
    pvx = np.empty(total)
    pvy = np.empty(total)
    pvx[pos[new_piece]] = ax[new_piece]
    pvy[pos[new_piece]] = ay[new_piece]
    bpos = (pos + new_piece)[accept]
    pvx[bpos] = bx[accept]
    pvy[bpos] = by[accept]
    return pvx, pvy, pieceL, piece_unit


def _lb_edges_hit(units, iu, x1, y1, x2, y2, west, south, east, north,
                  n_unit: int) -> np.ndarray:
    """kernels._edges_cross_bboxes batched over (unit, edge) instances:
    per-unit boolean 'any edge Liang–Barsky-accepts against the tile bbox'."""
    w_i, s_i = west[iu], south[iu]
    e_i, n_i = east[iu], north[iu]
    dx, dy = x2 - x1, y2 - y1
    t0 = np.zeros(x1.size)
    t1 = np.ones(x1.size)
    ok = np.ones(x1.size, dtype=bool)
    for p_a, q_a in ((-dx, x1 - w_i), (dx, e_i - x1),
                     (-dy, y1 - s_i), (dy, n_i - y1)):
        zero = p_a == 0
        ok &= ~zero | (q_a >= 0)
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            t = q_a / p_a
        neg = p_a < 0
        t0 = np.where(neg, np.maximum(t0, t), t0)
        t1 = np.where(~neg & ~zero, np.minimum(t1, t), t1)
    acc = ok & (t0 <= t1)
    return np.bincount(iu[acc], minlength=n_unit) > 0


def _covering_mask(n_rows, n_unit, unit_row, unit_base, ux, uy, west, south,
                   east, north, verts, S0, L0, xt, yt, x0, y0, gx,
                   is_line_row) -> np.ndarray:
    """Batched replication of kernels.polygon_covering_tiles /
    tiles._line_covering_tiles over every candidate unit: (a) vertex-tile
    marking, (b) tile-corner-in-ring (polygons; even-odd + the kernel's
    exact on-edge rule, wraparound edges of the allclose-stripped ring),
    (c) any-edge Liang–Barsky accept (closed ring for polygons, raw
    polyline for lines). Same tests, same tolerances, same floats — so the
    kept tile set equals the reference covering exactly."""
    covered = np.zeros(n_unit, dtype=bool)

    # (a) vertex tiles
    v_row = np.repeat(np.arange(n_rows), L0)
    vu = unit_base[v_row] + (yt - y0[v_row]) * gx[v_row] + (xt - x0[v_row])
    covered[vu] = True

    # closed ring per polygon row (np.allclose closure rule)
    le = S0 + L0 - 1
    fx_, fy_ = verts[S0, 0], verts[S0, 1]
    lx_, ly_ = verts[le, 0], verts[le, 1]
    app = ~((np.abs(fx_ - lx_) <= 1e-8 + 1e-5 * np.abs(lx_))
            & (np.abs(fy_ - ly_) <= 1e-8 + 1e-5 * np.abs(ly_)))
    crL = L0 + app
    crS = np.cumsum(crL) - crL
    offc = _ragged_arange(crL)
    rS0 = np.repeat(S0, crL)
    gidx = np.where(offc < np.repeat(L0, crL), rS0 + offc, rS0)
    crx = verts[gidx, 0]
    cry = verts[gidx, 1]
    srL = crL - 1      # allclose-stripped ring (cr is closed by construction)

    poly_u = ~is_line_row[unit_row]

    # (b) tile corner inside ring — remaining polygon units only
    rem = np.nonzero(poly_u & ~covered)[0]
    if rem.size:
        ne = srL[unit_row[rem]]
        iu = np.repeat(rem, ne)
        j = _ragged_arange(ne)
        base = crS[unit_row[iu]]
        nloc = np.repeat(ne, ne)
        i1 = base + j
        i2 = base + (j + 1) % nloc
        x1, y1 = crx[i1], cry[i1]
        x2, y2 = crx[i2], cry[i2]
        dx, dy = x2 - x1, y2 - y1
        seg2 = dx * dx + dy * dy
        tol = 1e-12 * np.maximum(1.0, np.sqrt(seg2))
        hit_b = np.zeros(n_unit, dtype=bool)
        for cx_, cy_ in ((west, south), (east, south), (east, north),
                         (west, north)):
            px, py = cx_[iu], cy_[iu]
            cond = (y1 > py) != (y2 > py)
            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            crosses = cond & (px < xint)
            par = np.bincount(iu[crosses], minlength=n_unit) % 2 == 1
            crossv = (px - x1) * dy - (py - y1) * dx
            dot = (px - x1) * dx + (py - y1) * dy
            # NOTE: no seg2>0 mask — the scalar kernel treats a zero-length
            # edge as matching every point; replicated bug-for-bug
            on = (np.abs(crossv) <= tol) & (dot >= 0) & (dot <= seg2)
            on_u = np.bincount(iu[on], minlength=n_unit) > 0
            hit_b |= par | on_u
        covered |= hit_b

    # (c) edge crosses tile bbox — remaining units; polygons use the closed
    # ring's consecutive edges, lines the raw polyline's
    rem = np.nonzero(poly_u & ~covered)[0]
    if rem.size:
        ne = crL[unit_row[rem]] - 1
        iu = np.repeat(rem, ne)
        j = _ragged_arange(ne)
        i1 = crS[unit_row[iu]] + j
        covered |= _lb_edges_hit(rem, iu, crx[i1], cry[i1], crx[i1 + 1],
                                 cry[i1 + 1], west, south, east, north,
                                 n_unit)
    rem = np.nonzero(~poly_u & ~covered)[0]
    if rem.size:
        ne = L0[unit_row[rem]] - 1
        iu = np.repeat(rem, ne)
        j = _ragged_arange(ne)
        i1 = np.repeat(S0[unit_row[rem]], ne) + j
        covered |= _lb_edges_hit(rem, iu, verts[i1, 0], verts[i1, 1],
                                 verts[i1 + 1, 0], verts[i1 + 1, 1],
                                 west, south, east, north, n_unit)
    return covered


def _row_weights_arrays(zs: np.ndarray, nv: np.ndarray, r0_start: np.ndarray,
                        r0_len: np.ndarray,
                        verts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """_row_weights core over flat structures: ring-0 slices (vertex start +
    length into the global ``verts``) and per-row total vertex counts."""
    idx = _gather(r0_start, r0_len)
    lon = np.nan_to_num(verts[idx, 0], nan=0.0, posinf=180.0, neginf=-180.0)
    lat = np.clip(np.nan_to_num(verts[idx, 1], nan=0.0, posinf=K.MAX_LAT,
                                neginf=-K.MAX_LAT), -K.MAX_LAT, K.MAX_LAT)
    n_v = np.repeat(np.power(2.0, zs.astype(np.float64)), r0_len)
    xt = np.clip(np.floor((lon + 180.0) / 360.0 * n_v), 0, n_v - 1)
    lat_r = np.radians(lat)
    yt = np.clip(np.floor(
        (1.0 - np.log(np.tan(lat_r) + 1.0 / np.cos(lat_r)) / np.pi) / 2.0 * n_v),
        0, n_v - 1)
    S = np.cumsum(r0_len) - r0_len
    grid = ((np.maximum.reduceat(xt, S) - np.minimum.reduceat(xt, S) + 1.0)
            * (np.maximum.reduceat(yt, S) - np.minimum.reduceat(yt, S) + 1.0)
            ).astype(np.int64)
    return np.maximum(grid * nv, 1), grid


def _row_weights(b: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Cheap per-row cost estimate for chunking: candidate-grid tile count x
    total ring vertices (the instance-array footprint the clip passes
    allocate). Uses ring-0's vertex-tile bbox only — an upper-bound proxy, not
    the exact covering (which is what the clip itself computes). Returns
    (weight, grid_cells) so slow_batch can route bbox-sparse rows (grid over
    TILEGEN_GRID_CAP) to the sparse core."""
    # vectorized over the whole batch — the per-row loop (scalar
    # nan_to_num + a point_to_tile call per row) cost ~165 µs/row, more
    # than the chunking it guards saves (cProfile: ~4 of the slow stage's
    # 6.4 s wall went to this estimator). One concatenated ring-0 vertex
    # array + segment min/max via reduceat computes identical weights.
    n = len(b)
    zs = b["_z"].to_numpy(np.int64)
    coords_list = b["coords"].tolist()
    nv = np.fromiter((sum(len(c) for c in cs) // 2 for cs in coords_list),
                     np.int64, n)
    r0 = [np.asarray(cs[0], np.float64) for cs in coords_list]
    L = np.fromiter((a.size // 2 for a in r0), np.int64, n)
    allv = np.concatenate(r0).reshape(-1, 2)
    S = np.cumsum(L) - L
    return _row_weights_arrays(zs, nv, S, L, allv)


def slow_batch(b: pd.DataFrame, extent: int,
               cap: int | None = None, pack: bool = False,
               gcap: int | None = None) -> pd.DataFrame:
    """One Arrow batch of multi-tile (feature, _z) rows → clipped tile rows.

    Memory-bounded two ways:
     - a skewed batch of large low-zoom polygons (~10^3 covering tiles) is
       split into sub-batches whose estimated instance-vertex total stays
       under ``cap`` (TILEGEN_SLOW_CAP, default 8M ~ 64 MB per float64 work
       array), since the core materializes per-(tile, ring) instance arrays
       for the whole batch at once;
     - a bbox-sparse row (candidate grid over TILEGEN_GRID_CAP cells — e.g. a
       continent-spanning diagonal line at z12, whose full bbox grid would be
       ~16.7M cells for O(10^3) actually-covered tiles) routes to
       _sparse_core, which enumerates the EXACT covering via the O(covered)
       kernels and clips only those units, in tile chunks sized to ``cap``.
    Contiguous splits preserve row order => output order.
    """
    import os
    n_rows = len(b)
    if n_rows == 0:
        return _empty_frame()
    if cap is None:
        cap = int(os.environ.get("TILEGEN_SLOW_CAP", "8000000"))
    w, g = _row_weights(b)
    if gcap is None:
        # standalone/test use only — plan-builders pass the driver-resolved
        # value (ADVICE r5: executor env != driver env on a real cluster)
        gcap = K.grid_cap()
    if int(w.sum()) <= cap and int(g.max()) <= gcap:
        return _slow_core(b, extent, pack)
    # greedy contiguous split; oversized-grid rows go alone to _sparse_core
    parts: list[pd.DataFrame] = []
    start = 0
    acc = 0

    def flush(end: int) -> None:
        nonlocal start, acc
        if end > start:
            parts.append(_slow_core(b.iloc[start:end], extent, pack))
        start = end
        acc = 0

    for i in range(n_rows):
        if g[i] > gcap:
            flush(i)
            parts.append(_sparse_core(b.iloc[i:i + 1], extent, cap, pack, gcap))
            start = i + 1
            continue
        if acc and acc + w[i] > cap:
            flush(i)
        acc += int(w[i])
    flush(n_rows)
    parts = [p for p in parts if len(p)]
    return pd.concat(parts, ignore_index=True) if parts else _empty_frame()


def _sparse_one_row_parts(is_line1: np.ndarray, z: int, fid: int,
                          ring_len: np.ndarray, ring_start: np.ndarray,
                          verts: np.ndarray, extent: int, cap: int,
                          pack: bool, gcap: int | None) -> list[tuple]:
    """One bbox-sparse row (KEPT/stripped ring slices into the global
    ``verts``): exact covering via the O(covered) scalar kernels, then the
    same batched clip over exactly those (tile, row) units — per-row work
    and memory are O(covered x vertices), never O(bbox area). Covering is
    precomputed, so the unit mask is all-true; tile chunks are sized so
    chunk_tiles x ring_vertices stays under ``cap``."""
    parts: list[tuple] = []
    r0 = ring_start[0]
    ring0 = verts[r0:r0 + ring_len[0]].ravel()
    if is_line1[0]:
        tiles = K.line_covering_tiles(ring0, z, cap=gcap)
    else:
        tiles = K.polygon_covering_tiles(ring0, z, cap=gcap)
    if tiles.shape[0] == 0:
        return parts
    nv = max(int(ring_len.sum()), 1)
    step = max(int(cap // nv), 1)
    rrc = np.array([ring_len.size], np.int64)
    rfr = np.array([0, ring_len.size], np.int64)
    for s in range(0, tiles.shape[0], step):
        t = tiles[s:s + step]
        ku = t.shape[0]
        ux = t[:, 0].astype(np.int64)
        uy = t[:, 1].astype(np.int64)
        west, south, east, north = K._tile_bounds_for(z, ux, uy)
        parts.extend(_clip_units_parts(
            is_line1, rrc, rfr, ring_len, ring_start, verts,
            np.zeros(ku, np.int64), np.full(ku, z, np.int64), ux, uy,
            np.full(ku, fid, np.int64), west, south, east, north,
            np.ones(ku, bool), extent, pack))
    return parts


def _sparse_core(b: pd.DataFrame, extent: int, cap: int,
                 pack: bool = False, gcap: int | None = None) -> pd.DataFrame:
    """Pandas front-end of _sparse_one_row_parts (tests / slow_batch)."""
    parts: list[tuple] = []
    for i in range(len(b)):
        row = b.iloc[i:i + 1]
        is_line_row = row["kind"].to_numpy() == "line"
        z = int(row["_z"].iloc[0])
        (ring_len, verts, ring_start, _rrc, _rfr) = _flatten_rings(
            row, is_line_row)
        parts.extend(_sparse_one_row_parts(
            is_line_row, z, int(row["feature_id"].iloc[0]), ring_len,
            ring_start, verts, extent, cap, pack, gcap))
    return _parts_to_pandas(parts, pack)


def _flatten_rings(b: pd.DataFrame, is_line_row: np.ndarray):
    """Flatten rings (lines: ring 0 only; polys: strip exact closing).
    Returns (ring_len, verts, ring_start, row_ring_count, row_first_ring)."""
    n_rows = len(b)
    ring_list: list[np.ndarray] = []
    ring_len_l: list[int] = []
    row_ring_count = np.empty(n_rows, np.int64)
    for i, coords in enumerate(b["coords"]):
        if is_line_row[i]:
            row_ring_count[i] = 1
            a = np.asarray(coords[0], np.float64)
            ring_list.append(a)
            ring_len_l.append(a.size // 2)
        else:
            row_ring_count[i] = len(coords)
            for c in coords:
                a = np.asarray(c, np.float64)
                if a.size >= 4 and a[0] == a[-2] and a[1] == a[-1]:
                    a = a[:-2]       # clip_ring_bbox_fast closing-strip
                ring_list.append(a)
                ring_len_l.append(a.size // 2)
    ring_len = np.asarray(ring_len_l, np.int64)
    verts = (np.concatenate(ring_list) if ring_list else np.zeros(0)).reshape(-1, 2)
    ring_start = np.cumsum(ring_len) - ring_len
    row_first_ring = np.concatenate([[0], np.cumsum(row_ring_count)])
    return ring_len, verts, ring_start, row_ring_count, row_first_ring


def _slow_core(b: pd.DataFrame, extent: int, pack: bool = False) -> pd.DataFrame:
    """Pandas front-end of _slow_core_parts (tests / slow_batch)."""
    n_rows = len(b)
    if n_rows == 0:
        return _empty_frame()
    kinds = b["kind"].to_numpy()
    zs = b["_z"].to_numpy(np.int64)
    fids = b["feature_id"].to_numpy()
    is_line_row = kinds == "line"
    (ring_len, verts, ring_start, row_ring_count,
     row_first_ring) = _flatten_rings(b, is_line_row)
    return _parts_to_pandas(
        _slow_core_parts(is_line_row, zs, fids, ring_len, verts, ring_start,
                         row_ring_count, row_first_ring, extent, pack), pack)


def _slow_core_parts(is_line_row, zs, fids, ring_len, verts, ring_start,
                     row_ring_count, row_first_ring, extent: int,
                     pack: bool = False) -> list[tuple]:
    """Mirrors the reference per-row loop (TILEGEN_FASTPATH=0 in
    tiles.clip_shapes_direct) output-for-output (modulo the r4 flat geom/off
    transport) over pre-flattened ring structures; see module docstring.
    """
    n_rows = is_line_row.size
    if n_rows == 0:
        return []

    # --- candidate grid per row: ring-0 vertex-tile bbox (the covering
    # kernel's candidate grid) ----------------------------------------------
    r0 = row_first_ring[:-1]
    L0 = ring_len[r0]
    v0 = _gather(ring_start[r0], L0)
    lon0 = np.nan_to_num(verts[v0, 0], nan=0.0, posinf=180.0, neginf=-180.0)
    lat0 = np.clip(np.nan_to_num(verts[v0, 1], nan=0.0, posinf=K.MAX_LAT,
                                 neginf=-K.MAX_LAT), -K.MAX_LAT, K.MAX_LAT)
    nz_v = np.repeat(np.power(2.0, zs.astype(np.float64)), L0)
    xt = np.clip(np.floor((lon0 + 180.0) / 360.0 * nz_v), 0, nz_v - 1).astype(np.int64)
    lr = np.radians(lat0)
    yt = np.clip(np.floor(
        (1.0 - np.log(np.tan(lr) + 1.0 / np.cos(lr)) / np.pi) / 2.0 * nz_v),
        0, nz_v - 1).astype(np.int64)
    vS = np.cumsum(L0) - L0
    x0 = np.minimum.reduceat(xt, vS)
    x1g = np.maximum.reduceat(xt, vS)
    y0 = np.minimum.reduceat(yt, vS)
    y1g = np.maximum.reduceat(yt, vS)

    gx = x1g - x0 + 1
    Ku = gx * (y1g - y0 + 1)
    unit_base = np.cumsum(Ku) - Ku
    unit_row = np.repeat(np.arange(n_rows), Ku)
    u_off = _ragged_arange(Ku)
    ux = x0[unit_row] + u_off % gx[unit_row]
    uy = y0[unit_row] + u_off // gx[unit_row]
    n_unit = unit_row.size
    unit_z = zs[unit_row]

    # tile lon/lat bounds (identical expressions to the reference loop)
    n_t = np.power(2.0, unit_z.astype(np.float64))
    west = ux / n_t * 360.0 - 180.0
    east = (ux + 1.0) / n_t * 360.0 - 180.0
    north = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * uy / n_t))))
    south = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (uy + 1.0) / n_t))))

    # --- covering filter: keep only tiles the reference covering kernels
    # would emit (grid candidates outside the geometry would otherwise leak
    # rare quantization slivers past the degenerate-drop) -------------------
    cov = _covering_mask(n_rows, n_unit, unit_row, unit_base, ux, uy,
                         west, south, east, north, verts, ring_start[r0], L0,
                         xt, yt, x0, y0, gx, is_line_row)
    return _clip_units_parts(
        is_line_row, row_ring_count, row_first_ring, ring_len, ring_start,
        verts, unit_row, unit_z, ux, uy, fids[unit_row], west, south, east,
        north, cov, extent, pack)


def _clip_units_parts(is_line_row, row_ring_count, row_first_ring, ring_len,
                      ring_start, verts, unit_row, unit_z, ux, uy, unit_fid,
                      west, south, east, north, cov, extent,
                      pack: bool = False) -> list[tuple]:
    """Clip + quantize + finalize + assemble over an explicit unit set (one
    unit = one (tile, row) pair), returning assemble_arrays part tuples
    (polygons part, then lines part). Shared by _slow_core (dense grid
    units, covering-masked) and _sparse_core (exact covering units, cov
    all-true)."""
    n_unit = unit_row.size
    r0 = row_first_ring[:-1]
    parts: list[tuple] = []

    # --- polygons -----------------------------------------------------------
    pu = np.nonzero(~is_line_row[unit_row] & cov)[0]
    if pu.size:
        cnt = row_ring_count[unit_row[pu]]
        p_inst_unit = np.repeat(pu, cnt)
        ring_ord = _ragged_arange(cnt)
        p_ring = row_first_ring[unit_row[p_inst_unit]] + ring_ord
        Lp = ring_len[p_ring]
        vidx = _gather(ring_start[p_ring], Lp)
        pvx = verts[vidx, 0]
        pvy = verts[vidx, 1]
        cvx, cvy, Lc = clip_polys_batched(pvx, pvy, Lp, p_inst_unit,
                                          west, south, east, north)
        qx, qy = quantize_instances(cvx, cvy, Lc, p_inst_unit, unit_z, ux, uy,
                                    extent)
        fin = finalize_instances(qx, qy, Lc, p_inst_unit,
                                 np.ones(Lc.size, dtype=bool), ring_ord,
                                 n_unit)
        parts.append(assemble_arrays(*fin, p_inst_unit, unit_z, ux, uy,
                                     unit_fid, pack))

    # --- lines --------------------------------------------------------------
    lu = np.nonzero(is_line_row[unit_row] & cov)[0]
    if lu.size:
        lrow = unit_row[lu]
        rl = r0[lrow]
        nseg = np.maximum(ring_len[rl] - 1, 0)
        seg_unit = np.repeat(lu, nseg)
        sidx = _gather(ring_start[rl], nseg)
        sx1 = verts[sidx, 0]
        sy1 = verts[sidx, 1]
        sx2 = verts[sidx + 1, 0]
        sy2 = verts[sidx + 1, 1]
        seg_first = np.zeros(seg_unit.size, dtype=bool)
        segS = np.cumsum(nseg) - nseg
        seg_first[segS[nseg > 0]] = True
        pvx, pvy, pieceL, piece_unit = clip_lines_batched(
            sx1, sy1, sx2, sy2, seg_unit, seg_first, west, south, east, north)
        if pieceL.size:
            qx, qy = quantize_instances(pvx, pvy, pieceL, piece_unit,
                                        unit_z, ux, uy, extent)
            fin = finalize_instances(qx, qy, pieceL, piece_unit,
                                     np.zeros(pieceL.size, dtype=bool),
                                     np.zeros(pieceL.size, np.int64), n_unit)
            parts.append(assemble_arrays(*fin, piece_unit, unit_z, ux, uy,
                                         unit_fid, pack))
    return parts


def _parts_to_pandas(parts: list[tuple], pack: bool) -> pd.DataFrame:
    """assemble_arrays part tuples → the historical pandas output (geom/off
    as Python lists, packed single-piece off as None)."""
    rows: dict[str, list] = {k: [] for k in CLIP_COLUMNS}
    for (z, x, y, fid, gvals, goff, ovals, ooff, osingle) in parts:
        if z.size == 0:
            continue
        rows["z"].extend(z.tolist())
        rows["x"].extend(x.tolist())
        rows["y"].extend(y.tolist())
        rows["feature_id"].extend(fid.tolist())
        rows["geom"].extend(a.tolist() for a in np.split(gvals, goff[1:-1]))
        # r7b: NULL off for single-piece rows in BOTH transports (was
        # packed-only) — ~90% of rows drop the off array from the exchange
        # and nest via a single array(geom) wrap
        offs = [a.tolist() for a in np.split(ovals, ooff[1:-1])]
        offs = [None if s else o for o, s in zip(offs, osingle)]
        rows["off"].extend(offs)
    return pd.DataFrame({
        "z": pd.Series(rows["z"], dtype="int32"),
        "x": pd.Series(rows["x"], dtype="int64"),
        "y": pd.Series(rows["y"], dtype="int64"),
        "feature_id": pd.Series(rows["feature_id"], dtype="int64"),
        "geom": pd.Series(rows["geom"], dtype=object),
        "off": pd.Series(rows["off"], dtype=object),
    })


def parts_to_batches(parts: list[tuple], pack: bool):
    """assemble_arrays part tuples → pyarrow RecordBatches (CLIP_FLAT_SCHEMA):
    the list columns are built straight from (values, offsets) buffers —
    zero per-row Python (guide §4.2). Packed single-piece rows get a NULL
    off via the ListArray validity mask."""
    import pyarrow as pa
    out = []
    for (z, x, y, fid, gvals, goff, ovals, ooff, osingle) in parts:
        if z.size == 0:
            continue
        geom = pa.ListArray.from_arrays(
            pa.array(goff.astype(np.int32)), pa.array(gvals, pa.int32()))
        mask = pa.array(osingle) if osingle.any() else None
        off = pa.ListArray.from_arrays(
            pa.array(ooff.astype(np.int32)), pa.array(ovals, pa.int32()),
            mask=mask)
        out.append(pa.RecordBatch.from_arrays(
            [pa.array(z, pa.int32()), pa.array(x, pa.int64()),
             pa.array(y, pa.int64()), pa.array(fid, pa.int64()), geom, off],
            names=["z", "x", "y", "feature_id", "geom", "off"]))
    return out


def _clip_units(is_line_row, row_ring_count, row_first_ring, ring_len,
                ring_start, verts, unit_row, unit_z, ux, uy, unit_fid,
                west, south, east, north, cov, extent,
                pack: bool = False) -> pd.DataFrame:
    """Pandas front-end of _clip_units_parts (tests / non-Arrow callers)."""
    return _parts_to_pandas(
        _clip_units_parts(is_line_row, row_ring_count, row_first_ring,
                          ring_len, ring_start, verts, unit_row, unit_z, ux,
                          uy, unit_fid, west, south, east, north, cov,
                          extent, pack), pack)


# ---------------------------------------------------------------------------
# r7 Arrow-native entry (guide §4.2): mapInArrow front-end — ring structures
# decoded straight from the ListArray offset/value buffers (no per-row
# Python lists on input) and output RecordBatches built from the
# assemble_arrays buffers (no np.split/tolist per row on output). The pandas
# front-ends above remain the reference/test surface; parity is pinned by
# the fastpath-vs-reference pytest and a direct arrow-vs-pandas test.
# ---------------------------------------------------------------------------

def decode_clip_rings(rb, strip: bool = True):
    """RecordBatch with (kind, coords) → flat ring structures, straight from
    the ListArray offset/value buffers. ``strip=True`` matches
    _flatten_rings exactly (lines: ring 0 only; polys: strip the exact
    closing vertex — representable as ring_len−1 with the same start, so no
    bytes are copied); ``strip=False`` matches _fast_batch's flatten (all
    rings, untouched). Returns (is_line, ring_len, ring_start, verts,
    row_ring_count, row_first_ring, raw) where ``raw`` =
    (nv_raw, r0_start, r0_len) feeds _row_weights_arrays (which uses the
    UNSTRIPPED ring 0 and all-raw-ring vertex counts, like _row_weights)."""
    import pyarrow.compute as pc
    cols = {n: rb.column(i) for i, n in enumerate(rb.schema.names)}
    is_line = np.asarray(pc.equal(cols["kind"], "line"))
    coords = cols["coords"]
    rc_raw = np.asarray(pc.list_value_length(coords)).astype(np.int64)
    rings = pc.list_flatten(coords)
    rl_d = np.asarray(pc.list_value_length(rings)).astype(np.int64)
    vals = np.asarray(pc.list_flatten(rings)).astype(np.float64)
    verts = vals.reshape(-1, 2)
    cum_d = np.concatenate([[0], np.cumsum(rl_d)])
    ring_start_all = (cum_d[:-1] // 2).astype(np.int64)
    V_all = rl_d // 2
    raw_first = np.concatenate([[0], np.cumsum(rc_raw)])[:-1].astype(np.int64)

    # raw per-row stats for the chunking estimator
    nv_raw = (cum_d[raw_first + rc_raw] - cum_d[raw_first]) // 2
    r0_start = ring_start_all[raw_first]
    r0_len = V_all[raw_first]

    if not strip:
        row_first_ring = np.concatenate(
            [[0], np.cumsum(rc_raw)]).astype(np.int64)
        return (is_line, V_all, ring_start_all, verts, rc_raw,
                row_first_ring,
                (np.maximum(nv_raw, 0), r0_start, np.maximum(r0_len, 0)))

    # kept rings: lines keep ring 0 only, polys keep all
    row_ring_count = np.where(is_line, np.minimum(rc_raw, 1), rc_raw)
    kept = _gather(raw_first, row_ring_count)
    s = ring_start_all[kept]
    V = V_all[kept]
    ring_is_poly = np.repeat(~is_line, row_ring_count)
    if verts.shape[0]:
        e = np.clip(s + V - 1, 0, verts.shape[0] - 1)
        s_safe = np.minimum(s, verts.shape[0] - 1)
        strip = (ring_is_poly & (V >= 2)
                 & (verts[s_safe, 0] == verts[e, 0])
                 & (verts[s_safe, 1] == verts[e, 1]))
    else:
        strip = np.zeros(kept.size, dtype=bool)
    ring_len = V - strip
    row_first_ring = np.concatenate([[0], np.cumsum(row_ring_count)]).astype(np.int64)
    return (is_line, ring_len, s.astype(np.int64), verts,
            row_ring_count.astype(np.int64), row_first_ring,
            (np.maximum(nv_raw, 0), r0_start, np.maximum(r0_len, 0)))


def slow_batch_arrow(rb, extent: int, cap: int | None = None,
                     pack: bool = False, gcap: int | None = None):
    """Arrow twin of slow_batch: one input RecordBatch of multi-tile
    (feature, _z) rows → list of output RecordBatches (CLIP_FLAT_SCHEMA).
    Same greedy contiguous chunking and sparse routing, same part order,
    zero per-row Python end to end."""
    import os
    n_rows = rb.num_rows
    if n_rows == 0:
        return []
    if cap is None:
        cap = int(os.environ.get("TILEGEN_SLOW_CAP", "8000000"))
    if gcap is None:
        gcap = K.grid_cap()
    (is_line, ring_len, ring_start, verts, row_ring_count, row_first_ring,
     (nv_raw, r0_start, r0_len)) = decode_clip_rings(rb)
    zs = np.asarray(rb.column(rb.schema.names.index("_z"))).astype(np.int64)
    fids = np.asarray(rb.column(rb.schema.names.index("feature_id"))).astype(np.int64)
    w, g = _row_weights_arrays(zs, nv_raw, r0_start, r0_len, verts)

    parts: list[tuple] = []

    def run_range(a: int, b_: int) -> None:
        if b_ <= a:
            return
        rs, re = int(row_first_ring[a]), int(row_first_ring[b_])
        parts.extend(_slow_core_parts(
            is_line[a:b_], zs[a:b_], fids[a:b_], ring_len[rs:re], verts,
            ring_start[rs:re], row_ring_count[a:b_],
            row_first_ring[a:b_ + 1] - rs, extent, pack))

    if int(w.sum()) <= cap and int(g.max()) <= gcap:
        run_range(0, n_rows)
        return parts_to_batches(parts, pack)
    start = 0
    acc = 0
    for i in range(n_rows):
        if g[i] > gcap:
            run_range(start, i)
            rs, re = int(row_first_ring[i]), int(row_first_ring[i + 1])
            parts.extend(_sparse_one_row_parts(
                is_line[i:i + 1], int(zs[i]), int(fids[i]), ring_len[rs:re],
                ring_start[rs:re], verts, extent, cap, pack, gcap))
            start = i + 1
            acc = 0
            continue
        if acc and acc + w[i] > cap:
            run_range(start, i)
            start = i
            acc = 0
        acc += int(w[i])
    run_range(start, n_rows)
    return parts_to_batches(parts, pack)
