"""Snap-rounding noder for fixed-precision overlay.

Faithful reimplementation of the reference's
``noding::snapround::SnapRoundingNoder`` pipeline
(``src/noding/snapround/SnapRoundingNoder.cpp``):

1. intersections of the *original* segments (robust LineIntersector)
   become node hot pixels; near-vertex situations within
   ``1/scale/100`` are treated as intersections
   (``SnapRoundingIntersectionAdder.cpp:43-104``);
2. every vertex adds a hot pixel; a pixel receiving more than one
   add becomes a node (``HotPixelIndex.cpp:46-78``);
3. each segment string is rounded to the grid and re-noded against
   every hot pixel its *original* segments pass through; pixels are
   half-open squares (top/right edges excluded), tested in the scaled
   integer domain with robust orientations
   (``HotPixel.cpp:44-186``);
4. finally interior vertices lying on node pixels become nodes
   (``SnapRoundingNoder.cpp:243-276``).

Rounding is ``util::round`` = Java ``Math.round`` semantics
(``src/util/math.cpp:58-85``) with the PrecisionModel scale/gridSize
resolution of ``PrecisionModel::setScale``
(``src/geom/PrecisionModel.cpp:169-205``).
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from geos_spark.kernels.dd import _point_to_segment, segment_intersection_point
from geos_spark.kernels.orientation import orientation_index
from geos_spark.kernels.segments import (
    COLLINEAR_INTERSECTION,
    POINT_INTERSECTION,
    intersect_pairs,
)

_GRIDSIZE_INT_TOL = 1e-5


def jround(val: float) -> float:
    """java_math_round (src/util/math.cpp:58-85)."""
    f = abs(math.modf(val)[0])
    n = math.modf(val)[1]
    if val >= 0:
        if f < 0.5:
            return math.floor(val)
        if f > 0.5:
            return math.ceil(val)
        return n + 1.0
    if f < 0.5:
        return math.ceil(val)
    if f > 0.5:
        return math.floor(val)
    return n


def _snap_to_int(val: float) -> float:
    vi = round(val)
    return vi if abs(val - vi) < _GRIDSIZE_INT_TOL else val


class PrecisionGrid:
    """FIXED PrecisionModel (scale/gridSize resolution per setScale)."""

    def __init__(self, scale: float):
        scale = abs(scale)
        if scale == 0:
            self.scale = 0.0
            self.grid_size = 0.0
        elif scale < 1:
            self.scale = scale
            self.grid_size = _snap_to_int(1.0 / scale)
        else:
            self.scale = _snap_to_int(scale)
            self.grid_size = 1.0 / self.scale

    def make_precise(self, val: float) -> float:
        if self.grid_size > 1:
            return jround(val / self.grid_size) * self.grid_size
        if self.scale != 0.0:
            return jround(val * self.scale) / self.scale
        return val

    def round_pt(self, p) -> tuple[float, float]:
        return (self.make_precise(p[0]), self.make_precise(p[1]))


class _Pixel:
    __slots__ = ("sx", "sy", "is_node")

    def __init__(self, sx, sy, is_node):
        self.sx = sx  # scaled (integer-valued) pixel center
        self.sy = sy
        self.is_node = is_node


def _pixel_contains(px: _Pixel, sx: float, sy: float) -> bool:
    """HotPixel::intersects(p) — half-open square in scaled space."""
    return (
        px.sx - 0.5 <= sx < px.sx + 0.5 and px.sy - 0.5 <= sy < px.sy + 0.5
    )


def _pixel_intersects_seg(px: _Pixel, p0, p1, scale: float) -> bool:
    """HotPixel::intersects(p0,p1) (HotPixel.cpp:63-186)."""
    sp0x, sp0y = p0[0] * scale, p0[1] * scale
    sp1x, sp1y = p1[0] * scale, p1[1] * scale
    # orient the segment in +x direction
    if sp0x > sp1x:
        sp0x, sp0y, sp1x, sp1y = sp1x, sp1y, sp0x, sp0y
    maxx = px.sx + 0.5
    minx = px.sx - 0.5
    maxy = px.sy + 0.5
    miny = px.sy - 0.5
    if min(sp0x, sp1x) >= maxx:
        return False
    if max(sp0x, sp1x) < minx:
        return False
    if min(sp0y, sp1y) >= maxy:
        return False
    if max(sp0y, sp1y) < miny:
        return False
    if sp0x == sp1x or sp0y == sp1y:
        return True  # vertical/horizontal within env -> intersects
    o_ul = int(orientation_index(sp0x, sp0y, sp1x, sp1y, minx, maxy))
    if o_ul == 0:
        return not sp0y < sp1y
    o_ur = int(orientation_index(sp0x, sp0y, sp1x, sp1y, maxx, maxy))
    if o_ur == 0:
        return not sp0y > sp1y
    if o_ul != o_ur:
        return True
    o_ll = int(orientation_index(sp0x, sp0y, sp1x, sp1y, minx, miny))
    if o_ll == 0:
        return True
    if o_ll != o_ul:
        return True
    o_lr = int(orientation_index(sp0x, sp0y, sp1x, sp1y, maxx, miny))
    if o_lr == 0:
        return not sp0y < sp1y
    if o_ll != o_lr:
        return True
    if o_lr != o_ur:
        return True
    return False


def _param_of(p, q, pt) -> float:
    dx = q[0] - p[0]
    dy = q[1] - p[1]
    if abs(dx) >= abs(dy):
        return (pt[0] - p[0]) / dx if dx != 0.0 else 0.0
    return (pt[1] - p[1]) / dy


def snap_round_strings(strings: list[list], scale: float):
    """Node a set of segment strings onto a fixed-precision grid.

    ``strings``: list of vertex chains ([(x, y), ...]).
    Returns (chains, node_points): per input string the snapped,
    fully-noded vertex chain (may be empty when collapsed), and the
    set of points at which chains must break into edges.
    """
    grid = PrecisionGrid(scale)
    nearness = 1.0 / grid.scale / 100.0

    # flat segment list with (string, index) tags
    segs = []
    for sid, pts in enumerate(strings):
        for i in range(len(pts) - 1):
            if pts[i] != pts[i + 1]:
                segs.append((pts[i], pts[i + 1], sid, i))

    pixels: dict[tuple, _Pixel] = {}

    def add_pixel(pt, as_node: bool) -> None:
        key = grid.round_pt(pt)
        px = pixels.get(key)
        if px is None:
            pixels[key] = _Pixel(
                jround(key[0] * grid.scale),
                jround(key[1] * grid.scale),
                as_node,
            )
        else:
            # a second add always promotes to node (HotPixelIndex.cpp:56)
            px.is_node = True

    splits: dict[tuple, list] = defaultdict(list)  # (sid,i) -> [(t, pt)]

    def add_split(p, q, sid, i, pt) -> None:
        if pt == p or pt == q:
            return
        splits[(sid, i)].append((_param_of(p, q, pt), pt))

    # --- phase 1: intersections of original segments ------------------
    n = len(segs)
    if n > 1:
        arr = np.array(
            [[s[0][0], s[0][1], s[1][0], s[1][1]] for s in segs],
            dtype=np.float64,
        )
        # x-sweep candidate pairs (margin = hot-pixel nearness);
        # triu_indices materializes O(n^2) index arrays
        from geos_spark.kernels.overlay import _overlap_pairs

        ii, jj = _overlap_pairs(arr, margin=nearness)
        cls = intersect_pairs(arr[ii], arr[jj]) if len(ii) else []
        for k in range(len(ii)):
            pa, qa, sa, ia = segs[int(ii[k])]
            pb, qb, sb, ib = segs[int(jj[k])]
            if sa == sb and ia == ib:
                continue
            handled = False
            if cls[k] == POINT_INTERSECTION:
                A = arr[ii[k]]
                B = arr[jj[k]]
                o1 = int(orientation_index(A[0], A[1], A[2], A[3], B[0], B[1]))
                o2 = int(orientation_index(A[0], A[1], A[2], A[3], B[2], B[3]))
                o3 = int(orientation_index(B[0], B[1], B[2], B[3], A[0], A[1]))
                o4 = int(orientation_index(B[0], B[1], B[2], B[3], A[2], A[3]))
                pt = segment_intersection_point(pa, qa, pb, qb, o1, o2, o3, o4)
                interior = (pt != pa and pt != qa) or (pt != pb and pt != qb)
                if interior:
                    add_split(pa, qa, sa, ia, pt)
                    add_split(pb, qb, sb, ib, pt)
                    add_pixel(pt, True)
                    handled = True
            elif cls[k] == COLLINEAR_INTERSECTION:
                for ep in (pb, qb):
                    t = _param_of(pa, qa, ep)
                    if 0.0 <= t <= 1.0:
                        add_split(pa, qa, sa, ia, ep)
                        add_pixel(ep, True)
                for ep in (pa, qa):
                    t = _param_of(pb, qb, ep)
                    if 0.0 <= t <= 1.0:
                        add_split(pb, qb, sb, ib, ep)
                        add_pixel(ep, True)
                handled = True
            if not handled:
                # near-vertex "intersections"
                # (SnapRoundingIntersectionAdder.cpp:73-104)
                for ep, (p, q, s, i) in (
                    (pa, (pb, qb, sb, ib)),
                    (qa, (pb, qb, sb, ib)),
                    (pb, (pa, qa, sa, ia)),
                    (qb, (pa, qa, sa, ia)),
                ):
                    if (
                        math.hypot(ep[0] - p[0], ep[1] - p[1]) >= nearness
                        and math.hypot(ep[0] - q[0], ep[1] - q[1]) >= nearness
                        and _point_to_segment(ep, p, q) < nearness
                    ):
                        add_split(p, q, s, i, ep)
                        add_pixel(ep, True)

    # --- vertex pixels ------------------------------------------------
    for pts in strings:
        for v in pts:
            add_pixel_vertex = grid.round_pt(v)
            px = pixels.get(add_pixel_vertex)
            if px is None:
                pixels[add_pixel_vertex] = _Pixel(
                    jround(add_pixel_vertex[0] * grid.scale),
                    jround(add_pixel_vertex[1] * grid.scale),
                    False,
                )
            else:
                px.is_node = True  # repeated add -> node

    pix_list = list(pixels.items())
    pix_sx = np.array([p.sx for _c, p in pix_list])
    pix_sy = np.array([p.sy for _c, p in pix_list])

    # --- phase 2: snap strings to grid + hot pixels -------------------
    chains = []
    chain_nodes: list[list] = []
    for sid, pts in enumerate(strings):
        noded = []
        for i in range(len(pts) - 1):
            if pts[i] == pts[i + 1]:
                continue
            if not noded:
                noded.append(pts[i])
            elif noded[-1] != pts[i]:
                noded.append(pts[i])
            seen = {pts[i], pts[i + 1]}
            for _t, pt in sorted(splits.get((sid, i), [])):
                if pt not in seen:
                    noded.append(pt)
                    seen.add(pt)
            noded.append(pts[i + 1])
        if not noded:
            chains.append([])
            chain_nodes.append([])
            continue
        rounded = []
        for p in noded:
            rp = grid.round_pt(p)
            if not rounded or rounded[-1] != rp:
                rounded.append(rp)
        if len(rounded) <= 1:
            chains.append([])
            chain_nodes.append([])
            continue
        snap_at: dict[int, list] = defaultdict(list)
        snapidx = 0
        for i in range(len(noded) - 1):
            p0, p1 = noded[i], noded[i + 1]
            if grid.round_pt(p1) == rounded[snapidx]:
                continue  # collapsed sub-segment
            # candidate pixels via scaled envelope prefilter
            sminx = min(p0[0], p1[0]) * grid.scale - 0.5
            smaxx = max(p0[0], p1[0]) * grid.scale + 0.5
            sminy = min(p0[1], p1[1]) * grid.scale - 0.5
            smaxy = max(p0[1], p1[1]) * grid.scale + 0.5
            cand = np.flatnonzero(
                (pix_sx >= sminx)
                & (pix_sx <= smaxx)
                & (pix_sy >= sminy)
                & (pix_sy <= smaxy)
            )
            for ci in cand:
                coord, px = pix_list[int(ci)]
                if not px.is_node and (
                    _pixel_contains(
                        px, p0[0] * grid.scale, p0[1] * grid.scale
                    )
                    or _pixel_contains(
                        px, p1[0] * grid.scale, p1[1] * grid.scale
                    )
                ):
                    continue
                if _pixel_intersects_seg(px, p0, p1, grid.scale):
                    snap_at[snapidx].append(coord)
                    px.is_node = True
            snapidx += 1
        chains.append(rounded)
        chain_nodes.append(snap_at)

    # --- phase 3: insert snapped nodes, emit final chains + node set --
    node_points: set = set()
    final_chains = []
    for rounded, snap_at in zip(chains, chain_nodes):
        if not rounded:
            final_chains.append([])
            continue
        out = [rounded[0]]
        for i in range(len(rounded) - 1):
            a, b = rounded[i], rounded[i + 1]
            ins = []
            seen = {a, b}
            for c in snap_at.get(i, []) if isinstance(snap_at, dict) else []:
                if c not in seen:
                    ins.append((_param_of(a, b, c), c))
                    seen.add(c)
                node_points.add(c)
            for _t, c in sorted(ins):
                out.append(c)
            out.append(b)
        final_chains.append(out)
        node_points.add(out[0])
        node_points.add(out[-1])
    # interior vertices on node pixels break chains too
    for out in final_chains:
        for v in out[1:-1]:
            px = pixels.get(v)
            if px is not None and px.is_node:
                node_points.add(v)
    return final_chains, node_points
