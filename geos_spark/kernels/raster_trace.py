"""Raster -> vector boundary tracing: one 4-connected pixel region
-> polygon(s) with holes.

This is the vector half of the raster<->vector tile materialization
the engine's tiling tier covers from the vector side (clip-by-rect,
``kernels/clip.py``).  The reference exposes the same mask<->polygon
duality through its C API consumers (GDALPolygonize is the canonical
client of GEOS for this; GEOS itself supplies the polygon assembly,
``src/operation/polygonize/Polygonizer.cpp``) — here the ring
extraction is done directly on the grid-edge multigraph, which is the
natural distributed decomposition (each region's cells are tiny after
the connected-components stage; the geometry build is per-region
local work).

Algorithm (per region, all integer grid arithmetic):

1. every cell contributes one directed boundary edge per missing
   4-neighbor, oriented so the region lies on the LEFT (bottom edge
   runs +x, right edge +y, top edge -x, left edge -y) — outer
   boundaries come out CCW, hole boundaries CW, exactly the OGC
   shell/hole winding the writer wants;
2. edges are linked start-vertex -> end-vertex into closed rings; at
   a *pinch vertex* (two diagonal cells of the region touching at a
   corner with the other two unset: 2 incoming + 2 outgoing edges)
   the incoming edge pairs with the RIGHT-turn outgoing edge — the
   turn that goes around the unset corner cell — which splits the
   Eulerian circuit into simple rings touching at the vertex (the
   valid-polygon reading of a self-touch: holes may touch the shell
   or each other at finitely many points, interiors stay connected);
3. collinear runs are merged, rings classified by shoelace sign,
   holes assigned to the shell whose interior contains the cell just
   up-right of the hole ring's minimum vertex (that cell is by
   construction a hole cell, so its center is strictly inside).

The combinatorial identities used as cross-checks by the tests and
the SQL oracle are exact in integers: for C cells with A interior
4-adjacencies,  area = C*cell^2  and  perimeter = (4*C - 2*A)*cell.
"""

from __future__ import annotations

import numpy as np

from . import geom as G

# directed edge steps: (dx_cell_missing_neighbor) -> (vertex_start_offset, step)
# Offsets are in grid-corner coordinates relative to the cell (x, y).
_RIGHT = (1, 0)
_UP = (0, 1)
_LEFT = (-1, 0)
_DOWN = (0, -1)

# right-turn lookup: incoming direction -> the right-turn outgoing
# direction.  At a pinch vertex the right turn goes AROUND the unset
# corner cell, which keeps every ring simple: background components
# stay 4-connected (two diagonal holes become two rings touching at
# the vertex), matching the 4-connected foreground of the CC stage.
_RIGHT_TURN = {_RIGHT: _DOWN, _UP: _RIGHT, _LEFT: _UP, _DOWN: _LEFT}


def boundary_edges(cells: np.ndarray):
    """Directed boundary edges of a cell set, region on the left.

    ``cells``: (n, 2) int array of (px, py).  Returns a dict
    start_vertex -> list[(end_vertex, direction)].
    """
    cellset = set(map(tuple, np.asarray(cells, dtype=np.int64)))
    out: dict[tuple[int, int], list] = {}

    def add(sx, sy, ex, ey, d):
        out.setdefault((sx, sy), []).append(((ex, ey), d))

    for (x, y) in cellset:
        if (x, y - 1) not in cellset:  # bottom: +x, region above
            add(x, y, x + 1, y, _RIGHT)
        if (x + 1, y) not in cellset:  # right: +y, region to -x
            add(x + 1, y, x + 1, y + 1, _UP)
        if (x, y + 1) not in cellset:  # top: -x, region below
            add(x + 1, y + 1, x, y + 1, _LEFT)
        if (x - 1, y) not in cellset:  # left: -y, region to +x
            add(x, y + 1, x, y, _DOWN)
    return out


def _link_rings(edges, merge_collinear: bool = True) -> list[np.ndarray]:
    """Link directed edges into closed rings (right-turn rule at
    4-valent pinch vertices), merging collinear runs.  Returns closed
    integer vertex arrays (first == last).

    ``merge_collinear=False`` keeps every ring at unit-cell segment
    granularity — required when the rings will be net-cancelled
    against an adjacent tile's rings by ``coverage_union`` (segment
    multiplicities cancel only when both sides draw IDENTICAL unit
    segments along the shared cut)."""
    rings = []
    # mutate edges dict: pop as we consume
    while edges:
        start, lst = next(iter(edges.items()))
        end, d0 = lst.pop()
        if not lst:
            del edges[start]
        ring = [start]
        v, din = end, d0
        while True:
            if v == start:
                # close only when the right-turn continuation IS the
                # initial edge; else the start vertex is a pinch this
                # ring passes through (consume its proper pairing)
                want = _RIGHT_TURN[din]
                if want == d0 or v not in edges:
                    break
            ring.append(v)
            cand = edges[v]
            if len(cand) == 1:
                nxt, dout = cand.pop()
                del edges[v]
            else:
                # pinch vertex: prefer the right-turn continuation
                want = _RIGHT_TURN[din]
                pick = 0
                for i, (_, dd) in enumerate(cand):
                    if dd == want:
                        pick = i
                        break
                nxt, dout = cand.pop(pick)
                if not cand:
                    del edges[v]
            v, din = nxt, dout
        ring.append(start)
        arr = np.array(ring, dtype=np.float64)
        if merge_collinear:
            keep = [0]
            for i in range(1, len(arr) - 1):
                a, b, c = arr[keep[-1]], arr[i], arr[i + 1]
                if (b[0] - a[0]) * (c[1] - b[1]) != (b[1] - a[1]) * (c[0] - b[0]):
                    keep.append(i)
            keep.append(len(arr) - 1)
            arr = arr[keep]
        rings.append(arr)
    return rings


def _shoelace2(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    return float(np.sum(x * y1 - x1 * y))


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    up = (y1 > py) != (y > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x + (py - y) * (x1 - x) / np.where(y1 != y, y1 - y, 1.0)
    return bool(np.count_nonzero(up & (xi > px)) & 1)


def trace_region(
    cells: np.ndarray,
    cell: float = 1.0,
    origin: tuple[float, float] = (0.0, 0.0),
    merge_collinear: bool = True,
) -> G.Geom:
    """Vectorize one 4-connected cell region into POLYGON /
    MULTIPOLYGON (grid corners scaled by ``cell`` about ``origin``).

    Shells are CCW, holes CW (writer-ready winding).  A pinched outer
    boundary yields a MULTIPOLYGON whose parts touch at the pinch
    vertices (valid: boundaries may intersect at finitely many
    points)."""
    cells = np.asarray(cells, dtype=np.int64).reshape(-1, 2)
    if len(cells) == 0:
        return G.Geom.empty(G.POLYGON)
    rings = _link_rings(boundary_edges(cells), merge_collinear)
    shells: list[tuple[np.ndarray, float]] = []
    holes: list[np.ndarray] = []
    for r in rings:
        a2 = _shoelace2(r)
        if a2 > 0:
            shells.append((r, a2))
        else:
            holes.append(r)
    # assign each hole to the shell containing its interior rep point
    # (the cell up-right of the hole ring's min vertex is a hole cell)
    parts: list[list[np.ndarray]] = [[s] for s, _ in shells]
    for h in holes:
        i = np.lexsort((h[:-1, 0], h[:-1, 1]))[0]
        rx, ry = h[i, 0] + 0.5, h[i, 1] + 0.5
        for k, (s, _) in enumerate(shells):
            if _point_in_ring(rx, ry, s):
                parts[k].append(h)
                break
        else:  # pragma: no cover - cannot happen for a closed region
            raise AssertionError("hole outside every shell")
    x0, y0 = origin

    def _scale(r: np.ndarray) -> np.ndarray:
        return np.column_stack([x0 + r[:, 0] * cell, y0 + r[:, 1] * cell])

    polys = [G.Geom(G.POLYGON, [_scale(r) for r in p]) for p in parts]
    if len(polys) == 1:
        return polys[0]
    return G.Geom.collection(G.MULTIPOLYGON, polys)


def region_stats(g: G.Geom) -> tuple[float, float, int, int]:
    """(area, perimeter, n_polys, n_holes) measured FROM the traced
    geometry (shoelace / ring length), so gate rows checked against
    the combinatorial cell formulas certify the geometry itself."""
    polys = g.data if g.type_id == G.MULTIPOLYGON else [g]
    area = 0.0
    perim = 0.0
    n_holes = 0
    for p in polys:
        rings = p.data
        for j, r in enumerate(rings):
            a2 = _shoelace2(r)
            area += a2 / 2.0  # holes are CW -> negative
            seg = r[1:] - r[:-1]
            perim += float(np.sum(np.hypot(seg[:, 0], seg[:, 1])))
            if j > 0:
                n_holes += 1
    return area, perim, len(polys), n_holes
