"""Concave hull of polygons.

Reimplements ConcaveHullOfPolygons
(src/algorithm/hull/ConcaveHullOfPolygons.cpp:158-509,
include/geos/algorithm/hull/ConcaveHullOfPolygons.h:83): triangulate
the space between the input polygons (constrained Delaunay over an
expanded frame with the outer shells as holes), then erode border
triangles whose outside edge exceeds the target length — optionally
keeping the boundary tight and allowing holes — and finish with a
coverage union of the kept triangles (plus the input for the hull
form).

Outer-shell selection per OuterShellsExtracter.cpp:41-120 (nested
shells dropped).
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.cdt import constrained_delaunay_polygon
from geos_spark.kernels.coverage import coverage_union

_FRAME_EXPAND_FACTOR = 4


def _outer_shells(g: G.Geom) -> list[np.ndarray]:
    from geos_spark.kernels.pip import EXTERIOR
    from geos_spark.kernels.relate import _locate_in_polys

    shells = [
        np.asarray(p.data[0], dtype=np.float64)
        for p in g.geoms()
        if p.type_id == G.POLYGON and p.data
    ]
    shells.sort(
        key=lambda r: (r[:, 0].max() - r[:, 0].min())
        * (r[:, 1].max() - r[:, 1].min())
    )
    outer: list[np.ndarray] = []
    for shell in reversed(shells):
        covered = False
        for o in outer:
            if (
                o[:, 0].min() <= shell[:, 0].min()
                and shell[:, 0].max() <= o[:, 0].max()
                and o[:, 1].min() <= shell[:, 1].min()
                and shell[:, 1].max() <= o[:, 1].max()
            ):
                loc = _locate_in_polys(
                    shell[:1], [G.Geom(G.POLYGON, [o])]
                )[0]
                if loc != EXTERIOR:
                    covered = True
                    break
        if not covered:
            outer.append(shell)
    return outer


class _Tris:
    def __init__(self, pts: np.ndarray, tris: list):
        self.pts = pts
        self.tris = [list(t) for t in tris]
        self.alive = [True] * len(tris)
        self.adj: list[list[int | None]] = [
            [None, None, None] for _ in tris
        ]
        em: dict = {}
        for ti, (a, b, c) in enumerate(self.tris):
            for ei, (u, v) in enumerate(((a, b), (b, c), (c, a))):
                em.setdefault((min(u, v), max(u, v)), []).append((ti, ei))
        for users in em.values():
            if len(users) == 2:
                (t1, e1), (t2, e2) = users
                self.adj[t1][e1] = t2
                self.adj[t2][e2] = t1

    def edge_len(self, ti: int, ei: int) -> float:
        a, b, c = self.tris[ti]
        u, v = ((a, b), (b, c), (c, a))[ei]
        return float(np.hypot(*(self.pts[u] - self.pts[v])))

    def remove(self, ti: int) -> None:
        self.alive[ti] = False
        for ei in range(3):
            nb = self.adj[ti][ei]
            if nb is not None:
                for k in range(3):
                    if self.adj[nb][k] == ti:
                        self.adj[nb][k] = None
                self.adj[ti][ei] = None

    def has_adjacent(self, ti: int, ei: int) -> bool:
        return self.adj[ti][ei] is not None

    def vertex_index_of(self, ti: int, coords: set) -> int:
        for i, vi in enumerate(self.tris[ti]):
            if (self.pts[vi][0], self.pts[vi][1]) in coords:
                return i
        return -1

    def adj_index_of(self, ti: int, other: int) -> int:
        for ei in range(3):
            if self.adj[ti][ei] == other:
                return ei
        return -1


def concave_hull_of_polygons(
    g: G.Geom,
    max_length: float | None = None,
    length_ratio: float | None = None,
    tight: bool = False,
    holes_allowed: bool = False,
    fill: bool = False,
) -> G.Geom:
    """concaveHullByLength / ByLengthRatio / concaveFill semantics."""
    from geos_spark.kernels.scalars import geom_area

    if fill:
        tight = True
    if g.is_empty or (not fill and geom_area(g) == 0):
        return G.Geom(G.POLYGON, [])
    shells = _outer_shells(g)
    xs = np.concatenate([s[:, 0] for s in shells])
    ys = np.concatenate([s[:, 1] for s in shells])
    x0, x1, y0, y1 = xs.min(), xs.max(), ys.min(), ys.max()
    diam = float(np.hypot(x1 - x0, y1 - y0))
    e = _FRAME_EXPAND_FACTOR * diam
    fx0, fy0, fx1, fy1 = x0 - e, y0 - e, x1 + e, y1 + e
    frame_shell = np.array(
        [
            (fx0, fy0), (fx1, fy0), (fx1, fy1), (fx0, fy1), (fx0, fy0)
        ]
    )
    pts, tris = constrained_delaunay_polygon(frame_shell, shells)
    T = _Tris(pts, tris)
    frame_corners = {
        (fx0, fy0), (fx1, fy0), (fx1, fy1), (fx0, fy1)
    }

    max_edge = max_length if max_length is not None else -1.0
    if length_ratio is not None:
        max_edge = _target_edge_length(T, frame_corners, length_ratio)

    # frame corner tris: remove; seed border queue with their inner
    # neighbours (opposite the frame corner vertex)
    border_que: list[int] = []
    border_edge: dict[int, int] = {}
    hull_set: set[int] = set()
    for ti in range(len(T.tris)):
        vi = T.vertex_index_of(ti, frame_corners)
        if vi >= 0:
            opp = (vi + 1) % 3  # Tri::oppEdge(vertex) = edge not
            # containing the vertex: edges are (0:01, 1:12, 2:20);
            # edge opposite vertex i is (i+1)
            nb = T.adj[ti][opp]
            if nb is not None and T.vertex_index_of(nb, frame_corners) < 0:
                border_que.append(nb)
                border_edge[nb] = T.adj_index_of(nb, ti)
            T.remove(ti)
        else:
            hull_set.add(ti)

    def is_removable(ti: int) -> bool:
        if tight and _touches_single_polygon(T, ti, shells):
            return True
        be = border_edge.get(ti)
        if be is not None and T.edge_len(ti, be) > max_edge:
            return True
        return False

    def add_border_tris(ti: int) -> None:
        for ei in range(3):
            nb = T.adj[ti][ei]
            if nb is not None:
                border_que.append(nb)
                border_edge[nb] = T.adj_index_of(nb, ti)

    def remove_border_tri(ti: int) -> None:
        T.remove(ti)
        hull_set.discard(ti)
        border_edge.pop(ti, None)

    def drain_border() -> None:
        while border_que:
            ti = border_que.pop()
            if ti not in hull_set:
                continue
            if is_removable(ti):
                add_border_tris(ti)
                remove_border_tri(ti)

    drain_border()

    if holes_allowed:
        while True:
            seed = None
            for ti in sorted(hull_set):
                if _is_border_tri(T, ti):
                    continue
                if any(
                    T.has_adjacent(ti, ei)
                    and T.edge_len(ti, ei) > max_edge
                    for ei in range(3)
                ):
                    seed = ti
                    break
            if seed is None:
                break
            add_border_tris(seed)
            remove_border_tri(seed)
            drain_border()

    # union of kept triangles (they form a coverage)
    tri_polys = []
    for ti in sorted(hull_set):
        a, b, c = T.tris[ti]
        tri_polys.append(
            G.Geom.polygon([[tuple(pts[a]), tuple(pts[b]), tuple(pts[c])]])
        )
    if not tri_polys:
        fill_geom = G.Geom(G.POLYGON, [])
    else:
        fill_geom = coverage_union(
            G.Geom.collection(G.GEOMETRYCOLLECTION, tri_polys)
        )
    if fill:
        return fill_geom
    if fill_geom.is_empty:
        return g
    members = tri_polys + [
        G.Geom(G.POLYGON, p.data)
        for p in g.geoms()
        if p.type_id == G.POLYGON and p.data
    ]
    return coverage_union(
        G.Geom.collection(G.GEOMETRYCOLLECTION, members)
    )


def _is_border_tri(T: _Tris, ti: int) -> bool:
    return any(not T.has_adjacent(ti, ei) for ei in range(3))


def _target_edge_length(T: _Tris, frame_corners, ratio: float) -> float:
    if ratio == 0:
        return 0.0
    mx, mn = -1.0, -1.0
    for ti in range(len(T.tris)):
        if T.vertex_index_of(ti, frame_corners) >= 0:
            continue
        for ei in range(3):
            if not T.has_adjacent(ti, ei):
                continue
            ln = T.edge_len(ti, ei)
            mx = max(mx, ln)
            mn = ln if mn < 0 else min(mn, ln)
    if ratio == 1:
        return 2 * mx
    return ratio * (mx - mn) + mn


def _touches_single_polygon(T: _Tris, ti: int, shells) -> bool:
    tri_pts = [tuple(T.pts[v]) for v in T.tris[ti]]
    txs = [p[0] for p in tri_pts]
    tys = [p[1] for p in tri_pts]
    for shell in shells:
        if (
            shell[:, 0].min() <= max(txs)
            and min(txs) <= shell[:, 0].max()
            and shell[:, 1].min() <= max(tys)
            and min(tys) <= shell[:, 1].max()
        ):
            ring = {(p[0], p[1]) for p in shell[1:]}
            if all(p in ring for p in tri_pts):
                return True
    return False
