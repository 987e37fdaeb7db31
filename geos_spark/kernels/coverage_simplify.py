"""Topology-preserving coverage simplification (TPVW).

Reimplements the reference's coverage simplifier semantics:

- ``CoverageRingEdges`` (src/coverage/CoverageRingEdges.cpp:62-200):
  decompose the coverage's rings into unique shared edges split at
  nodes (vertices used by >2 rings, boundary-chain endpoints with
  degree >2, and boundary/inner transitions).
- ``CoverageEdge`` (src/coverage/CoverageEdge.cpp:37-160): unique-edge
  keys via the reference's extremal-vertex rule (replicated exactly,
  including its highest-vertex comparison).
- ``TPVWSimplifier`` + ``Corner`` + ``LinkedLine``
  (src/coverage/TPVWSimplifier.cpp:44-300, src/coverage/Corner.cpp,
  src/simplify/LinkedLine.cpp): Visvalingam-Whyatt on each edge with a
  (area, index)-ordered corner heap, removal blocked when the corner
  triangle contains a vertex of any nearby edge (topology
  preservation) or would collapse onto a 2-point edge baseline.
- ``CoverageSimplifier`` (src/coverage/CoverageSimplifier.cpp:96-156):
  ``simplify`` (all edges) and ``simplifyInner`` (inner edges only,
  outer boundary held as constraints), then ring reassembly with the
  reference's direction rule.
"""

from __future__ import annotations

import heapq

import numpy as np

from geos_spark.kernels import geom as G

_NO = -1


def _tri_area(a, b, c) -> float:
    return abs(
        ((c[0] - a[0]) * (b[1] - a[1]) - (b[0] - a[0]) * (c[1] - a[1])) / 2
    )


def _orient_sign(a, b, c) -> int:
    v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    return 0 if v == 0 else (1 if v > 0 else -1)


def _tri_intersects(a, b, c, p) -> bool:
    """Triangle::intersects (closed triangle contains p)."""
    # isCCW via signed area of the triangle
    ccw = (
        (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    ) > 0
    exterior = -1 if ccw else 1
    if exterior == _orient_sign(a, b, p):
        return False
    if exterior == _orient_sign(b, c, p):
        return False
    if exterior == _orient_sign(c, a, p):
        return False
    return True


class _LinkedLine:
    """simplify/LinkedLine.cpp: doubly-linked vertex list."""

    def __init__(self, pts: np.ndarray):
        self.coord = pts
        n = len(pts)
        self.is_ring = n > 3 and (pts[0] == pts[-1]).all()
        self.n = n - 1 if self.is_ring else n
        self.next = list(range(1, self.n + 1))
        self.next[-1] = 0 if self.is_ring else _NO
        self.prev = list(range(-1, self.n - 1))
        self.prev[0] = self.n - 1 if self.is_ring else _NO
        self.size = self.n

    def has(self, i: int) -> bool:
        if not self.is_ring and (i == 0 or i == len(self.coord) - 1):
            return True
        return i != _NO and i < len(self.prev) and self.prev[i] != _NO

    def remove(self, i: int) -> None:
        ip, inx = self.prev[i], self.next[i]
        if ip != _NO:
            self.next[ip] = inx
        if inx != _NO:
            self.prev[inx] = ip
        self.prev[i] = _NO
        self.next[i] = _NO
        self.size = max(0, self.size - 1)

    def coords(self) -> np.ndarray:
        out = [
            self.coord[i]
            for i in range(self.n if self.is_ring else len(self.coord))
            if self.has(i)
        ]
        if self.is_ring:
            out.append(out[0])
        return np.asarray(out)


class _Edge:
    """TPVWSimplifier::Edge."""

    def __init__(self, pts: np.ndarray, is_free_ring: bool, area_tol: float):
        self.area_tol = area_tol
        self.is_free_ring = is_free_ring
        self.pts = pts
        self.n = len(pts)
        self.ll = _LinkedLine(pts)
        self.min_size = 3 if self.ll.is_ring else 2
        # vertex index: live mask over pts (ring closing vertex off)
        self.live = np.ones(self.n, dtype=bool)
        if self.ll.is_ring:
            self.live[self.n - 1] = False
        self.env = (
            float(pts[:, 0].min()),
            float(pts[:, 1].min()),
            float(pts[:, 0].max()),
            float(pts[:, 1].max()),
        )

    def query(self, env) -> np.ndarray:
        x0, y0, x1, y1 = env
        m = (
            self.live
            & (self.pts[:, 0] >= x0)
            & (self.pts[:, 0] <= x1)
            & (self.pts[:, 1] >= y0)
            & (self.pts[:, 1] <= y1)
        )
        return np.flatnonzero(m)

    # --- corner handling -------------------------------------------
    def _corner(self, i: int):
        ip, inx = self.ll.prev[i], self.ll.next[i]
        a = _tri_area(self.coord(ip), self.coord(i), self.coord(inx))
        return (a, i, ip, inx)

    def coord(self, i: int):
        return self.ll.coord[i]

    def simplify(self, edges: list) -> np.ndarray:
        pq: list = []
        min_index = 0 if (self.ll.is_ring and self.is_free_ring) else 1
        for i in range(min_index, self.n - 1):
            self._add_corner(i, pq)
        while pq and self.ll.size > self.min_size:
            area, i, ip, inx = heapq.heappop(pq)
            # removed/stale corner
            if self.ll.prev[i] != ip or self.ll.next[i] != inx:
                continue
            if area > self.area_tol:
                break
            if self._is_removable((area, i, ip, inx), edges):
                self.ll.remove(i)
                self.live[i] = False
                self._add_corner(ip, pq)
                self._add_corner(inx, pq)
        return self.ll.coords()

    def _add_corner(self, i: int, pq: list) -> None:
        if self.is_free_ring or (i != 0 and i != self.n - 1):
            c = self._corner(i)
            if c[0] <= self.area_tol:
                heapq.heappush(pq, c)

    def _is_removable(self, corner, edges) -> bool:
        _, i, ip, inx = corner
        pp, p, pn = self.coord(ip), self.coord(i), self.coord(inx)
        ex0 = min(pp[0], p[0], pn[0])
        ey0 = min(pp[1], p[1], pn[1])
        ex1 = max(pp[0], p[0], pn[0])
        ey1 = max(pp[1], p[1], pn[1])
        env = (ex0, ey0, ex1, ey1)
        for edge in edges:
            if (
                edge.env[0] > ex1
                or edge.env[2] < ex0
                or edge.env[1] > ey1
                or edge.env[3] < ey0
            ):
                continue
            for vi in edge.query(env):
                v = edge.pts[vi]
                if edge is self and vi in (i, ip, inx):
                    continue
                if (
                    (v == pp).all() or (v == p).all() or (v == pn).all()
                ):
                    continue
                if _tri_intersects(pp, p, pn, v):
                    return False
            if edge is not self and edge.ll.size == 2:
                lp = edge.ll.coords()
                b0, b1 = lp[0], lp[1]
                if ((pp == b0).all() and (pn == b1).all()) or (
                    (pp == b1).all() and (pn == b0).all()
                ):
                    return False
        return True


def _tpvw_simplify(
    lines: list[np.ndarray],
    free_rings: list[bool],
    constraints: list[np.ndarray],
    tolerance: float,
) -> list[np.ndarray]:
    area_tol = tolerance * tolerance
    edges = [
        _Edge(pts, free_rings[i] if free_rings else False, area_tol)
        for i, pts in enumerate(lines)
    ]
    cons = [_Edge(pts, False, area_tol) for pts in constraints]
    all_edges = edges + cons
    return [e.simplify(all_edges) for e in edges]


# ---------------------------------------------------------------------
# CoverageRingEdges
# ---------------------------------------------------------------------


def _dedupe(pts: np.ndarray) -> np.ndarray:
    keep = [0]
    for i in range(1, len(pts)):
        if (pts[i] != pts[keep[-1]]).any():
            keep.append(i)
    return pts[keep]


def _key(t) -> tuple:
    return (float(t[0]), float(t[1]))


class _CovEdge:
    __slots__ = ("pts", "ring_count", "is_free_ring", "constrained")

    def __init__(self, pts: np.ndarray, is_free_ring: bool):
        self.pts = pts
        self.ring_count = 0
        self.is_free_ring = is_free_ring
        self.constrained = False

    def start(self):
        return self.pts[0]

    def end(self):
        return self.pts[-1]


class CoverageRingEdges:
    """Edge decomposition + reassembly over a polygonal coverage."""

    def __init__(self, geoms: list[G.Geom], owned: int | None = None):
        self.geoms = geoms
        self.owned = len(geoms) if owned is None else owned
        self.edges: list[_CovEdge] = []
        self._ring_edges: dict[int, list[_CovEdge]] = {}
        self._build()

    # -- node discovery ---------------------------------------------
    def _rings(self, with_geom=False):
        """Yield (ring_key, pts[, geom_index]) over every non-empty ring."""
        rid = 0
        for gi, g in enumerate(self.geoms):
            for p in g.geoms():
                if p.type_id != G.POLYGON or not p.data:
                    continue
                for ring in p.data:
                    if len(ring):
                        pts = np.asarray(ring, dtype=np.float64)
                        yield (rid, pts, gi) if with_geom else (rid, pts)
                    rid += 1

    def _build(self) -> None:
        vcount: dict = {}
        for _, pts in self._rings():
            for i in range(1, len(pts)):  # skip ring-closing duplicate
                k = _key(pts[i])
                vcount[k] = vcount.get(k, 0) + 1
        nodes = {k for k, c in vcount.items() if c > 2}

        # boundary segments: XOR multiset of normalized segments
        bset: set = set()
        for _, pts in self._rings():
            for i in range(len(pts) - 1):
                s = (_key(pts[i]), _key(pts[i + 1]))
                s = s if s[0] <= s[1] else (s[1], s[0])
                if s in bset:
                    bset.discard(s)
                else:
                    bset.add(s)
        bcount: dict = {}
        for s in bset:
            bcount[s[0]] = bcount.get(s[0], 0) + 1
            bcount[s[1]] = bcount.get(s[1], 0) + 1
        nodes |= {k for k, c in bcount.items() if c > 2}

        unique: dict = {}
        for rid, pts, gi in self._rings(with_geom=True):
            # boundary/inner transition nodes
            def isbdy(i):
                s = (_key(pts[i]), _key(pts[i + 1]))
                s = s if s[0] <= s[1] else (s[1], s[0])
                return s in bset

            prev_b = isbdy(len(pts) - 2)
            for i in range(len(pts) - 1):
                b = isbdy(i)
                if b != prev_b:
                    nodes.add(_key(pts[i]))
                prev_b = b

            ring_edges = self._extract_ring_edges(pts, unique, nodes)
            if ring_edges:
                self._ring_edges[rid] = ring_edges
                if gi >= self.owned:
                    # halo/constraint member: its edges must stay fixed
                    for e in ring_edges:
                        e.constrained = True

    def _extract_ring_edges(self, pts, unique, nodes):
        cpts = _dedupe(pts)
        if (cpts[0] != cpts[-1]).any():
            cpts = np.vstack([cpts, cpts[:1]])
        if len(cpts) < 3:  # compacted ring too short
            return []
        n = len(cpts) - 1

        def next_node(start):
            index = start
            scanned0 = False
            while True:
                index = 0 if (index == _NO or index + 1 >= n) else index + 1
                if index == 0:
                    if start == _NO and scanned0:
                        return _NO
                    scanned0 = True
                if _key(cpts[index]) in nodes:
                    return index
                if index == start:
                    return _NO

        out = []
        first = next_node(_NO)
        if first == _NO:
            out.append(self._edge_full_ring(cpts, unique))
        else:
            start = first
            while True:
                end = next_node(start)
                out.append(self._edge_section(cpts, start, end, unique))
                start = end
                if end == first:
                    break
        return out

    # -- unique-edge keys (CoverageEdge::key, quirks included) ------
    @staticmethod
    def _find_distinct(pts, index, forward, pt):
        i = index
        endi = len(pts) - 1
        while True:
            if (pts[i] != pt).any():
                return pts[i]
            i = (0 if i == endi else i + 1) if forward else (
                endi if i == 0 else i - 1
            )
            if i == index:
                raise ValueError("edge has no distinct points")

    @staticmethod
    def _full_ring_key(ring):
        ilow = 0
        for i in range(1, len(ring) - 1):
            if tuple(ring[ilow]) < tuple(ring[i]):
                ilow = i
        k0 = ring[ilow]
        a0 = CoverageRingEdges._find_distinct(ring, ilow, True, k0)
        a1 = CoverageRingEdges._find_distinct(ring, ilow, False, k0)
        k1 = a0 if tuple(a0) < tuple(a1) else a1
        return (_key(k0), _key(k1))

    def _edge_full_ring(self, ring, unique):
        key = self._full_ring_key(ring)
        edge = unique.get(key)
        if edge is None:
            edge = _CovEdge(ring.copy(), True)
            unique[key] = edge
            self.edges.append(edge)
        edge.ring_count += 1
        return edge

    @staticmethod
    def _section_pts(ring, start, end):
        size = end - start + 1 if start < end else len(ring) - start + end
        idx = start
        pts = []
        for _ in range(size):
            pts.append(ring[idx])
            idx += 1
            if idx >= len(ring):
                idx = 1
        return np.asarray(pts)

    def _edge_section(self, ring, start, end, unique):
        # end == start: a single-node ring — the edge is the full
        # cycle STARTING at the node, keyed like a full ring but NOT
        # free (the node endpoint is pinned) — CoverageRingEdges.cpp
        # createEdge(ring, start, end) with end==start
        if end == start:
            key = self._full_ring_key(ring)
        else:
            e0, e1 = ring[start], ring[end]
            if tuple(e0) < tuple(e1):
                k0 = e0
                k1 = self._find_distinct(ring, start, True, k0)
            else:
                k0 = e1
                k1 = self._find_distinct(ring, end, False, k0)
            key = (_key(k0), _key(k1))
        edge = unique.get(key)
        if edge is None:
            edge = _CovEdge(self._section_pts(ring, start, end), False)
            unique[key] = edge
            self.edges.append(edge)
        edge.ring_count += 1
        return edge

    # -- rebuild -----------------------------------------------------
    def build_coverage(self) -> list[G.Geom]:
        out = []
        rid_iter = self._rings()
        rid_map = {rid: pts for rid, pts in rid_iter}
        for g in self.geoms:
            out.append(self._build_geom(g))
        return out

    def _build_geom(self, g: G.Geom) -> G.Geom:
        rid = self._rid_base(g)
        polys = []
        for p in g.geoms():
            if p.type_id != G.POLYGON or not p.data:
                polys.append(p)
                continue
            rings = []
            for ring in p.data:
                if len(ring) == 0:
                    rings.append(ring)
                    rid += 1
                    continue
                rings.append(self._build_ring(rid))
                rid += 1
            polys.append(G.Geom(G.POLYGON, rings))
        if g.type_id == G.MULTIPOLYGON:
            return G.Geom.collection(G.MULTIPOLYGON, polys)
        return polys[0]

    def _rid_base(self, g: G.Geom) -> int:
        base = 0
        for gg in self.geoms:
            if gg is g:
                return base
            for p in gg.geoms():
                if p.type_id == G.POLYGON and p.data:
                    base += sum(1 for _ in p.data)
        return base

    def _build_ring(self, rid: int) -> np.ndarray:
        ring_edges = self._ring_edges.get(rid)
        if ring_edges is None:
            # invalid/degenerate ring: copy the original
            for r, pts in self._rings():
                if r == rid:
                    return pts
            return np.zeros((0, 2))
        pts: list = []
        for i, edge in enumerate(ring_edges):
            last = pts[-1] if pts else None
            fwd = self._edge_dir_forward(ring_edges, i, last)
            ep = edge.pts if fwd else edge.pts[::-1]
            for c in ep:
                if pts and (pts[-1] == c).all():
                    continue
                pts.append(c)
        return np.asarray(pts)

    @staticmethod
    def _edge_dir_forward(ring_edges, index, prev_pt) -> bool:
        size = len(ring_edges)
        if size <= 1:
            return True
        if index == 0:
            if size == 2:
                return True
            end0 = ring_edges[0].end()
            return (end0 == ring_edges[1].start()).all() or (
                end0 == ring_edges[1].end()
            ).all()
        return prev_pt is not None and (
            prev_pt == ring_edges[index].start()
        ).all()


# ---------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------


def coverage_simplify(
    geoms: list[G.Geom],
    tolerance: float,
    inner_only: bool = False,
    owned: int | None = None,
) -> list[G.Geom]:
    """CoverageSimplifier::simplify / simplifyInner over a coverage
    list: simplify shared edges once, rebuild every member with
    identical shared linework (topology preserved).

    ``owned``: only the first ``owned`` members are simplified and
    returned; the rest are halo/constraint members whose edges stay
    fixed (and pin any edge they share). This is the contract of the
    distributed partitioned operator: cross-partition edges are
    deterministic constraints, so any partition reproduces the shared
    linework bit-for-bit."""
    for g in geoms:
        if g.type_id not in (G.POLYGON, G.MULTIPOLYGON):
            raise ValueError("coverage_simplify: non-polygonal input")
    cov = CoverageRingEdges(geoms, owned=owned)
    if inner_only:
        # reference simplifyInner: inner = ring-count-2 edges, outer
        # (ring-count-1) edges are constraints; other counts omitted
        free = [
            e
            for e in cov.edges
            if e.ring_count == 2 and not e.constrained
        ]
        cons = [
            e
            for e in cov.edges
            if e.ring_count == 1 or (e.ring_count == 2 and e.constrained)
        ]
    else:
        free = [e for e in cov.edges if not e.constrained]
        cons = [e for e in cov.edges if e.constrained]
    simp = _tpvw_simplify(
        [e.pts for e in free],
        [e.is_free_ring for e in free],
        [e.pts for e in cons],
        tolerance,
    )
    for e, s in zip(free, simp):
        e.pts = s
    out = cov.build_coverage()
    return out[: cov.owned]
