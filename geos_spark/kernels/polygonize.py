"""Polygonize / BuildArea / MakeValid kernels.

- ``polygonize``: faces of a fully-noded linework arrangement —
  the role of ``operation/polygonize/Polygonizer.cpp``; implemented
  by tracing every half-edge with the overlay kernel's minimal-ring
  machinery (faces kept on the left) and pairing hole cycles with
  their smallest strictly-containing shells.
- ``build_area``: ``operation/polygonize/BuildArea.cpp`` — polygonize,
  nest faces whose shell equals another face's hole, keep faces with
  an even ancestor count, dissolve with cascaded union.
- ``make_valid``: ``operation/valid/MakeValid.cpp`` — the PostGIS
  linework method: node boundaries by unioning with a point,
  iteratively build areas from cut edges and symmetric-difference
  them together, report leftover cut edges and collapsed points.

Oracle gate: ``tests/xmltester/tests/misc/{buildarea,makevalid}.xml``
golden outputs, compared normalized.
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels import overlay as OV
from geos_spark.kernels.scalars import ring_signed_area
from geos_spark.kernels.valid import is_valid


def _ring_key(r: np.ndarray) -> frozenset:
    return frozenset((float(x), float(y)) for x, y in r)


def _rings_equal_any_direction(r1: np.ndarray, r2: np.ndarray) -> bool:
    """BuildArea.cpp ringsEqualAnyDirection: same cyclic sequence in
    either direction."""
    if len(r1) != len(r2):
        return False
    n = len(r1) - 1
    if n <= 0:
        return True
    a = [tuple(p) for p in r1[:-1]]
    b = [tuple(p) for p in r2[:-1]]
    try:
        off = b.index(a[0])
    except ValueError:
        return False
    if all(a[i] == b[(i + off) % n] for i in range(1, n)):
        return True
    return all(a[i] == b[(off - i) % n] for i in range(1, n))


def _polygonize_rings(undirected: set) -> list[np.ndarray]:
    """PolygonizeGraph edge-ring extraction
    (src/operation/polygonize/PolygonizeGraph.cpp:173-280): delete
    dangles and cut edges, build maximal rings with the
    next-CW-edge pairing (sym(out_i).next = out_{i+1} in CCW star
    order), then convert to minimal rings by re-pairing the ring's
    edges CCW at nodes it passes through more than once.  The pinch-
    node sector pairing differs from the overlay tracer's rule — it
    is what separates island faces from their surrounding face."""
    import math

    # dangle removal to fixpoint
    edges = set(undirected)
    while True:
        deg: dict = {}
        for p, q in edges:
            deg[p] = deg.get(p, 0) + 1
            deg[q] = deg.get(q, 0) + 1
        drop = {e for e in edges if deg[e[0]] == 1 or deg[e[1]] == 1}
        if not drop:
            break
        edges -= drop
    if not edges:
        return []

    def build(dir_edges):
        n = len(dir_edges)
        eid = {e: k for k, e in enumerate(dir_edges)}
        sym = [eid[(b, a)] for (a, b) in dir_edges]
        out_at: dict = {}
        for k, (a, b) in enumerate(dir_edges):
            out_at.setdefault(a, []).append(k)
        for a, lst in out_at.items():
            lst.sort(
                key=lambda k: math.atan2(
                    dir_edges[k][1][1] - a[1], dir_edges[k][1][0] - a[0]
                )
            )
        nxt = [None] * n
        for a, lst in out_at.items():
            m = len(lst)
            for i in range(m):
                nxt[sym[lst[i]]] = lst[(i + 1) % m]
        # maximal rings
        label = [-1] * n
        rings_edges = []
        for e in range(n):
            if label[e] != -1:
                continue
            lab = len(rings_edges)
            cur = e
            path = []
            while label[cur] == -1:
                label[cur] = lab
                path.append(cur)
                cur = nxt[cur]
            rings_edges.append(path)
        return eid, sym, out_at, nxt, label, rings_edges

    dir_edges = []
    for p, q in edges:
        dir_edges.append((p, q))
        dir_edges.append((q, p))
    _, sym, _, _, label, _ = build(dir_edges)
    # cut edges: both directions in the same maximal ring
    cut = {
        tuple(sorted((a, b)))
        for k, (a, b) in enumerate(dir_edges)
        if label[k] == label[sym[k]]
    }
    if cut:
        edges -= {e for e in edges if tuple(sorted(e)) in cut}
        if not edges:
            return []
        dir_edges = []
        for p, q in edges:
            dir_edges.append((p, q))
            dir_edges.append((q, p))
    eid, sym, out_at, nxt, label, rings_edges = build(dir_edges)

    # minimal conversion: CCW re-pairing at multiply-visited nodes
    for lab, path in enumerate(rings_edges):
        counts: dict = {}
        for e in path:
            a = dir_edges[e][0]
            counts[a] = counts.get(a, 0) + 1
        for node, cnt in counts.items():
            if cnt <= 1:
                continue
            star = out_at[node]
            first_out = None
            prev_in = None
            for de in reversed(star):  # CW iteration over CCW star
                out_de = de if label[de] == lab else None
                in_de = sym[de] if label[sym[de]] == lab else None
                if out_de is None and in_de is None:
                    continue
                if in_de is not None:
                    prev_in = in_de
                if out_de is not None:
                    if prev_in is not None:
                        nxt[prev_in] = out_de
                        prev_in = None
                    if first_out is None:
                        first_out = out_de
            if prev_in is not None:
                nxt[prev_in] = first_out

    visited = [False] * len(dir_edges)
    rings = []
    for e in range(len(dir_edges)):
        if visited[e]:
            continue
        cur = e
        pts = []
        while not visited[cur]:
            visited[cur] = True
            pts.append(dir_edges[cur][0])
            cur = nxt[cur]
        if cur == e and len(pts) >= 3:
            pts.append(pts[0])
            rings.append(np.asarray(pts, dtype=np.float64))
    return rings


def polygonize(g: G.Geom) -> list[G.Geom]:
    """Faces of a noded linework (Polygonizer.getPolygons)."""
    # LinearComponentExtracter semantics: lines AND polygon rings
    chains = []
    for part in g.geoms():
        if part.type_id == G.LINESTRING and len(part.data) > 1:
            chains.append(part.data)
        elif part.type_id == G.POLYGON:
            chains.extend(r for r in part.data if len(r) > 1)
    edges: set = set()
    for line in chains:
        for i in range(len(line) - 1):
            p = (float(line[i, 0]), float(line[i, 1]))
            q = (float(line[i + 1, 0]), float(line[i + 1, 1]))
            if p != q:
                edges.add((p, q) if p < q else (q, p))
    rings = _polygonize_rings(edges)

    # JTS EdgeRing convention: shells trace CW (isHole == isCCW);
    # output shells re-oriented CCW for the Geom convention
    shells = [r[::-1].copy() for r in rings if ring_signed_area(r) < 0]
    holes = [r for r in rings if ring_signed_area(r) > 0]
    if not shells:
        return []
    shell_area = [abs(ring_signed_area(s)) for s in shells]
    assigned: list[list[np.ndarray]] = [[] for _ in shells]
    for h in holes:
        best = -1
        best_area = np.inf
        for si, s in enumerate(shells):
            if shell_area[si] >= best_area:
                continue
            loc = _ring_contains_cycle(s, h)
            if loc:
                best = si
                best_area = shell_area[si]
        if best >= 0:
            assigned[best].append(h)
    return [
        G.Geom(G.POLYGON, [s] + assigned[i]) for i, s in enumerate(shells)
    ]


def _ring_contains_cycle(shell: np.ndarray, h: np.ndarray) -> bool:
    """Containment of a hole cycle in a candidate shell, skipping test
    points that lie ON the shell (hole edges legitimately coincide
    with the shells of the faces filling them — the reference's
    EdgeRing::findEdgeRingContaining uses the same
    point-not-on-candidate search)."""
    from geos_spark.kernels.orientation import orientation_index
    from geos_spark.kernels.overlay import _point_in_ring_parity

    segs = np.hstack([shell[:-1], shell[1:]])
    for i in range(len(h) - 1):
        pt = ((h[i, 0] + h[i + 1, 0]) / 2.0, (h[i, 1] + h[i + 1, 1]) / 2.0)
        inx = (np.minimum(segs[:, 0], segs[:, 2]) <= pt[0]) & (
            pt[0] <= np.maximum(segs[:, 0], segs[:, 2])
        )
        iny = (np.minimum(segs[:, 1], segs[:, 3]) <= pt[1]) & (
            pt[1] <= np.maximum(segs[:, 1], segs[:, 3])
        )
        cand = np.flatnonzero(inx & iny)
        on_bdy = False
        if len(cand):
            s = segs[cand]
            o = orientation_index(
                s[:, 0], s[:, 1], s[:, 2], s[:, 3], pt[0], pt[1]
            )
            on_bdy = bool((np.asarray(o) == 0).any())
        if on_bdy:
            continue
        return _point_in_ring_parity(pt, shell)
    return False  # every test point on the candidate: coincident rings


def build_area(g: G.Geom) -> G.Geom:
    """BuildArea.cpp::build."""
    from geos_spark.kernels.union import cascaded_polygon_union

    polys = polygonize(g)
    if not polys:
        return G.Geom(G.GEOMETRYCOLLECTION, [])
    if len(polys) == 1:
        return polys[0]
    # nest faces: a face whose shell equals another face's hole
    n = len(polys)
    env_area = []
    for p in polys:
        x0, y0, x1, y1 = p.envelope()
        env_area.append((x1 - x0) * (y1 - y0))
    order = sorted(range(n), key=lambda i: -env_area[i])
    parent = [None] * n
    for oi, i in enumerate(order):
        for hole in polys[i].data[1:]:
            for j in order[oi + 1:]:
                if parent[j] is not None:
                    continue
                if _rings_equal_any_direction(polys[j].data[0], hole):
                    parent[j] = i
                    break

    def ancestors(i: int) -> int:
        c = 0
        while parent[i] is not None:
            c += 1
            i = parent[i]
        return c

    keep = [polys[i] for i in range(n) if ancestors(i) % 2 == 0]
    if not keep:
        return G.Geom(G.GEOMETRYCOLLECTION, [])
    u = cascaded_polygon_union(keep)
    return u


def _node_line_with_first_coordinate(g: G.Geom) -> G.Geom | None:
    """MakeValid.cpp nodeLineWithFirstCoordinate: noding union of a
    lineal geometry with one of its own points."""
    if g.is_empty:
        return None
    first = None
    for p in g.geoms():
        if p.type_id == G.LINESTRING and len(p.data):
            first = (float(p.data[0, 0]), float(p.data[0, 1]))
            break
    if first is None:
        return None
    return OV.overlay_robust(g, G.Geom.point(first[0], first[1]), OV.UNION)


def _unique_points(g: G.Geom) -> G.Geom:
    seen = set()
    pts = []
    for p in g.geoms():
        data = p.data if not isinstance(p.data, list) else None
        if p.type_id in (G.POINT, G.LINESTRING):
            for x, y in p.data:
                k = (float(x), float(y))
                if k not in seen:
                    seen.add(k)
                    pts.append(G.Geom.point(k[0], k[1]))
        elif p.type_id == G.POLYGON:
            for r in p.data:
                for x, y in r:
                    k = (float(x), float(y))
                    if k not in seen:
                        seen.add(k)
                        pts.append(G.Geom.point(k[0], k[1]))
    if not pts:
        return G.Geom.empty(G.MULTIPOINT)
    return G.Geom.collection(G.MULTIPOINT, pts)


def _make_valid_line(g: G.Geom) -> G.Geom | None:
    return _node_line_with_first_coordinate(g)


def _make_valid_poly(g: G.Geom) -> G.Geom:
    from geos_spark.kernels.scalars import geom_boundary

    bound = geom_boundary(g)
    cut_edges = _node_line_with_first_coordinate(bound)
    if cut_edges is None:
        return G.Geom(G.POLYGON, [])
    collapse_points = OV.overlay_robust(
        _unique_points(bound), _unique_points(cut_edges), OV.DIFFERENCE
    )
    area: G.Geom = G.Geom(G.POLYGON, [])
    while not cut_edges.is_empty and any(
        p.type_id == G.LINESTRING for p in cut_edges.geoms()
    ):
        new_area = build_area(cut_edges)
        if new_area.is_empty:
            break
        new_bound = geom_boundary(new_area)
        area = OV.overlay_robust(area, new_area, OV.SYMDIFFERENCE)
        cut_edges = OV.overlay_robust(cut_edges, new_bound, OV.DIFFERENCE)
    items = []
    if not area.is_empty:
        items.append(area)
    if not cut_edges.is_empty:
        items.append(cut_edges)
    if not collapse_points.is_empty:
        items.append(collapse_points)
    if not items:
        return area
    if len(items) == 1:
        return items[0]
    return G.Geom.collection(G.GEOMETRYCOLLECTION, items)


def make_valid(g: G.Geom) -> G.Geom:
    """MakeValid::build."""
    try:
        if is_valid(g):
            return g
    except Exception:
        pass
    t = g.type_id
    if t == G.LINESTRING:
        out = _make_valid_line(g)
        return out if out is not None else G.Geom.empty(G.LINESTRING)
    if t == G.MULTILINESTRING:
        points = []
        lines = []
        for part in g.geoms():
            v = _make_valid_line(part)
            if v is None or v.is_empty:
                continue
            if v.type_id == G.POINT:
                points.append(v)
            else:
                for q in v.geoms():
                    if q.type_id == G.LINESTRING:
                        lines.append(q)
                    elif q.type_id == G.POINT:
                        points.append(q)
        prt = None
        if points:
            prt = (
                points[0]
                if len(points) == 1
                else G.Geom.collection(G.MULTIPOINT, points)
            )
        lrt = None
        if lines:
            lrt = (
                lines[0]
                if len(lines) == 1
                else G.Geom.collection(G.MULTILINESTRING, lines)
            )
        if prt is not None and lrt is not None:
            return G.Geom.collection(G.GEOMETRYCOLLECTION, [prt, lrt])
        if prt is not None:
            return prt
        if lrt is not None:
            return lrt
        return G.Geom.empty(G.MULTILINESTRING)
    if t in (G.POLYGON, G.MULTIPOLYGON):
        return _make_valid_poly(g)
    if t == G.GEOMETRYCOLLECTION:
        return G.Geom.collection(
            G.GEOMETRYCOLLECTION, [make_valid(p) for p in g.data]
        )
    return g
