"""Densify + linear referencing + line merge.

- densify: vertices inserted at <= tolerance spacing; each segment of
  length L splits into ceil(L/tol) equal parts, points computed with
  pointAlong fractions (``src/geom/util/Densifier.cpp:108-140``).
- project / interpolate: length-indexed line referencing
  (``src/linearref/LengthIndexedLine.cpp``).
- line_merge: join maximal chains through degree-2 nodes
  (``src/operation/linemerge/LineMerger.cpp``).
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G


def _densify_coords(c: np.ndarray, tol: float) -> np.ndarray:
    if len(c) < 2:
        return c
    out = []
    for i in range(len(c) - 1):
        p0, p1 = c[i], c[i + 1]
        out.append(p0)
        length = float(np.hypot(p1[0] - p0[0], p1[1] - p0[1]))
        n_dbl = np.ceil(length / tol)
        if n_dbl > 2**31 - 1:
            raise ValueError(
                "Tolerance is too small compared to geometry length"
            )
        n = int(n_dbl)
        if n > 1:
            seg_len = length / n
            for j in range(1, n):
                f = (j * seg_len) / length
                out.append(p0 + f * (p1 - p0))
    out.append(c[-1])
    return np.asarray(out, dtype=np.float64)


def densify(g: G.Geom, tol: float) -> G.Geom:
    if tol <= 0:
        raise ValueError("Tolerance must be positive")
    if g.type_id == G.POINT or g.is_empty:
        return g
    if g.type_id == G.LINESTRING:
        return G.Geom(G.LINESTRING, _densify_coords(g.data, tol))
    if g.type_id == G.POLYGON:
        return G.Geom(
            G.POLYGON, [_densify_coords(r, tol) for r in g.data]
        )
    if g.is_collection:
        return G.Geom(g.type_id, [densify(p, tol) for p in g.data])
    return g


# ----------------------------------------------------------------------
# length-indexed linear referencing
# ----------------------------------------------------------------------


def line_length(c: np.ndarray) -> float:
    d = np.diff(c, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def interpolate(c: np.ndarray, index: float) -> tuple[float, float]:
    """Point at length `index` along the line (clamped to ends)."""
    if index <= 0:
        return float(c[0, 0]), float(c[0, 1])
    acc = 0.0
    for i in range(len(c) - 1):
        seg = float(np.hypot(c[i + 1, 0] - c[i, 0], c[i + 1, 1] - c[i, 1]))
        if acc + seg >= index and seg > 0:
            f = (index - acc) / seg
            p = c[i] + f * (c[i + 1] - c[i])
            return float(p[0]), float(p[1])
        acc += seg
    return float(c[-1, 0]), float(c[-1, 1])


def project(c: np.ndarray, x: float, y: float) -> float:
    """Length index of the closest point on the line to (x, y)."""
    best = np.inf
    best_idx = 0.0
    acc = 0.0
    p = np.array([x, y])
    for i in range(len(c) - 1):
        a, b = c[i], c[i + 1]
        d = b - a
        l2 = float(d @ d)
        t = 0.0 if l2 == 0 else float(np.clip((p - a) @ d / l2, 0, 1))
        q = a + t * d
        dist = float(np.hypot(*(p - q)))
        seg = float(np.sqrt(l2))
        if dist < best:
            best = dist
            best_idx = acc + t * seg
        acc += seg
    return best_idx


def line_substring(c: np.ndarray, start: float, end: float) -> np.ndarray:
    """Sub-line between two length indexes (LengthIndexedLine
    extractLine semantics for 0 <= start <= end <= length)."""
    total = line_length(c)
    start = max(0.0, min(start, total))
    end = max(start, min(end, total))
    pts = [interpolate(c, start)]
    acc = 0.0
    for i in range(len(c) - 1):
        seg = float(np.hypot(c[i + 1, 0] - c[i, 0], c[i + 1, 1] - c[i, 1]))
        v = acc + seg
        if start < v < end:
            pts.append((float(c[i + 1, 0]), float(c[i + 1, 1])))
        acc = v
    pts.append(interpolate(c, end))
    out = [pts[0]]
    for q in pts[1:]:
        if q != out[-1]:
            out.append(q)
    if len(out) == 1:
        out.append(out[0])
    return np.asarray(out, dtype=np.float64)


# ----------------------------------------------------------------------
# line merge
# ----------------------------------------------------------------------


def _key(x, y):
    return (round(float(x), 9), round(float(y), 9))


def line_merge(g: G.Geom, directed: bool = False) -> G.Geom:
    """Merge maximal chains through degree-2 nodes (LineMerger).
    Input linework is assumed noded (as the reference requires).

    ``directed=True`` is GEOSLineMergeDirected
    (capi/geos_c.h.in:5066-5079, LineMerger.cpp:59 ``isDirected``):
    lines are never reversed, and a degree-2 node only merges when one
    line ends there and the other starts there (a node where both
    edges are incoming or both outgoing is a chain boundary,
    LineMerger.cpp:196-202)."""
    from geos_spark.kernels.relate import _line_parts

    lines = [c for c in _line_parts(g)]
    if not lines:
        return G.Geom.empty(G.MULTILINESTRING)
    if directed:
        return _line_merge_directed(lines)
    # graph: node -> list of (line_idx, direction)
    adj: dict[tuple, list[tuple[int, bool]]] = {}
    for li, c in enumerate(lines):
        adj.setdefault(_key(*c[0]), []).append((li, True))
        adj.setdefault(_key(*c[-1]), []).append((li, False))
    used = [False] * len(lines)

    def chain_from(li: int, forward: bool) -> np.ndarray:
        coords = list(map(tuple, lines[li] if forward else lines[li][::-1]))
        used[li] = True
        # extend forward
        while True:
            end = _key(*coords[-1])
            cands = [
                (lj, fwd) for lj, fwd in adj.get(end, []) if not used[lj]
            ]
            if len(adj.get(end, [])) != 2 or len(cands) != 1:
                break
            lj, fwd = cands[0]
            nxt = lines[lj] if fwd else lines[lj][::-1]
            used[lj] = True
            coords.extend(map(tuple, nxt[1:]))
        return np.asarray(coords, dtype=np.float64)

    merged = []
    # start at nodes whose degree != 2 (true chain ends)
    for node, ends in adj.items():
        if len(ends) == 2:
            continue
        for li, fwd in ends:
            if not used[li]:
                merged.append(chain_from(li, fwd))
    # leftover cycles
    for li in range(len(lines)):
        if not used[li]:
            merged.append(chain_from(li, True))
    if len(merged) == 1:
        return G.Geom(G.LINESTRING, merged[0])
    return G.Geom(
        G.MULTILINESTRING, [G.Geom(G.LINESTRING, m) for m in merged]
    )


def _line_merge_directed(lines: list) -> G.Geom:
    """Directed merge: no reversals; a chain continues through a node
    only if exactly one line ends and exactly one starts there."""
    outs: dict[tuple, list[int]] = {}
    ins: dict[tuple, list[int]] = {}
    for li, c in enumerate(lines):
        outs.setdefault(_key(*c[0]), []).append(li)
        ins.setdefault(_key(*c[-1]), []).append(li)
    used = [False] * len(lines)

    def _through(node: tuple) -> bool:
        return len(outs.get(node, [])) == 1 and len(ins.get(node, [])) == 1

    def chain_from(li: int) -> np.ndarray:
        coords = list(map(tuple, lines[li]))
        used[li] = True
        while True:
            end = _key(*coords[-1])
            if not _through(end):
                break
            lj = outs[end][0]
            if used[lj]:
                break
            used[lj] = True
            coords.extend(map(tuple, lines[lj][1:]))
        return np.asarray(coords, dtype=np.float64)

    merged = []
    for node in set(outs) | set(ins):
        if _through(node):
            continue
        for li in outs.get(node, []):
            if not used[li]:
                merged.append(chain_from(li))
    # leftover directed cycles
    for li in range(len(lines)):
        if not used[li]:
            merged.append(chain_from(li))
    if len(merged) == 1:
        return G.Geom(G.LINESTRING, merged[0])
    return G.Geom(
        G.MULTILINESTRING, [G.Geom(G.LINESTRING, m) for m in merged]
    )
