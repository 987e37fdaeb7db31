"""Coverage cleaning.

Reimplements the reference's CoverageCleaner / CleanCoverage
(src/coverage/CoverageCleaner.cpp:142-460,
src/coverage/CleanCoverage.cpp:40-280): snap + node the coverage
linework (the SnappingNoder machinery shared with the overlay
kernel), dissolve, polygonize the arrangement, classify each
resultant face by how many input polygons cover its interior point
(0 = gap, 1 = face, >1 = overlap), merge overlaps by strategy
(longest border / max / min area / min index) and narrow gaps
(MaximumInscribedCircle diameter below the limit) to the adjacent
area with the longest shared border, then coverage-union each
input's faces.  Result list maps 1-1 to the input; collapsed or
fully-covered inputs yield None.
"""

from __future__ import annotations

import numpy as np

from geos_spark.kernels import geom as G
from geos_spark.kernels.coverage import coverage_union
from geos_spark.kernels.overlay import (
    INTERSECTION,
    _collect_segments,
    _flatten_operand,
    _node_segments_snapping,
    _seed_snap_index,
    _snap_operand,
    _SnapIndex,
    overlay_robust,
)
from geos_spark.kernels.pip import EXTERIOR
from geos_spark.kernels.relate import _locate_in_polys

MERGE_LONGEST_BORDER = 0
MERGE_MAX_AREA = 1
MERGE_MIN_AREA = 2
MERGE_MIN_INDEX = 3

_DEFAULT_SNAPPING_FACTOR = 1.0e8


def _poly_parts(g: G.Geom) -> list:
    return [p for p in g.geoms() if p.type_id == G.POLYGON and p.data]


def _default_snap_distance(geoms) -> float:
    import math

    xs0 = ys0 = math.inf
    xs1 = ys1 = -math.inf
    for g in geoms:
        if g is None or g.is_empty:
            continue
        x0, y0, x1, y1 = g.envelope()
        xs0, ys0 = min(xs0, x0), min(ys0, y0)
        xs1, ys1 = max(xs1, x1), max(ys1, y1)
    if xs1 < xs0:
        return 0.0
    return math.hypot(xs1 - xs0, ys1 - ys0) / _DEFAULT_SNAPPING_FACTOR


def _node_and_dissolve(geoms, tol) -> set:
    """CoverageCleaner::node + LineDissolver::dissolve — the snapped,
    noded, deduplicated undirected edge set of the boundary
    linework."""
    polygonal = [
        g
        for g in geoms
        if g is not None
        and not g.is_empty
        and g.type_id in (G.POLYGON, G.MULTIPOLYGON)
    ]
    snap = _SnapIndex(tol) if tol > 0 else None
    if snap is not None:
        _seed_snap_index(polygonal, snap)
        snapped = [
            _flatten_operand(_snap_operand(g, snap)) for g in polygonal
        ]
    else:
        snapped = polygonal
    segs = []
    sizes: dict = {}
    ringflag: dict = {}
    sid = 0
    for g in snapped:
        s, sz, rf, sid = _collect_segments(g, 0, sid)
        segs += s
        sizes.update(sz)
        ringflag.update(rf)
    if snap is not None:
        _node_segments_snapping(segs, sizes, ringflag, snap)
    else:
        from geos_spark.kernels.overlay import _node_segments

        _node_segments(segs, sizes, ringflag)
    edges: set = set()
    for s in segs:
        pts = [s.p]
        for _t, pt in sorted(s.splits, key=lambda e: e[0]):
            if pt != pts[-1] and pt != s.q:
                pts.append(pt)
        pts.append(s.q)
        for u, v in zip(pts[:-1], pts[1:]):
            if u != v:
                edges.add((u, v) if u < v else (v, u))
    return edges


def _interior_point(poly: G.Geom):
    from geos_spark.kernels.scalars import interior_point

    return interior_point(poly)


def _covers(parent: G.Geom, pt) -> bool:
    parts = _poly_parts(parent)
    if not parts:
        return False
    return (
        _locate_in_polys(np.asarray([pt], dtype=np.float64), parts)[0]
        != EXTERIOR
    )


def _geom_length(g: G.Geom) -> float:
    """Geometry::getLength: lines by length, polygons by perimeter."""
    total = 0.0
    for p in g.geoms():
        if p.type_id == G.LINESTRING and len(p.data) > 1:
            d = np.diff(np.asarray(p.data), axis=0)
            total += float(np.hypot(d[:, 0], d[:, 1]).sum())
        elif p.type_id == G.POLYGON:
            for r in p.data:
                if len(r) > 1:
                    d = np.diff(np.asarray(r), axis=0)
                    total += float(np.hypot(d[:, 0], d[:, 1]).sum())
    return total


def _border_length(area_polys: list, poly: G.Geom) -> float:
    total = 0.0
    for ap in area_polys:
        inter = overlay_robust(ap, poly, INTERSECTION)
        total += _geom_length(inter)
    return total


def _poly_area(g: G.Geom) -> float:
    from geos_spark.kernels.scalars import geom_area

    return geom_area(g)


def _is_adjacent(area_polys: list, gap: G.Geom) -> bool:
    """RelateNG ADJACENT pattern F***1**** — interiors disjoint,
    boundaries share linework."""
    from geos_spark.kernels.relate import relate_pattern

    return any(
        relate_pattern(gap, ap, "F***1****") for ap in area_polys
    )


def _gap_is_mergable(gap: G.Geom, max_width: float) -> bool:
    """MaximumInscribedCircle::isRadiusWithin(gap, w/2)
    (MaximumInscribedCircle.cpp:185-208): envelope short-circuit
    (width or height < 2*maxRadius => within), then the MIC computed
    at tolerance maxRadius * MAX_RADIUS_FRACTION (1e-4,
    MaximumInscribedCircle.h:204)."""
    import math

    from geos_spark.kernels.circles import maximum_inscribed_circle

    if max_width <= 0:
        return False
    max_r = max_width / 2.0
    x0, y0, x1, y1 = gap.envelope()
    if (x1 - x0) < 2 * max_r or (y1 - y0) < 2 * max_r:
        return True
    try:
        c, rp = maximum_inscribed_circle(gap, max_r * 1e-4)
    except Exception:
        return False
    r = math.hypot(c[0] - rp[0], c[1] - rp[1])
    return r <= max_r


def coverage_clean(
    geoms: list,
    snapping_distance: float = -1.0,
    overlap_merge_strategy: int = MERGE_LONGEST_BORDER,
    gap_maximum_width: float = 0.0,
) -> list:
    """CoverageCleaner::clean — returns one cleaned polygonal
    geometry per input (None for collapsed/covered/non-polygonal
    members)."""
    from geos_spark.kernels.polygonize import _polygonize_rings
    from geos_spark.kernels.scalars import ring_signed_area

    tol = (
        snapping_distance
        if snapping_distance >= 0
        else _default_snap_distance(geoms)
    )
    edges = _node_and_dissolve(geoms, tol)
    rings = _polygonize_rings(edges)
    shells = [r[::-1].copy() for r in rings if ring_signed_area(r) < 0]
    holes = [r for r in rings if ring_signed_area(r) > 0]
    # assign holes to smallest containing shells (Polygonizer)
    from geos_spark.kernels.polygonize import _ring_contains_cycle

    shell_area = [abs(ring_signed_area(s)) for s in shells]
    assigned: list[list[np.ndarray]] = [[] for _ in shells]
    for h in holes:
        best = -1
        best_area = np.inf
        for si, s in enumerate(shells):
            if shell_area[si] >= best_area:
                continue
            if _ring_contains_cycle(s, h):
                best = si
                best_area = shell_area[si]
        if best >= 0:
            assigned[best].append(h)
    resultants = [
        G.Geom(G.POLYGON, [s] + assigned[i]) for i, s in enumerate(shells)
    ]

    # classify each resultant by the inputs covering its interior point
    n = len(geoms)
    areas: list[list[G.Geom] | None] = [None] * n
    gaps: list[G.Geom] = []
    overlap_parents: list[tuple[G.Geom, list[int]]] = []
    for res in resultants:
        ip = _interior_point(res)
        if ip is None:
            continue
        pt = (float(ip[0]), float(ip[1]))
        parent = -1
        ovl: list[int] = []
        for i in range(n):
            g = geoms[i]
            if g is None or g.is_empty or g.type_id not in (
                G.POLYGON,
                G.MULTIPOLYGON,
            ):
                continue
            x0, y0, x1, y1 = g.envelope()
            if not (x0 <= pt[0] <= x1 and y0 <= pt[1] <= y1):
                continue
            if _covers(g, pt):
                if parent < 0:
                    parent = i
                else:
                    ovl.append(parent)
                    ovl.append(i)
        if parent < 0:
            gaps.append(res)
        elif ovl:
            overlap_parents.append((res, sorted(set(ovl))))
        else:
            if areas[parent] is None:
                areas[parent] = []
            areas[parent].append(res)

    # merge overlaps per strategy (parents scanned ascending)
    for res, parents in overlap_parents:
        target = -1
        best_val = None
        for i in parents:
            a_polys = areas[i] or []
            if overlap_merge_strategy == MERGE_LONGEST_BORDER:
                val = _border_length(a_polys, res)
                better = best_val is None or val > best_val
            elif overlap_merge_strategy == MERGE_MAX_AREA:
                val = sum(_poly_area(p) for p in a_polys)
                better = best_val is None or val > best_val
            elif overlap_merge_strategy == MERGE_MIN_AREA:
                val = sum(_poly_area(p) for p in a_polys)
                better = best_val is None or val < best_val
            else:  # MERGE_MIN_INDEX
                val = i
                better = best_val is None
            if target < 0 or better:
                target = i
                best_val = val
        if target >= 0:
            if areas[target] is None:
                areas[target] = []
            areas[target].append(res)

    # merge mergable gaps to the adjacent area with longest border
    for gap in gaps:
        if not _gap_is_mergable(gap, gap_maximum_width):
            continue
        gx0, gy0, gx1, gy1 = gap.envelope()
        best = -1
        best_len = 0.0
        for i in range(n):
            if not areas[i]:
                continue
            if not _is_adjacent(areas[i], gap):
                continue
            ln = _border_length(areas[i], gap)
            if best < 0 or ln > best_len:
                best = i
                best_len = ln
        if best >= 0:
            areas[best].append(gap)

    out = []
    for i in range(n):
        if not areas[i]:
            out.append(None)
        else:
            out.append(
                coverage_union(
                    G.Geom.collection(G.GEOMETRYCOLLECTION, areas[i])
                )
            )
    return out
