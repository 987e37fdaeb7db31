"""Circular-arc math for the curved geometry types (SQL/MM).

Mirrors the reference's arc primitives so curve measures agree with
its unit-test expectations:

- center/radius/angle/length/segment-area: ``include/geos/geom/
  CircularArc.h`` (Graphics Gems III circumcenter via
  ``src/algorithm/CircularArcs.cpp:27-55``);
- arc-aware envelope expansion with the quadrant walk:
  ``src/algorithm/CircularArcs.cpp:57-125``;
- closed-curve (curved-ring) area: ``src/algorithm/Area.cpp:100-151``
  (``Area::ofClosedCurve`` — chord shoelace plus signed circular-
  segment corrections);
- per-curve length/envelope iteration conventions:
  ``src/geom/CircularString.cpp:54-68`` (arcs at stride 2),
  ``src/geom/SimpleCurve.cpp:121-140`` (envelope expands EVERY
  consecutive coordinate triple, stride 1 — reproduced verbatim, as
  the reference's own unit expectations pin this behavior).

All functions take plain (k,2) float64 coordinate arrays; no curve
object is materialized on the hot path.
"""

from __future__ import annotations

import math

import numpy as np

_NAN = float("nan")

# quadrants, geom/Quadrant.h:56-59 (NE=0 NW=1 SW=2 SE=3)
_NE, _NW, _SW, _SE = 0, 1, 2, 3


def _orient(ax, ay, bx, by, cx, cy) -> int:
    """Sign of the cross product (CCW=+1, CW=-1, collinear=0).

    The reference uses the robust Orientation::index; arc points are
    user-given (not computed intersections), so the plain double cross
    matches it except on adversarial near-collinear triples, where the
    arc is degenerate anyway.
    """
    cross = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if cross > 0:
        return 1
    if cross < 0:
        return -1
    return 0


def arc_center(p0, p1, p2) -> tuple[float, float]:
    """Circumcenter of the arc triple (CircularArcs::getCenter).

    p0 == p2 denotes a full circle: center is midpoint(p0, p1).
    Collinear triples yield (nan, nan) (the reference divides by the
    vanishing determinant; we guard the exact-zero case explicitly).
    """
    x0, y0 = p0
    x1, y1 = p1
    x2, y2 = p2
    if x0 == x2 and y0 == y2:
        return (0.5 * (x0 + x1), 0.5 * (y0 + y1))
    ax, ay = x1 - x2, y1 - y2
    bx, by = x2 - x0, y2 - y0
    cx, cy = x0 - x1, y0 - y1
    d1 = -(bx * cx + by * cy)
    d2 = -(cx * ax + cy * ay)
    d3 = -(ax * bx + ay * by)
    e1 = d2 * d3
    e2 = d3 * d1
    e3 = d1 * d2
    e = e1 + e2 + e3
    if e == 0.0:
        return (_NAN, _NAN)
    g3x, g3y = x0 + x1 + x2, y0 + y1 + y2
    hx = (e1 * x0 + e2 * x1 + e3 * x2) / e
    hy = (e1 * y0 + e2 * y1 + e3 * y2) / e
    return (0.5 * (g3x - hx), 0.5 * (g3y - hy))


def arc_radius(p0, p1, p2) -> float:
    cx, cy = arc_center(p0, p1, p2)
    return math.hypot(p0[0] - cx, p0[1] - cy)


def _arc_angle(p0, p1, p2, cx: float, cy: float) -> float:
    """Inner sector angle (CircularArc::getAngle)."""
    if p0[0] == p2[0] and p0[1] == p2[1]:
        return 2.0 * math.pi
    t0 = math.atan2(p0[1] - cy, p0[0] - cx)
    t2 = math.atan2(p2[1] - cy, p2[0] - cx)
    if _orient(p0[0], p0[1], p1[0], p1[1], p2[0], p2[1]) == 1:
        # COUNTERCLOCKWISE arc: swap endpoints
        t0, t2 = t2, t0
    if t0 < t2:
        t0 += 2.0 * math.pi
    return t0 - t2


def arc_angle(p0, p1, p2) -> float:
    cx, cy = arc_center(p0, p1, p2)
    return _arc_angle(p0, p1, p2, cx, cy)


def arc_length(p0, p1, p2) -> float:
    """Arc length (CircularArc::getLength); collinear -> chord."""
    cx, cy = arc_center(p0, p1, p2)
    r = math.hypot(p0[0] - cx, p0[1] - cy)
    if math.isnan(r):
        return math.hypot(p2[0] - p0[0], p2[1] - p0[1])
    return _arc_angle(p0, p1, p2, cx, cy) * r


def arc_segment_area(p0, p1, p2) -> float:
    """Area between arc and its chord (CircularArc::getArea)."""
    cx, cy = arc_center(p0, p1, p2)
    r = math.hypot(p0[0] - cx, p0[1] - cy)
    if math.isnan(r):
        return 0.0
    theta = _arc_angle(p0, p1, p2, cx, cy)
    return r * r / 2.0 * (theta - math.sin(theta))


def _quadrant(cx: float, cy: float, px: float, py: float) -> int:
    # geom/Quadrant.h:98-118
    if px >= cx:
        return _NE if py >= cy else _SE
    return _NW if py >= cy else _SW


def expand_envelope(env: list[float], p0, p1, p2) -> None:
    """Expand [xmin ymin xmax ymax] to cover the arc
    (CircularArcs::expandEnvelope — quadrant walk over the axis
    extremes the arc sweeps past)."""

    def inc(x: float, y: float) -> None:
        if x < env[0]:
            env[0] = x
        if y < env[1]:
            env[1] = y
        if x > env[2]:
            env[2] = x
        if y > env[3]:
            env[3] = y

    inc(p0[0], p0[1])
    inc(p1[0], p1[1])
    inc(p2[0], p2[1])
    cx, cy = arc_center(p0, p1, p2)
    if math.isnan(cx):
        return  # collinear
    if (cx == p0[0] and cy == p0[1]) or (cx == p1[0] and cy == p1[1]):
        return  # zero-length arc
    orientation = _orient(cx, cy, p0[0], p0[1], p1[0], p1[1])
    q0 = _quadrant(cx, cy, p0[0], p0[1])
    q2 = _quadrant(cx, cy, p2[0], p2[1])
    r = math.hypot(p1[0] - cx, p1[1] - cy)
    if q0 == q2:
        # same quadrant: arc crosses all axes or none
        if _orient(cx, cy, p1[0], p1[1], p2[0], p2[1]) != orientation:
            inc(cx, cy + r)
            inc(cx - r, cy)
            inc(cx, cy - r)
            inc(cx + r, cy)
        return
    if orientation == -1:  # CLOCKWISE
        q0, q2 = q2, q0
    q = q0 + 1
    while (q % 4) != ((q2 + 1) % 4):
        qq = q % 4
        if qq == _NW:
            inc(cx, cy + r)
        elif qq == _SW:
            inc(cx - r, cy)
        elif qq == _SE:
            inc(cx, cy - r)
        else:  # NE
            inc(cx + r, cy)
        q += 1


def circularstring_length(coords: np.ndarray) -> float:
    """Sum of arc lengths over point triples at stride 2
    (CircularString::getLength)."""
    tot = 0.0
    for i in range(2, len(coords), 2):
        tot += arc_length(coords[i - 2], coords[i - 1], coords[i])
    return tot


def circularstring_expand_envelope(
    env: list[float], coords: np.ndarray
) -> None:
    """Envelope of a curved coordinate sequence. The reference expands
    EVERY consecutive triple (stride 1, SimpleCurve.cpp:132-137) — the
    extra triples only ever grow the envelope on degenerate inputs, and
    its unit tests pin this exact behavior."""
    for i in range(2, len(coords)):
        expand_envelope(env, coords[i - 2], coords[i - 1], coords[i])


def closed_curve_area(sections: list[tuple[np.ndarray, bool]]) -> float:
    """Absolute area enclosed by a closed ring made of (coords,
    is_curved) sections (Area::ofClosedCurve): shoelace over chords
    plus signed circular-segment corrections."""
    total = 0.0
    for coords, is_curved in sections:
        if len(coords) == 0:
            continue
        if is_curved:
            for j in range(2, len(coords), 2):
                p0, p1, p2 = coords[j - 2], coords[j - 1], coords[j]
                total += 0.5 * (p0[0] * p2[1] - p2[0] * p0[1])
                seg = arc_segment_area(p0, p1, p2)
                if seg == 0.0:
                    continue
                if _orient(
                    p0[0], p0[1], p2[0], p2[1], p1[0], p1[1]
                ) == -1:
                    total += seg
                else:
                    total -= seg
        else:
            x = coords[:, 0]
            y = coords[:, 1]
            total += float(
                0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
            )
    return abs(total)
