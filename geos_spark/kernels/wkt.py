"""WKT reader/writer (ingest path for the xmltester oracle corpus).

Reader tolerance mirrors ``src/io/WKTReader.cpp``: case-insensitive
tags, EMPTY at any level, optional Z/M ordinate suffixes and extra
ordinates (parsed, truncated to XY — engine semantics are 2-D, as the
reference's predicates are). Writer mirrors ``src/io/WKTWriter.cpp``
defaults: trimmed doubles, XY.
"""

from __future__ import annotations

import re

import numpy as np

from geos_spark.kernels import geom as G

_TOKEN = re.compile(r"[A-Za-z]+|\(|\)|,|[-+0-9.eE]+")

_TYPE_BY_NAME = {
    "POINT": G.POINT,
    "LINESTRING": G.LINESTRING,
    "LINEARRING": G.LINESTRING,
    "POLYGON": G.POLYGON,
    "MULTIPOINT": G.MULTIPOINT,
    "MULTILINESTRING": G.MULTILINESTRING,
    "MULTIPOLYGON": G.MULTIPOLYGON,
    "GEOMETRYCOLLECTION": G.GEOMETRYCOLLECTION,
    # SQL/MM curve types (src/io/WKTReader.cpp:309-335)
    "CIRCULARSTRING": G.CIRCULARSTRING,
    "COMPOUNDCURVE": G.COMPOUNDCURVE,
    "CURVEPOLYGON": G.CURVEPOLYGON,
    "MULTICURVE": G.MULTICURVE,
    "MULTISURFACE": G.MULTISURFACE,
}


class _Lexer:
    def __init__(self, s: str):
        self.toks = _TOKEN.findall(s)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, t: str) -> None:
        got = self.next()
        if got != t:
            raise ValueError(f"WKT parse: expected {t!r}, got {got!r}")


def parse_wkt(s: str) -> G.Geom:
    lex = _Lexer(s.strip())
    g = _parse_geom(lex)
    return g


def _parse_geom(lex: _Lexer) -> G.Geom:
    tag = lex.next().upper()
    if tag not in _TYPE_BY_NAME:
        raise ValueError(f"unknown WKT tag {tag!r}")
    tid = _TYPE_BY_NAME[tag]
    # optional dimension tag(s): Z / M / ZM (possibly as separate token)
    nxt = lex.peek()
    ndim = 2
    if nxt and nxt.upper() in ("Z", "M", "ZM"):
        ndim = 2 + len(nxt)
        lex.next()
    if lex.peek() and lex.peek().upper() == "EMPTY":
        lex.next()
        return G.Geom.empty(tid)
    if tid == G.POINT:
        coords = _parse_coord_list(lex, ndim)
        return G.Geom(G.POINT, coords[:1])
    if tid == G.LINESTRING:
        return G.Geom(
            G.LINESTRING,
            _parse_coord_list(lex, ndim),
            is_ring=(tag == "LINEARRING"),
        )
    if tid == G.POLYGON:
        return G.Geom(G.POLYGON, _parse_ring_list(lex, ndim))
    if tid == G.CIRCULARSTRING:
        return G.Geom(G.CIRCULARSTRING, _parse_coord_list(lex, ndim))
    if tid == G.COMPOUNDCURVE:
        # members: bare "(...)" (implicit LINESTRING) or tagged
        # LINESTRING / CIRCULARSTRING (readCompoundCurveText,
        # src/io/WKTReader.cpp:418-437)
        return G.Geom(
            G.COMPOUNDCURVE,
            _parse_member_list(
                lex, ndim, _parse_simple_curve_member
            ),
        )
    if tid == G.CURVEPOLYGON:
        # rings: bare "(...)" or LINESTRING / CIRCULARSTRING /
        # COMPOUNDCURVE (readCurvePolygonText -> readCurveText)
        return G.Geom(
            G.CURVEPOLYGON,
            _parse_member_list(lex, ndim, _parse_curve_member),
        )
    if tid == G.MULTICURVE:
        return G.Geom(
            G.MULTICURVE,
            _parse_member_list(lex, ndim, _parse_curve_member),
        )
    if tid == G.MULTISURFACE:
        # members: bare "((...))" (implicit POLYGON) or tagged
        # POLYGON / CURVEPOLYGON (readSurfaceText)
        return G.Geom(
            G.MULTISURFACE,
            _parse_member_list(lex, ndim, _parse_surface_member),
        )
    if tid == G.MULTIPOINT:
        # both MULTIPOINT ((1 2), (3 4)) and MULTIPOINT (1 2, 3 4)
        lex.expect("(")
        parts: list[G.Geom] = []
        if lex.peek() == ")":
            lex.next()
            return G.Geom(G.MULTIPOINT, parts)
        while True:
            if lex.peek() == "(":
                coords = _parse_coord_list(lex, ndim)
                parts.append(G.Geom(G.POINT, coords[:1]))
            elif lex.peek() and lex.peek().upper() == "EMPTY":
                lex.next()
                parts.append(G.Geom.empty(G.POINT))
            else:
                coords = _parse_bare_coord(lex, ndim)
                parts.append(G.Geom(G.POINT, coords))
            if lex.next() == ")":
                break
        return G.Geom(G.MULTIPOINT, parts)
    if tid == G.MULTILINESTRING:
        lex.expect("(")
        parts = []
        if lex.peek() == ")":
            lex.next()
            return G.Geom(G.MULTILINESTRING, parts)
        while True:
            if lex.peek() and lex.peek().upper() == "EMPTY":
                lex.next()
                parts.append(G.Geom.empty(G.LINESTRING))
            else:
                parts.append(G.Geom(G.LINESTRING, _parse_coord_list(lex, ndim)))
            if lex.next() == ")":
                break
        return G.Geom(G.MULTILINESTRING, parts)
    if tid == G.MULTIPOLYGON:
        lex.expect("(")
        parts = []
        if lex.peek() == ")":
            lex.next()
            return G.Geom(G.MULTIPOLYGON, parts)
        while True:
            if lex.peek() and lex.peek().upper() == "EMPTY":
                lex.next()
                parts.append(G.Geom.empty(G.POLYGON))
            else:
                parts.append(G.Geom(G.POLYGON, _parse_ring_list(lex, ndim)))
            if lex.next() == ")":
                break
        return G.Geom(G.MULTIPOLYGON, parts)
    # GEOMETRYCOLLECTION
    lex.expect("(")
    parts = []
    if lex.peek() == ")":
        lex.next()
        return G.Geom(G.GEOMETRYCOLLECTION, parts)
    while True:
        parts.append(_parse_geom(lex))
        if lex.next() == ")":
            break
    return G.Geom(G.GEOMETRYCOLLECTION, parts)


def _parse_member_list(lex: _Lexer, ndim: int, member_fn) -> list:
    """Parenthesized comma list of members (or nothing for EMPTY —
    the EMPTY token is consumed by the caller's dispatch)."""
    lex.expect("(")
    parts: list[G.Geom] = []
    if lex.peek() == ")":
        lex.next()
        return parts
    while True:
        parts.append(member_fn(lex, ndim))
        if lex.next() == ")":
            break
    return parts


def _parse_curve_member(lex: _Lexer, ndim: int) -> G.Geom:
    """readCurveText (WKTReader.cpp:385-398): bare '(' is an implicit
    LINESTRING; otherwise a tagged curve type; bare EMPTY defaults to
    LINESTRING EMPTY."""
    t = lex.peek()
    if t == "(":
        return G.Geom(G.LINESTRING, _parse_coord_list(lex, ndim))
    if t and t.upper() == "EMPTY":
        lex.next()
        return G.Geom.empty(G.LINESTRING)
    g = _parse_geom(lex)
    if g.type_id not in (
        G.LINESTRING, G.CIRCULARSTRING, G.COMPOUNDCURVE
    ):
        raise ValueError(
            "expected LINESTRING/CIRCULARSTRING/COMPOUNDCURVE member"
        )
    return g


def _parse_simple_curve_member(lex: _Lexer, ndim: int) -> G.Geom:
    g = _parse_curve_member(lex, ndim)
    if g.type_id == G.COMPOUNDCURVE:
        raise ValueError("expected LINESTRING or CIRCULARSTRING member")
    return g


def _parse_surface_member(lex: _Lexer, ndim: int) -> G.Geom:
    """readSurfaceText (WKTReader.cpp:400-413): bare '(' is an
    implicit POLYGON; otherwise POLYGON or CURVEPOLYGON."""
    t = lex.peek()
    if t == "(":
        return G.Geom(G.POLYGON, _parse_ring_list(lex, ndim))
    if t and t.upper() == "EMPTY":
        lex.next()
        return G.Geom.empty(G.POLYGON)
    g = _parse_geom(lex)
    if g.type_id not in (G.POLYGON, G.CURVEPOLYGON):
        raise ValueError("expected POLYGON or CURVEPOLYGON member")
    return g


def _parse_bare_coord(lex: _Lexer, ndim: int) -> np.ndarray:
    vals = []
    while lex.peek() not in (",", ")", None):
        vals.append(float(lex.next()))
    return np.array([vals[:2]], dtype=np.float64)


def _parse_coord_list(lex: _Lexer, ndim: int) -> np.ndarray:
    lex.expect("(")
    coords = []
    cur: list[float] = []
    while True:
        t = lex.next()
        if t == ",":
            coords.append(cur[:2])
            cur = []
        elif t == ")":
            if cur:
                coords.append(cur[:2])
            break
        else:
            cur.append(float(t))
    return np.array(coords, dtype=np.float64).reshape(-1, 2)


def _parse_ring_list(lex: _Lexer, ndim: int) -> list[np.ndarray]:
    lex.expect("(")
    rings = []
    if lex.peek() == ")":
        lex.next()
        return rings
    while True:
        if lex.peek() and lex.peek().upper() == "EMPTY":
            lex.next()
            rings.append(np.zeros((0, 2), dtype=np.float64))
        else:
            rings.append(_parse_coord_list(lex, ndim))
        if lex.next() == ")":
            break
    return rings


# ----------------------------------------------------------------------
# Writer
# ----------------------------------------------------------------------


def _num(v: float, rounding: int | None) -> str:
    if rounding is not None:
        v = round(v, rounding)
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _coords_str(coords: np.ndarray, rounding) -> str:
    return ", ".join(
        f"{_num(x, rounding)} {_num(y, rounding)}" for x, y in coords
    )


def _curve_member_str(p: G.Geom, rounding) -> str:
    """Member text inside COMPOUNDCURVE/CURVEPOLYGON/MULTICURVE:
    LINESTRING children are written bare, CIRCULARSTRING tagged,
    COMPOUNDCURVE tagged (WKTWriter appendCurveText /
    appendSimpleCurveText, src/io/WKTWriter.cpp:311-334)."""
    if p.type_id == G.CIRCULARSTRING or p.type_id == G.COMPOUNDCURVE:
        return write_wkt(p, rounding)
    if p.is_empty:
        return "EMPTY"
    return f"({_coords_str(p.data, rounding)})"


def _surface_member_str(p: G.Geom, rounding) -> str:
    """Member text inside MULTISURFACE: POLYGON bare, CURVEPOLYGON
    tagged (appendMultiSurfaceText, WKTWriter.cpp:595-615)."""
    if p.type_id == G.CURVEPOLYGON:
        return write_wkt(p, rounding)
    if p.is_empty:
        return "EMPTY"
    inner = ", ".join(f"({_coords_str(r, rounding)})" for r in p.data)
    return f"({inner})"


def write_wkt(g: G.Geom, rounding: int | None = None) -> str:
    name = {v: k for k, v in _TYPE_BY_NAME.items() if k != "LINEARRING"}[
        g.type_id
    ]
    if g.type_id in (G.MULTICURVE, G.MULTISURFACE):
        # reference writes EMPTY only for zero members
        # (appendMultiCurveText, WKTWriter.cpp:563-585)
        if not g.data:
            return f"{name} EMPTY"
        member = (
            _curve_member_str
            if g.type_id == G.MULTICURVE
            else _surface_member_str
        )
        inner = ", ".join(member(p, rounding) for p in g.data)
        return f"{name} ({inner})"
    if g.is_empty:
        return f"{name} EMPTY"
    if g.type_id == G.CIRCULARSTRING:
        return f"CIRCULARSTRING ({_coords_str(g.data, rounding)})"
    if g.type_id == G.COMPOUNDCURVE:
        inner = ", ".join(
            _curve_member_str(p, rounding) for p in g.data
        )
        return f"COMPOUNDCURVE ({inner})"
    if g.type_id == G.CURVEPOLYGON:
        inner = ", ".join(
            _curve_member_str(p, rounding) for p in g.data
        )
        return f"CURVEPOLYGON ({inner})"
    if g.type_id == G.POINT:
        return f"POINT ({_coords_str(g.data, rounding)})"
    if g.type_id == G.LINESTRING:
        return f"LINESTRING ({_coords_str(g.data, rounding)})"
    if g.type_id == G.POLYGON:
        inner = ", ".join(f"({_coords_str(r, rounding)})" for r in g.data)
        return f"POLYGON ({inner})"
    if g.type_id == G.MULTIPOINT:
        inner = ", ".join(
            f"({_coords_str(p.data, rounding)})" for p in g.data
        )
        return f"MULTIPOINT ({inner})"
    if g.type_id == G.MULTILINESTRING:
        inner = ", ".join(
            f"({_coords_str(p.data, rounding)})" for p in g.data
        )
        return f"MULTILINESTRING ({inner})"
    if g.type_id == G.MULTIPOLYGON:
        inner = ", ".join(
            "("
            + ", ".join(f"({_coords_str(r, rounding)})" for r in p.data)
            + ")"
            for p in g.data
        )
        return f"MULTIPOLYGON ({inner})"
    inner = ", ".join(write_wkt(p, rounding) for p in g.data)
    return f"GEOMETRYCOLLECTION ({inner})"
