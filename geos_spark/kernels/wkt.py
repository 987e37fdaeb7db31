"""WKT reader/writer (ingest path for the xmltester oracle corpus).

Reader tolerance mirrors ``src/io/WKTReader.cpp``: case-insensitive
tags, EMPTY at any level, optional Z/M ordinate suffixes (preserved in
the ``Geom`` Z/M side channels; a bare third ordinate with no tag is
Z, per ``WKTReader::getCoordinates``) and extra ordinates. Writer
mirrors ``src/io/WKTWriter.cpp`` defaults: trimmed doubles, output
dimension 4 (``WKTWriter.cpp:66``), the ordinate tag written from the
geometry's declared hasZ/hasM (``appendGeometryTaggedText``,
``WKTWriter.cpp:205-233``, removeEmptyDimensions=false) and passed
down to every nested tagged member.
"""

from __future__ import annotations

import re

import numpy as np

from geos_spark.kernels import geom as G

_TOKEN = re.compile(r"[A-Za-z]+|\(|\)|,|[-+0-9.eE]+|NaN|nan")

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


def _declare_empty(tid: int, kind: str | None) -> G.Geom:
    """EMPTY with a dimension tag keeps the declared Z/M channel
    (WKTReader: POINT Z EMPTY round-trips with hasZ()==true)."""
    g = G.Geom.empty(tid)
    if kind and tid in (G.POINT, G.LINESTRING, G.CIRCULARSTRING):
        if "Z" in kind:
            g.zs = np.zeros(0, dtype=np.float64)
        if "M" in kind:
            g.ms = np.zeros(0, dtype=np.float64)
    elif kind and tid == G.POLYGON:
        if "Z" in kind:
            g.zs = []
        if "M" in kind:
            g.ms = []
    return g


def _parse_geom(lex: _Lexer, kind: str | None = None) -> G.Geom:
    tag = lex.next().upper()
    if tag not in _TYPE_BY_NAME:
        raise ValueError(f"unknown WKT tag {tag!r}")
    tid = _TYPE_BY_NAME[tag]
    # optional dimension tag(s): Z / M / ZM (possibly as separate token)
    nxt = lex.peek()
    if nxt and nxt.upper() in ("Z", "M", "ZM"):
        kind = nxt.upper()
        lex.next()
    if lex.peek() and lex.peek().upper() == "EMPTY":
        lex.next()
        return _declare_empty(tid, kind)
    if tid == G.POINT:
        coords, zs, ms = _parse_seq(lex, kind)
        return G.Geom(
            G.POINT,
            coords[:1],
            zs=None if zs is None else zs[:1],
            ms=None if ms is None else ms[:1],
        )
    if tid == G.LINESTRING:
        coords, zs, ms = _parse_seq(lex, kind)
        return G.Geom(
            G.LINESTRING,
            coords,
            is_ring=(tag == "LINEARRING"),
            zs=zs,
            ms=ms,
        )
    if tid == G.POLYGON:
        rings, zl, ml = _parse_ring_list(lex, kind)
        return G.Geom(G.POLYGON, rings, zs=zl, ms=ml)
    if tid == G.CIRCULARSTRING:
        coords, zs, ms = _parse_seq(lex, kind)
        return G.Geom(G.CIRCULARSTRING, coords, zs=zs, ms=ms)
    if tid == G.COMPOUNDCURVE:
        # members: bare "(...)" (implicit LINESTRING) or tagged
        # LINESTRING / CIRCULARSTRING (readCompoundCurveText,
        # src/io/WKTReader.cpp:418-437)
        return G.Geom(
            G.COMPOUNDCURVE,
            _parse_member_list(
                lex, kind, _parse_simple_curve_member
            ),
        )
    if tid == G.CURVEPOLYGON:
        # rings: bare "(...)" or LINESTRING / CIRCULARSTRING /
        # COMPOUNDCURVE (readCurvePolygonText -> readCurveText)
        return G.Geom(
            G.CURVEPOLYGON,
            _parse_member_list(lex, kind, _parse_curve_member),
        )
    if tid == G.MULTICURVE:
        return G.Geom(
            G.MULTICURVE,
            _parse_member_list(lex, kind, _parse_curve_member),
        )
    if tid == G.MULTISURFACE:
        # members: bare "((...))" (implicit POLYGON) or tagged
        # POLYGON / CURVEPOLYGON (readSurfaceText)
        return G.Geom(
            G.MULTISURFACE,
            _parse_member_list(lex, kind, _parse_surface_member),
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
                coords, zs, ms = _parse_seq(lex, kind)
                parts.append(
                    G.Geom(
                        G.POINT,
                        coords[:1],
                        zs=None if zs is None else zs[:1],
                        ms=None if ms is None else ms[:1],
                    )
                )
            elif lex.peek() and lex.peek().upper() == "EMPTY":
                lex.next()
                parts.append(_declare_empty(G.POINT, kind))
            else:
                coords, zs, ms = _parse_bare_coord(lex, kind)
                parts.append(G.Geom(G.POINT, coords, zs=zs, ms=ms))
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
                parts.append(_declare_empty(G.LINESTRING, kind))
            else:
                coords, zs, ms = _parse_seq(lex, kind)
                parts.append(G.Geom(G.LINESTRING, coords, zs=zs, ms=ms))
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
                parts.append(_declare_empty(G.POLYGON, kind))
            else:
                rings, zl, ml = _parse_ring_list(lex, kind)
                parts.append(G.Geom(G.POLYGON, rings, zs=zl, ms=ml))
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
        parts.append(_parse_geom(lex, kind))
        if lex.next() == ")":
            break
    return G.Geom(G.GEOMETRYCOLLECTION, parts)


def _parse_member_list(lex: _Lexer, kind, member_fn) -> list:
    """Parenthesized comma list of members (or nothing for EMPTY —
    the EMPTY token is consumed by the caller's dispatch)."""
    lex.expect("(")
    parts: list[G.Geom] = []
    if lex.peek() == ")":
        lex.next()
        return parts
    while True:
        parts.append(member_fn(lex, kind))
        if lex.next() == ")":
            break
    return parts


def _parse_curve_member(lex: _Lexer, kind) -> G.Geom:
    """readCurveText (WKTReader.cpp:385-398): bare '(' is an implicit
    LINESTRING; otherwise a tagged curve type; bare EMPTY defaults to
    LINESTRING EMPTY."""
    t = lex.peek()
    if t == "(":
        coords, zs, ms = _parse_seq(lex, kind)
        return G.Geom(G.LINESTRING, coords, zs=zs, ms=ms)
    if t and t.upper() == "EMPTY":
        lex.next()
        return _declare_empty(G.LINESTRING, kind)
    g = _parse_geom(lex, kind)
    if g.type_id not in (
        G.LINESTRING, G.CIRCULARSTRING, G.COMPOUNDCURVE
    ):
        raise ValueError(
            "expected LINESTRING/CIRCULARSTRING/COMPOUNDCURVE member"
        )
    return g


def _parse_simple_curve_member(lex: _Lexer, kind) -> G.Geom:
    g = _parse_curve_member(lex, kind)
    if g.type_id == G.COMPOUNDCURVE:
        raise ValueError("expected LINESTRING or CIRCULARSTRING member")
    return g


def _parse_surface_member(lex: _Lexer, kind) -> G.Geom:
    """readSurfaceText (WKTReader.cpp:400-413): bare '(' is an
    implicit POLYGON; otherwise POLYGON or CURVEPOLYGON."""
    t = lex.peek()
    if t == "(":
        rings, zl, ml = _parse_ring_list(lex, kind)
        return G.Geom(G.POLYGON, rings, zs=zl, ms=ml)
    if t and t.upper() == "EMPTY":
        lex.next()
        return _declare_empty(G.POLYGON, kind)
    g = _parse_geom(lex, kind)
    if g.type_id not in (G.POLYGON, G.CURVEPOLYGON):
        raise ValueError("expected POLYGON or CURVEPOLYGON member")
    return g


def _split_rows(rows: list[list[float]], kind: str | None):
    """Per-coordinate ordinate lists -> (coords(k,2), zs, ms).

    The explicit tag wins ('POINT M (1 2 3)' is XYM); with no tag the
    ordinate count decides — 3 is XYZ, >=4 is XYZM
    (WKTReader::getCoordinates dimension inference)."""
    if not rows:
        empty = np.zeros((0, 2), dtype=np.float64)
        if kind is None:
            return empty, None, None
        return (
            empty,
            np.zeros(0, dtype=np.float64) if "Z" in kind else None,
            np.zeros(0, dtype=np.float64) if "M" in kind else None,
        )
    width = max(len(r) for r in rows)
    if kind is None:
        if width >= 4:
            kind = "ZM"
        elif width == 3:
            kind = "Z"
        else:
            kind = ""
    nan = float("nan")
    coords = np.array(
        [[r[0], r[1]] for r in rows], dtype=np.float64
    ).reshape(-1, 2)
    zs = ms = None
    if kind == "Z":
        zs = np.array(
            [r[2] if len(r) > 2 else nan for r in rows], dtype=np.float64
        )
    elif kind == "M":
        ms = np.array(
            [r[2] if len(r) > 2 else nan for r in rows], dtype=np.float64
        )
    elif kind == "ZM":
        zs = np.array(
            [r[2] if len(r) > 2 else nan for r in rows], dtype=np.float64
        )
        ms = np.array(
            [r[3] if len(r) > 3 else nan for r in rows], dtype=np.float64
        )
    return coords, zs, ms


def _parse_bare_coord(lex: _Lexer, kind):
    vals = []
    while lex.peek() not in (",", ")", None):
        vals.append(float(lex.next()))
    return _split_rows([vals], kind)


def _parse_seq(lex: _Lexer, kind):
    lex.expect("(")
    rows: list[list[float]] = []
    cur: list[float] = []
    while True:
        t = lex.next()
        if t == ",":
            rows.append(cur)
            cur = []
        elif t == ")":
            if cur:
                rows.append(cur)
            break
        else:
            cur.append(float(t))
    return _split_rows(rows, kind)


def _parse_ring_list(lex: _Lexer, kind):
    lex.expect("(")
    rings: list[np.ndarray] = []
    zl: list = []
    ml: list = []
    any_z = any_m = False
    if lex.peek() == ")":
        lex.next()
        return rings, None, None
    while True:
        if lex.peek() and lex.peek().upper() == "EMPTY":
            lex.next()
            rings.append(np.zeros((0, 2), dtype=np.float64))
            zl.append(np.zeros(0, dtype=np.float64))
            ml.append(np.zeros(0, dtype=np.float64))
        else:
            coords, zs, ms = _parse_seq(lex, kind)
            rings.append(coords)
            any_z |= zs is not None
            any_m |= ms is not None
            zl.append(
                zs if zs is not None else np.full(len(coords), np.nan)
            )
            ml.append(
                ms if ms is not None else np.full(len(coords), np.nan)
            )
        if lex.next() == ")":
            break
    return rings, (zl if any_z else None), (ml if any_m else None)


# ----------------------------------------------------------------------
# Writer
# ----------------------------------------------------------------------


def _num(v: float, rounding: int | None) -> str:
    if v != v:
        return "NaN"
    if rounding is not None:
        v = round(v, rounding)
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _coords_str(
    coords: np.ndarray, rounding, zs=None, ms=None, wz=False, wm=False
) -> str:
    """One coordinate list. When the output ordinate set includes Z/M
    but a leaf lacks the channel, NaN is written — exactly the
    reference's getOrdinate(Z) fallback (CoordinateSequence.cpp:300)."""
    if not wz and not wm:
        return ", ".join(
            f"{_num(x, rounding)} {_num(y, rounding)}" for x, y in coords
        )
    n = len(coords)
    nanarr = None
    if (wz and zs is None) or (wm and ms is None):
        nanarr = np.full(n, np.nan)
    parts = []
    for i in range(n):
        s = f"{_num(coords[i, 0], rounding)} {_num(coords[i, 1], rounding)}"
        if wz:
            zv = (zs if zs is not None else nanarr)[i]
            s += f" {_num(zv, rounding)}"
        if wm:
            mv = (ms if ms is not None else nanarr)[i]
            s += f" {_num(mv, rounding)}"
        parts.append(s)
    return ", ".join(parts)


def _tag(name: str, wz: bool, wm: bool) -> str:
    """appendOrdinateText (WKTWriter.cpp:265-287), new-style tags."""
    if wz and wm:
        return f"{name} ZM"
    if wz:
        return f"{name} Z"
    if wm:
        return f"{name} M"
    return name


def _curve_member_str(p: G.Geom, rounding, wz, wm) -> str:
    """Member text inside COMPOUNDCURVE/CURVEPOLYGON/MULTICURVE:
    LINESTRING children are written bare, CIRCULARSTRING tagged,
    COMPOUNDCURVE tagged (WKTWriter appendCurveText /
    appendSimpleCurveText, src/io/WKTWriter.cpp:311-334)."""
    if p.type_id == G.CIRCULARSTRING or p.type_id == G.COMPOUNDCURVE:
        return _write_tagged(p, rounding, wz, wm)
    if p.is_empty:
        return "EMPTY"
    return f"({_coords_str(p.data, rounding, p.zs, p.ms, wz, wm)})"


def _surface_member_str(p: G.Geom, rounding, wz, wm) -> str:
    """Member text inside MULTISURFACE: POLYGON bare, CURVEPOLYGON
    tagged (appendMultiSurfaceText, WKTWriter.cpp:595-615)."""
    if p.type_id == G.CURVEPOLYGON:
        return _write_tagged(p, rounding, wz, wm)
    if p.is_empty:
        return "EMPTY"
    return f"({_poly_rings_str(p, rounding, wz, wm)})"


def _poly_rings_str(p: G.Geom, rounding, wz, wm) -> str:
    nr = len(p.data)
    zl = p.zs if p.zs is not None else [None] * nr
    ml = p.ms if p.ms is not None else [None] * nr
    return ", ".join(
        f"({_coords_str(r, rounding, z, m, wz, wm)})"
        for r, z, m in zip(p.data, zl, ml)
    )


def write_wkt(g: G.Geom, rounding: int | None = None) -> str:
    """The output ordinate set is the geometry's declared hasZ/hasM
    (outputDimension 4, removeEmptyDimensions=false — the reference
    writer defaults) and is passed down to every nested member
    (appendGeometryTaggedText recursion)."""
    return _write_tagged(g, rounding, g.has_z, g.has_m)


def _write_tagged(
    g: G.Geom, rounding, wz: bool, wm: bool
) -> str:
    name = _tag(
        {v: k for k, v in _TYPE_BY_NAME.items() if k != "LINEARRING"}[
            g.type_id
        ],
        wz,
        wm,
    )
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
        inner = ", ".join(member(p, rounding, wz, wm) for p in g.data)
        return f"{name} ({inner})"
    if g.is_empty:
        return f"{name} EMPTY"
    if g.type_id == G.CIRCULARSTRING:
        return f"{name} ({_coords_str(g.data, rounding, g.zs, g.ms, wz, wm)})"
    if g.type_id == G.COMPOUNDCURVE:
        inner = ", ".join(
            _curve_member_str(p, rounding, wz, wm) for p in g.data
        )
        return f"{name} ({inner})"
    if g.type_id == G.CURVEPOLYGON:
        inner = ", ".join(
            _curve_member_str(p, rounding, wz, wm) for p in g.data
        )
        return f"{name} ({inner})"
    if g.type_id == G.POINT:
        return f"{name} ({_coords_str(g.data, rounding, g.zs, g.ms, wz, wm)})"
    if g.type_id == G.LINESTRING:
        return f"{name} ({_coords_str(g.data, rounding, g.zs, g.ms, wz, wm)})"
    if g.type_id == G.POLYGON:
        return f"{name} ({_poly_rings_str(g, rounding, wz, wm)})"
    if g.type_id == G.MULTIPOINT:
        inner = ", ".join(
            "EMPTY"
            if p.is_empty
            else f"({_coords_str(p.data, rounding, p.zs, p.ms, wz, wm)})"
            for p in g.data
        )
        return f"{name} ({inner})"
    if g.type_id == G.MULTILINESTRING:
        inner = ", ".join(
            "EMPTY"
            if p.is_empty
            else f"({_coords_str(p.data, rounding, p.zs, p.ms, wz, wm)})"
            for p in g.data
        )
        return f"{name} ({inner})"
    if g.type_id == G.MULTIPOLYGON:
        inner = ", ".join(
            "EMPTY" if p.is_empty else f"({_poly_rings_str(p, rounding, wz, wm)})"
            for p in g.data
        )
        return f"{name} ({inner})"
    inner = ", ".join(
        _write_tagged(p, rounding, wz, wm) for p in g.data
    )
    return f"{name} ({inner})"
