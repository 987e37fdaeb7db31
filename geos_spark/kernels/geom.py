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

# WKB type ids (ISO)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

_TYPE_NAMES = {
    POINT: "POINT",
    LINESTRING: "LINESTRING",
    POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT",
    MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON",
    GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}


class Geom:
    """type_id + payload.

    payload by type:
      POINT           -> (k,2) array, k in {0,1} (0 = EMPTY)
      LINESTRING      -> (k,2) array (k=0 = EMPTY)
      POLYGON         -> list of (k,2) closed rings (shell first); [] = EMPTY
      MULTI*/GC       -> list of child Geom
    """

    __slots__ = ("type_id", "data", "srid")

    def __init__(self, type_id: int, data, srid: int = 0):
        self.type_id = type_id
        self.data = data
        self.srid = srid

    # -- constructors -------------------------------------------------
    @staticmethod
    def point(x: float, y: float) -> "Geom":
        return Geom(POINT, np.array([[x, y]], dtype=np.float64))

    @staticmethod
    def empty(type_id: int) -> "Geom":
        if type_id in (POINT, LINESTRING):
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
        if self.type_id in (POINT, LINESTRING):
            return len(self.data) == 0
        if self.type_id == POLYGON:
            return len(self.data) == 0
        return all(g.is_empty for g in self.data) if self.data else True

    @property
    def is_collection(self) -> bool:
        return self.type_id >= MULTIPOINT

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
        if self.type_id == LINESTRING:
            return 1
        if self.type_id == POLYGON:
            return 2
        return max(g.dimension() for g in self.geoms() if not g.is_empty)

    def envelope(self) -> tuple[float, float, float, float]:
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
        if self.type_id in (POINT, LINESTRING):
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
